"""Text-analysis operators for the training-data pipeline layer:
language-ID (marker heuristic), quality scoring, token counting, document
fingerprinting (rolling hash). All vectorized over Arrow/pandas batches;
the first three are deliberately SQL-expressible for oracle parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# language marker words (checked as ' word ' within ' '||text||' ')
LANG_MARKERS = [("en", " the "), ("de", " der "), ("fr", " les "), ("es", " por ")]


def token_count_batch(batch: pa.Table) -> pa.Table:
    """tokens = whitespace-split count (≡ SQL len(regexp_split_to_array(
    trim(text), '\\s+')) for non-empty text)."""
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n = pc.list_value_length(pc.utf8_split_whitespace(txt)).cast(pa.int64())
    return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": n})


def _count_sub(txt: pa.Array, pat: str) -> pa.Array:
    return pc.count_substring(txt, pat)


def quality_batch(batch: pa.Table) -> pa.Table:
    """Integer quality signals + one double ratio (deterministic division)."""
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n_chars = pc.utf8_length(txt).cast(pa.int64())
    n_tokens = pc.list_value_length(pc.utf8_split_whitespace(txt)).cast(pa.int64())
    n_spaces = _count_sub(txt, " ").cast(pa.int64())
    n_the = _count_sub(pc.binary_join_element_wise(" ", txt, " ", ""), " the ").cast(pa.int64())
    mean_tok_len = pc.divide(
        pc.subtract(n_chars, n_spaces).cast(pa.float64()),
        pc.max_element_wise(n_tokens, 1).cast(pa.float64()))
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_chars": n_chars, "n_tokens": n_tokens,
                     "n_spaces": n_spaces, "n_the": n_the,
                     "mean_tok_len": mean_tok_len})


def langid_batch(batch: pa.Table) -> pa.Table:
    """Marker-word argmax with a fixed preference order (en>de>fr>es)."""
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    padded = pc.binary_join_element_wise(" ", txt, " ", "")
    counts = {lang: np.asarray(_count_sub(padded, pat))
              for lang, pat in LANG_MARKERS}
    c = np.stack([counts[lang] for lang, _ in LANG_MARKERS])  # (4, n)
    best = np.argmax(c, axis=0)          # first max wins = preference order
    any_hit = c.max(axis=0) > 0
    langs = np.array([lang for lang, _ in LANG_MARKERS], dtype=object)
    out = np.where(any_hit, langs[best], "unknown")
    return pa.table({"doc_id": batch.column("doc_id"),
                     "lang_pred": pa.array(out.tolist(), pa.string())})


_FP_BASE = 257
_FP_MOD = (1 << 61) - 1


def fingerprint_text(s: str) -> int:
    """Rolling polynomial hash over bytes, mod 2^61-1 (not SQL-expressible;
    checked by unit test + rows-only driver check)."""
    h = 0
    for b in s.encode():
        h = (h * _FP_BASE + b) % _FP_MOD
    return h


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"doc_id": batch["doc_id"],
                         "fingerprint": batch["text"].map(fingerprint_text)
                         .astype("uint64")})
