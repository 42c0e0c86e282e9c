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


def nonempty_token_counts(txt: pa.Array) -> pa.Array:
    """Per-doc count of NON-empty whitespace-split tokens ≡ Python
    ``len(text.split())``. Arrow's ``utf8_split_whitespace`` emits empty
    strings at leading/trailing whitespace; counting them would diverge
    from str.split() and the trim()-based SQL oracles on edge-whitespace
    text (latent with edge-whitespace-free synth data, but wrong)."""
    lists = pc.utf8_split_whitespace(txt)
    raw = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    flat = lists.flatten()
    empty_of = np.bincount(
        np.repeat(np.arange(len(raw)), raw)[np.asarray(pc.equal(flat, ""))],
        minlength=len(raw))
    return pa.array(raw - empty_of, pa.int64())


def token_count_batch(batch: pa.Table) -> pa.Table:
    """tokens = non-empty whitespace-split count ≡ len(text.split())."""
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_tokens": nonempty_token_counts(txt)})


def _count_sub(txt: pa.Array, pat: str) -> pa.Array:
    return pc.count_substring(txt, pat)


def quality_batch(batch: pa.Table) -> pa.Table:
    """Integer quality signals + one double ratio (deterministic division)."""
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n_chars = pc.utf8_length(txt).cast(pa.int64())
    n_tokens = nonempty_token_counts(txt)
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


# BPE-ish pre-tokenizer (GPT-2-style, simplified to RE2 syntax — no
# lookahead): contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs, whitespace runs. Both Arrow's
# count_substring_regex and DuckDB's regexp_extract_all run RE2, so the
# SQL oracle counts the exact same non-overlapping matches.
BPE_ISH_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)"
                   r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """Subword-style token count: non-overlapping BPE_ISH_PATTERN matches
    per doc (the whitespace-free analog of a GPT-2 pre-tokenizer's segment
    count), vectorized via Arrow's RE2 kernel."""
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n = pc.count_substring_regex(txt, BPE_ISH_PATTERN).cast(pa.int64())
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_bpe_tokens": n})


_FP_BASE = 257
_FP_MOD = (1 << 61) - 1


def fingerprint_text(s: str) -> int:
    """Rolling polynomial hash over bytes, mod 2^61-1 (not SQL-expressible;
    checked by unit test + rows-only driver check)."""
    h = 0
    for b in s.encode():
        h = (h * _FP_BASE + b) % _FP_MOD
    return h


_FP_B4 = _FP_BASE ** 4          # 257^4 ≈ 2^32.02 < p — no mod needed
_FP_COEFFS = np.array([_FP_BASE ** 3, _FP_BASE ** 2, _FP_BASE, 1],
                      dtype=np.uint64)


def _fp_horner(mat: np.ndarray) -> np.ndarray:
    """Vectorized Horner over a (n_docs, L) uint64 byte matrix
    (LEFT-zero-padded, L a multiple of 4: leading zero bytes are the
    identity for this hash, h = 0·257 + 0). Bytes are folded 4 at a time:
    one fully-vectorized polynomial combine turns every 4-byte window into
    a < 2^34 addend, then the python-level loop runs once per 4 byte
    positions with multiplier 257⁴.

    Modular arithmetic stays in uint64 via the Mersenne-prime split
    (p = 2^61−1 ⇒ 2^61 ≡ 1 mod p): with h = h₁·2^31 + h₀,
    h·257⁴ = (h₁·257⁴)·2^31 + h₀·257⁴, and the 2^31 shift re-splits its
    operand at bit 30, keeping every intermediate < 2^63.5."""
    p = np.uint64(_FP_MOD)
    c = np.uint64(_FP_B4)
    m31 = np.uint64((1 << 31) - 1)
    m30 = np.uint64((1 << 30) - 1)
    n, L = mat.shape
    poly = (mat.reshape(n, L // 4, 4) * _FP_COEFFS).sum(axis=2)  # < 2^34
    h = np.zeros(n, dtype=np.uint64)
    # loop invariant: h < 2^61 + 7 (the conditional subtract is deferred
    # to one final fold — the split bounds below hold for this slack)
    for j in range(poly.shape[1]):
        t = (h >> np.uint64(31)) * c                         # < 2^62.1
        part = (t >> np.uint64(30)) + ((t & m30) << np.uint64(31))  # ≡ t·2^31
        x = part + (h & m31) * c + poly[:, j]                # < 2^63.5
        h = (x >> np.uint64(61)) + (x & p)                   # < 2^61 + 7
    h = (h >> np.uint64(61)) + (h & p)
    return np.where(h >= p, h - p, h)


def fingerprint_many(texts, budget_elems: int = 1_000_000,
                     min_group: int = 64) -> np.ndarray:
    """Whole-batch rolling hash ≡ per-row :func:`fingerprint_text` (the
    scalar twin, kept for tests). Docs are length-sorted and processed in
    the LARGEST left-padded byte matrices that fit ``budget_elems``
    (≈8 MB of uint64; measured sweet spot on 32-core node), so the per-BYTE Horner loop runs over wide numpy
    rows and the padding waste is bounded by the within-group length
    spread. Python-level work is O(n_docs + max_len per group), not
    O(total bytes)."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    enc = [s.encode() for s in texts]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    g0 = 0
    while g0 < n:
        # greedy group: lengths ascend, so the group max is its last member
        g1 = g0 + 1
        while g1 < n and (g1 + 1 - g0) * max(1, int(lens[order[g1]])) \
                <= budget_elems:
            g1 += 1
        g1 = max(g1, min(n, g0 + min_group))
        idx = order[g0:g1]
        g0 = g1
        L = int(lens[idx].max())
        if L == 0:
            continue
        L += (-L) % 4  # left-pad to a 4-byte multiple for the folded Horner
        mat = np.zeros((len(idx), L), dtype=np.uint64)
        for r, i in enumerate(idx):
            b = np.frombuffer(enc[i], dtype=np.uint8)
            mat[r, L - len(b):] = b
        out[idx] = _fp_horner(mat)
    return out


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint) — zero-copy Arrow in, Arrow out."""
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fingerprint": pa.array(
                         fingerprint_many(
                             np.asarray(batch.column("text"), dtype=object)),
                         pa.uint64())})


# ------------------------------------------------ char-trigram LM scoring
LM_BUCKETS = 1 << 18


CHUNK_CHARS = 1 << 21  # ~2M codepoints per kernel chunk (see below)

# per-worker reusable scratch (the kernel runs inside long-lived Ray
# workers; reusing pages avoids first-touch page faults, which on this
# VM's degraded-memory phases run 10-100× slower than warm writes).
# Keyed by (name, dtype): a caller re-requesting a name with a different
# dtype gets its own buffer, never a wrongly-typed view.
_SCRATCH: dict[tuple[str, np.dtype], np.ndarray] = {}


def _scratch(name: str, n: int, dtype) -> np.ndarray:
    key = (name, np.dtype(dtype))
    buf = _SCRATCH.get(key)
    if buf is None or len(buf) < n:
        buf = np.empty(max(n, CHUNK_CHARS + 2), key[1])
        _SCRATCH[key] = buf
    return buf[:n]


def gather_into_scratch(values: np.ndarray, idx: np.ndarray,
                        name: str = "gather") -> np.ndarray:
    """Public scratch-backed gather: ``values[idx]`` written into a
    persistent per-worker buffer instead of a fresh allocation (a fresh
    ~100 MB gather per batch is all first-touch pages on this VM — see
    the module scratch note). The returned view is valid until the next
    same-(name, dtype) scratch call on this worker; callers must consume
    it before requesting the same buffer again."""
    out = _scratch(name, len(idx), values.dtype)
    np.take(values, idx, out=out)
    return out


def _splitmix_inplace(a: np.ndarray, tmp: np.ndarray) -> None:
    """In-place splitmix64 finalizer (bit-identical to dedup._splitmix)."""
    from .dedup import _GOLD
    a += _GOLD
    np.right_shift(a, np.uint64(30), out=tmp)
    a ^= tmp
    a *= np.uint64(0xBF58476D1CE4E5B9)
    np.right_shift(a, np.uint64(27), out=tmp)
    a ^= tmp
    a *= np.uint64(0x94D049BB133111EB)
    np.right_shift(a, np.uint64(31), out=tmp)
    a ^= tmp


def _trigram_chunk(arr_chunk: list, out: np.ndarray) -> int:
    """Hashed-trigram buckets for one bounded chunk of docs, written into
    ``out`` (the caller's slice of the batch result); returns the count.
    All intermediates live in reusable per-worker scratch — the only
    fresh allocations per call are the joined string/bytes (unavoidable)."""
    from .dedup import _GOLD
    joined = "\x00\x00".join(arr_chunk)
    u = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    m = len(u) - 2
    if m <= 0:
        return 0
    h = _scratch("h", m, np.uint64)
    t = _scratch("t", m, np.uint64)
    np.copyto(h, u[:-2], casting="unsafe")          # c0
    h *= _GOLD
    np.copyto(t, u[1:-1], casting="unsafe")         # c1
    h ^= t
    _splitmix_inplace(h, t)
    h *= _GOLD
    np.copyto(t, u[2:], casting="unsafe")           # c2
    h ^= t
    _splitmix_inplace(h, t)
    h %= np.uint64(LM_BUCKETS)
    v = _scratch("v", m, bool)
    w = _scratch("w", m, bool)
    np.not_equal(u[:-2], 0, out=v)
    np.not_equal(u[1:-1], 0, out=w)
    v &= w
    np.not_equal(u[2:], 0, out=w)
    v &= w
    n_valid = int(np.count_nonzero(v))
    np.compress(v, h.view(np.int64), out=out[:n_valid])
    return n_valid


def char_trigram_buckets(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat hashed-trigram bucket ids, int64 offsets[n+1]) for a whole
    batch, vectorized: docs are joined with a 2-NUL separator and decoded
    to a uint32 codepoint array (``utf-32-le`` + frombuffer — no
    per-char Python), trigram hashes are a position-sensitive splitmix
    fold over three shifted views, bucket = hash mod 2^18. Windows
    touching a separator are masked out, so no trigram crosses a doc
    boundary; docs shorter than 3 chars contribute none. (Real NUL chars
    in a doc would shed that doc's adjacent trigrams — acceptable for a
    quality score; synth/web text has none.)

    The decode+fold runs over doc-aligned chunks of ≤ ``CHUNK_CHARS``
    codepoints, with every intermediate in REUSABLE per-worker scratch
    and the result written straight into one preallocated output array:
    the naive fold chain allocates ~10 fresh temporaries the size of the
    whole batch, and on this VM first-touch page faults intermittently
    run 10-100× slower than warm writes (measured 34× single-threaded on
    identical inputs), so allocation traffic — not FLOPs — dominated the
    200k-doc LM build. Trigram hashes never cross docs, so doc-aligned
    chunking is exact; results are bit-identical to the scalar twin."""
    arr = np.asarray(texts, dtype=object)
    n = len(arr)
    offs = np.zeros(n + 1, dtype=np.int64)
    if n == 0:
        return np.zeros(0, np.int64), offs
    lst = arr.tolist()
    lens = np.fromiter((len(t) for t in lst), count=n, dtype=np.int64)
    tri_counts = np.maximum(lens - 2, 0)
    np.cumsum(tri_counts, out=offs[1:])
    b = np.empty(int(offs[-1]), dtype=np.int64)
    pos = 0
    start, budget = 0, 0
    for i in range(n):
        budget += int(lens[i]) + 2
        if budget >= CHUNK_CHARS:
            pos += _trigram_chunk(lst[start:i + 1], b[pos:])
            start, budget = i + 1, 0
    if start < n:
        pos += _trigram_chunk(lst[start:], b[pos:])
    assert pos == offs[-1]
    return b, offs


def segment_sums(values: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-segment sums with each segment accumulated INDEPENDENTLY
    left-to-right (``np.add.reduceat`` over non-empty starts), so the
    result is bit-identical at any batching — unlike a cumsum-diff,
    whose prefix rounding leaks across segments."""
    n = len(offs) - 1
    out = np.zeros(n, dtype=np.float64)
    nonempty = np.diff(offs) > 0
    if nonempty.any():
        out[nonempty] = np.add.reduceat(values, offs[:-1][nonempty])
    return out
