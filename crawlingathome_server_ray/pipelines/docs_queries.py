"""Training-data operators over the ``documents`` / ``embeddings`` tables:
dedup family, text analysis, similarity search, multimodal plumbing.
SQL-expressible ones carry DuckDB oracles; sketch-based ones (minhash,
simhash, fingerprint, IVF) are rows-only for the driver and exactness-tested
in pytest instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions import ann
from .frontier_core import coalesce_slim
from ..functions.canonicalize import md5_hash64, md5_hex
from ..functions.dedup import (connected_components, hamming64,
                               jaccard_pairs_hashed, minhash_batch,
                               pairs_from_groups, simhash_batch,
                               simhash_chunks)
from ..functions.text import (fingerprint_batch, langid_batch, quality_batch,
                              token_count_batch)

BATCH = 8192


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------- exact dedup
def q_doc_dedup_exact(sf_dir: str):
    """First-wins (min doc_id) per exact text: partial min per batch →
    groupby(text_md5).min — two-phase so the shuffle carries one row per
    distinct text per block, never the texts themselves at full width."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": np.asarray(b.column("doc_id")),
                           "h": np.asarray(md5_hex(b.column("text")))})
        out = df.groupby("h", sort=False)["doc_id"].min().reset_index()
        return pa.table({"h": pa.array(out["h"], pa.string()),
                         "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64())})

    agg = (coalesce_slim(ds.map_batches(partial, batch_format="pyarrow",
                                        batch_size=BATCH))
           .groupby("h").min("doc_id"))
    return agg.map_batches(
        lambda b: pa.table({"doc_id": b.column("min(doc_id)")}),
        batch_format="pyarrow", batch_size=65536)


SQL_DOC_DEDUP = """
SELECT doc_id FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1"""


# ---------------------------------------------------------------- text analysis
def q_token_count(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pyarrow", batch_size=BATCH)


# ≡ len(text.split()): regexp-trim both edges (SQL trim() strips spaces
# only, not \t\n) and guard all-whitespace text to 0 — matches the Ray
# side's non-empty token count exactly
SQL_TRIMMED = "regexp_replace(text, '^\\s+|\\s+$', '', 'g')"
SQL_N_TOKENS = (f"CASE WHEN {SQL_TRIMMED} = '' THEN 0 "
                f"ELSE len(regexp_split_to_array({SQL_TRIMMED}, '\\s+')) END")

SQL_TOKEN_COUNT = f"""
SELECT doc_id, CAST({SQL_N_TOKENS} AS BIGINT) AS n_tokens
FROM documents"""


def q_token_count_bpe(sf_dir: str):
    """Subword-style (BPE-ish regex) token counting — the second token
    metric of the training-data brief, alongside whitespace counting."""
    from ..functions.text import bpe_token_count_batch
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        bpe_token_count_batch, batch_format="pyarrow", batch_size=BATCH)


def _sql_token_count_bpe() -> str:
    from ..functions.text import BPE_ISH_PATTERN
    # DuckDB regexp_extract_all also runs RE2 → identical non-overlapping
    # match segmentation. Single-quote the pattern (it contains a ').
    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents"""


def q_doc_quality(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow", batch_size=BATCH)


SQL_DOC_QUALITY = f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST({SQL_N_TOKENS} AS BIGINT) AS n_tokens,
  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
  CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
    AS BIGINT) AS n_the,
  (length(text) - (length(text) - length(replace(text, ' ', '')))) * 1.0
    / greatest({SQL_N_TOKENS}, 1) AS mean_tok_len
FROM documents"""


# ---------------------------------------------------------- normalization
def q_doc_normalize(sf_dir: str):
    """Canonical text normalization (the pre-dedup cleanup stage): NFC
    unicode normalize → lowercase → collapse runs of whitespace to one
    space → trim. Lower/collapse/trim are single vectorized Arrow
    kernels with exact DuckDB twins (``lower`` parity probed on Turkish
    İ, final sigma, ligatures, fullwidth forms). NFC can NOT use Arrow's
    ``utf8_normalize`` — pyarrow 16's kernel emits DECOMPOSED output for
    every form incl. NFC (verified: composed é → e+U+0301) — so rows are
    split by a vectorized non-ASCII scan (``[^\\x00-\\x7F]`` RE2 match):
    ASCII rows are NFC-invariant and skip straight through; only the
    non-ASCII minority (a few % of web text) pays a per-row
    ``unicodedata.normalize`` (a single C call, matching DuckDB's
    ``nfc_normalize`` — parity pinned in ``test_normalize_engineered``).
    Emits ``changed`` so a downstream filter can skip rewriting
    untouched rows."""
    def norm(b: pa.Table) -> pa.Table:
        out = _norm_text(b.column("text"))
        return pa.table({"doc_id": b.column("doc_id"), "norm_text": out,
                         "changed": pc.not_equal(out, b.column("text"))})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow", batch_size=BATCH)


def _norm_text(t) -> pa.Array:
    """The q_doc_normalize kernel as a reusable array→array transform
    (NFC → lower → collapse whitespace → trim; see q_doc_normalize's
    docstring for the ASCII fast path rationale)."""
    import unicodedata
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    non_ascii = pc.match_substring_regex(t, r"[^\x00-\x7F]")
    idx = np.nonzero(np.asarray(non_ascii))[0]
    if len(idx):
        arr = np.asarray(t, dtype=object)
        for i in idx:
            arr[i] = unicodedata.normalize("NFC", arr[i])
        t = pa.array(arr, pa.string())
    return pc.utf8_trim_whitespace(pc.replace_substring_regex(
        pc.utf8_lower(t), r"\s+", " "))


def q_doc_dedup_keep_best(sf_dir: str):
    """Best-wins dedup on NORMALIZED text — the curation variant of
    first-wins: raw texts that differ only in case/whitespace/unicode
    form collide after normalization, and the survivor is the RICHEST
    original (max character count, doc_id as the deterministic
    tie-break), not merely the first seen.

    Same two-phase shape as q_doc_dedup_exact (one slim shuffle, one
    row per distinct normalized text per block): the lexicographic
    argmax (n_chars DESC, doc_id ASC) packs into a single int64 —
    ``n_chars·2³¹ + (2³¹−1−doc_id)`` — so the distributed fold is a
    plain groupby-max, no per-group map_groups. The packing bound
    (both < 2³¹) is asserted per batch; texts never shuffle."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    HALF = np.int64(1) << np.int64(31)

    def partial(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), np.int64)
        n_chars = np.asarray(pc.utf8_length(
            b.column("text").combine_chunks()
            if isinstance(b.column("text"), pa.ChunkedArray)
            else b.column("text")), np.int64)
        assert (ids < HALF).all() and (n_chars < HALF).all(), \
            "int64 argmax packing bound exceeded (see docstring)"
        key = n_chars * HALF + (HALF - 1 - ids)
        h = np.asarray(md5_hex(_norm_text(b.column("text"))))
        df = pd.DataFrame({"h": h, "key": key})
        out = df.groupby("h", sort=False)["key"].max().reset_index()
        return pa.table({"h": pa.array(out["h"], pa.string()),
                         "key": pa.array(out["key"].to_numpy(), pa.int64())})

    agg = (coalesce_slim(ds.map_batches(partial, batch_format="pyarrow",
                                        batch_size=BATCH))
           .groupby("h").max("key"))

    def decode(b: pa.Table) -> pa.Table:
        key = np.asarray(b.column("max(key)"), np.int64)
        return pa.table({
            "doc_id": pa.array(HALF - 1 - (key % HALF), pa.int64()),
            "n_chars": pa.array(key // HALF, pa.int64())})

    return agg.map_batches(decode, batch_format="pyarrow",
                           batch_size=65536)


SQL_DOC_DEDUP_BEST = r"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM documents
QUALIFY row_number() OVER (
  PARTITION BY trim(regexp_replace(lower(nfc_normalize(text)),
                                   '\s+', ' ', 'g'))
  ORDER BY length(text) DESC, doc_id) = 1"""


SQL_DOC_NORMALIZE = r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
         AS norm_text,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
         <> text AS changed
FROM documents"""


# ------------------------------------------------------------------ PII
# One RE2 pattern list drives BOTH engines: Arrow's count/replace_
# substring_regex and DuckDB's regexp_extract_all/regexp_replace are all
# RE2 (leftmost, non-overlapping, greedy) — identical match semantics by
# construction. Applied sequentially (emails first, so an IP-shaped
# substring inside an already-redacted email domain is not re-counted);
# counts are taken on the text as it stands BEFORE that pattern's own
# replacement, mirroring the oracle's CTE chain.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[- .]\d{2,4}[- .]\d{3,4}(?:[- .]\d{2,4})?\b",
     "<PHONE>"),
]


def q_doc_pii_scrub(sf_dir: str):
    """PII detection + redaction over documents: per-doc counts of
    emails / IPv4s / international-format phone numbers, and the
    fully-redacted text. One vectorized RE2 pass per pattern
    (``pc.count_substring_regex`` + ``pc.replace_substring_regex``) —
    no Python-rate loops; embarrassingly parallel, no shuffle. The
    standard scrubbing stage of a training-data pipeline (synth text
    carries no PII, so the sf oracle checks the identity path; matching
    behavior on PII-bearing text is pinned by
    ``test_pii_scrub_engineered`` against both the oracle and golden
    expectations)."""

    def scrub(b: pa.Table) -> pa.Table:
        t = b.column("text")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        cols = {"doc_id": b.column("doc_id")}
        for name, pat, repl in PII_PATTERNS:
            cols[f"n_{name}"] = pc.count_substring_regex(t, pat) \
                .cast(pa.int64())
            t = pc.replace_substring_regex(t, pat, repl)
        cols["redacted"] = t
        return pa.table(cols)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow", batch_size=BATCH)


def _sql_pii_scrub() -> str:
    (_, p_email, r_email), (_, p_ip, r_ip), (_, p_phone, r_phone) = \
        PII_PATTERNS
    return f"""
WITH s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{p_email}')) AS BIGINT)
           AS n_email,
         regexp_replace(text, '{p_email}', '{r_email}', 'g') AS t
  FROM documents),
s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t, '{p_ip}')) AS BIGINT) AS n_ip,
         regexp_replace(t, '{p_ip}', '{r_ip}', 'g') AS t
  FROM s1)
SELECT doc_id, n_email, n_ip,
       CAST(len(regexp_extract_all(t, '{p_phone}')) AS BIGINT) AS n_phone,
       regexp_replace(t, '{p_phone}', '{r_phone}', 'g') AS redacted
FROM s2"""


def q_doc_langid(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        langid_batch, batch_format="pyarrow", batch_size=BATCH)


SQL_DOC_LANGID = """
WITH c AS (
  SELECT doc_id,
    CAST((length(p) - length(replace(p, ' the ', ''))) / 5 AS BIGINT) AS c_en,
    CAST((length(p) - length(replace(p, ' der ', ''))) / 5 AS BIGINT) AS c_de,
    CAST((length(p) - length(replace(p, ' les ', ''))) / 5 AS BIGINT) AS c_fr,
    CAST((length(p) - length(replace(p, ' por ', ''))) / 5 AS BIGINT) AS c_es
  FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents))
SELECT doc_id,
  CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en > 0 THEN 'en'
       WHEN c_de >= c_fr AND c_de >= c_es AND c_de > 0 THEN 'de'
       WHEN c_fr >= c_es AND c_fr > 0 THEN 'fr'
       WHEN c_es > 0 THEN 'es'
       ELSE 'unknown' END AS lang_pred
FROM c"""


def q_doc_fingerprint(sf_dir: str):
    """Rolling polynomial hash per doc (rows-only: not SQL-expressible)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow", batch_size=BATCH)


# ---------------------------------------------------------------- minhash LSH
N_LSH_BUCKETS = 64


def _join_partitions(cap: int = 16) -> int:
    """Hash-join partition count sized to the cluster: ~CPU/2 (join
    aggregator actors + map tasks share the node), ≥2, ≤cap per join."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, min(cap, cpus // 2))


def _pair_bucket(a: np.ndarray, b: np.ndarray,
                 n_buckets: int = N_LSH_BUCKETS) -> np.ndarray:
    """Shuffle key for (a, b) id-pair dedup: every duplicate of a pair —
    emitted by different LSH bands — lands in the same bucket."""
    from ..functions.dedup import _splitmix
    mixed = _splitmix(a.astype(np.uint64)
                      ^ _splitmix(b.astype(np.uint64)))
    return (mixed % np.uint64(n_buckets)).astype(np.int32)


def _lsh_bucket(band_id, band_hash) -> np.ndarray:
    """Shuffle key: whole (band_id, band_hash) groups land in one bucket,
    so a groupby over ~64 int buckets replaces a groupby over ~16·n_docs
    mostly-singleton band groups (Ray's per-group dispatch over millions of
    tiny groups measured pathologically slow in round 1)."""
    from ..functions.dedup import _splitmix
    mixed = _splitmix(np.asarray(band_hash, dtype=np.uint64)
                      ^ (np.asarray(band_id).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
    return (mixed % np.uint64(N_LSH_BUCKETS)).astype(np.int32)


def q_minhash_dedup(sf_dir: str, n_perm: int = 64, bands: int = 16,
                    jaccard_threshold: float = 0.8,
                    distributed_pairs_threshold: int = 1_000_000):
    """MinHash→LSH→verify→cluster, fully distributed: returns
    (doc_id, cluster_id) for every doc in a verified near-dup cluster.

    1. sketch: map_batches → exploded (band_id, band_hash, doc_id) rows
       (16 B/row; texts never leave their blocks);
    2. candidates: groupby(lsh bucket) → vectorized within-bucket pair
       expansion (``pairs_from_groups``);
    3. cross-band dedup of pairs: groupby(a_id, b_id) — pairs only;
    4. verify: candidate pairs ⋈ documents twice on doc_id (Ray native
       hash join — the bucketed semi-join; the corpus streams, the driver
       never gathers texts), whole-batch vectorized hashed-shingle Jaccard
       (``jaccard_pairs_hashed``) inside map_batches;
    5. cluster: driver union-find while verified pairs fit
       (≤ ``distributed_pairs_threshold``); above it, distributed
       min-label propagation (``distributed_components``) — identical
       labels, never driver-resident (tests force both branches and
       assert equality).
    """
    ds = _docs(sf_dir, ["doc_id", "text"])
    # sketch batches are smaller than the generic BATCH so a small corpus
    # still fans out across the pool (sketching is the compute-heavy stage)
    bands_ds = ds.map_batches(
        lambda b: minhash_batch(b, n_perm=n_perm, bands=bands),
        batch_format="pyarrow", batch_size=1024)

    def add_bucket(b: pa.Table) -> pa.Table:
        bk = _lsh_bucket(np.asarray(b.column("band_id")),
                         np.asarray(b.column("band_hash")))
        return b.append_column("bucket", pa.array(bk, pa.int32()))

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = pairs_from_groups(
            [g["band_id"].to_numpy(np.int32),
             g["band_hash"].to_numpy(np.uint64)],
            g["doc_id"].to_numpy(np.int64))
        # pair_bucket: cross-band duplicate pairs co-locate for the dedup
        # groupby (bucketed map_groups beats Ray's Aggregate operator by
        # ~1.5 s of fixed cost at this scale, same asymptotics)
        return pd.DataFrame({"a_id": a, "b_id": b,
                             "pair_bucket": _pair_bucket(a, b)})

    cand = (bands_ds.map_batches(add_bucket, batch_format="pyarrow",
                                 batch_size=1 << 19)
            .groupby("bucket").map_groups(emit_pairs, batch_format="pandas")
            .groupby("pair_bucket")
            .map_groups(lambda g: g.drop_duplicates(["a_id", "b_id"])
                        [["a_id", "b_id"]],
                        batch_format="pandas")
            # repartition before the joins: groupby outputs can carry
            # schema-less empty blocks that crash a JoinOperator's build
            # side (see dedup.distributed_components); pairs are slim
            .repartition(_join_partitions())
            .materialize())  # candidate pairs only — ≪ corpus at any scale
    if cand.count() == 0:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "cluster_id": pd.array([], dtype="int64")})

    docs_a = ds.map_batches(
        lambda b: pa.table({"a_id": b.column("doc_id"),
                            "text_a": b.column("text")}),
        batch_format="pyarrow", batch_size=BATCH)
    docs_b = ds.map_batches(
        lambda b: pa.table({"b_id": b.column("doc_id"),
                            "text_b": b.column("text")}),
        batch_format="pyarrow", batch_size=BATCH)
    # two hash joins, materialized between: two concurrent JoinOperators in
    # one plan strand each other's aggregator actors on a small node, and
    # the intermediate (pairs + text_a) is candidate-sized, not corpus-sized
    np_ = _join_partitions()
    withtext = (cand.join(docs_a, join_type="inner", num_partitions=np_,
                          on=("a_id",)).materialize()
                .join(docs_b, join_type="inner", num_partitions=np_,
                      on=("b_id",)))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # whole-batch vectorized Jaccard over hashed shingle sets (unique
        # texts shingled once per batch) — no per-pair Python shingling
        sims = jaccard_pairs_hashed(df["text_a"].to_numpy(dtype=object),
                                    df["text_b"].to_numpy(dtype=object))
        out = df.loc[sims >= jaccard_threshold, ["a_id", "b_id"]]
        return out.astype({"a_id": "int64", "b_id": "int64"})

    verified = withtext.map_batches(verify, batch_format="pandas",
                                    batch_size=4096).materialize()
    if verified.count() > distributed_pairs_threshold:
        # scale path: pairs outgrew the driver — min-label propagation,
        # result stays a Dataset end to end
        from ..functions.dedup import distributed_components
        labels = distributed_components(verified)
        return labels.map_batches(
            lambda b: pa.table({"doc_id": b.column("node"),
                                "cluster_id": b.column("label")}),
            batch_format="pyarrow")
    vp = verified.to_pandas()  # verified near-dup pairs: driver-sized here
    comp = connected_components(list(zip(vp["a_id"].astype(int),
                                         vp["b_id"].astype(int))))
    out = sorted(comp.items())
    return pd.DataFrame({"doc_id": pd.array([d for d, _ in out], dtype="int64"),
                         "cluster_id": pd.array([c for _, c in out], dtype="int64")})


# ---------------------------------------------------------------- simhash
def q_simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs via pigeonhole chunk bucketing, fully
    distributed: any pair within hamming ≤ 3 shares one of 4 exact 16-bit
    chunks → explode 4 (chunk_idx, chunk_val) rows per doc → groupby(lsh
    bucket) → within-bucket pair expansion + vectorized hamming verify (the
    simhash values travel with the rows, so verification happens in the
    same map_groups — no second pass) → distributed cross-chunk pair dedup.
    The driver receives only the final verified pairs."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    sh_ds = ds.map_batches(simhash_batch, batch_format="pyarrow",
                           batch_size=1024)

    def explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        hs = np.asarray(b.column("simhash"), dtype=np.uint64)
        chunks = simhash_chunks(hs, 4)  # (n, 4)
        n = len(ids)
        ci = np.tile(np.arange(4, dtype=np.int32), n)
        cv = chunks.reshape(-1)
        return pa.table({
            "bucket": pa.array(_lsh_bucket(ci, cv), pa.int32()),
            "chunk_idx": pa.array(ci, pa.int32()),
            "chunk_val": pa.array(cv, pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
            "simhash": pa.array(np.repeat(hs, 4), pa.uint64())})

    def emit_verified(g: pd.DataFrame) -> pd.DataFrame:
        a, b, ha, hb = pairs_from_groups(
            [g["chunk_idx"].to_numpy(np.int32),
             g["chunk_val"].to_numpy(np.uint64)],
            g["doc_id"].to_numpy(np.int64),
            payload=g["simhash"].to_numpy(np.uint64))
        ok = hamming64(ha, hb) <= max_hamming
        return pd.DataFrame({"a_id": a[ok], "b_id": b[ok],
                             "pair_bucket": _pair_bucket(a[ok], b[ok])})

    pairs = (sh_ds.map_batches(explode, batch_format="pyarrow",
                               batch_size=1 << 18)
             .groupby("bucket").map_groups(emit_verified,
                                           batch_format="pandas")
             .groupby("pair_bucket")
             .map_groups(lambda g: g.drop_duplicates(["a_id", "b_id"])
                         [["a_id", "b_id"]],
                         batch_format="pandas"))
    out = pairs.to_pandas()  # final verified pairs only
    if out.empty:
        return pd.DataFrame({"a_id": pd.array([], dtype="int64"),
                             "b_id": pd.array([], dtype="int64")})
    return (out.astype({"a_id": "int64", "b_id": "int64"})
            .sort_values(["a_id", "b_id"]).reset_index(drop=True))


# ------------------------------------------- exact set-similarity join
NGRAM_JACCARD_THRESHOLD = 0.8
# Degenerate-skew guard on prefix-shingle groups: a shingle shared by more
# prefixes than this gets triu expansion for the first cap members + a
# spanning star for the tail (pairs_from_groups). Below the cap the join is
# EXACT (the prefix-filter lemma has no false negatives and verify has no
# false positives); a group above it means >4096 docs share a rare-position
# shingle — a mass-duplication pathology where cluster-level dedup, not an
# exhaustive pair list, is the sane product. triu memory is the binding
# constraint: 4096² ≈ 8.4M pair slots per group.
PREFIX_MAX_GROUP = 4096


def q_ngram_jaccard_dup(sf_dir: str,
                        threshold: float = NGRAM_JACCARD_THRESHOLD,
                        k: int = 3):
    """EXACT n-gram-Jaccard similarity self-join over documents: every
    pair (a<b) with shingle-set Jaccard ≥ threshold, with the exact
    intersection/union sizes and the ratio. The exact counterpart of the
    approximate minhash/simhash family — same shingle semantics
    (3-token shingles, short-doc one-shingle rule), but candidate
    generation is prefix filtering (Bayardo et al. WWW'07; distributed
    layout as in Vernica et al. SIGMOD'10) instead of LSH, so recall is 1
    by construction and a DuckDB string-gram oracle checks it exactly
    (hash-vs-string gram identity differs only on 64-bit collisions).

    Plan: map_batches prefix explode (``prefix_filter_rows`` — slim
    (uint64, int64) rows, texts never shuffle) → bucketed groupby pair
    expansion → bucketed pair dedup → two native hash joins fetch
    candidate texts → whole-batch vectorized Jaccard verify
    (``jaccard_pairs_hashed`` with counts). Identical shuffle shape to
    q_minhash_dedup; only the candidate key differs."""
    from ..functions.dedup import prefix_filter_rows
    ds = _docs(sf_dir, ["doc_id", "text"])

    def prefix_rows(b: pa.Table) -> pa.Table:
        h, ids = prefix_filter_rows(b.column("text"),
                                    np.asarray(b.column("doc_id"), np.int64),
                                    threshold=threshold, k=k)
        bucket = (np.zeros(0, np.int32) if len(h) == 0 else
                  _lsh_bucket(np.zeros(len(h), np.int32), h))
        return pa.table({"h": pa.array(h, pa.uint64()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(bucket, pa.int32())})

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = pairs_from_groups([g["h"].to_numpy(np.uint64)],
                                 g["doc_id"].to_numpy(np.int64),
                                 max_group=PREFIX_MAX_GROUP)
        return pd.DataFrame({"a_id": a, "b_id": b,
                             "pair_bucket": _pair_bucket(a, b)})

    empty = pd.DataFrame({"a_id": pd.array([], dtype="int64"),
                          "b_id": pd.array([], dtype="int64"),
                          "n_inter": pd.array([], dtype="int64"),
                          "n_union": pd.array([], dtype="int64"),
                          "jac": pd.array([], dtype="float64")})
    cand = (coalesce_slim(ds.map_batches(prefix_rows, batch_format="pyarrow",
                                         batch_size=2048))
            .groupby("bucket").map_groups(emit_pairs, batch_format="pandas")
            .groupby("pair_bucket")
            .map_groups(lambda g: g.drop_duplicates(["a_id", "b_id"])
                        [["a_id", "b_id"]],
                        batch_format="pandas")
            .repartition(_join_partitions())
            .materialize())  # candidate pairs only — ≪ corpus at any scale
    if cand.count() == 0:
        return empty

    docs_a = ds.map_batches(
        lambda b: pa.table({"a_id": b.column("doc_id"),
                            "text_a": b.column("text")}),
        batch_format="pyarrow", batch_size=BATCH)
    docs_b = ds.map_batches(
        lambda b: pa.table({"b_id": b.column("doc_id"),
                            "text_b": b.column("text")}),
        batch_format="pyarrow", batch_size=BATCH)
    np_ = _join_partitions()
    withtext = (cand.join(docs_a, join_type="inner", num_partitions=np_,
                          on=("a_id",)).materialize()
                .join(docs_b, join_type="inner", num_partitions=np_,
                      on=("b_id",)))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        sims, inter, na, nb = jaccard_pairs_hashed(
            df["text_a"].to_numpy(dtype=object),
            df["text_b"].to_numpy(dtype=object), k=k, return_counts=True)
        ok = sims >= threshold
        return pd.DataFrame({
            "a_id": df["a_id"].to_numpy(np.int64)[ok],
            "b_id": df["b_id"].to_numpy(np.int64)[ok],
            "n_inter": inter[ok], "n_union": (na + nb - inter)[ok],
            "jac": sims[ok]})

    out = (withtext.map_batches(verify, batch_format="pandas",
                                batch_size=4096)
           .to_pandas())  # pairs ≥ threshold only: near-dup-sized output
    if out.empty:
        return empty
    return (out.astype({"a_id": "int64", "b_id": "int64",
                        "n_inter": "int64", "n_union": "int64"})
            .sort_values(["a_id", "b_id"]).reset_index(drop=True))


# ------------------------------------------- shared-substring detection
# Exact + winnowed detection of document pairs sharing a long verbatim
# byte span (the substring-dedup concern of Lee et al. 2022). Both paths
# shuffle only slim (uint64 fp, int64 doc_id) rows — texts never leave
# their blocks — and share the bucketed pair machinery of the LSH family.
SUBSTR_K = 24          # gram length: pairs share a ≥24-char verbatim span
SUBSTR_W = 16          # winnow window: detection exact at ≥ k+w-1 = 39


def _fp_pair_frame(fps_ds, max_group: int = PREFIX_MAX_GROUP,
                   driver_pairs_threshold: int = 1_000_000):
    """(fp, doc_id, bucket) rows → distinct (a_id, b_id) pairs sharing at
    least one fingerprint: bucketed groupby pair expansion + bucketed
    cross-bucket pair dedup (same shuffle shape as the LSH candidates).
    Collected to a sorted DataFrame only while the pair count fits the
    driver (counted on the DATASET, like q_minhash_dedup's switch); a
    mass-duplication corpus above the threshold returns the distributed
    pair Dataset for the caller to write or cluster."""
    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = pairs_from_groups([g["fp"].to_numpy(np.uint64)],
                                 g["doc_id"].to_numpy(np.int64),
                                 max_group=max_group)
        ok = a != b
        a, b = a[ok], b[ok]
        return pd.DataFrame({"a_id": a, "b_id": b,
                             "pair_bucket": _pair_bucket(a, b)})

    pairs = (coalesce_slim(fps_ds).groupby("bucket")
             .map_groups(emit_pairs, batch_format="pandas")
             .groupby("pair_bucket")
             .map_groups(lambda g: g.drop_duplicates(["a_id", "b_id"])
                         [["a_id", "b_id"]],
                         batch_format="pandas")
             .materialize())
    if pairs.count() > driver_pairs_threshold:
        return pairs                          # Dataset: stays distributed
    df = pairs.to_pandas()
    if df.empty:
        return pd.DataFrame({"a_id": pd.array([], dtype="int64"),
                             "b_id": pd.array([], dtype="int64")})
    return (df.astype({"a_id": "int64", "b_id": "int64"})
            .sort_values(["a_id", "b_id"]).reset_index(drop=True))


def q_doc_substring_dup(sf_dir: str, k: int = SUBSTR_K,
                        driver_pairs_threshold: int = 1_000_000):
    """EXACT shared-substring self-join: every pair (a<b) of documents
    sharing at least one verbatim k-byte span. Per batch, ONE vectorized
    prefix-hash pass + one whole-matrix modular multiply produces every
    gram's 61-bit rolling hash (``gram_hashes_padded``); per-doc-distinct
    (fp, doc_id) rows shuffle (16 B/gram — the corpus re-keyed once, the
    inherent cost of exactness; ``doc_substring_winnow`` is the sublinear
    scale path), then bucketed pair expansion + dedup. Hash equality
    stands in for gram equality (2^-61 collision odds, same policy as
    doc_line_dedup); the DuckDB oracle compares true substrings."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def emit_grams(b: pa.Table) -> pa.Table:
        from ..functions.dedup import gram_hashes_padded
        g, valid = gram_hashes_padded(b.column("text").to_pylist(), k)
        di, pos = np.nonzero(valid)
        fp = g[di, pos]
        did = np.asarray(b.column("doc_id"), np.int64)[di]
        order = np.lexsort((fp, did))          # per-doc-distinct grams
        fp, did = fp[order], did[order]
        keep = np.ones(len(fp), bool)
        keep[1:] = (fp[1:] != fp[:-1]) | (did[1:] != did[:-1])
        fp, did = fp[keep], did[keep]
        bucket = (np.zeros(0, np.int32) if len(fp) == 0 else
                  _lsh_bucket(np.zeros(len(fp), np.int32), fp))
        return pa.table({"fp": pa.array(fp, pa.uint64()),
                         "doc_id": pa.array(did, pa.int64()),
                         "bucket": pa.array(bucket, pa.int32())})

    # batch 512 keeps every kernel scratch buffer < the 32 MB glibc mmap
    # threshold: buffers live in the worker's (pre-faulted) heap instead
    # of fresh mmaps, dodging this sandbox's throttled first-touch faults
    fps = ds.map_batches(emit_grams, batch_format="pyarrow",
                         batch_size=512)
    return _fp_pair_frame(fps,
                          driver_pairs_threshold=driver_pairs_threshold)


def q_doc_substring_winnow(sf_dir: str, k: int = SUBSTR_K,
                           w: int = SUBSTR_W,
                           driver_pairs_threshold: int = 1_000_000):
    """Winnowed shared-substring detection (Schleimer–Wilkerson–Aiken
    MOSS fingerprinting): each doc keeps only the minimum gram hash of
    every w-window (density ≈ 2/(w+1) of positions), then the same pair
    machinery as the exact join. GUARANTEED to report every pair sharing
    a span ≥ k+w-1 bytes (SWA 2003 §3 — exact above the threshold, not
    probabilistic); pairs sharing only k..k+w-2 bytes may or may not
    surface. This is the 100-TB path: fingerprint rows are ~8% of gram
    rows at the defaults, and the guarantee threshold — not a recall
    target — is the tuning knob. Rows-only for the driver (winnow
    selection is not SQL-expressible); the guarantee and the
    subset/superset sandwich vs the exact join are pytest-proven."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def emit_fps(b: pa.Table) -> pa.Table:
        from ..functions.dedup import gram_hashes_padded, winnow_select
        g, valid = gram_hashes_padded(b.column("text").to_pylist(), k)
        d, pos = winnow_select(g, valid, w)
        fp = g[d, pos]
        did = np.asarray(b.column("doc_id"), np.int64)[d]
        order = np.lexsort((fp, did))          # per-doc-distinct selections
        fp, did = fp[order], did[order]
        keep = np.ones(len(fp), bool)
        keep[1:] = (fp[1:] != fp[:-1]) | (did[1:] != did[:-1])
        fp, did = fp[keep], did[keep]
        bucket = (np.zeros(0, np.int32) if len(fp) == 0 else
                  _lsh_bucket(np.zeros(len(fp), np.int32), fp))
        return pa.table({"fp": pa.array(fp, pa.uint64()),
                         "doc_id": pa.array(did, pa.int64()),
                         "bucket": pa.array(bucket, pa.int32())})

    fps = ds.map_batches(emit_fps, batch_format="pyarrow",
                         batch_size=512)
    return _fp_pair_frame(fps,
                          driver_pairs_threshold=driver_pairs_threshold)


def _sql_substring_dup(k: int = SUBSTR_K) -> str:
    # char-based substr ≡ the Ray side's byte grams: the documents table
    # is ASCII by construction (asserted in tests)
    return f"""
WITH nums AS (SELECT CAST(i AS INT) AS i FROM range(1, 1000001) r(i)
              WHERE i <= (SELECT max(n_chars) FROM documents) - {k} + 1),
g AS (SELECT DISTINCT d.doc_id, substr(d.text, n.i, {k}) AS gram
      FROM documents d JOIN nums n ON n.i <= d.n_chars - {k} + 1)
SELECT a.doc_id AS a_id, b.doc_id AS b_id
FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
GROUP BY 1, 2 ORDER BY 1, 2"""


def _sql_ngram_jaccard(threshold: float = NGRAM_JACCARD_THRESHOLD,
                       k: int = 3) -> str:
    """String-gram oracle: DISTINCT k-token grams per doc (short docs
    with 0<nt<k contribute their whole token list as one gram — the
    Ray side's short-doc rule), exact intersection via gram self-join.
    jac is int64→double division in both engines: IEEE-identical."""
    toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    return f"""
WITH lens AS (
  SELECT doc_id, {toks} AS t, len({toks}) AS nt FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:least(i+{k - 1}, nt)], ' ') AS g
  FROM lens, LATERAL unnest(range(1,
       CASE WHEN nt >= {k} THEN nt - {k - 1}
            WHEN nt > 0 THEN 1 ELSE 0 END + 1)) AS u(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT a_id, b_id, CAST(c AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - c AS BIGINT) AS n_union,
       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jac
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {threshold}
ORDER BY a_id, b_id"""


# ---------------------------------------------------------------- curation
CURATE_MIN_CHARS = 100
CURATE_MIN_TOKENS = 20


def q_docs_curated(sf_dir: str, n_buckets: int = 64):
    """The composite curation pipeline a training-data user actually runs,
    end to end in one streaming chain: quality gate (length/token floors)
    → language ID (keep identified) → exact first-wins dedup by content
    (bucketed one-shuffle, min doc_id wins) → deterministic 1/2 sample on
    md5(doc_id). Output (doc_id, lang_pred, n_tokens); every step is
    SQL-expressible so the WHOLE composite verifies against one DuckDB
    oracle."""
    from ..functions.text import langid_batch
    ds = _docs(sf_dir, ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        from ..functions.text import nonempty_token_counts
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        n_tokens = nonempty_token_counts(txt)  # ≡ len(text.split())
        lang = langid_batch(b).column("lang_pred")
        keep = pc.and_(
            pc.and_(pc.greater_equal(n_chars, CURATE_MIN_CHARS),
                    pc.greater_equal(n_tokens, CURATE_MIN_TOKENS)),
            pc.not_equal(lang, "unknown"))
        t = pa.table({"doc_id": b.column("doc_id"),
                      "text_h": md5_hex(txt),
                      "lang_pred": lang, "n_tokens": n_tokens}).filter(keep)
        hh = pd.util.hash_array(np.asarray(t.column("text_h")))
        return t.append_column(
            "bucket", pa.array((hh % n_buckets).astype(np.int32), pa.int32()))

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text_h", "doc_id"], kind="mergesort")
        return g[~g["text_h"].duplicated()].drop(columns=["bucket", "text_h"])

    def sample(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        nib = md5_hash64(np.char.mod("%d", ids)) >> np.uint64(60)
        return b.filter(pa.array(nib < 8)).select(
            ["doc_id", "lang_pred", "n_tokens"])

    return (coalesce_slim(ds.map_batches(prep, batch_format="pyarrow",
                                         batch_size=BATCH))
            .groupby("bucket").map_groups(first_wins, batch_format="pandas")
            .map_batches(sample, batch_format="pyarrow", batch_size=65536))


SQL_DOCS_CURATED = f"""
WITH f AS (
  SELECT doc_id, text,
         CAST({SQL_N_TOKENS} AS BIGINT) AS n_tokens,
         ' ' || text || ' ' AS p
  FROM documents
  WHERE length(text) >= {CURATE_MIN_CHARS}
    AND {SQL_N_TOKENS} >= {CURATE_MIN_TOKENS}),
c AS (
  SELECT doc_id, text, n_tokens,
    CAST((length(p) - length(replace(p, ' the ', ''))) / 5 AS BIGINT) AS c_en,
    CAST((length(p) - length(replace(p, ' der ', ''))) / 5 AS BIGINT) AS c_de,
    CAST((length(p) - length(replace(p, ' les ', ''))) / 5 AS BIGINT) AS c_fr,
    CAST((length(p) - length(replace(p, ' por ', ''))) / 5 AS BIGINT) AS c_es
  FROM f),
l AS (
  SELECT doc_id, text, n_tokens,
    CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en > 0 THEN 'en'
         WHEN c_de >= c_fr AND c_de >= c_es AND c_de > 0 THEN 'de'
         WHEN c_fr >= c_es AND c_fr > 0 THEN 'fr'
         WHEN c_es > 0 THEN 'es'
         ELSE 'unknown' END AS lang_pred
  FROM c),
d AS (
  SELECT doc_id, lang_pred, n_tokens,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM l WHERE lang_pred <> 'unknown')
SELECT doc_id, lang_pred, n_tokens FROM d
WHERE rn = 1
  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      IN ('0','1','2','3','4','5','6','7')"""


def q_docs_scrub_pipeline(sf_dir: str, n_buckets: int = 64):
    """The OTHER composite a training-data user runs end to end: text
    normalization (NFC/lower/collapse/trim — ``q_doc_normalize``'s
    kernel) → PII redaction (``PII_PATTERNS``, sequential) → quality
    gates on the SCRUBBED text (char/token floors) → exact first-wins
    dedup by scrubbed content (bucketed one-shuffle, min doc_id wins).
    Output (doc_id, n_tokens, n_pii). Every step is SQL-expressible, so
    the whole chain verifies against one DuckDB oracle — normalization
    dedups case/whitespace/unicode-form variants that raw-text dedup
    (``q_docs_curated``) cannot see. Same scale shape as the curated
    chain: one streaming map + one slim bucketed shuffle (doc_id, md5,
    counts — the texts never shuffle)."""
    import unicodedata

    from ..functions.text import nonempty_token_counts
    ds = _docs(sf_dir, ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.column("text")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        # normalize (ASCII fast path, see q_doc_normalize)
        non_ascii = pc.match_substring_regex(t, r"[^\x00-\x7F]")
        idx = np.nonzero(np.asarray(non_ascii))[0]
        if len(idx):
            arr = np.asarray(t, dtype=object)
            for i in idx:
                arr[i] = unicodedata.normalize("NFC", arr[i])
            t = pa.array(arr, pa.string())
        t = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.utf8_lower(t), r"\s+", " "))
        # scrub
        n_pii = pa.nulls(len(t), pa.int64()).fill_null(0)
        for _, pat, repl in PII_PATTERNS:
            n_pii = pc.add(n_pii, pc.count_substring_regex(t, pat)
                           .cast(pa.int64()))
            t = pc.replace_substring_regex(t, pat, repl)
        # gates on the scrubbed text
        n_chars = pc.utf8_length(t).cast(pa.int64())
        n_tokens = nonempty_token_counts(t)
        keep = pc.and_(pc.greater_equal(n_chars, CURATE_MIN_CHARS),
                       pc.greater_equal(n_tokens, CURATE_MIN_TOKENS))
        out = pa.table({"doc_id": b.column("doc_id"),
                        "text_h": md5_hex(t),
                        "n_tokens": n_tokens, "n_pii": n_pii}).filter(keep)
        hh = pd.util.hash_array(np.asarray(out.column("text_h")))
        return out.append_column(
            "bucket", pa.array((hh % n_buckets).astype(np.int32), pa.int32()))

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text_h", "doc_id"], kind="mergesort")
        return g[~g["text_h"].duplicated()].drop(columns=["bucket", "text_h"])

    return (coalesce_slim(ds.map_batches(prep, batch_format="pyarrow",
                                         batch_size=BATCH))
            .groupby("bucket").map_groups(first_wins, batch_format="pandas"))


def _sql_scrub_pipeline() -> str:
    (_, p_email, r_email), (_, p_ip, r_ip), (_, p_phone, r_phone) = \
        PII_PATTERNS
    norm = (r"trim(regexp_replace(lower(nfc_normalize(text)), "
            r"'\s+', ' ', 'g'))")
    return f"""
WITH n AS (
  SELECT doc_id, {norm} AS t FROM documents),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '{p_email}')) AS BIGINT) AS c1,
         regexp_replace(t, '{p_email}', '{r_email}', 'g') AS t FROM n),
s2 AS (
  SELECT doc_id, c1,
         CAST(len(regexp_extract_all(t, '{p_ip}')) AS BIGINT) AS c2,
         regexp_replace(t, '{p_ip}', '{r_ip}', 'g') AS t FROM s1),
s3 AS (
  SELECT doc_id, c1 + c2 +
         CAST(len(regexp_extract_all(t, '{p_phone}')) AS BIGINT) AS n_pii,
         regexp_replace(t, '{p_phone}', '{r_phone}', 'g') AS t FROM s2),
g AS (
  SELECT doc_id, n_pii, t,
         CASE WHEN t = '' THEN 0
              ELSE len(string_split(t, ' ')) END AS n_tokens
  FROM s3
  WHERE length(t) >= {CURATE_MIN_CHARS}
    AND (CASE WHEN t = '' THEN 0
              ELSE len(string_split(t, ' ')) END) >= {CURATE_MIN_TOKENS}),
d AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, n_pii,
         row_number() OVER (PARTITION BY t ORDER BY doc_id) AS rn
  FROM g)
SELECT doc_id, n_tokens, n_pii FROM d WHERE rn = 1"""


# ---------------------------------------------------------------- corpus stats
QUANTILES = (0.5, 0.9, 0.99)


def q_doc_length_quantiles(sf_dir: str):
    """Exact per-language discrete quantiles of doc length via a
    value-count histogram: per-batch partial (lang, n_chars, n) counts →
    groupby(lang) over the SHRUNK histogram (≤ |distinct lengths| rows per
    lang, never the rows themselves) → quantile from the cumulative
    counts. Exact at any corpus size because the histogram domain is
    bounded, unlike sorting the group. The rank rule matches DuckDB's
    quantile_disc: element at 1-based rank ceil(q·n)."""
    ds = _docs(sf_dir, ["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["lang", "n_chars"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    def quants(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby("n_chars", sort=True)["n"].sum()).reset_index()
        vals = g["n_chars"].to_numpy(dtype=np.int64)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        row = {"lang": None}
        for q in QUANTILES:
            rank = max(1, int(np.ceil(q * n)))
            row[f"p{int(q * 100)}"] = vals[np.searchsorted(cum, rank)]
        return pd.DataFrame([row])

    def quants_with_lang(g: pd.DataFrame) -> pd.DataFrame:
        out = quants(g)
        out["lang"] = g["lang"].iloc[0]
        return out[["lang", "p50", "p90", "p99"]]

    return (ds.map_batches(partial, batch_format="pandas", batch_size=BATCH)
            .groupby("lang").map_groups(quants_with_lang,
                                        batch_format="pandas"))


SQL_DOC_QUANTILES = """
SELECT lang,
       quantile_disc(n_chars, 0.50) AS p50,
       quantile_disc(n_chars, 0.90) AS p90,
       quantile_disc(n_chars, 0.99) AS p99
FROM documents GROUP BY lang"""


def q_doc_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: per-language rates (1/16 for the
    dominant 'en' stratum, 4/16 otherwise) keyed on md5(doc_id) — the
    downsample-the-head / keep-the-tail shape of training-data curation.
    Rides the vectorized md5 kernel; fully streaming, no shuffle."""
    ds = _docs(sf_dir, ["doc_id", "lang"])

    def pick(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        nib = md5_hash64(np.char.mod("%d", ids)) >> np.uint64(60)
        is_en = np.asarray(pc.equal(b.column("lang"), "en"))
        keep = np.where(is_en, nib == 0, nib < 4)
        return b.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=BATCH)


SQL_DOC_STRATIFIED = """
SELECT doc_id, lang FROM documents
WHERE CASE WHEN lang = 'en'
      THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
      ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
      END"""


TOP_BIGRAMS_K = 50


def q_top_bigrams(sf_dir: str, k: int = TOP_BIGRAMS_K, n_buckets: int = 64):
    """Global top-k token bigrams: per-batch partial counts (one Arrow
    split + vectorized pandas concat/value_counts) → bucketed groupby
    (bigrams hash-bucketed, so per-bucket totals are exact and the global
    top-k is a subset of the union of per-bucket top-ks) → tiny driver
    merge of ≤ n_buckets·k rows."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        texts = b.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.utf8_split_whitespace(texts)
        flat = lists.flatten()
        raw_counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        doc_of = np.repeat(np.arange(len(raw_counts)), raw_counts)
        keep = np.asarray(pc.not_equal(flat, ""))
        toks = np.asarray(flat, dtype=object)[keep]
        doc_of = doc_of[keep]
        if len(toks) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        adj = doc_of[:-1] == doc_of[1:]
        big = (pd.Series(toks[:-1][adj]).str
               .cat(pd.Series(toks[1:][adj]), sep=" "))
        vc = big.value_counts()
        grams = vc.index.to_numpy(dtype=object)
        bucket = (pd.util.hash_array(grams) % n_buckets).astype(np.int32)
        return pa.table({"bigram": pa.array(grams, pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64()),
                         "bucket": pa.array(bucket, pa.int32())})

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("bigram", sort=False)["n"].sum().reset_index()
        tot = tot.sort_values(["n", "bigram"], ascending=[False, True],
                              kind="mergesort").head(k)
        return tot[["bigram", "n"]]

    per_bucket = (coalesce_slim(ds.map_batches(partial,
                                               batch_format="pyarrow",
                                               batch_size=BATCH))
                  .groupby("bucket").map_groups(bucket_topk,
                                                batch_format="pandas"))
    merged = per_bucket.to_pandas()  # ≤ n_buckets × k rows
    merged = merged.sort_values(["n", "bigram"], ascending=[False, True],
                                kind="mergesort").head(k).reset_index(drop=True)
    return merged.astype({"n": "int64"})


SQL_TOP_BIGRAMS = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT d.toks[t.i] || ' ' || d.toks[t.i + 1] AS bigram, count(*) AS n
FROM d, LATERAL unnest(range(1, len(d.toks))) AS t(i)
GROUP BY 1
ORDER BY n DESC, bigram
LIMIT {TOP_BIGRAMS_K}"""


def _toks_docof(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(tokens, doc_row_index): Arrow whitespace split with empties
    dropped — the same grammar as the q_top_bigrams partial and the
    oracles' list_filter(regexp_split_to_array(...), x -> x <> '')."""
    texts = b.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(texts)
    flat = lists.flatten()
    raw_counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    doc_of = np.repeat(np.arange(len(raw_counts)), raw_counts)
    keep = np.asarray(pc.not_equal(flat, ""))
    return np.asarray(flat, dtype=object)[keep], doc_of[keep]


PMI_MIN_N = 4


def q_pmi_collocations(sf_dir: str, min_n: int = PMI_MIN_N,
                       n_buckets: int = 64,
                       join_threshold: int = 1 << 20):
    """PMI collocation extraction (SURVEY X58): every adjacent-token
    bigram seen ≥ ``min_n`` times, with the exact corpus counts PMI
    needs — (w1, w2, n_pair, n_w1, n_w2); the score itself,
    ln(n_pair·N/(n_w1·n_w2)) (Church & Hanks 1990), is a pure function
    of these integers, so only exact int64 facts are emitted and the
    oracle hash-matches (the module-header float discipline).

    Shape: ONE tokenize pass emits both the bigram and the unigram
    partial counts into a shared slim table (tag ``is_pair``; pairs
    bucket by gram hash, words by word hash — each key class never
    spans its buckets, so the single bucketed fold yields exact totals
    for both). The support filter shrinks the pair table, then a
    COUNTED THRESHOLD SWITCH (the X2/X27 discipline) attaches unigram
    counts: below ``join_threshold`` collocations the pair table
    collects and the unigram side is semi-filtered to the pair
    vocabulary before a driver merge (two broadcast-filter passes, no
    join shuffle); above it, two native distributed hash joins. Both
    branches asserted equal in tests."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    npart = max(8, min(64, cpus))

    empty_b = pa.table({"w1": pa.array([], pa.string()),
                        "w2": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                        "is_pair": pa.array([], pa.int8()),
                        "bucket": pa.array([], pa.int32())})

    def partial(b: pa.Table) -> pa.Table:
        toks, doc_of = _toks_docof(b)
        if len(toks) == 0:
            return empty_b
        vc = pd.Series(toks).value_counts()
        words = vc.index.to_numpy(dtype=object)
        wb = (pd.util.hash_array(words) % n_buckets).astype(np.int32)
        uni = pa.table({"w1": pa.array(words, pa.string()),
                        "w2": pa.array(np.full(len(words), "",
                                               dtype=object), pa.string()),
                        "n": pa.array(vc.to_numpy(np.int64)),
                        "is_pair": pa.array(
                            np.zeros(len(words), np.int8)),
                        "bucket": pa.array(wb, pa.int32())})
        if len(toks) < 2:
            return uni
        adj = doc_of[:-1] == doc_of[1:]
        per = (pd.DataFrame({"w1": toks[:-1][adj], "w2": toks[1:][adj]})
               .groupby(["w1", "w2"], sort=False).size()
               .reset_index(name="n"))
        grams = (per["w1"] + " " + per["w2"]).to_numpy(dtype=object)
        gb = (pd.util.hash_array(grams) % n_buckets).astype(np.int32)
        big = pa.table({"w1": pa.array(per["w1"], pa.string()),
                        "w2": pa.array(per["w2"], pa.string()),
                        "n": pa.array(per["n"].to_numpy(np.int64)),
                        "is_pair": pa.array(np.ones(len(per), np.int8)),
                        "bucket": pa.array(gb, pa.int32())})
        return pa.concat_tables([uni, big])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = (g.groupby(["w1", "w2", "is_pair"], sort=False,
                         as_index=False)["n"].sum())
        tot = tot[(tot["is_pair"] == 0) | (tot["n"] >= min_n)]
        tot["n"] = tot["n"].astype("int64")
        return tot[["w1", "w2", "is_pair", "n"]]

    totals = (coalesce_slim(ds.map_batches(partial,
                                           batch_format="pyarrow",
                                           batch_size=BATCH))
              .groupby("bucket").map_groups(fold, batch_format="pandas")
              .materialize())
    pairs = totals.filter(expr="is_pair == 1")
    uni = totals.filter(expr="is_pair == 0")
    n_pairs = pairs.count()
    if n_pairs <= join_threshold:
        # small collocation table: driver merge, unigram side
        # semi-filtered to the pair vocabulary (never the full vocab)
        pdf = pairs.select_columns(["w1", "w2", "n"]).to_pandas()
        vocab = np.unique(np.concatenate([
            pdf["w1"].to_numpy(dtype=object),
            pdf["w2"].to_numpy(dtype=object)])) if len(pdf) else \
            np.empty(0, object)
        vref = ray.put(vocab)

        def in_vocab(b: pa.Table) -> pa.Table:
            want = ray.get(vref)
            w = np.asarray(b.column("w1"), dtype=object)
            pos = np.minimum(np.searchsorted(want, w),
                             max(len(want) - 1, 0))
            keep = want[pos] == w if len(want) else \
                np.zeros(len(w), bool)
            return b.filter(pa.array(keep)).select(["w1", "n"])

        udf = uni.map_batches(in_vocab, batch_format="pyarrow",
                              batch_size=65536).to_pandas()
        cnt = dict(zip(udf["w1"], udf["n"].astype("int64")))
        out = pd.DataFrame({
            "w1": pdf["w1"], "w2": pdf["w2"],
            "n_pair": pdf["n"].astype("int64"),
            "n_w1": pdf["w1"].map(cnt).astype("int64"),
            "n_w2": pdf["w2"].map(cnt).astype("int64")})
        return out

    def as_pairs(b: pa.Table) -> pa.Table:
        return pa.table({"w1": b.column("w1"), "w2": b.column("w2"),
                         "n_pair": b.column("n")})

    def as_uni(col: str):
        def conv(b: pa.Table) -> pa.Table:
            return pa.table({col.replace("n_", ""): b.column("w1"),
                             col: b.column("n")})
        return conv

    p = pairs.map_batches(as_pairs, batch_format="pyarrow")
    u1 = uni.map_batches(as_uni("n_w1"), batch_format="pyarrow")
    u2 = uni.map_batches(as_uni("n_w2"), batch_format="pyarrow")
    j = p.join(u1, join_type="inner", num_partitions=npart, on=("w1",))
    return j.join(u2, join_type="inner", num_partitions=npart, on=("w2",))


SQL_PMI = f"""
WITH d AS (
  SELECT list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '') AS toks
  FROM documents),
uni AS (
  SELECT t.tok AS w, CAST(count(*) AS BIGINT) AS n_w
  FROM d, LATERAL unnest(d.toks) AS t(tok) GROUP BY 1),
big AS (
  SELECT d.toks[t.i] AS w1, d.toks[t.i + 1] AS w2,
         CAST(count(*) AS BIGINT) AS n_pair
  FROM d, LATERAL unnest(range(1, len(d.toks))) AS t(i)
  GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_N})
SELECT b.w1, b.w2, b.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2
FROM big b JOIN uni u1 ON u1.w = b.w1 JOIN uni u2 ON u2.w = b.w2"""


# the sf-synth lexicon is ~30 distinct whitespace tokens, so V=16 leaves
# a real OOV signal at every test scale (production would use 10^5-10^6)
VOCAB_V = 16


def q_vocab_oov_rate(sf_dir: str, v: int = VOCAB_V, n_buckets: int = 64):
    """Vocabulary coverage / OOV-rate audit (SURVEY X59): build the
    exact global top-V vocabulary by corpus frequency (count desc, term
    asc — the tokenizer-design question "how much of the corpus does a
    V-word vocab cover"), then score every document's token count and
    out-of-vocabulary token count against it. Output (doc_id, n_tokens,
    n_oov) — exact int64, zero-token docs omitted on both sides.

    Pass 1 is the bucketed exact top-k shape (per-batch partials, a
    term never spans buckets ⇒ per-bucket totals exact ⇒ the global
    top-V is a subset of the ≤ buckets·V per-bucket winners merged on
    the driver). The vocab — V words, fixed and small — broadcasts
    once via ``ray.put``; pass 2 is a vectorized searchsorted
    membership per batch, no shuffle at all."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def uni_partial(b: pa.Table) -> pa.Table:
        toks, _ = _toks_docof(b)
        vc = pd.Series(toks).value_counts()
        words = vc.index.to_numpy(dtype=object)
        bucket = (pd.util.hash_array(words) % n_buckets).astype(np.int32)
        return pa.table({"w": pa.array(words, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64)),
                         "bucket": pa.array(bucket, pa.int32())})

    def bucket_topv(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("w", sort=False, as_index=False)["n"].sum()
        return (tot.sort_values(["n", "w"], ascending=[False, True],
                                kind="mergesort").head(v)[["w", "n"]])

    cand = (coalesce_slim(ds.map_batches(uni_partial,
                                         batch_format="pyarrow",
                                         batch_size=BATCH))
            .groupby("bucket").map_groups(bucket_topv,
                                          batch_format="pandas")
            .to_pandas())                        # ≤ n_buckets·V rows
    vocab = np.sort(cand.sort_values(["n", "w"],
                                     ascending=[False, True],
                                     kind="mergesort")
                    .head(v)["w"].to_numpy(dtype=object))
    vocab_ref = ray.put(vocab)

    def score(b: pa.Table) -> pa.Table:
        toks, doc_of = _toks_docof(b)
        ids = np.asarray(b.column("doc_id"), np.int64)
        if len(toks) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_oov": pa.array([], pa.int64())})
        vb = ray.get(vocab_ref)
        pos = np.searchsorted(vb, toks)
        pos[pos == len(vb)] = 0
        oov = vb[pos] != toks
        n_tok = np.bincount(doc_of, minlength=len(ids))
        n_oov = np.bincount(doc_of, weights=oov, minlength=len(ids))
        keep = n_tok > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_tokens": pa.array(n_tok[keep].astype(np.int64)),
            "n_oov": pa.array(n_oov[keep].astype(np.int64))})

    return ds.map_batches(score, batch_format="pyarrow", batch_size=BATCH)


SQL_OOV = f"""
WITH toks AS (
  SELECT doc_id, t.tok AS term
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS toks
        FROM documents) d,
       LATERAL unnest(d.toks) AS t(tok)),
cnt AS (SELECT term, count(*) AS n FROM toks GROUP BY 1),
vocab AS (SELECT term FROM cnt ORDER BY n DESC, term LIMIT {VOCAB_V})
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE term NOT IN
                             (SELECT term FROM vocab)) AS BIGINT) AS n_oov
FROM toks GROUP BY doc_id"""


# fixed-point step for exact embedding sums: float32 → double promotion
# is exact on both sides, ·2^20 is an exponent shift (exact), floor is
# floor — so the int64 partials are bit-identical to the SQL oracle's
EMB_QUANT = 1 << 20


def q_embedding_label_stats(sf_dir: str):
    """Embedding drift / centroid monitor (SURVEY X64): per (label, dim)
    — count and exact fixed-point coordinate sum, the sufficient
    statistics for per-class centroids and between-snapshot drift checks
    (an embedding-space data card; the monitor DataPerf-style eval
    suites run per training slice). centroid = sum_q / (n · 2^20).

    One streaming pass: each batch reshapes its list<float> column to an
    (n, d) matrix ONCE (zero-copy flatten), quantizes, and scatter-adds
    per present label — the partial is ≤ #labels × d rows regardless of
    batch size; the final groupby is bounded the same way. Only int64
    facts are emitted (float sums would differ from the oracle in
    summation order)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding", "label"])

    def partial(b: pa.Table) -> pa.Table:
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        n = len(emb)
        d = flat.size // max(n, 1)
        q = np.floor(flat * EMB_QUANT).astype(np.int64).reshape(n, d)
        labels = np.asarray(b.column("label"), np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(uniq))),
            "n": pa.array(np.repeat(counts, d), pa.int64()),
            "sum_q": pa.array(sums.ravel(), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=BATCH)
            .groupby(["label", "dim"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_q", alias_name="sum_q")))


SQL_EMB_STATS = f"""
SELECT CAST(e.label AS BIGINT) AS label, t.i AS dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(e.embedding[t.i + 1] * {EMB_QUANT}.0)
                AS BIGINT)) AS BIGINT) AS sum_q
FROM embeddings e, LATERAL unnest(range(len(e.embedding))) AS t(i)
GROUP BY 1, 2"""


# ---------------------------------------------------------------- embeddings
def q_ann_topk(sf_dir: str):
    return ann.brute_force_topk(sf_dir, n_queries=10, k=10)


SQL_ANN_TOPK = """
SELECT q.vec_id AS query_id,
       CAST(row_number() OVER (PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(q.embedding, v.embedding) DESC,
                     v.vec_id) AS BIGINT) AS rank,
       v.vec_id
FROM embeddings q, embeddings v
WHERE q.vec_id < 10 AND v.vec_id <> q.vec_id
QUALIFY rank <= 10"""


def q_ann_ivf_topk(sf_dir: str):
    """IVF approximate variant (rows-only; recall vs brute force is tested
    in pytest)."""
    return ann.ivf_topk(sf_dir, n_queries=10, k=10)


def q_ann_pq_topk(sf_dir: str):
    """Product-quantization ADC variant (rows-only; recall vs brute force
    + compression ratio tested in pytest) — the memory-bound scale path:
    the search scans 8-byte code rows, never the raw vectors."""
    return ann.pq_topk(sf_dir, n_queries=10, k=10)


def q_ann_ivfpq_topk(sf_dir: str):
    """Combined IVF-PQ variant (rows-only; recall + pruned-read +
    compression tested in pytest) — the 10^10-vector production layout:
    partition-pruned cell reads over 64×-compressed codes."""
    return ann.ivfpq_topk(sf_dir, n_queries=10, k=10)


COSINE_DUP_THRESHOLD = 0.4  # calibrated to the synthetic embeddings
# (random-ish 64-dim vectors: max off-diagonal cosine ≈ 0.48, so 0.4 yields a
# small, meaningful pair set; production near-dup would use 0.9+)


def q_embedding_kmeans(sf_dir: str, n_clusters: int = 10,
                       n_iter: int = 10, seed: int = 42):
    """Distributed spherical k-means over the embeddings table: n_iter
    streaming Lloyd's passes (broadcast centroids, per-batch partial
    sums, tree-reduce combine — ``ann.kmeans_fit``) then one assignment
    pass. Returns the (vec_id, cluster_id) Dataset — the corpus streams;
    the driver only ever holds the k×d centroid matrix. Rows-only for the
    driver (iterative, not SQL-expressible); exactness vs the single-node
    twin and purity vs the generator's ground-truth labels in pytest."""
    from ..functions.ann import kmeans_assign, kmeans_fit
    cent = kmeans_fit(sf_dir, n_clusters=n_clusters, n_iter=n_iter,
                      seed=seed)
    return kmeans_assign(sf_dir, cent)


def q_cosine_near_dup(sf_dir: str):
    return ann.cosine_near_dup_pairs(sf_dir, limit_ids=1000,
                                     threshold=COSINE_DUP_THRESHOLD)


def q_cosine_near_dup_ivf(sf_dir: str):
    """IVF-cell all-pairs variant (rows-only; recall vs the exact
    broadcast variant asserted in pytest). The pair set here is bounded
    by limit_ids=1000, so collecting to a sorted frame is driver-safe;
    the unbounded scale path (q_semantic_dedup) keeps the Dataset."""
    return ann.pairs_to_sorted_pandas(
        ann.cosine_near_dup_ivf(sf_dir, threshold=COSINE_DUP_THRESHOLD,
                                limit_ids=1000))


SQL_COSINE_NEAR_DUP = f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM embeddings a, embeddings b
WHERE a.vec_id < 1000 AND b.vec_id < 1000 AND a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding, b.embedding) >= {COSINE_DUP_THRESHOLD}
ORDER BY a_id, b_id"""


# ---------------------------------------------------------------- multimodal
def q_binary_meta(sf_dir: str):
    """Multimodal plumbing smoke: treat pages.html as an opaque binary
    payload column; emit size + sniffed type (the decode itself is stubbed
    in stages/multimodal.py — no image/audio libs in this container)."""
    from .frontier_core import pages_ds

    def meta(b: pa.Table) -> pa.Table:
        h = b.column("html")
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        n = pc.binary_length(h).cast(pa.int64())
        looks = pc.starts_with(h.cast(pa.string()), "<html>")
        return pa.table({"url": b.column("url"), "n_bytes": n,
                         "looks_html": looks})

    return pages_ds(sf_dir, ["url", "html"]).map_batches(
        meta, batch_format="pyarrow", batch_size=BATCH)


def sql_binary_meta(pages_path: str) -> str:
    return f"""
SELECT url, CAST(octet_length(html) AS BIGINT) AS n_bytes,
       decode(html) LIKE '<html>%' AS looks_html
FROM read_parquet('{pages_path}/*.parquet')"""


DOCS_QUERIES = {
    "doc_dedup_exact": q_doc_dedup_exact,
    "doc_dedup_keep_best": q_doc_dedup_keep_best,
    "token_count": q_token_count,
    "token_count_bpe": q_token_count_bpe,
    "doc_quality": q_doc_quality,
    "doc_pii_scrub": q_doc_pii_scrub,
    "doc_normalize": q_doc_normalize,
    "doc_langid": q_doc_langid,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_length_quantiles": q_doc_length_quantiles,
    "doc_stratified_sample": q_doc_stratified_sample,
    "docs_curated": q_docs_curated,
    "docs_scrub_pipeline": q_docs_scrub_pipeline,
    "top_bigrams": q_top_bigrams,
    "pmi_collocations": q_pmi_collocations,
    "vocab_oov_rate": q_vocab_oov_rate,
    "ngram_jaccard_dup": q_ngram_jaccard_dup,
    "doc_substring_dup": q_doc_substring_dup,
    "doc_substring_winnow": q_doc_substring_winnow,
    "minhash_dedup": q_minhash_dedup,
    "simhash_pairs": q_simhash_pairs,
    "ann_topk": q_ann_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_pq_topk": q_ann_pq_topk,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "cosine_near_dup": q_cosine_near_dup,
    "cosine_near_dup_ivf": q_cosine_near_dup_ivf,
    "embedding_kmeans": q_embedding_kmeans,
    "embedding_label_stats": q_embedding_label_stats,
    "binary_meta": q_binary_meta,
}

DOCS_SQL = {
    "doc_dedup_exact": SQL_DOC_DEDUP,
    "doc_dedup_keep_best": SQL_DOC_DEDUP_BEST,
    "token_count": SQL_TOKEN_COUNT,
    "token_count_bpe": _sql_token_count_bpe(),
    "doc_quality": SQL_DOC_QUALITY,
    "doc_pii_scrub": _sql_pii_scrub(),
    "doc_normalize": SQL_DOC_NORMALIZE,
    "doc_langid": SQL_DOC_LANGID,
    "doc_length_quantiles": SQL_DOC_QUANTILES,
    "doc_stratified_sample": SQL_DOC_STRATIFIED,
    "docs_curated": SQL_DOCS_CURATED,
    "docs_scrub_pipeline": _sql_scrub_pipeline(),
    "top_bigrams": SQL_TOP_BIGRAMS,
    "pmi_collocations": SQL_PMI,
    "vocab_oov_rate": SQL_OOV,
    "ngram_jaccard_dup": _sql_ngram_jaccard(),
    "doc_substring_dup": _sql_substring_dup(),
    "ann_topk": SQL_ANN_TOPK,
    "cosine_near_dup": SQL_COSINE_NEAR_DUP,
    "embedding_label_stats": SQL_EMB_STATS,
    # fingerprint / minhash / simhash / ivf: rows-only (non-SQL sketches)
}
