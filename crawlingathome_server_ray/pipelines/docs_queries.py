"""Training-data operators over the ``documents`` / ``embeddings`` tables:
dedup family, text analysis, similarity search, multimodal plumbing.
SQL-expressible ones carry DuckDB oracles; sketch-based ones (minhash,
simhash, fingerprint, IVF) are rows-only for the driver and exactness-tested
in pytest instead.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions import ann
from ..functions.dedup import (connected_components, hamming64, jaccard,
                               minhash_batch, simhash_batch, simhash_chunks)
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
                           "h": [hashlib.md5(t.encode()).hexdigest()
                                 for t in b.column("text").to_pylist()]})
        out = df.groupby("h", sort=False)["doc_id"].min().reset_index()
        return pa.table({"h": pa.array(out["h"], pa.string()),
                         "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=BATCH)
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


SQL_TOKEN_COUNT = """
SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
  AS n_tokens
FROM documents"""


def q_doc_quality(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow", batch_size=BATCH)


SQL_DOC_QUALITY = """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
  CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
    AS BIGINT) AS n_the,
  (length(text) - (length(text) - length(replace(text, ' ', '')))) * 1.0
    / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) AS mean_tok_len
FROM documents"""


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
        fingerprint_batch, batch_format="pandas", batch_size=BATCH)


# ---------------------------------------------------------------- minhash LSH
def q_minhash_dedup(sf_dir: str, n_perm: int = 64, bands: int = 16,
                    jaccard_threshold: float = 0.8):
    """MinHash→LSH→verify→cluster: returns (doc_id, cluster_id) for every
    doc in a verified near-dup cluster. Shuffle = groupby (band_id,
    band_hash) over the exploded band rows; verification joins back the
    candidate pairs' texts by broadcast."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    bands_ds = ds.map_batches(
        lambda df: minhash_batch(df, n_perm=n_perm, bands=bands),
        batch_format="pandas", batch_size=BATCH).materialize()

    # candidate buckets = (band_id, band_hash) groups with ≥2 members. A
    # per-bucket map_groups would dispatch python once per bucket (≈ 16 ×
    # n_docs groups — almost all singletons), and Ray's sort-aggregate over
    # that many string groups is pathologically slow; instead: per-batch
    # partial counts → small driver combine → broadcast hot-bucket set.
    partials = bands_ds.map_batches(
        lambda df: df.groupby(["band_id", "band_hash"], sort=False)
        .size().reset_index(name="n"),
        batch_format="pandas", batch_size=65536).to_pandas()
    counts = (partials.groupby(["band_id", "band_hash"], sort=False)["n"]
              .sum().reset_index())
    hot = counts[counts["n"] >= 2]
    hot_keys = set(zip(hot["band_id"].astype(int), hot["band_hash"]))
    if not hot_keys:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "cluster_id": pd.array([], dtype="int64")})
    ref = ray.put(hot_keys)

    def in_hot(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(ref)
        mask = [(int(b), h) in keys
                for b, h in zip(df["band_id"], df["band_hash"])]
        return df[pd.Series(mask, index=df.index)]

    members = bands_ds.map_batches(in_hot, batch_format="pandas",
                                   batch_size=65536).to_pandas()
    pairs = []
    for _, g in members.groupby(["band_id", "band_hash"], sort=False):
        ids = np.sort(g["doc_id"].to_numpy())
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs.append((int(ids[x]), int(ids[y])))
    cand = pd.DataFrame(pairs, columns=["a_id", "b_id"]).drop_duplicates() \
        if pairs else pd.DataFrame({"a_id": [], "b_id": []})
    if len(cand) == 0:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "cluster_id": pd.array([], dtype="int64")})
    need = set(int(x) for x in cand["a_id"]) | set(int(x) for x in cand["b_id"])
    texts: dict[int, str] = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        for d, t in zip(np.asarray(b["doc_id"]).tolist(), b["text"].to_pylist()):
            if d in need:
                texts[d] = t
    verified = [(int(a), int(b_)) for a, b_ in zip(cand["a_id"], cand["b_id"])
                if jaccard(texts[int(a)], texts[int(b_)]) >= jaccard_threshold]
    comp = connected_components(verified)
    out = sorted(comp.items())
    return pd.DataFrame({"doc_id": pd.array([d for d, _ in out], dtype="int64"),
                         "cluster_id": pd.array([c for _, c in out], dtype="int64")})


# ---------------------------------------------------------------- simhash
def q_simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs via pigeonhole chunk bucketing: any pair
    within hamming ≤ 3 shares one of 4 exact 16-bit chunks → groupby
    (chunk_idx, chunk_val) → verify hamming."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    sh = ds.map_batches(simhash_batch, batch_format="pandas",
                        batch_size=BATCH).to_pandas()
    ids = sh["doc_id"].to_numpy(dtype=np.int64)
    hs = sh["simhash"].to_numpy(dtype=np.uint64)
    chunks = simhash_chunks(hs, 4)
    seen_pairs = set()
    for ci in range(4):
        df = pd.DataFrame({"v": chunks[:, ci], "i": np.arange(len(ids))})
        for _, g in df.groupby("v"):
            idx = g["i"].to_numpy()
            if len(idx) < 2:
                continue
            for x in range(len(idx)):
                for y in range(x + 1, len(idx)):
                    a, b = int(ids[idx[x]]), int(ids[idx[y]])
                    seen_pairs.add((min(a, b), max(a, b)))
    if not seen_pairs:
        return pd.DataFrame({"a_id": pd.array([], dtype="int64"),
                             "b_id": pd.array([], dtype="int64")})
    arr = np.array(sorted(seen_pairs), dtype=np.int64)
    pos = {int(d): i for i, d in enumerate(ids)}
    ha = hs[[pos[int(a)] for a in arr[:, 0]]]
    hb = hs[[pos[int(b)] for b in arr[:, 1]]]
    ok = hamming64(ha, hb) <= max_hamming
    return pd.DataFrame({"a_id": arr[ok, 0], "b_id": arr[ok, 1]})


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


COSINE_DUP_THRESHOLD = 0.4  # calibrated to the synthetic embeddings
# (random-ish 64-dim vectors: max off-diagonal cosine ≈ 0.48, so 0.4 yields a
# small, meaningful pair set; production near-dup would use 0.9+)


def q_cosine_near_dup(sf_dir: str):
    return ann.cosine_near_dup_pairs(sf_dir, limit_ids=1000,
                                     threshold=COSINE_DUP_THRESHOLD)


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
    "token_count": q_token_count,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_fingerprint": q_doc_fingerprint,
    "minhash_dedup": q_minhash_dedup,
    "simhash_pairs": q_simhash_pairs,
    "ann_topk": q_ann_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "cosine_near_dup": q_cosine_near_dup,
    "binary_meta": q_binary_meta,
}

DOCS_SQL = {
    "doc_dedup_exact": SQL_DOC_DEDUP,
    "token_count": SQL_TOKEN_COUNT,
    "doc_quality": SQL_DOC_QUALITY,
    "doc_langid": SQL_DOC_LANGID,
    "ann_topk": SQL_ANN_TOPK,
    "cosine_near_dup": SQL_COSINE_NEAR_DUP,
    # fingerprint / minhash / simhash / ivf: rows-only (non-SQL sketches)
}
