"""Late-stage training-data operators: sequence packing for LM training
batches, CCNet-style duplicate-line removal, and a SemDeDup-style
semantic-dedup composite over the embeddings table.

Reference analog: none — the reference (a crawl coordinator,
/root/reference/main.py) stops at shard dispatch; these are the
downstream curation steps the graft brief adds. Scale notes per
operator in the docstrings; the shared discipline matches
``curation_queries``: slim shuffles (ids + small ints, never text where
avoidable), partial-aggregate before any groupby, bucketed map_groups
instead of per-tiny-group dispatch, bounded driver artifacts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.canonicalize import md5_hash64
from .frontier_core import coalesce_slim

BATCH = 8192
HASH_MOD = 1_000_000_007  # token-checksum modulus (fits any int64 sum)


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=columns)


def _tok_lists(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whitespace tokens with empties dropped (≡ the curation oracles'
    list_filter(regexp_split_to_array(text,'\\s+'), x -> x <> '')):
    returns (flat_tokens, doc_row_of_token, idx_within_doc)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(texts)
    flat = lists.flatten()
    counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    keep = np.asarray(pc.not_equal(flat, ""))
    toks = np.asarray(flat, dtype=object)[keep]
    doc_of = doc_of[keep]
    kept_counts = np.bincount(doc_of, minlength=len(counts))
    starts = np.cumsum(kept_counts) - kept_counts
    idx_within = np.arange(len(doc_of)) - np.repeat(starts, kept_counts)
    return toks, doc_of, idx_within


def _tok_hash_mod(tokens: np.ndarray) -> np.ndarray:
    """Per-token checksum ≡ DuckDB ``md5_number_upper(term) % MOD``:
    md5_number_upper is the first 8 digest bytes as a LITTLE-endian
    uint64, i.e. the byteswap of our big-endian md5 kernel."""
    return (md5_hash64(tokens).byteswap() % np.uint64(HASH_MOD)).astype(np.int64)


# ------------------------------------------------------------- sequence packing
SEQPACK_LEN = 128          # tokens per training block
SEQPACK_RANGE_DOCS = 64    # docs per offset range (one driver row per range)
SEQPACK_MAX_RANGES = 1 << 18   # driver offset-table bound: O(1) in corpus
SEQPACK_BUCKETS = 64


def q_seq_pack(sf_dir: str, block_len: int = SEQPACK_LEN,
               range_docs: int | None = None):
    """Sequence packing — the step that turns a curated corpus into
    fixed-length LM training examples: concatenate all documents' tokens
    in doc_id order and cut the stream into ``block_len``-token blocks
    (docs may span block boundaries). Output is one row per block:
    (block_id, n_tokens, n_docs, first_doc, last_doc, tok_hash_mod) —
    the integer facts of the packed example, with a modular md5 checksum
    standing in for the token payload so the SQL oracle can verify
    content, not just counts.

    Distributed global prefix-sum, two streaming passes:

    1. per-batch partial (range_id → token count) → groupby(range_id)
       sum: ONE slim row per ``range_docs`` docs reaches the driver,
       which computes exclusive base offsets per range and broadcasts
       them via ray.put. ``range_docs`` defaults to
       max(SEQPACK_RANGE_DOCS, ⌈n_docs / SEQPACK_MAX_RANGES⌉) — the
       driver table is bounded at ~2^18 rows (a few MB) at ANY corpus
       size (10^10 docs ⇒ ~38k docs/range, still comfortable
       map_groups granularity), and the packed output is invariant to
       range_docs (global token positions are exact regardless of the
       range partitioning — asserted by the oracle and the scalar
       twin);
    2. groupby(range_id) over the docs (texts move once, keyed by the
       contiguous doc range — a near-no-op repartition when the input
       is doc_id-sorted): within a range, sort by doc_id, cumsum local
       offsets, add the broadcast base → exact global token positions →
       per-(block, doc) contribution rows (n, checksum);
    3. final: contributions bucketed by block_id % 64 → per-bucket
       pandas aggregate (a block lives in exactly one bucket, so the
       bucketed groupby is exact and dodges the Aggregate operator's
       per-query fixed cost at toy scale).

    Shuffle ledger: one text shuffle keyed by doc range + two slim ones
    (range totals, block contributions) — no all-to-all over tokens.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])
    if range_docs is None:
        # parquet-metadata count — no data read. Assumes dense-ish
        # doc_ids (the documents table's contract: ids 0..n-1); with a
        # very sparse id space the distinct-range count could exceed
        # n_docs/range_docs — pass range_docs ≈ max_id/SEQPACK_MAX_RANGES
        # explicitly in that case
        n_docs = ds.count()
        range_docs = max(SEQPACK_RANGE_DOCS,
                         -(-n_docs // SEQPACK_MAX_RANGES))

    def range_partial(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        _, doc_of, _ = _tok_lists(b.column("text"))
        n_by_doc = np.bincount(doc_of, minlength=len(ids)).astype(np.int64)
        rng = ids // range_docs
        df = (pd.DataFrame({"range_id": rng, "n": n_by_doc})
              .groupby("range_id", sort=False)["n"].sum().reset_index())
        return pa.table({"range_id": pa.array(df["range_id"], pa.int64()),
                         "n": pa.array(df["n"], pa.int64())})

    totals = (ds.map_batches(range_partial, batch_format="pyarrow",
                             batch_size=BATCH)
              .groupby("range_id").sum("n").to_pandas())
    totals = totals.sort_values("range_id")
    base = np.concatenate(([0], np.cumsum(
        totals["sum(n)"].to_numpy(np.int64))))[:-1]
    # broadcast as two SORTED int64 arrays (zero-copy plasma reads +
    # O(log n) searchsorted per task) — the dict variant deserialized the
    # whole up-to-2^18-entry mapping once per map_groups task
    rid_arr = totals["range_id"].to_numpy(np.int64)
    bases_ref = ray.put((rid_arr, base))

    def with_range(b: pa.Table) -> pa.Table:
        rng = pc.divide(b.column("doc_id"), range_docs).cast(pa.int64())
        return b.append_column("range_id", rng)

    def range_contribs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        ids = g["doc_id"].to_numpy(np.int64)
        toks, doc_of, idx_within = _tok_lists(pa.array(g["text"], pa.string()))
        if len(toks) == 0:
            return pd.DataFrame({"block_id": np.empty(0, np.int64),
                                 "doc_id": np.empty(0, np.int64),
                                 "n": np.empty(0, np.int64),
                                 "hs": np.empty(0, np.int64),
                                 "bucket": np.empty(0, np.int32)})
        n_by_doc = np.bincount(doc_of, minlength=len(ids)).astype(np.int64)
        local = np.cumsum(n_by_doc) - n_by_doc  # exclusive, within range
        rids, bases = ray.get(bases_ref)        # zero-copy numpy views
        rbase = int(bases[np.searchsorted(rids, int(ids[0]) // range_docs)])
        pos = rbase + local[doc_of] + idx_within
        block = pos // block_len
        hs = _tok_hash_mod(toks)
        df = (pd.DataFrame({"block_id": block, "doc_id": ids[doc_of], "hs": hs})
              .groupby(["block_id", "doc_id"], sort=False)["hs"]
              .agg(["count", "sum"]).reset_index())
        return pd.DataFrame({
            "block_id": df["block_id"].to_numpy(np.int64),
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n": df["count"].to_numpy(np.int64),
            "hs": df["sum"].to_numpy(np.int64),
            "bucket": (df["block_id"].to_numpy(np.int64)
                       % SEQPACK_BUCKETS).astype(np.int32)})

    def bucket_final(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("block_id", sort=False).agg(
            n_tokens=("n", "sum"), n_docs=("doc_id", "size"),
            first_doc=("doc_id", "min"), last_doc=("doc_id", "max"),
            hs=("hs", "sum")).reset_index()
        agg["tok_hash_mod"] = agg["hs"] % HASH_MOD
        return agg[["block_id", "n_tokens", "n_docs",
                    "first_doc", "last_doc", "tok_hash_mod"]].astype("int64")

    return (ds.map_batches(with_range, batch_format="pyarrow",
                           batch_size=BATCH)
            .groupby("range_id").map_groups(range_contribs,
                                            batch_format="pandas")
            .groupby("bucket").map_groups(bucket_final,
                                          batch_format="pandas"))


SQL_TOKS = ("list_filter(regexp_split_to_array(text, '\\s+'), "
            "x -> x <> '')")

SQL_SEQ_PACK = f"""
WITH d AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
t AS (SELECT doc_id, unnest(toks) AS term,
             unnest(range(len(toks))) AS i FROM d),
p AS (SELECT doc_id, term,
             row_number() OVER (ORDER BY doc_id, i) - 1 AS pos FROM t),
c AS (SELECT pos // {SEQPACK_LEN} AS block_id, doc_id, count(*) AS n,
             sum(md5_number_upper(term) % {HASH_MOD}) AS hs
      FROM p GROUP BY 1, 2)
SELECT CAST(block_id AS BIGINT) AS block_id,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc,
       CAST(sum(hs) % {HASH_MOD} AS BIGINT) AS tok_hash_mod
FROM c GROUP BY block_id"""


# ----------------------------------------------------------- line-level dedup
LINE_IDX_BITS = 20            # ≤ 2^20 lines per doc (key packing bound)
LINE_BUCKETS = 64


def q_doc_line_dedup(sf_dir: str):
    """CCNet-style duplicate-line removal: split every document into
    lines ('\\n'), keep only the globally FIRST occurrence of each exact
    line (first = smallest (doc_id, line_idx)), and rebuild each doc
    from its surviving lines. Output one row per doc:
    (doc_id, n_lines, n_kept, text_kept).

    Distributed first-wins at line granularity:

    1. explode: map_batches → (line_h = md5-64 of the line, key =
       doc_id·2^20 + idx, doc_id, idx, line);
    2. firsts: per-batch partial min(key) per line_h → bucketed
       groupby(line_h % 64) final min — the shuffle carries one slim
       row per distinct line per block, never the line text;
    3. verdicts: exploded lines ⋈ firsts on line_h (Ray native hash
       join; the one unavoidable text movement, since surviving lines
       must reach their doc's rebuild) → kept = (key == first_key);
    4. rebuild: bucketed groupby(doc_id % 64) → per-bucket pandas
       group-reassembly ('\\n'.join of kept lines in idx order).

    Line identity is the 64-bit md5 (collision-negligible, same
    convention as ``q_doc_dedup_exact``); the oracle dedups on the line
    string itself. The packed key bounds docs to 2^20 lines and ids to
    2^43 (10^10-doc scale fits). The synthetic sf corpus is single-line
    (the oracle then degenerates to doc-level first-wins — still
    end-to-end through every stage); multi-line behavior is pinned by
    the engineered-corpus pytest.
    """
    from .docs_queries import _join_partitions
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _explode_arrays(b: pa.Table):
        texts = b.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(texts, "\n")
        flat = lists.flatten()
        counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        doc_id = np.repeat(ids, counts)
        starts = np.cumsum(counts) - counts
        idx = np.arange(len(doc_id)) - np.repeat(starts, counts)
        h = md5_hash64(flat).view(np.int64)
        key = (doc_id << LINE_IDX_BITS) + idx
        return doc_id, idx, flat, h, key

    def explode(b: pa.Table) -> pa.Table:
        doc_id, idx, flat, h, key = _explode_arrays(b)
        return pa.table({"line_h": pa.array(h, pa.int64()),
                         "key": pa.array(key, pa.int64()),
                         "doc_id": pa.array(doc_id, pa.int64()),
                         "idx": pa.array(idx, pa.int64()),
                         "line": flat})

    lines = ds.map_batches(explode, batch_format="pyarrow",
                           batch_size=BATCH)

    def first_partial(b: pa.Table) -> pa.Table:
        # fused slim pass for the firsts side: explodes and immediately
        # reduces to one (line_h, min key) row per distinct line in the
        # batch — the line strings never enter this shuffle
        _, _, _, h, key = _explode_arrays(b)
        df = pd.DataFrame({"line_h": h, "key": key})
        out = df.groupby("line_h", sort=False)["key"].min().reset_index()
        return pa.table({
            "line_h": pa.array(out["line_h"].to_numpy(np.int64), pa.int64()),
            "first_key": pa.array(out["key"].to_numpy(np.int64), pa.int64()),
            "lbucket": pa.array((out["line_h"].to_numpy(np.int64)
                                 % LINE_BUCKETS).astype(np.int32), pa.int32())})

    firsts = (coalesce_slim(ds.map_batches(first_partial,
                                           batch_format="pyarrow",
                                           batch_size=BATCH))
              .groupby("lbucket")
              .map_groups(lambda g: g.groupby("line_h", sort=False)
                          ["first_key"].min().reset_index(),
                          batch_format="pandas")
              .repartition(_join_partitions()).materialize())

    joined = lines.join(firsts, join_type="inner",
                        num_partitions=_join_partitions(), on=("line_h",))

    def mark(b: pa.Table) -> pa.Table:
        kept = pc.equal(b.column("key"), b.column("first_key"))
        dbucket = pc.cast(
            pc.bit_wise_and(b.column("doc_id"), LINE_BUCKETS - 1), pa.int32())
        return pa.table({"doc_id": b.column("doc_id"),
                         "idx": b.column("idx"), "line": b.column("line"),
                         "kept": kept, "dbucket": dbucket})

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "idx"], kind="mergesort")
        agg = g.groupby("doc_id", sort=False).agg(
            n_lines=("idx", "size"), n_kept=("kept", "sum")).reset_index()
        kept_txt = (g.loc[g["kept"]].groupby("doc_id", sort=False)["line"]
                    .agg("\n".join))
        agg["text_kept"] = agg["doc_id"].map(kept_txt).fillna("")
        return agg.astype({"doc_id": "int64", "n_lines": "int64",
                           "n_kept": "int64"})

    return (joined.map_batches(mark, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("dbucket").map_groups(rebuild, batch_format="pandas"))


SQL_LINE_DEDUP = f"""
WITH d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
l AS (SELECT doc_id, unnest(ls) AS line,
             unnest(range(len(ls))) AS i FROM d),
k AS (SELECT line, min(doc_id * {1 << LINE_IDX_BITS} + i) AS first_key
      FROM l GROUP BY line),
j AS (SELECT doc_id, i, line,
             (doc_id * {1 << LINE_IDX_BITS} + i = first_key) AS kept
      FROM l JOIN k USING (line))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (kept) AS BIGINT) AS n_kept,
       coalesce(string_agg(line, chr(10) ORDER BY i) FILTER (WHERE kept),
                '') AS text_kept
FROM j GROUP BY doc_id"""


# ----------------------------------------------------------- semantic dedup
def q_semantic_dedup(sf_dir: str, threshold: float = 0.95,
                     n_clusters: int = 16, n_assign: int = 2,
                     distributed_pairs_threshold: int = 1_000_000):
    """SemDeDup-style semantic deduplication over the embeddings table
    (rows-only: k-means is iterative, not SQL-expressible): cluster the
    corpus, find cosine-≥-threshold pairs WITHIN clusters, connect them
    into duplicate groups, keep the minimum vec_id per group. Output one
    row per vector: (vec_id, is_kept).

    Composition of proven scale paths: ``ann.cosine_near_dup_ivf``
    (multi-assigned IVF cells → within-cell matmul pairs → bucketed pair
    dedup; no all-pairs) returns the pair set as a DATASET — the branch
    switch counts it distributed (``pairs.count()``) and only the
    below-threshold branch ever collects pairs to the driver (same
    discipline as ``q_minhash_dedup``). Above the threshold, clustering
    is distributed min-label propagation and the drop-set is projected
    out of the label Dataset (dropped nodes are strictly fewer than
    pair endpoints, which are ≪ corpus) before the one driver-side
    gather that feeds the broadcast. One streaming is_in pass then
    flags every vector. The corpus is never driver-resident; the pair
    set is driver-resident only when counted small.
    """
    from ..functions.ann import cosine_near_dup_ivf
    from ..functions.dedup import connected_components, distributed_components

    pairs = cosine_near_dup_ivf(sf_dir, threshold=threshold,
                                n_clusters=n_clusters,
                                n_assign=n_assign).materialize()
    n_pairs = pairs.count()
    if n_pairs > distributed_pairs_threshold:
        # scale branch: pairs never collect on the driver. repartition
        # squeezes out schema-less empty blocks from the bucketed
        # map_groups before the label joins (see distributed_components)
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        labels = distributed_components(
            pairs.repartition(max(2, min(16, cpus // 2))))

        def dropped_nodes(b: pa.Table) -> pa.Table:
            keep = pc.not_equal(b.column("node"), b.column("label"))
            return pa.table({"node": pc.filter(b.column("node"), keep)})

        drop = (labels.map_batches(dropped_nodes, batch_format="pyarrow")
                .to_pandas()["node"].to_numpy(np.int64))
    elif n_pairs == 0:
        drop = np.zeros(0, np.int64)
    else:
        vp = pairs.to_pandas()  # counted ≤ threshold: driver-sized
        comp = connected_components(list(zip(vp["a_id"].astype(int),
                                             vp["b_id"].astype(int))))
        drop = np.fromiter((n for n, c in comp.items() if n != c),
                           dtype=np.int64, count=sum(
                               1 for n, c in comp.items() if n != c))
    drop_ref = ray.put(pa.array(np.sort(drop), pa.int64()))

    def flag(b: pa.Table) -> pa.Table:
        dropped = pc.is_in(b.column("vec_id"), value_set=ray.get(drop_ref))
        return pa.table({"vec_id": b.column("vec_id"),
                         "is_kept": pc.invert(dropped)})

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id"]).map_batches(
        flag, batch_format="pyarrow", batch_size=65536)


# ------------------------------------------------ training-shard shuffle
SHUF_SHARDS = 16
SHUF_SALT = "shuf7:"


def q_training_shard_shuffle(sf_dir: str, n_shards: int = SHUF_SHARDS):
    """Deterministic global shuffle into training shards (SURVEY X51) —
    the last step of every LM data pipeline: break source/crawl-order
    correlations before the trainer streams the corpus sequentially
    (GPT-3 §2.2 and The Pile both shuffle at shard granularity). Order
    is the seeded 60-bit md5 key of the doc_id, so the permutation is a
    pure function of the data: shard = key % n_shards, pos = rank of
    (key, doc_id) within the shard.

    This is the scale-honest layout for a 100-TB shuffle: ONE slim
    (doc_id, key) shuffle — text never moves — into n_shards buckets
    with a vectorized argsort rank per shard; no global prefix-sum, no
    total order across shards (the trainer reads shards independently,
    so cross-shard order is meaningless by construction). Writing the
    actual payload is then a hive `shard=` partitioned write keyed by
    this table. Driver never sees more than the result it returns."""
    ds = _docs(sf_dir, ["doc_id"])

    def keyed(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), np.int64)
        h = md5_hash64(np.char.add(SHUF_SALT, np.char.mod("%d", ids)))
        key = (h >> np.uint64(4)).astype(np.int64)     # 60-bit, int64-safe
        return pa.table({
            "shard": pa.array(key % n_shards, pa.int64()),
            "key": pa.array(key, pa.int64()),
            "doc_id": pa.array(ids, pa.int64())})

    def rank(g: pa.Table) -> pa.Table:
        key = np.asarray(g.column("key"), np.int64)
        ids = np.asarray(g.column("doc_id"), np.int64)
        order = np.lexsort((ids, key))
        return pa.table({
            "shard": g.column("shard").slice(0, len(order)),
            "pos": pa.array(np.arange(len(order), dtype=np.int64),
                            pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64())})

    return (coalesce_slim(ds.map_batches(keyed, batch_format="pyarrow",
                                         batch_size=BATCH))
            .groupby("shard").map_groups(rank, batch_format="pyarrow"))


SQL_SHARD_SHUFFLE = f"""
WITH k AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('{SHUF_SALT}' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) AS key
  FROM documents)
SELECT CAST(key % {SHUF_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY key % {SHUF_SHARDS}
                               ORDER BY key, doc_id) - 1 AS BIGINT) AS pos,
       doc_id
FROM k"""


TRAINING_QUERIES = {
    "seq_pack": q_seq_pack,
    "doc_line_dedup": q_doc_line_dedup,
    "semantic_dedup": q_semantic_dedup,  # rows-only (iterative k-means)
    "training_shard_shuffle": q_training_shard_shuffle,
}

TRAINING_SQL = {
    "seq_pack": SQL_SEQ_PACK,
    "doc_line_dedup": SQL_LINE_DEDUP,
    "training_shard_shuffle": SQL_SHARD_SHUFFLE,
}
