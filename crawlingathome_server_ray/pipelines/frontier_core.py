"""Reusable Ray Data building blocks for the frontier pipelines.

Stage chain (≙ reference job lifecycle, SURVEY.md §3.1):
read pages → canonicalize+hash → exact-dedup (first-wins by min warc_ts) →
robots gate → politeness ranking → dispatch → fetch/extract.

Every builder returns a *lazy* Dataset; nothing here materializes the main
input. The only driver-side materialization is the survivor-timestamp set in
:func:`dedup_survivors` — a deliberate broadcast semi-join (see its
docstring for the 10^10-scale variant).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data import Dataset

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.canonicalize import canonicalize_array, canonicalize_batch
from ..sources.synth import ensure_frontier


def pages_path(sf_dir: str) -> str:
    return os.path.join(ensure_frontier(sf_dir), "pages")


def tree_fingerprint(path: str) -> str:
    """Cheap content key (mtime+size) for a parquet file OR directory
    tree. Per-process Dataset caches key on it so a regenerated-in-place
    fixture never serves stale data (the ``ann.ivf_build`` precedent,
    functions/ann.py:99). One stat per file, paid once per cache miss."""
    st = os.stat(path)
    if not os.path.isdir(path):
        return f"{st.st_mtime_ns:x}_{st.st_size:x}"
    tot, newest = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            s = os.stat(os.path.join(root, f))
            tot += s.st_size
            newest = max(newest, s.st_mtime_ns)
    return f"{newest:x}_{tot:x}"


def pages_ds(sf_dir: str, columns: list[str] | None = None,
             num_blocks: int = 32) -> Dataset:
    """Column-pruned read of the synthetic frontier for a scale factor.
    The frontier is one file with 32 row groups; force that many input
    splits so a single-file read doesn't serialize the pipeline."""
    return ray.data.read_parquet(pages_path(sf_dir), columns=columns,
                                 override_num_blocks=num_blocks)


def canonicalize_light(batch: pa.Table) -> pa.Table:
    """url → url_canon + host only (no md5) for queries that don't need it."""
    canon, host = canonicalize_array(batch.column("url"))
    return batch.append_column("url_canon", canon).append_column("host", host)


def with_canon(ds: Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
               light: bool = False) -> Dataset:
    fn = canonicalize_light if light else (
        lambda b: canonicalize_batch(b, cfg.partition_hex_chars))
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=cfg.batch_size,
                          zero_copy_batch=True)


def _ts_us(batch: pa.Table) -> pa.Table:
    """int64 microseconds view of warc_ts (aggregation-friendly)."""
    col = batch.column("warc_ts")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return batch.append_column("ts_us", col.cast(pa.int64()))


def _partial_min_ts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one (url_canon, ts_us) row per canon URL with the
    batch-local min — shrinks the groupby shuffle (partial aggregation)."""
    import pandas as pd
    df = pd.DataFrame({"url_canon": np.asarray(batch.column("url_canon")),
                       "ts_us": np.asarray(batch.column("ts_us"))})
    out = df.groupby("url_canon", sort=False)["ts_us"].min().reset_index()
    return pa.table({"url_canon": pa.array(out["url_canon"].to_numpy(dtype=object), pa.string()),
                     "ts_us": pa.array(out["ts_us"].to_numpy(), pa.int64())})


def survivor_ts_set(canon_ds: Dataset) -> np.ndarray:
    """First-wins dedup key set: min(warc_ts) per url_canon.

    Because ``warc_ts`` is globally unique in the frontier, the min-timestamp
    per canonical URL *identifies* the surviving row, so dedup = membership
    of ``ts_us`` in this set. Two-phase: per-batch partial min (map_batches
    combiner) → ``groupby(url_canon).min`` over the shrunk partials → driver
    collects one int64 per unique URL.

    Scale note: at 10^10 unique URLs this driver-side set (~80 GB) would
    not fit — :func:`dedup_survivors_bucketed` (one bucketed shuffle, no
    driver set) is the production path and the default behind
    :func:`dedup_survivors`; the bloom seen-filter actor pool
    (stages/seen_filter.py) is the streaming variant. This broadcast
    twin is kept because it is *exact* and DuckDB-verifiable, and tests
    assert the bucketed path produces identical rows.
    """
    partial = canon_ds.map_batches(_ts_us, batch_format="pyarrow").map_batches(
        _partial_min_ts, batch_format="pyarrow")
    # final combine on the driver: each block contributed ≤1 row per distinct
    # URL, so the driver sees ~|unique| rows — one pandas groupby, not a Ray
    # all-to-all (Ray's sort-aggregate over 10^5+ string groups measured
    # ~100× slower than this at sf0.1). At 10^10 scale: repartition by
    # url_hash bucket and run this same combine per bucket.
    import pandas as pd
    frames = [pd.DataFrame({"url_canon": np.asarray(b["url_canon"]),
                            "ts_us": np.asarray(b["ts_us"])})
              for b in partial.iter_batches(batch_format="pyarrow",
                                            batch_size=65536)]
    if not frames:
        return np.empty(0, np.int64)
    allp = pd.concat(frames, ignore_index=True)
    return allp.groupby("url_canon", sort=False)["ts_us"].min() \
        .to_numpy(dtype=np.int64)


def filter_survivors(canon_ds: Dataset, ts_set: np.ndarray) -> Dataset:
    """Keep only first-wins survivor rows (broadcast membership filter)."""
    ref = ray.put(ts_set)

    def keep(batch: pa.Table) -> pa.Table:
        ts = ray.get(ref)
        b = _ts_us(batch)
        mask = pc.is_in(b.column("ts_us"), value_set=pa.array(ts, pa.int64()))
        return b.filter(mask).drop_columns(["ts_us"])

    return canon_ds.map_batches(keep, batch_format="pyarrow")


SLIM_COALESCE_ROWS = 1 << 19


def coalesce_slim(ds: Dataset, rows: int = SLIM_COALESCE_ROWS) -> Dataset:
    """Re-batch a slim (few-column, fixed-width) Dataset into large blocks
    before a sort/groupby shuffle.

    Ray's sort-based shuffle creates (input blocks × output partitions)
    intermediate objects, and the partition count itself EQUALS the input
    block count — so feeding it thousands of tiny slim blocks (the natural
    output of a fine-grained map stage) makes the object count grow
    QUADRATICALLY with data size. Measured at sfscale (19.2M slim rows)
    this was the dominant superlinear term in snapshot_delta /
    frontier_expand / host_degree: snapshot_delta spent 48 s wall in the
    shuffle against 14 s of remote compute, because 512 blocks × 512
    partitions = 262k tiny objects. An identity map_batches at a large
    batch_size is a linear zero-copy-concat pass that caps the block count
    at total_rows/rows, shrinking the shuffle's object matrix back to
    ~dozens × dozens. Slim rows are ≤ ~100 B, so the default 512k-row
    blocks are ~40 MB — object-store friendly at any corpus size.

    ``num_cpus=0.999`` is a deliberate FUSION BLOCKER, not a resource
    hint: Ray fuses consecutive task-pool map_batches and bundles the
    fused task's INPUT to the chain's largest batch_size — fused with a
    compute-heavy upstream map, this 512k batch_size would serialize the
    whole upstream stage into a handful of tasks (measured: the fused
    html-parse → partial → coalesce chain of q_host_link_graph ran as
    ONE task, 17 s vs 6 s). Incompatible remote args keep the coalesce
    a separate, trivially cheap operator. (Dataset.repartition with
    target_num_rows_per_block is not an alternative: it only splits
    blocks, never merges them.)"""
    return ds.map_batches(lambda t: t, batch_format="pyarrow",
                          batch_size=rows, num_cpus=0.999)


N_DEDUP_BUCKETS = 64


def dedup_survivors_bucketed(ds_canon: Dataset,
                             n_buckets: int = N_DEDUP_BUCKETS) -> Dataset:
    """Exact first-wins dedup by canonical URL as ONE bucketed shuffle —
    the distributed scale path (no driver-side key set at any scale).

    Bucket key = hash(url_canon) % n_buckets, so every canonical URL's rows
    land in exactly one bucket; within a bucket one vectorized pandas
    sort + drop_duplicates keeps the min-warc_ts row per URL. The groupby
    runs over ``n_buckets`` int keys (cheap sort-aggregate), never over
    millions of string keys (Ray's per-group dispatch over mostly-singleton
    string groups measured ~100× slower in round 1)."""
    import pandas as pd

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(b.column("url_canon")))
        return b.append_column(
            "dedup_bucket",
            pa.array((h % n_buckets).astype(np.int32), pa.int32()))

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url_canon", "warc_ts"], kind="mergesort")
        return (g[~g["url_canon"].duplicated()]
                .drop(columns=["dedup_bucket"]))

    # large batches: trivial map, and the shuffle needs few big blocks
    # (see coalesce_slim) — rows carry two url strings, ~150 B each
    return (ds_canon.map_batches(add_bucket, batch_format="pyarrow",
                                 batch_size=1 << 18)
            .groupby("dedup_bucket")
            .map_groups(first_wins, batch_format="pandas"))


def dedup_survivors(ds_canon: Dataset) -> Dataset:
    """Exact first-wins dedup by canonical URL (D1, SURVEY.md §2.7) —
    distributed bucketed implementation. The broadcast variant
    (:func:`filter_survivors` + :func:`survivor_ts_set`) is kept as the
    DuckDB-auditable reference twin; both are asserted equal in
    tests/test_frontier_queries.py."""
    return dedup_survivors_bucketed(ds_canon)


def actor_pool_size(reserve: int = 2, cap: int = 12) -> int:
    """Size an actor pool to cluster CPUs minus a reserve so the pool never
    starves the read/write task stages (an all-CPU pool deadlocks the
    streaming executor on a small node)."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, min(cap, cpus - reserve))


def robots_gated(ds: Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                 concurrency: int | None = None) -> Dataset:
    """Append ``allowed`` via the cached robots actor pool (T3)."""
    from ..stages.robots import RobotsGate
    return ds.map_batches(RobotsGate, batch_format="pyarrow",
                          batch_size=cfg.batch_size,
                          concurrency=concurrency or actor_pool_size())


def robots_allowed_only(ds: Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                        concurrency: int | None = None) -> Dataset:
    return robots_gated(ds, cfg, concurrency).map_batches(
        lambda b: b.filter(b.column("allowed")).drop_columns(["allowed"]),
        batch_format="pyarrow")
