"""Per-host politeness priority queue (rebuild-new O5, SURVEY.md §2.6).

The reference dispatches uniform CommonCrawl shards in random order
(reference models.py:112 ``ORDER BY RANDOM()``); the north_rule replaces
this with a per-host politeness queue: within each host, URLs are ordered by
``(warc_ts, url_canon)`` and assigned

    politeness_rank  = 1-based position within the host
    fetch_round      = (politeness_rank - 1) // budget

so at most ``budget`` URLs of a host are fetched per round. Realized as the
``groupby(host)`` shuffle + per-group vectorized ranking.

Skew note (10^10-frontier scale): hosts follow a Zipf law, so the hottest
host's group can dwarf the rest. The shuffle key stays ``host`` (ranking
needs all of a host's rows together), but per-group work is O(n log n)
vectorized sort, and upstream stages have already collapsed rows to the slim
``(url_canon, host, warc_ts)`` projection — the wide ``html`` column never
enters this shuffle (SURVEY.md §7 hard-part d). For pathological hosts
(>10^7 URLs), pass ``max_rounds``: a per-batch per-host top-(budget ×
max_rounds) pre-cap runs BEFORE the bucket shuffle, so a degenerate host
ships at most cap × n_blocks rows into its bucket instead of all of them —
see :func:`politeness_ranked`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset


import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_ORDER = ("warc_ts", "url_canon")
N_BUCKETS = 256


def rank_host_group(g: pd.DataFrame, budget: int,
                    order: tuple[str, ...] = DEFAULT_ORDER) -> pd.DataFrame:
    """Vectorized multi-host ranking: sort by (host, *order), rank =
    cumcount within host. Works on a group of MANY whole hosts (pandas
    variant, used by tests; the pipeline path is the Arrow-native
    :func:`rank_table`)."""
    g = g.sort_values(["host", *order], kind="mergesort")
    rank = g.groupby("host", sort=False).cumcount().to_numpy() + 1
    g = g.assign(politeness_rank=rank.astype(np.int64),
                 fetch_round=((rank - 1) // budget).astype(np.int64))
    return g


def rank_table(t: pa.Table, budget: int,
               order: tuple[str, ...] = DEFAULT_ORDER) -> pa.Table:
    """Arrow-native ranking: sort_indices + boundary diff — no pandas object
    conversion (which dominated wall time on payload-bearing tables)."""
    if "host_bucket" in t.schema.names:
        t = t.drop_columns(["host_bucket"])
    n = t.num_rows
    if n == 0:
        return (t.append_column("politeness_rank", pa.array([], pa.int64()))
                .append_column("fetch_round", pa.array([], pa.int64())))
    keys = [("host", "ascending")] + [(c, "ascending") for c in order]
    t = t.take(pc.sort_indices(t, sort_keys=keys))
    h = t.column("host")
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    if n > 1:
        neq = np.asarray(pc.not_equal(h.slice(1), h.slice(0, n - 1)))
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
    else:
        starts = np.array([0])
    counts = np.diff(np.append(starts, n))
    rank = np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1
    return (t.append_column("politeness_rank", pa.array(rank, pa.int64()))
            .append_column("fetch_round",
                           pa.array((rank - 1) // budget, pa.int64())))


def local_host_topk(t: pa.Table, cap: int,
                    order: tuple[str, ...] = DEFAULT_ORDER) -> pa.Table:
    """Batch-local per-host top-``cap`` by ``order`` (Arrow-native sort +
    boundary diff). Correctness of the pre-cap: a row outside its
    batch-local host top-cap has ≥ cap same-host rows ordered before it
    within the batch alone, hence ≥ cap globally → its global rank > cap →
    it cannot appear in the first ``cap`` ranks. So filtering per batch
    first is a strict superset of the global winners."""
    ranked = rank_table(t, budget=1, order=order)
    keep = pc.less_equal(ranked.column("politeness_rank"), cap)
    return ranked.filter(keep).drop_columns(["politeness_rank", "fetch_round"])


def politeness_ranked(ds: Dataset, budget: int,
                      order: tuple[str, ...] = DEFAULT_ORDER,
                      max_rounds: int | None = None,
                      align_col: str | None = None,
                      sub_buckets: int = 16) -> Dataset:
    """Per-host rank + fetch_round columns via a bucketed groupby shuffle.

    ``max_rounds``: optionally keep only URLs scheduled in the first
    ``max_rounds`` politeness rounds (≤ budget × max_rounds per host). The
    cap is applied per-batch BEFORE the shuffle (:func:`local_host_topk`) —
    the skew guard for Zipf-pathological hosts: the shuffle then carries at
    most cap rows per (host, block) instead of the host's full URL set.
    Ranks of surviving rows are identical to the uncapped ranking
    (asserted in tests/test_functions.py::test_politeness_host_precap).

    The shuffle key is ``host_bucket = hash(host) % 256``, not ``host``:
    whole hosts land in one bucket (ranking stays exact), but Ray's
    per-group python dispatch runs 256× instead of once per host — inside a
    bucket the ranking is one Arrow-native sort + boundary diff
    (:func:`rank_table`; no per-row python, no pandas conversion).
    This is the skew-aware variant from SURVEY.md §4: a pathological host
    only ever inflates one bucket, which is still one vectorized sort.

    Callers should pass only the slim columns they need ranked — the
    shuffle moves every byte of every column.

    ``order`` is the within-host priority. The flagship pipeline uses
    ``("url_canon",)`` so ranks are invariant to which duplicate row survived
    the streaming bloom filter (survivor arrival order is nondeterministic;
    the canonical URL is not).

    ``align_col``: bucket = align_col·sub_buckets + hash(host)%sub_buckets,
    so every output block belongs to exactly ONE value of ``align_col``.
    The flagship passes "partition_id" (hosts already map 1:1 to
    partitions), which makes the downstream hive-partitioned schedule
    write emit ~sub_buckets files per partition instead of splitting every
    one of the 256 hash buckets across all partitions (measured 512 → 45
    files on a 2.4M-row wave; same wall-time, far fewer small files for
    the object store / downstream pruned reads at scale)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        hosts = np.asarray(batch.column("host"))
        h = pd.util.hash_array(hosts)
        if align_col is not None:
            a = np.asarray(batch.column(align_col)).astype(np.int64)
            b = (a * sub_buckets + (h % sub_buckets)).astype(np.int32)
        else:
            b = (h % N_BUCKETS).astype(np.int32)
        return batch.append_column("host_bucket", pa.array(b, pa.int32()))

    if max_rounds is not None:
        cap = budget * max_rounds
        ds = ds.map_batches(lambda t: local_host_topk(t, cap, order),
                            batch_format="pyarrow")

    ranked = (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("host_bucket")
              .map_groups(lambda t: rank_table(t, budget, order),
                          batch_format="pyarrow"))
    if max_rounds is not None:
        ranked = ranked.map_batches(
            lambda t: t.filter(pc.less(t.column("fetch_round"), max_rounds)),
            batch_format="pyarrow")
    return ranked
