"""Frontier operator queries — Ray Data implementations.

Each function takes ``sf_dir`` (a /root/testdata/sf* path; the matching
synthetic frontier is materialized idempotently under /tmp/graft_frontier)
and returns a Dataset / pandas DataFrame whose columns exactly match the
DuckDB oracle in :mod:`.oracle` (same names, same dtypes) so the driver's
order-insensitive value-hash comparison passes.

Operator ↔ reference mapping is in SURVEY.md §2 (M8/M9 canonicalize, D1
dedup, T3 robots, O5 politeness, T1/O3 dispatch, M10 extract, A6 counters).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.extract import fetch_extract_batch
from ..stages.dispatch import dispatch_table
from ..stages.politeness import politeness_ranked
from . import frontier_core as core


# per-process cache of the canonicalized slim frontier (url, warc_ts,
# url_canon, host), materialized once per sf_dir — the dedup/robots/
# politeness query chain consumes it multiple times, and re-running the
# regex canonicalization per pass doubled every query's wall time. ~150 MB
# at sf0.1; at production scale this would be the staged frontier on disk
# (pipelines/frontier.py bootstrap), not an in-memory cache.
_SLIM_CACHE: dict[str, object] = {}


def _slim(sf_dir: str, cfg: PipelineConfig):
    if sf_dir not in _SLIM_CACHE:
        ds = core.with_canon(core.pages_ds(sf_dir, ["url", "warc_ts"]),
                             cfg, light=True)
        _SLIM_CACHE[sf_dir] = ds.materialize()
    return _SLIM_CACHE[sf_dir]


def q_url_canonicalize(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    ds = core.pages_ds(sf_dir, columns=["url"])
    return core.with_canon(ds, cfg, light=True).select_columns(
        ["url", "url_canon", "host"])


def q_url_dedup_exact(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    return core.dedup_survivors(_slim(sf_dir, cfg)).select_columns(
        ["url_canon", "url", "warc_ts"])


def q_robots_gate(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    return core.robots_gated(core.dedup_survivors(_slim(sf_dir, cfg)),
                             cfg).select_columns(["url_canon", "host", "allowed"])


def q_politeness_rank(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    allowed = core.robots_allowed_only(core.dedup_survivors(_slim(sf_dir, cfg)), cfg)
    slim = allowed.select_columns(["host", "url_canon", "warc_ts"])
    return politeness_ranked(slim, cfg.politeness_budget).select_columns(
        ["host", "url_canon", "politeness_rank", "fetch_round"])


def q_dispatch_order(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Partition universe from the *unique hosts* of allowed survivors —
    md5 per host (thousands), never per row (millions)."""
    from ..functions.canonicalize import md5_partition
    import numpy as np
    allowed = core.robots_allowed_only(core.dedup_survivors(_slim(sf_dir, cfg)), cfg)
    hosts = np.asarray(allowed.unique("host"), dtype=object)
    parts = sorted(set(md5_partition(hosts, cfg.partition_hex_chars).tolist()))
    return dispatch_table(parts, cfg.seed)


def q_extract_text(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    ds = core.pages_ds(sf_dir, ["url", "warc_ts", "html", "text"])
    return ds.map_batches(fetch_extract_batch, batch_format="pyarrow",
                          batch_size=cfg.batch_size,
                          zero_copy_batch=True).select_columns(
        ["url", "warc_ts", "text_extracted"])


def q_url_distinct_hll(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Approximate distinct canonical URLs via mergeable HLL sketches
    (rows-only for the driver; accuracy asserted vs exact in pytest)."""
    import pandas as pd
    from ..functions.sketches import hll_distinct
    ds = _slim(sf_dir, cfg)
    est = hll_distinct(ds, "url_canon")
    return pd.DataFrame({"n_distinct_est": pd.array([int(round(est))], "int64")})


HH_PHI = 0.01  # heavy-hitter threshold: hosts holding > 1% of the frontier


def q_host_heavy_hitters(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """EXACT hosts with > φ·n frontier rows WITHOUT a full groupby(host):
    mergeable Misra-Gries sketches per batch (KB messages, no false
    negatives at k+1 > 1/φ) find ≤k candidates; a broadcast is_in pass
    counts exactly those; threshold on exact counts ⇒ identical to SQL
    ``GROUP BY host HAVING count(*) > φ·n``. The pattern that replaces a
    10^9-host shuffle with two streaming passes at 100 TB."""
    from ..functions.sketches import heavy_hitters_exact
    return heavy_hitters_exact(_slim(sf_dir, cfg), "host", HH_PHI, k=256)


def q_frontier_counters(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    ds = _slim(sf_dir, cfg)
    n_pages = ds.count()
    survivors = core.dedup_survivors(ds)
    gated = core.robots_gated(survivors, cfg).materialize()
    n_unique = gated.count()
    allowed = gated.map_batches(
        lambda b: b.filter(b.column("allowed")).drop_columns(["allowed"]),
        batch_format="pyarrow").materialize()
    n_allowed = allowed.count()
    n_hosts = len(allowed.unique("host"))
    ranked = politeness_ranked(
        allowed.select_columns(["host", "url_canon", "warc_ts"]),
        cfg.politeness_budget)
    n_round0 = ranked.map_batches(
        lambda b: b.filter(pa.compute.less_equal(b.column("politeness_rank"),
                                                 cfg.politeness_budget)),
        batch_format="pyarrow").count()
    return pd.DataFrame({
        "n_pages": pd.array([n_pages], dtype="int64"),
        "n_unique": pd.array([n_unique], dtype="int64"),
        "n_dups_removed": pd.array([n_pages - n_unique], dtype="int64"),
        "n_blocked": pd.array([n_unique - n_allowed], dtype="int64"),
        "n_allowed": pd.array([n_allowed], dtype="int64"),
        "n_hosts": pd.array([n_hosts], dtype="int64"),
        "n_round0": pd.array([n_round0], dtype="int64"),
    })
