"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Operator inventory: SURVEY.md §2. Frontier operators run over the
deterministic synthetic pages frontier (sources/synth.py) materialized
under /tmp/graft_frontier/<sf>/ — their oracle SQL reads the same parquet
via read_parquet(path), recomputing canonicalization / md5 partitioning /
robots rules / politeness ranks entirely in SQL. Analytics and
training-data operators run over the driver's pre-registered views.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from crawlingathome_server_ray.pipelines import frontier_queries as _fq
from crawlingathome_server_ray.pipelines.analytics import (ANALYTICS_QUERIES,
                                                           ANALYTICS_SQL,
                                                           q_url_sample,
                                                           sql_url_sample)
from crawlingathome_server_ray.pipelines.curation_queries import (
    CURATION_QUERIES, CURATION_SQL)
from crawlingathome_server_ray.pipelines.docs_queries import (DOCS_QUERIES,
                                                              DOCS_SQL,
                                                              sql_binary_meta)
from crawlingathome_server_ray.pipelines.frontier_core import pages_path
from crawlingathome_server_ray.pipelines.link_queries import (LINK_QUERIES,
                                                              link_oracle_sql)
from crawlingathome_server_ray.pipelines.media_queries import MEDIA_QUERIES
from crawlingathome_server_ray.pipelines.oracle import frontier_oracle_sql
from crawlingathome_server_ray.pipelines.training_queries import (
    TRAINING_QUERIES, TRAINING_SQL)
from crawlingathome_server_ray.sources.link_synth import ensure_links
from crawlingathome_server_ray.sources.synth import (ensure_frontier,
                                                     ensure_snapshot2)

# the driver compares at sf0.01; materialize that frontier (and the link
# table + snapshot B) at import time so the oracle SQL's read_parquet
# paths exist regardless of evaluation order
_SF_ORACLE = "/root/testdata/sf0.01"
ensure_frontier(_SF_ORACLE)
_LINKS_ROOT = ensure_links(_SF_ORACLE)
_SNAP2_PATH = ensure_snapshot2(_SF_ORACLE)

_FRONTIER_QUERIES = {
    "url_canonicalize": _fq.q_url_canonicalize,
    "url_dedup_exact": _fq.q_url_dedup_exact,
    "robots_gate": _fq.q_robots_gate,
    "politeness_rank": _fq.q_politeness_rank,
    "dispatch_order": _fq.q_dispatch_order,
    "extract_text": _fq.q_extract_text,
    "frontier_counters": _fq.q_frontier_counters,
    "host_heavy_hitters": _fq.q_host_heavy_hitters,
    "url_distinct_hll": _fq.q_url_distinct_hll,  # rows-only (approximate)
    "recrawl_priority": _fq.q_recrawl_priority,
    "url_pattern_mine": _fq.q_url_pattern_mine,
    "snapshot_delta": _fq.q_snapshot_delta,
    "host_change_rate": _fq.q_host_change_rate,
    "crawl_budget_alloc": _fq.q_crawl_budget_alloc,
    "crawl_trap_score": _fq.q_crawl_trap_score,
    "mirror_hosts": _fq.q_mirror_hosts,
    "snapshot_compact": _fq.q_snapshot_compact,
    "url_surt_key": _fq.q_url_surt_key,
    "cdx_prefix_lookup": _fq.q_cdx_prefix_lookup,
    "url_features": _fq.q_url_features,
    "crawl_schedule_occupancy": _fq.q_crawl_schedule_occupancy,
    "host_lookalikes": _fq.q_host_lookalikes,
}


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full crawl (bootstrap →
    bloom seen-filter → robots → politeness → dispatch waves → two-stage
    close) then return the fetched stage-1 dataset."""
    from crawlingathome_server_ray.config import PipelineConfig
    from crawlingathome_server_ray.pipelines.frontier import (
        read_stage1_with_schedule, run_crawl)

    cfg = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_entry")
    summary = run_crawl("/root/testdata/sf0.001", cfg, resume=False)
    return read_stage1_with_schedule(summary["out_root"])


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    out.update(_FRONTIER_QUERIES)
    out.update(ANALYTICS_QUERIES)
    out.update(DOCS_QUERIES)
    out.update(CURATION_QUERIES)
    out.update(TRAINING_QUERIES)
    # rows-only: real BMP/PNG/JPEG/MJPEG/WAV decode — DuckDB cannot parse
    # these formats; round-trip + golden coverage in tests/test_media.py
    out.update(MEDIA_QUERIES)
    # link graph: extraction + host graph are SQL-oracled; pagerank is
    # rows-only (iterative) with a dense numpy twin in tests/test_links.py
    out.update(LINK_QUERIES)
    out["url_sample"] = q_url_sample
    return out


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}
    sqls.update(frontier_oracle_sql(pages_path=pages_path(_SF_ORACLE)))
    sqls.update(ANALYTICS_SQL)
    sqls.update(DOCS_SQL)
    sqls.update(CURATION_SQL)
    sqls.update(TRAINING_SQL)
    sqls["binary_meta"] = sql_binary_meta(pages_path(_SF_ORACLE))
    sqls["snapshot_delta"] = _fq.sql_snapshot_delta(
        pages_path(_SF_ORACLE), _SNAP2_PATH)
    sqls["host_change_rate"] = _fq.sql_host_change_rate(
        pages_path(_SF_ORACLE), _SNAP2_PATH)
    sqls["crawl_budget_alloc"] = _fq.sql_crawl_budget_alloc(
        pages_path(_SF_ORACLE), _SNAP2_PATH)
    sqls["crawl_trap_score"] = _fq.sql_crawl_trap_score(
        pages_path(_SF_ORACLE))
    sqls["mirror_hosts"] = _fq.sql_mirror_hosts(pages_path(_SF_ORACLE))
    sqls["snapshot_compact"] = _fq.sql_snapshot_compact(
        pages_path(_SF_ORACLE), _SNAP2_PATH)
    sqls["url_sample"] = sql_url_sample(pages_path(_SF_ORACLE))
    import os as _os
    sqls.update(link_oracle_sql(
        _os.path.join(_LINKS_ROOT, "linkpages", "*.parquet")))
    return sqls
