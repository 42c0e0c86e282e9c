"""Frontier operators vs the DuckDB oracle at sf0.001 (fast) — the same
comparison the driver runs at sf0.01 via __ray_entry__."""

import duckdb
import pytest

from conftest import SF, assert_frames_match
from crawlingathome_server_ray.pipelines import frontier_queries as fq
from crawlingathome_server_ray.pipelines.frontier_core import pages_path
from crawlingathome_server_ray.pipelines.oracle import frontier_oracle_sql

QUERIES = {
    "url_canonicalize": fq.q_url_canonicalize,
    "url_dedup_exact": fq.q_url_dedup_exact,
    "robots_gate": fq.q_robots_gate,
    "politeness_rank": fq.q_politeness_rank,
    "dispatch_order": fq.q_dispatch_order,
    "extract_text": fq.q_extract_text,
    "frontier_counters": fq.q_frontier_counters,
    "host_heavy_hitters": fq.q_host_heavy_hitters,
    "recrawl_priority": fq.q_recrawl_priority,
    "url_pattern_mine": fq.q_url_pattern_mine,
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_frontier_query_matches_oracle(ray_session, name):
    sql = frontier_oracle_sql(pages_path=pages_path(SF))[name]
    oracle = duckdb.sql(sql).df()
    result = QUERIES[name](SF)
    assert_frames_match(result, oracle, name)


def test_dedup_bucketed_equals_broadcast(ray_session):
    """The distributed bucketed first-wins dedup must produce exactly the
    rows of the broadcast survivor-set twin."""
    from crawlingathome_server_ray.pipelines import frontier_core as core
    from crawlingathome_server_ray.config import DEFAULT_CONFIG
    ds = core.with_canon(core.pages_ds(SF, ["url", "warc_ts"]),
                         DEFAULT_CONFIG, light=True).materialize()
    a = (core.dedup_survivors_bucketed(ds).to_pandas()
         .sort_values("url_canon").reset_index(drop=True))
    b = (core.filter_survivors(ds, core.survivor_ts_set(ds)).to_pandas()
         .sort_values("url_canon").reset_index(drop=True))
    import pandas as pd
    cols = ["url", "warc_ts", "url_canon", "host"]
    pd.testing.assert_frame_equal(a[cols], b[cols])
