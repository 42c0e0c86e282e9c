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
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_frontier_query_matches_oracle(ray_session, name):
    sql = frontier_oracle_sql(pages_path=pages_path(SF))[name]
    oracle = duckdb.sql(sql).df()
    result = QUERIES[name](SF)
    assert_frames_match(result, oracle, name)
