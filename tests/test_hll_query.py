"""HLL distinct query vs exact distinct (tolerance check — the driver only
row-counts this one since it's approximate)."""

import duckdb

from conftest import SF
from crawlingathome_server_ray.pipelines.frontier_core import pages_path
from crawlingathome_server_ray.pipelines.frontier_queries import q_url_distinct_hll
from crawlingathome_server_ray.pipelines.oracle import frontier_oracle_sql


def test_hll_estimate_within_tolerance(ray_session):
    est = int(q_url_distinct_hll(SF)["n_distinct_est"].iloc[0])
    sql = frontier_oracle_sql(pages_path=pages_path(SF))["url_dedup_exact"]
    exact = duckdb.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    assert abs(est - exact) / exact < 0.03, (est, exact)
