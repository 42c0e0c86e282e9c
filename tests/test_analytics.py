"""Analytics operators vs DuckDB oracles on the driver testdata (sf0.001)."""

import duckdb
import pytest

from conftest import SF, assert_frames_match
from crawlingathome_server_ray.pipelines.analytics import (ANALYTICS_QUERIES,
                                                           ANALYTICS_SQL)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", sorted(ANALYTICS_QUERIES))
def test_analytics_matches_oracle(ray_session, name):
    if name not in ANALYTICS_SQL:
        pytest.skip(f"{name} is a rows-only sketch (exactness tested in test_sketches.py)")
    con = _con(SF)
    oracle = con.execute(ANALYTICS_SQL[name]).df()
    result = ANALYTICS_QUERIES[name](SF)
    assert_frames_match(result, oracle, name)


def test_url_sample_matches_oracle(ray_session):
    import duckdb
    from crawlingathome_server_ray.pipelines.analytics import (q_url_sample,
                                                               sql_url_sample)
    from crawlingathome_server_ray.pipelines.frontier_core import pages_path
    oracle = duckdb.sql(sql_url_sample(pages_path(SF))).df()
    assert_frames_match(q_url_sample(SF), oracle, "url_sample")


def test_shipping_priority_semijoin_branch(ray_session):
    """Forcing the native hash semi-join branch (broadcast_max_keys=0)
    must equal the broadcast is_in branch."""
    from conftest import to_pandas
    from crawlingathome_server_ray.pipelines.analytics import q_shipping_priority
    a = to_pandas(q_shipping_priority(SF)).reset_index(drop=True)
    b = to_pandas(q_shipping_priority(SF, broadcast_max_keys=0)
                  ).reset_index(drop=True)
    assert a.equals(b), (a, b)
