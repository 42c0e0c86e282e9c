"""Driver-contract smoke: entry() runs the flagship and returns rows with a
stable schema; oracle_sql() keys are a subset of queries() keys."""

import sys


def test_entry_contract(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    assert set(sqls) <= set(qs), "oracle_sql keys must exist in queries"
    assert len(qs) >= 25
    # frontier, analytics, and training-data families all present
    for k in ("url_canonicalize", "dispatch_order", "leaderboard_topk",
              "minhash_dedup", "ann_topk", "events_sessionize"):
        assert k in qs, k

    ds = e.entry()
    n = ds.count()
    assert n > 0
    names = set(ds.schema().names)
    assert {"url_canon", "host", "text_extracted", "politeness_rank",
            "fetch_round"} <= names
