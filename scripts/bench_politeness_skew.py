#!/usr/bin/env python
"""Skewed-host politeness benchmark (VERDICT r2 item 4).

Builds a frontier slice where ONE host owns ~30% of all URLs (a Zipf
pathology far beyond the synth generator's default skew), then times
``politeness_ranked`` with the per-batch host pre-cap OFF (max_rounds=None,
the refsim-golden default) vs ON (max_rounds=K). With the cap ON, the hot
host ships at most budget×K rows per input block into its shuffle bucket
instead of its entire 30% share — the Zipf skew guard of
stages/politeness.py.

Also re-asserts rank invariance on this pathological input: every row the
capped run schedules carries exactly the rank the uncapped run gave it
(the pre-cap only removes rows beyond the horizon, never reorders).

Usage: RAY_GRAFT_CPUS=32 python scripts/bench_politeness_skew.py [n_rows]
Prints one JSON line; record lands in BENCH/politeness_skew.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_skewed(n_rows: int, hot_frac: float = 0.3, n_hosts: int = 2000,
                 seed: int = 7):
    """Slim (host, url_canon, warc_ts) frontier with one ~hot_frac host."""
    rng = np.random.default_rng(seed)
    n_hot = int(n_rows * hot_frac)
    cold = rng.integers(1, n_hosts, size=n_rows - n_hot)
    hosts = np.concatenate([np.zeros(n_hot, dtype=np.int64), cold])
    rng.shuffle(hosts)
    host_s = pd.Series(hosts).map(lambda h: f"host{h:05d}.example.com")
    urls = [f"http://{h}/p/{i}" for i, h in enumerate(host_s)]
    return pd.DataFrame({"host": host_s.astype(object),
                         "url_canon": urls,
                         "warc_ts": np.arange(n_rows, dtype=np.int64)})


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray
    import ray.data
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from crawlingathome_server_ray.stages.politeness import politeness_ranked

    df = build_skewed(n_rows)
    base = ray.data.from_pandas(df).repartition(64).materialize()
    budget, max_rounds = 3, 10

    def timed(max_r):
        best = None
        for _ in range(int(os.environ.get("GRAFT_SKEW_REPEATS", "3"))):
            t0 = time.time()
            out = politeness_ranked(
                base, budget, order=("warc_ts", "url_canon"),
                max_rounds=max_r)
            n = 0
            for b in out.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
                n += b.num_rows
            dt = time.time() - t0
            if best is None or dt < best[0]:
                best = (dt, n)
        return best

    t_off, n_off = timed(None)
    t_on, n_on = timed(max_rounds)

    # rank invariance on the pathological input: capped ranks ⊆ uncapped
    uncapped = politeness_ranked(base.limit(200_000), budget,
                                 order=("warc_ts", "url_canon"),
                                 max_rounds=None).to_pandas()
    capped = politeness_ranked(base.limit(200_000), budget,
                               order=("warc_ts", "url_canon"),
                               max_rounds=max_rounds).to_pandas()
    u = uncapped.set_index("url_canon")["politeness_rank"]
    c = capped.set_index("url_canon")["politeness_rank"]
    assert (u.loc[c.index] == c).all(), "pre-cap changed surviving ranks"
    assert (c <= budget * max_rounds).all()

    ray.shutdown()
    print(json.dumps({
        "metric": "politeness_skew_precap", "unit": "sec",
        "n_rows": n_rows, "hot_host_frac": 0.3, "num_cpus": num_cpus,
        "budget": budget, "max_rounds": max_rounds,
        "sec_precap_off": round(t_off, 3), "rows_off": n_off,
        "sec_precap_on": round(t_on, 3), "rows_on": n_on,
        "speedup": round(t_off / t_on, 2),
        "rank_invariance": "asserted"}))


if __name__ == "__main__":
    main()
