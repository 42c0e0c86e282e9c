#!/usr/bin/env python
"""Link-graph family benchmark at larger-than-suite scale.

The suite measures the family at sf0.1 (120k pages / 5k hosts). This
script runs the same queries on the sfbench-shaped link table (480k
pages / 20k hosts, ~3.8M anchors) so the growth factors are measured,
not asserted: extraction + host-graph build (the streaming part, should
grow ~linearly in pages), PageRank/HITS (the actor-pool part, per-round
cost grows with distinct host pairs; driver state with hosts), and the
bucketed rank queries. Prints one JSON line.

Usage: python scripts/bench_links_scale.py [--sf sfbench]
Env: RAY_GRAFT_CPUS (default 32).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = "sfbench"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    sf_dir = f"/root/testdata/{sf}"   # only the NAME matters to the synth
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    from crawlingathome_server_ray.sources.link_synth import (ensure_links,
                                                              link_rows_for)
    # init Ray BEFORE the synth so ensure_links can fan the file slices
    # out as tasks (serial generation is ~0.6 ms/page — 20 min at sfscale)
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data

    t0 = time.time()
    ensure_links(sf_dir)
    gen_s = round(time.time() - t0, 1)
    n_pages, n_hosts = link_rows_for(sf_dir)

    def _warm(b):
        import numpy as _np

        import crawlingathome_server_ray.pipelines.link_queries  # noqa: F401
        x = _np.empty(256 << 20, dtype=_np.uint8)
        x[::4096] = 1
        del x
        return b

    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 2) \
        .map_batches(_warm, batch_format="pyarrow").materialize()

    from crawlingathome_server_ray.pipelines import link_queries as lq

    def consume(r):
        if isinstance(r, ray.data.Dataset):
            n = 0
            for b in r.iter_batches(batch_size=65536,
                                    batch_format="pyarrow"):
                n += b.num_rows
            return n
        return len(r)

    times: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name, fn):
        t = time.time()
        rows[name] = consume(fn())
        times[name] = round(time.time() - t, 3)

    lq._GRAPH_CACHE.clear()
    timed("outlink_extract", lambda: lq.q_outlink_extract(sf_dir))
    timed("host_link_graph", lambda: lq.q_host_link_graph(sf_dir))
    timed("host_pagerank", lambda: lq.q_host_pagerank(sf_dir))
    timed("host_hits", lambda: lq.q_host_hits(sf_dir))
    timed("host_degree", lambda: lq.q_host_degree(sf_dir))
    timed("reciprocal_hosts", lambda: lq.q_reciprocal_hosts(sf_dir))
    timed("inlink_anchor_topk", lambda: lq.q_inlink_anchor_topk(sf_dir))
    timed("frontier_expand", lambda: lq.q_frontier_expand(sf_dir))

    # snapshot delta rides the pages frontier of the same scale factor
    from crawlingathome_server_ray.pipelines import frontier_queries as fq
    from crawlingathome_server_ray.sources.synth import ensure_snapshot2
    t0 = time.time()
    ensure_snapshot2(sf_dir)
    snap_gen_s = round(time.time() - t0, 1)
    timed("snapshot_delta", lambda: fq.q_snapshot_delta(sf_dir))

    ray.shutdown()
    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "links_scale_bench", "value": total, "unit": "sec",
        "queries": times, "rows": rows, "n_pages": n_pages,
        "n_hosts": n_hosts, "gen_s": gen_s, "snap_gen_s": snap_gen_s,
        "num_cpus": num_cpus, "sf": sf}))


if __name__ == "__main__":
    main()
