#!/usr/bin/env python
"""CDX-family benchmark at frontier scale (X66-X67 evidence).

Times, over a large synthetic frontier (default sfscale, 9.6M URLs):
  - url_surt_key   : full-table SURT + per-host cdx ordinal (one pass +
                     one bucketed rank shuffle)
  - cdx build      : one-time bucketed index build (one streaming pass)
  - cdx lookup     : domain probe against the built index — must read
                     only the probe buckets, so its cost scales with
                     the probed buckets' size, never the corpus. NB the
                     deterministic probes (lexicographically-smallest
                     hosts) are the synth frontier's Zipf-LARGEST
                     hosts, i.e. the worst-case domain query — the
                     lookup-vs-fullpass ratio is an upper bound.

Usage: python scripts/bench_cdx_scale.py [sf_dir]   (default sfscale)
Env: RAY_GRAFT_CPUS (default 32). Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sfscale"
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from crawlingathome_server_ray.pipelines import frontier_queries as fq
    from crawlingathome_server_ray.pipelines import frontier_core as core
    from crawlingathome_server_ray.sources.synth import ensure_frontier

    ensure_frontier(sf_dir)
    n_urls = core.pages_ds(sf_dir, ["url"]).count()

    def consume(ds):
        if hasattr(ds, "iter_batches"):
            return sum(b.num_rows for b in
                       ds.iter_batches(batch_size=65536,
                                       batch_format="pyarrow"))
        return len(ds)

    out = {"sf": os.path.basename(os.path.normpath(sf_dir)),
           "n_urls": int(n_urls), "num_cpus": num_cpus}

    # warm the slim cache once so every timed leg starts from the same
    # staged state (the suite-bench convention)
    fq._slim(sf_dir, fq.DEFAULT_CONFIG)

    t = time.perf_counter()
    out["surt_key_rows"] = consume(fq.q_url_surt_key(sf_dir))
    out["surt_key_s"] = round(time.perf_counter() - t, 3)

    # force a cold build: drop any cached index generation for this sf
    tag = os.path.basename(os.path.normpath(sf_dir))
    for d in os.listdir("/tmp/graft_cdx") if os.path.isdir("/tmp/graft_cdx") else []:
        if d.startswith(f"{tag}_b"):
            shutil.rmtree(os.path.join("/tmp/graft_cdx", d),
                          ignore_errors=True)
    t = time.perf_counter()
    root = fq.cdx_index_build(sf_dir)
    out["index_build_s"] = round(time.perf_counter() - t, 3)

    stats: dict = {}
    t = time.perf_counter()
    out["lookup_rows"] = consume(
        fq.q_cdx_prefix_lookup(sf_dir, stats=stats))
    out["lookup_s"] = round(time.perf_counter() - t, 3)
    out.update(stats)
    out["lookup_vs_fullpass"] = round(out["lookup_s"] / out["surt_key_s"], 4)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
