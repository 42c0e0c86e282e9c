"""CLI: run/resume the crawl, inspect status, manifest surgery.

Replaces the reference's admin endpoints (set-banner / ban-shard /
reset-shard, reference main.py:298-370 — the latter two obsolete no-ops)
and the dashboard counts (main.py:81-164) with explicit subcommands:

    python -m crawlingathome_server_ray.cli run --sf /root/testdata/sf0.001
    python -m crawlingathome_server_ray.cli status --sf ...
    python -m crawlingathome_server_ray.cli reopen --sf ... --partition 3
    python -m crawlingathome_server_ray.cli ban    --sf ... --partition 3

This module owns its Ray session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import os


def _manifest(args):
    from .config import PipelineConfig
    from .state.checkpoint import Manifest
    cfg = PipelineConfig(checkpoint_dir=args.ckpt)
    out_root = os.path.join(cfg.checkpoint_dir,
                            os.path.basename(os.path.normpath(args.sf)))
    return Manifest(out_root, cfg.lease_timeout_s), cfg, out_root


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="crawlingathome_server_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("run", "resume", "status", "reopen", "ban", "leaderboard",
                 "validate-worker"):
        s = sub.add_parser(name)
        s.add_argument("--sf", default="/root/testdata/sf0.001")
        s.add_argument("--ckpt", default=os.environ.get("GRAFT_CKPT_DIR",
                                                        "/tmp/graft_ckpt"))
        if name in ("reopen", "ban"):
            s.add_argument("--partition", type=int, required=True)
        if name == "validate-worker":
            s.add_argument("--token", required=True)
        if name in ("run", "resume"):
            s.add_argument("--wave-size", type=int, default=None)  # None → cfg.wave_size
            s.add_argument("--num-cpus", type=int,
                           default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = p.parse_args(argv)

    if args.cmd in ("run", "resume"):
        import ray
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from .config import PipelineConfig
        from .pipelines.frontier import run_crawl
        cfg = PipelineConfig(checkpoint_dir=args.ckpt)
        summary = run_crawl(args.sf, cfg, resume=(args.cmd == "resume"),
                            wave_size=args.wave_size)
        print(json.dumps({k: v for k, v in summary.items()
                          if k != "dispatch_order"}, default=str))
        ray.shutdown()
        return

    m, cfg, out_root = _manifest(args)
    if args.cmd == "status":
        recs = m.all()
        states: dict[str, int] = {}
        for r in recs.values():
            states[r["state"]] = states.get(r["state"], 0) + 1
        print(json.dumps({"out_root": out_root, "states": states,
                          "totals": m.totals()}))
    elif args.cmd == "reopen":
        # force the partition back to open: next resume reprocesses it.
        # NOTE: the URL-seen snapshot still contains the partition's URLs,
        # so with the bloom filter a re-crawl dedups them all (fetched=0,
        # counted as urls_deduped); use seen_filter_kind="cuckoo" and a
        # delete pass when true re-fetch semantics are needed.
        path = m._path(args.partition)
        if path.exists():
            path.unlink()
        print(json.dumps({"reopened": args.partition,
                          "note": "seen-set entries persist; bloom re-crawl "
                                  "will dedup this partition's URLs"}))
    elif args.cmd == "ban":
        from .state.checkpoint import CLOSED, LEASED
        if m.state(args.partition) != CLOSED:
            m.transition(args.partition, LEASED, completor="admin-ban")
            m.transition(args.partition, CLOSED, completor="admin-ban",
                         counters={}, lineage={"banned": True})
        print(json.dumps({"banned": args.partition}))
    elif args.cmd == "leaderboard":
        # jobs/pairs accumulation (≙ reference main.py:428-435) + the
        # per-worker rate jobs/(last−first)×3600 (templates/worker.html:37)
        lb = {comp: {"jobs": e["jobs"], "pairs": e["pairs"],
                     "efficiency_jobs_per_h": e["efficiency_jobs_per_h"]}
              for comp, e in m.worker_stats().items()}
        print(json.dumps(dict(sorted(lb.items(),
                                     key=lambda kv: -kv[1]["jobs"]))))
    elif args.cmd == "validate-worker":
        # ≙ reference /api/validateWorker (main.py:515-522)
        print(json.dumps({"token": args.token,
                          "valid": m.validate_worker(args.token)}))


if __name__ == "__main__":
    main()
