"""Flagship crawl pipeline vs the pure-Python reference-semantics oracle
(refsim): dispatch ordering, URL-seen/fetched sets, politeness ranks,
counters, two-stage state machine, leaderboard — plus kill/resume
idempotence (SURVEY.md §5.2, §5.5)."""

import shutil

import pyarrow.parquet as pq
import pytest

from conftest import SF
from crawlingathome_server_ray.config import PipelineConfig
from crawlingathome_server_ray.pipelines.frontier import run_crawl
from crawlingathome_server_ray.refsim.sim import simulate
from crawlingathome_server_ray.sources.synth import ensure_frontier
from crawlingathome_server_ray.state.checkpoint import Manifest

CFG = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_test")


@pytest.fixture(scope="module")
def crawl_and_sim(ray_session):
    shutil.rmtree(CFG.checkpoint_dir, ignore_errors=True)
    summary = run_crawl(SF, CFG, resume=False)
    frontier = ensure_frontier(SF, CFG.seed)
    pages = pq.read_table(frontier + "/pages")
    seed_urls = pq.read_table(frontier + "/seed_list.parquet",
                              columns=["url"]).column("url").to_pylist()
    sim = simulate(pages, CFG, seed_urls=seed_urls)
    return summary, sim


def _stage1(summary, pid):
    return pq.read_table(f"{summary['out_root']}/stage1/partition_id={pid}")


def test_dispatch_order_matches(crawl_and_sim):
    summary, sim = crawl_and_sim
    assert summary["dispatch_order"] == sim.dispatch


def test_all_partitions_closed(crawl_and_sim):
    summary, sim = crawl_and_sim
    assert summary["partitions_closed"] == sorted(sim.states)


def test_fetched_url_set_matches(crawl_and_sim):
    summary, sim = crawl_and_sim
    for pid in sim.dispatch:
        got = set(_stage1(summary, pid).column("url_canon").to_pylist())
        assert got == sim.fetched[pid], f"partition {pid} fetched set differs"


def test_politeness_ranks_match(crawl_and_sim):
    summary, sim = crawl_and_sim
    for pid in sim.dispatch:
        t = pq.read_table(f"{summary['out_root']}/schedule/partition_id={pid}")
        for c, r, fr in zip(t.column("url_canon").to_pylist(),
                            t.column("politeness_rank").to_pylist(),
                            t.column("fetch_round").to_pylist()):
            assert sim.rank[c] == (r, fr), f"rank mismatch for {c}"
        assert set(t.column("url_canon").to_pylist()) == sim.fetched[pid]


def test_seed_list_priority_bites(crawl_and_sim):
    """The seed list must actually reorder at least one host's queue
    (otherwise the priority plumbing is dead code)."""
    summary, sim = crawl_and_sim
    reordered = 0
    for pid in sim.dispatch:
        t = pq.read_table(f"{summary['out_root']}/schedule/partition_id={pid}",
                          columns=["host", "url_canon", "politeness_rank"])
        import collections
        by_host = collections.defaultdict(list)
        for h, c, r in zip(t.column("host").to_pylist(),
                           t.column("url_canon").to_pylist(),
                           t.column("politeness_rank").to_pylist()):
            by_host[h].append((r, c))
        for h, rows in by_host.items():
            ranked_order = [c for _, c in sorted(rows)]
            if ranked_order != sorted(ranked_order):
                reordered += 1
    assert reordered > 0, "no host queue was reordered by the seed list"


def test_counters_match(crawl_and_sim):
    summary, sim = crawl_and_sim
    m = Manifest(summary["out_root"], CFG.lease_timeout_s)
    for pid, rec in m.all().items():
        assert rec["counters"] == sim.counters[pid], f"counters differ @ {pid}"


def test_extract_invariant_on_output(crawl_and_sim):
    summary, sim = crawl_and_sim
    for pid in sim.dispatch[:4]:
        t = _stage1(summary, pid)
        assert t.column("text_extracted").to_pylist() == t.column("text").to_pylist()


def test_leaderboard_matches(crawl_and_sim):
    summary, sim = crawl_and_sim
    m = Manifest(summary["out_root"], CFG.lease_timeout_s)
    lb = {}
    for rec in m.all().values():
        nick = rec["completor"]
        e = lb.setdefault(nick, {"jobs": 0, "pairs": 0})
        e["jobs"] += 1
        e["pairs"] += rec.get("pairs_scraped") or 0
    assert lb == sim.leaderboard


def test_postgres_short_circuit(crawl_and_sim):
    summary, sim = crawl_and_sim
    m = Manifest(summary["out_root"], CFG.lease_timeout_s)
    from crawlingathome_server_ray.refsim.sim import is_postgres
    for pid, rec in m.all().items():
        if is_postgres(CFG.seed, pid):
            assert "postgres" in rec["gpu_url"]
            assert "pairs_scraped" not in rec
        else:
            assert rec.get("pairs_scraped", 0) >= 0
            assert not rec["gpu_url"].startswith("postgres")


def test_dirty_crash_resume(ray_session):
    """Crash mid-wave: a partition left LEASED with partial stage-1 garbage
    on disk must be cleaned and reprocessed on resume, converging to the
    same final state (at-least-once + idempotence, SURVEY.md §2.9 W5)."""
    import pyarrow as pa
    cfg = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_dirty")
    shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
    partial = run_crawl(SF, cfg, resume=False, stop_after=3)
    m = Manifest(partial["out_root"], cfg.lease_timeout_s)
    victim = next(p for p in partial["dispatch_order"]
                  if p not in partial["partitions_closed"])
    # simulate a crash: leased + partial garbage output
    m.transition(victim, "leased", completor="crashed-worker")
    import pathlib
    gdir = pathlib.Path(partial["out_root"], "stage1", f"partition_id={victim}")
    gdir.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table({"junk": [1, 2, 3]}), gdir / "garbage.parquet")

    resumed = run_crawl(SF, cfg, resume=True)
    full_cfg = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_dirty_ref")
    shutil.rmtree(full_cfg.checkpoint_dir, ignore_errors=True)
    full = run_crawl(SF, full_cfg, resume=False)
    assert resumed["partitions_closed"] == full["partitions_closed"]
    assert Manifest(resumed["out_root"]).totals() == \
        Manifest(full["out_root"]).totals()
    # the garbage file must be gone from the victim's rewritten output
    assert not (gdir / "garbage.parquet").exists()


def test_crash_mid_bootstrap_no_duplicate_staging(ray_session):
    """Crash DURING the bootstrap staging write: a resume must not
    append a second copy of the frontier next to the partial one (the
    pre-round-4 hazard: write_parquet into the same dir twice). The
    staging build is atomic (write into .build, rename on completion),
    so partial staging dirs are discarded and counters stay exact."""
    import pathlib
    cfg = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_bootcrash")
    shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
    full = run_crawl(SF, cfg, resume=False)
    full_totals = Manifest(full["out_root"]).totals()
    staging = pathlib.Path(full["out_root"], "staging")
    # simulate a crash mid-write: completed files but NO _STAGED marker
    # (the pre-atomicity on-disk state) — resume must rebuild cleanly
    crashed = staging.with_name("staging_crashed")
    shutil.rmtree(crashed, ignore_errors=True)
    shutil.copytree(staging, crashed)
    (crashed / "_STAGED").unlink()
    (crashed / "_ROWCOUNTS.json").unlink()
    # drop one partition's files entirely to make the partial state real
    victim = sorted(p for p in crashed.iterdir()
                    if p.name.startswith("partition_id="))[0]
    shutil.rmtree(victim)
    shutil.rmtree(staging)
    crashed.rename(staging)
    # wipe manifests + the seen snapshot so every partition reprocesses
    # over the (crashed) staging dir with a fresh seen set
    shutil.rmtree(pathlib.Path(full["out_root"], "manifest"),
                  ignore_errors=True)
    snap = pathlib.Path(full["out_root"], "seen_snapshot.pkl")
    if snap.exists():
        snap.unlink()
    resumed = run_crawl(SF, cfg, resume=True)
    assert resumed["partitions_closed"] == full["partitions_closed"]
    assert Manifest(resumed["out_root"]).totals() == full_totals, \
        "resume after mid-bootstrap crash changed totals (duplicate rows?)"


def test_reopen_then_resume_dedups_not_crashes(ray_session):
    """Admin-reopening a CLOSED partition and resuming must converge: the
    partition's URLs are still in the persistent seen set, so the re-crawl
    legitimately fetches ZERO rows — which must not crash the empty-batch
    extract/write/gpu path (regression: found live via the CLI)."""
    cfg = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_reopen")
    shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
    full = run_crawl(SF, cfg, resume=False)
    victim = full["partitions_closed"][0]
    m = Manifest(full["out_root"], cfg.lease_timeout_s)
    m._path(victim).unlink()  # ≙ cli reopen
    resumed = run_crawl(SF, cfg, resume=True)
    assert resumed["partitions_closed"] == full["partitions_closed"]
    rec = Manifest(resumed["out_root"]).read(victim)
    assert rec["state"] == "closed"
    assert rec["counters"]["urls_fetched"] == 0
    assert rec["counters"]["urls_deduped"] == rec["counters"]["urls_seen"]


def test_kill_and_resume_identical(ray_session):
    cfg = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_resume")
    shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
    partial = run_crawl(SF, cfg, resume=False, stop_after=5)
    assert len(partial["partitions_closed"]) == 5
    resumed = run_crawl(SF, cfg, resume=True)
    full_cfg = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_full")
    shutil.rmtree(full_cfg.checkpoint_dir, ignore_errors=True)
    full = run_crawl(SF, full_cfg, resume=False)
    assert resumed["partitions_closed"] == full["partitions_closed"]
    m_resumed = Manifest(resumed["out_root"]).totals()
    m_full = Manifest(full["out_root"]).totals()
    assert m_resumed == m_full, "resume double-processed some partition"


def test_hex_chars_2_matches_refsim(ray_session):
    """The 256-partition configuration (partition_hex_chars=2) must
    reproduce refsim dispatch/counters/state exactly — the docstring's
    promised at-scale partitioning, not just the 16-partition default."""
    cfg = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_hex2",
                         partition_hex_chars=2)
    shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
    summary = run_crawl(SF, cfg, resume=False, wave_size=64)
    frontier = ensure_frontier(SF, cfg.seed)
    pages = pq.read_table(frontier + "/pages")
    seed_urls = pq.read_table(frontier + "/seed_list.parquet",
                              columns=["url"]).column("url").to_pylist()
    sim = simulate(pages, cfg, seed_urls=seed_urls)
    assert summary["dispatch_order"] == sim.dispatch
    assert summary["partitions_closed"] == sorted(sim.states)
    # sf0.001 has 60 hosts ⇒ ≤60 non-empty partitions, but they must span
    # the 256-way id space (beyond the 16-way default's 0..15 range)
    assert max(summary["partitions_closed"]) > 15
    assert len(summary["partitions_closed"]) > 40
    m = Manifest(summary["out_root"], cfg.lease_timeout_s)
    for pid, rec in m.all().items():
        assert rec["counters"] == sim.counters[pid], f"counters @ {pid}"
    shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)


def test_wave_size_invariance(ray_session):
    """The wave is only the unit of execution — manifests, counters, and
    schedules must be identical at any wave_size (determinism under
    parallelism, SURVEY.md §7 hard-part a)."""
    outs = {}
    for ws in (4, 64):
        cfg = PipelineConfig(checkpoint_dir=f"/tmp/graft_ckpt_ws{ws}")
        shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
        s = run_crawl(SF, cfg, resume=False, wave_size=ws)
        m = Manifest(s["out_root"], cfg.lease_timeout_s)
        sched = {}
        for pid in s["partitions_closed"]:
            t = pq.read_table(f"{s['out_root']}/schedule/partition_id={pid}",
                              columns=["url_canon", "politeness_rank"])
            sched[pid] = sorted(zip(t.column("url_canon").to_pylist(),
                                    t.column("politeness_rank").to_pylist()))
        outs[ws] = (s["dispatch_order"], s["partitions_closed"],
                    {p: r["counters"] for p, r in m.all().items()}, sched)
        shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
    assert outs[4] == outs[64]


def test_gpu_overlap_equivalence(ray_session):
    """The gpu-overlap thread is only a scheduling optimization: with a
    small wave_size (many waves, so wave N's gpu leg really does run under
    wave N+1's cpu phase) the manifests, counters, dispatch order and
    schedules must be byte-identical to the serial gpu path."""
    outs = {}
    for ov in (False, True):
        cfg = PipelineConfig(checkpoint_dir=f"/tmp/graft_ckpt_ov{int(ov)}",
                             gpu_overlap=ov)
        shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
        s = run_crawl(SF, cfg, resume=False, wave_size=4)
        m = Manifest(s["out_root"], cfg.lease_timeout_s)
        sched = {}
        for pid in s["partitions_closed"]:
            t = pq.read_table(f"{s['out_root']}/schedule/partition_id={pid}",
                              columns=["url_canon", "politeness_rank"])
            sched[pid] = sorted(zip(t.column("url_canon").to_pylist(),
                                    t.column("politeness_rank").to_pylist()))
        outs[ov] = (s["dispatch_order"], s["partitions_closed"],
                    {p: r["counters"] for p, r in m.all().items()}, sched)
        shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
    assert outs[False] == outs[True]


def test_staging_compact_equals_sort_layout(ray_session):
    """The two partition-contiguous staging engines must stage identical
    ROWS per partition (the exchange is layout-only), and the compact
    layout must actually be compact — not blocks × partitions files."""
    import glob
    import os

    import pandas as pd

    from crawlingathome_server_ray.pipelines.frontier import bootstrap_staging

    roots = {}
    for layout in ("sort", "compact"):
        cfg = PipelineConfig(checkpoint_dir=f"/tmp/graft_ckpt_lay_{layout}",
                             partition_hex_chars=2, staging_layout=layout)
        shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
        staging = os.path.join(cfg.checkpoint_dir, "sf0.001", "staging")
        os.makedirs(os.path.dirname(staging), exist_ok=True)
        roots[layout] = bootstrap_staging(SF, cfg, staging)

    a = pq.read_table(roots["sort"]).to_pandas()
    b = pq.read_table(roots["compact"]).to_pandas()
    key = ["partition_id", "url_canon", "url", "warc_ts"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    # compact: ≤ a couple of files per partition dir (row-capped writer)
    for d in glob.glob(os.path.join(roots["compact"], "partition_id=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) <= 2, d
    for layout in roots:
        shutil.rmtree(f"/tmp/graft_ckpt_lay_{layout}", ignore_errors=True)
