"""Flagship pipeline: the full URL-frontier crawl scheduler, end to end.

Reproduces the reference's job lifecycle (SURVEY.md §3.1: /api/new →
/api/newJob → markAsDone CPU → GPU stage → closed, reference
main.py:484-697) as a two-phase Ray Data pipeline:

**Phase A — bootstrap** (≙ ``update_db.py`` frontier build): one streaming
pass ``read_parquet(pages) → canonicalize+hash → write_parquet`` hive-
partitioned by ``partition_id`` ( = first hex char of md5(host), so every
host's URLs land in exactly one partition → politeness is globally exact
per-host while staying partition-local). This is the pipeline's single
full-data shuffle; all later reads are partition-pruned directory reads.

**Phase B — crawl waves**: partitions are processed in the seeded dispatch
permutation (≙ ``ORDER BY RANDOM()`` at reference models.py:112, made
deterministic), grouped into *waves* to amortize per-execution scheduling
cost — the partition stays the unit of lease/close/manifest; the wave is
only the unit of execution. Per wave, ONE streaming pass runs

    bloom seen-filter (shared actor shards) → robots gate (per-worker rule
    cache) → fetch/extract (byte-identical text invariant, html dropped)

as a single vectorized ``map_batches`` function over zero-copy Arrow, then
the politeness ranking runs on the slim (url_hash, host, url_canon)
projection — the wide columns never enter the ``groupby(host)`` shuffle
(SURVEY.md §7 hard-part d) — and the schedule is broadcast back. Stage-1
parquet is written hive-partitioned; partitions whose upload store is
"postgres" close directly (reference main.py:413-415, 650-652); the rest
run the GPU stage (per-URL token counts → ``pairs_scraped``) and close.

Every partition close writes an atomic manifest (state, lease, counters,
lineage); bloom snapshots commit per wave. Kill the driver at any point and
``run_crawl(resume=True)`` skips closed partitions and reproduces the same
final state (tests/test_flagship.py).

Scale notes: on a real cluster, partitions number 256+ (partition_hex_chars
= 2) and wave size ≈ cluster width; the payload↔schedule recombination is a
native hash join on url_hash (read_stage1_with_schedule) — fully
distributed, no driver-side schedule dict at any scale.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import threading
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.canonicalize import canonicalize_batch, md5_partition
from ..functions.extract import fetch_extract_batch
from ..sources.synth import ensure_frontier
from ..stages.dispatch import dispatch_order, worker_name
from ..stages.politeness import politeness_ranked
from ..stages.robots import allowed_mask
from ..stages.seen_filter import SeenFilter, make_shards, snapshot_shards
from ..state.checkpoint import (CLOSED, GPU, LEASED, STAGE_VERSIONS, Manifest)

NICKNAME_POOL = 5


def upload_store(seed: int, pid: int,
                 shortcircuit_hex: tuple[str, ...] = ("0", "1")) -> str:
    """Deterministic analog of the reference's random upload-address pools
    (reference main.py:507-510): partitions whose md5 leads with one of
    ``shortcircuit_hex`` (default 2/16) get the 'postgres' store, which
    short-circuits the GPU stage (reference main.py:413-415). The hex set
    comes from PipelineConfig.postgres_shortcircuit_hex — one knob, used
    identically here and in refsim.is_postgres."""
    h = hashlib.md5(f"store|{seed}|{pid}".encode()).hexdigest()
    return "postgres" if h[0] in shortcircuit_hex else "files"


def bootstrap_staging(sf_dir: str, cfg: PipelineConfig, staging: str) -> str:
    """Phase A: canonicalize + hash-partition the frontier once (resumable).

    Crash-safe: the staging dataset is written into a ``.build`` sibling
    and atomically renamed into place once complete (same protocol as
    ``ann.ivf_build``) — a run killed mid-bootstrap can never leave a
    half-written staging dir that a resume's second ``write_parquet``
    would append duplicate rows next to. ``_STAGED`` (inside the dir,
    created before the rename) remains the completion marker."""
    done = os.path.join(staging, "_STAGED")
    if os.path.exists(done):
        return staging
    shutil.rmtree(staging, ignore_errors=True)   # pre-atomicity leftovers
    tmp = staging + ".build"
    shutil.rmtree(tmp, ignore_errors=True)
    pages = os.path.join(ensure_frontier(sf_dir, cfg.seed), "pages")
    # a single pages file reads as few blocks by default; force enough input
    # splits that canonicalize+write saturate the cluster
    ds = ray.data.read_parquet(
        pages, override_num_blocks=cfg.read_override_num_blocks or 64)
    ds = ds.map_batches(lambda b: canonicalize_batch(b, cfg.partition_hex_chars,
                                                 cfg.pct_normalize_urls),
                        batch_format="pyarrow", batch_size=cfg.batch_size,
                        zero_copy_batch=True)
    # partition-contiguous staging layout (≙ the reference's bootstrap sort
    # by shard number, update_db.py:107). Unsorted, every write task emits
    # a file into every partition dir it saw (blocks × partitions files —
    # measured hex2/sfscale downstream 111 s → 60 s once contiguous).
    # Two engines produce the contiguous layout:
    #   "sort"    — global range shuffle by partition_id: one all-to-all
    #               that moves every html byte and whose fixed
    #               coordination cost is the bootstrap's Amdahl serial
    #               term at small core counts (phase efficiency 0.62
    #               measured at sfxl/hex2, BASELINE.md);
    #   "compact" — unsorted hive write + X63 per-partition compaction
    #               INSIDE the .build dir: one independent Ray task per
    #               partition, no exchange, embarrassingly parallel —
    #               the default at hex ≥ 2.
    layout = cfg.staging_layout
    if layout is None:
        if cfg.staging_sort is not None:
            layout = "sort" if cfg.staging_sort else "plain"
        else:
            layout = "compact" if cfg.partition_hex_chars >= 2 else "plain"
    if layout == "sort":
        ds = ds.sort("partition_id")
    ds.write_parquet(tmp, partition_cols=["partition_id"])
    if layout == "compact":
        from .maintenance import compact_partitions
        compact_partitions(tmp)
    # persist per-partition row counts ONCE, here (distributed footer
    # scan), so the wave loop never does driver-side staging I/O: a wave
    # at hex2 spans thousands of files and a per-wave footer scan is
    # Amdahl serial fraction on the critical path (round-3 verdict #2)
    _write_row_counts(tmp, _partition_ids(tmp))
    Path(tmp, "_STAGED").touch()
    os.rename(tmp, staging)                      # atomic publish
    return staging


def _partition_ids(staging: str) -> list[int]:
    return sorted(int(p.name.split("=")[1]) for p in Path(staging).iterdir()
                  if p.name.startswith("partition_id="))


def _make_cpu_stage(shards, hex_chars: int):
    """The wave's single hot map function: seen-filter → robots → extract.

    A plain task function (not an actor pool): the bloom state lives in the
    shared shard actors, the robots rule cache in the worker process — so
    there is no per-execution actor spin-up, and Ray schedules it elastically.

    Counters are NOT tracked here (round-2 did a sharded-counter-actor RPC
    per batch — one RTT on the critical path of every batch): the stage
    emits every post-bloom row tagged with the boolean ``allowed`` robots
    verdict, and the driver derives all four counters per wave from data —
    urls_seen from staging parquet metadata, fetched/blocked from one tiny
    (partition_id, allowed) count pass over the materialized wave. Derived
    counters are exactly-once by construction (recomputable, never
    incremented), which also removes half of the retry hazard below.

    Still NOT idempotent: ``seen(batch)`` mutates the bloom shards — a
    Ray-retried task would find its own URLs already 'seen' and silently
    drop the batch. The wave therefore runs with ``max_retries=0`` (see
    run_crawl): a lost task fails the wave, and resume replays it from the
    manifest + the last committed seen-snapshot, which is consistent
    (snapshots commit only at wave end).
    """
    seen = SeenFilter(shards)

    def stage(batch: pa.Table) -> pa.Table:
        if "partition_id" in batch.schema.names:
            # restored by hive-path inference on the staged files
            pids_in = np.asarray(batch.column("partition_id")).astype(np.int32)
            batch = batch.set_column(
                batch.schema.get_field_index("partition_id"), "partition_id",
                pa.array(pids_in, pa.int32()))
        else:
            pids_in = md5_partition(batch.column("host"), hex_chars)
            batch = batch.append_column("partition_id",
                                        pa.array(pids_in, pa.int32()))

        deduped = seen(batch)
        allowed = allowed_mask(deduped)
        # extraction is a pure per-row function; running it on the (rare)
        # blocked rows too keeps one uniform vectorized pass — blocked rows
        # are filtered before the stage-1 write, so no blocked text is ever
        # published downstream
        out = fetch_extract_batch(deduped, verify=True)
        return (out.drop_columns(["html"])
                .append_column("allowed", pa.array(allowed)))

    return stage


ROWCOUNTS_FILE = "_ROWCOUNTS.json"
_ROWCOUNT_CACHE: dict[tuple[str, int], dict[int, int]] = {}


def _scan_row_counts(staging: str, pids: list[int]) -> dict[int, int]:
    """urls_seen per partition from parquet footer metadata — no data
    read, and no driver I/O: partitions fan out over Ray tasks (one task
    per chunk of partitions). Runs once at bootstrap."""
    @ray.remote(num_cpus=0.5)
    def scan(chunk: list[int]) -> dict[int, int]:
        import pyarrow.parquet as pq
        return {p: sum(
            pq.ParquetFile(str(f)).metadata.num_rows
            for f in Path(staging, f"partition_id={p}").glob("*.parquet"))
            for p in chunk}

    chunks = [pids[i:i + 32] for i in range(0, len(pids), 32)]
    out: dict[int, int] = {}
    for d in ray.get([scan.remote(c) for c in chunks]):
        out.update(d)
    return out


def _write_row_counts(staging: str, pids: list[int]) -> None:
    """Atomically persist the staging row-count manifest (part of the
    bootstrap artifact, alongside ``_STAGED``)."""
    import json
    path = Path(staging, ROWCOUNTS_FILE)
    tmp = Path(staging, ROWCOUNTS_FILE + ".tmp")
    tmp.write_text(json.dumps(_scan_row_counts(staging, pids)))
    os.replace(tmp, path)


def _load_row_counts(staging: str) -> dict[int, int]:
    """Per-partition staging row counts from the bootstrap manifest —
    O(1) driver work per wave. Staging dirs written before the manifest
    existed (older checkpoints resumed across versions) get it computed
    and persisted once. Cache key includes the manifest mtime so a
    regenerated staging dir under the same path never serves stale
    counts."""
    import json
    path = Path(staging, ROWCOUNTS_FILE)
    if not path.exists():
        _write_row_counts(staging, _partition_ids(staging))
    key = (staging, path.stat().st_mtime_ns)
    cached = _ROWCOUNT_CACHE.get(key)
    if cached is None:
        cached = {int(k): int(v) for k, v in json.loads(
            path.read_text()).items()}
        _ROWCOUNT_CACHE[key] = cached
    return cached


def _wave_counters(surv_all, staging: str, wave: list[int]) -> dict[int, dict]:
    """Derive the per-partition counter dict for one wave from data:
    one (partition_id, allowed) partial-count pass over the materialized
    wave output + the bootstrap-persisted staging row-count manifest
    (no per-wave staging I/O). ≙ the reference's Redis counters
    (SURVEY.md A6), but recomputable instead of incremented."""
    def part_counts(b: pa.Table) -> pa.Table:
        pids = np.asarray(b.column("partition_id"), dtype=np.int64)
        ok = np.asarray(b.column("allowed"))
        u = np.unique(pids)
        size = int(u.max()) + 1 if len(u) else 1
        n_new = np.bincount(pids, minlength=size)
        n_ok = np.bincount(pids[ok], minlength=size)
        return pa.table({"partition_id": pa.array(u, pa.int64()),
                         "n_new": pa.array(n_new[u], pa.int64()),
                         "n_ok": pa.array(n_ok[u], pa.int64())})

    cdf = (surv_all.select_columns(["partition_id", "allowed"])
           .map_batches(part_counts, batch_format="pyarrow")
           .to_pandas())
    agg = (cdf.groupby("partition_id")[["n_new", "n_ok"]].sum()
           if len(cdf) else {})
    seen_by_pid = _load_row_counts(staging)
    out = {}
    for pid in wave:
        n_new = int(agg["n_new"].get(pid, 0)) if len(cdf) else 0
        n_ok = int(agg["n_ok"].get(pid, 0)) if len(cdf) else 0
        seen_n = seen_by_pid.get(pid, 0)
        out[pid] = {"urls_seen": seen_n,
                    "urls_deduped": seen_n - n_new,
                    "robots_blocked": n_new - n_ok,
                    "urls_fetched": n_ok}
    return out


def load_seed_hashes(sf_dir: str, cfg: PipelineConfig) -> np.ndarray:
    """Canonical url_hash set of the crawl seed list (≙ the reference's
    bootstrap open.json, update_db.py:36): seed-listed URLs get priority 0
    in the politeness queue. Seed URLs not present in the frontier are
    simply no-op entries."""
    import pyarrow.parquet as pq
    from ..functions.canonicalize import canonicalize_url, md5_hash64
    path = os.path.join(ensure_frontier(sf_dir, cfg.seed), "seed_list.parquet")
    urls = pq.read_table(path, columns=["url"]).column("url").to_pylist()
    canon = [canonicalize_url(u, cfg.pct_normalize_urls) for u in urls]
    return np.sort(md5_hash64(canon))


def read_stage1_with_schedule(out_root: str, pids: list[int] | None = None):
    """Stage-1 payload joined with its politeness-schedule sidecar by
    ``url_hash`` via Ray's native hash join — both sides hash-partitioned
    on the key, so the join is fully distributed (the round-1 driver-side
    broadcast searchsorted is gone; at 10^10 URLs neither side ever
    materializes outside the object store). ``url_hash`` is unique per
    surviving URL (the bloom filter admits each hash once).

    Join semantics: with the default ``politeness_max_rounds=None`` the
    schedule covers exactly the fetched URLs and the inner join is 1:1.
    When a crawl horizon IS configured, the schedule sidecar only contains
    rows with ``fetch_round < max_rounds`` — the inner join then
    DELIBERATELY applies that horizon to the payload: rows beyond it are
    out of crawl scope, not lost (they remain in the stage-1 artifact for
    a later horizon extension). Consumers needing the full payload read
    stage-1 directly. Used by entry(), tests, and any consumer that needs
    payload + schedule together."""
    s1 = Path(out_root, "stage1")
    sch = Path(out_root, "schedule")
    sel = (sorted(int(p.name.split("=")[1]) for p in s1.iterdir())
           if pids is None else pids)
    files = [str(f) for p in sel
             for f in sorted(Path(s1, f"partition_id={p}").glob("*.parquet"))]
    sfiles = [str(f) for p in sel
              for f in sorted(Path(sch, f"partition_id={p}").glob("*.parquet"))]
    payload = ray.data.read_parquet(files)
    schedule = ray.data.read_parquet(
        sfiles, columns=["url_hash", "politeness_rank", "fetch_round"])
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return payload.join(schedule, join_type="inner",
                        num_partitions=max(2, min(16, cpus // 2)),
                        on=("url_hash",))


def _defuse_fsspec_http_import() -> None:
    """Ray Data's path resolution re-imports ``fsspec.implementations.http``
    on EVERY read/write call; with aiohttp absent from this environment the
    import fails EVERY time (failed imports aren't cached), and two driver
    threads resolving paths concurrently can hit CPython's import
    deadlock-avoidance and leak a spurious ``ImportError: cannot import
    name 'HTTPFileSystem'`` out of ``read_parquet`` (observed in the
    gpu-overlap thread). Register a minimal stub module once so the import
    succeeds deterministically; ray's ``_is_http_filesystem`` only uses the
    class as an ``isinstance`` target, which is correctly always False —
    no http filesystem can exist here without aiohttp anyway."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except (ImportError, ModuleNotFoundError):
        import sys
        import types
        m = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:      # isinstance target only, never created
            pass

        m.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = m


def _gpu_token_sums(stage1_root: str, stage2_root: str,
                    gpu_pids: list[int],
                    cfg: PipelineConfig) -> dict[int, int]:
    """Stage 2 (GPU leg): read the wave's stage-1 artifact (≙ the GPU
    worker downloading gpu_url, reference main.py:573), pruned to the
    needed columns and the non-postgres partitions only, compute token
    counts, hive-write stage 2, and return per-partition token sums.

    A partition may legitimately have ZERO fetched rows (e.g. a re-opened
    partition whose URLs are all in the seen set) — then no stage-1 dir
    exists for it and read_parquet([]) errors, hence the file-list guard.

    ONE streaming launch: read → tokens → hive write (no wave-wide
    materialize holding the stage-2 table in the object store). The
    per-partition token sums then come from a SLIM re-read of just the
    integer column of the files this wave just wrote — the old
    materialize+write+groupby shape was three pipeline launches per
    wave, a measured core-count-invariant ~6.7 s/wave slice of the gpu
    phase (BASELINE.md hex2 decomposition). Thread-safe driver-side
    (only Ray Data API calls + local state), so run_crawl can overlap it
    with the NEXT wave's cpu/politeness phases (cfg.gpu_overlap)."""
    pairs_by_pid: dict[int, int] = {}
    s1_files = sorted(
        str(f) for p in gpu_pids
        for f in Path(stage1_root, f"partition_id={p}").glob("*.parquet"))
    if not s1_files:
        return pairs_by_pid

    def tokens(batch: pa.Table) -> pa.Table:
        txt = batch.column("text_extracted")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n = pc.list_value_length(pc.utf8_split_whitespace(txt)).cast(pa.int64())
        pid_col = np.asarray(batch.column("partition_id")).astype(np.int32)
        return pa.table({"url_canon": batch.column("url_canon"),
                         "lang": batch.column("lang"),
                         "partition_id": pa.array(pid_col, pa.int32()),
                         "n_tokens": n})

    # max_retries=0 on the write: the per-pid token sums below are
    # derived by globbing the files this launch writes — a write task
    # retried after flushing a part file would leave a stray duplicate
    # the glob double-counts (same rationale as the cpu stage: a lost
    # task fails the wave, resume replays from the manifest).
    ray.data.read_parquet(
        s1_files, columns=["url_canon", "lang", "text_extracted",
                           "partition_id"]).map_batches(
        tokens, batch_format="pyarrow",
        batch_size=cfg.batch_size).write_parquet(
        stage2_root, partition_cols=["partition_id"],
        ray_remote_args={"max_retries": 0})
    s2_files = sorted(
        str(f) for p in gpu_pids
        for f in Path(stage2_root, f"partition_id={p}").glob("*.parquet"))
    slim = ray.data.read_parquet(s2_files, columns=["n_tokens"],
                                 include_paths=True)

    def sum_partial(b: pa.Table) -> pa.Table:
        # partition_id is hive-encoded in the file path; one row per
        # (file-derived pid) per batch
        import re as _re
        paths, inv = np.unique(
            np.asarray(b.column("path"), dtype=object),
            return_inverse=True)                 # ≈1 distinct per file
        per_path = np.fromiter(
            (int(_re.search(r"partition_id=(\d+)", p).group(1))
             for p in paths), np.int32, len(paths))
        pids = per_path[inv]
        t = pa.table({"partition_id": pa.array(pids, pa.int32()),
                      "n": b.column("n_tokens")})
        g = t.group_by("partition_id").aggregate([("n", "sum")])
        return g.rename_columns(["partition_id", "n"])

    parts = (slim.map_batches(sum_partial, batch_format="pyarrow",
                              batch_size=65536).to_pandas())
    for pid, n in parts.groupby("partition_id")["n"].sum().items():
        pairs_by_pid[int(pid)] = int(n)
    return pairs_by_pid


def run_crawl(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
              out_root: str | None = None, resume: bool = True,
              stop_after: int | None = None,
              wave_size: int | None = None) -> dict:
    """Run (or resume) the crawl; returns the metrics summary.
    ``wave_size`` defaults to ``cfg.wave_size`` — one knob shared by the
    CLI, bench, and tests."""
    _defuse_fsspec_http_import()   # required for thread-safe Ray Data IO
    wave_size = cfg.wave_size if wave_size is None else wave_size
    out_root = out_root or os.path.join(cfg.checkpoint_dir,
                                        os.path.basename(os.path.normpath(sf_dir)))
    if not resume:
        shutil.rmtree(out_root, ignore_errors=True)
    staging = os.path.join(out_root, "staging")
    manifest = Manifest(out_root, cfg.lease_timeout_s)

    t0 = time.time()
    phase_times: dict[str, float] = {}

    def _mark(name: str, since: float) -> float:
        phase_times[name] = round(phase_times.get(name, 0.0)
                                  + (time.time() - since), 2)
        return time.time()

    tp = time.time()
    bootstrap_staging(sf_dir, cfg, staging)
    tp = _mark("bootstrap", tp)
    universe = _partition_ids(staging)
    order = dispatch_order(universe, cfg.seed)

    shards = make_shards(cfg.n_seen_shards, cfg.seen_bits_per_shard,
                         cfg.seen_num_hashes,
                         snapshots=manifest.load_seen_snapshot() if resume else None,
                         kind=cfg.seen_filter_kind)
    seed_hashes_ref = ray.put(load_seed_hashes(sf_dir, cfg))
    lineage_base = {"input": staging, "seed": cfg.seed,
                    "stage_versions": STAGE_VERSIONS}
    stage1_root = os.path.join(out_root, "stage1")
    stage2_root = os.path.join(out_root, "stage2")
    schedule_root = os.path.join(out_root, "schedule")

    todo = [p for p in order if manifest.state(p) != CLOSED]
    if stop_after is not None:
        todo = todo[:stop_after]

    cpu_stage = _make_cpu_stage(shards, cfg.partition_hex_chars)

    pending: dict | None = None   # at most ONE wave's GPU leg in flight

    def _close_wave(e: dict) -> None:
        """Join the wave's GPU leg (if overlapped), then run the
        per-partition close: state machine + counters + lineage + the
        wave's pre-captured seen-snapshot. ``gpu_stage`` records the
        leg's own wall time (overlapped with the next wave's phases when
        gpu_overlap is on); ``gpu_wait`` records only the blocking join
        remainder — the true critical-path cost."""
        t_join = time.time()
        if e["thread"] is not None:
            e["thread"].join()
        if e["err"] is not None:
            raise e["err"]
        phase_times["gpu_stage"] = round(
            phase_times.get("gpu_stage", 0.0) + e["gpu_s"], 2)
        if e["thread"] is not None:
            phase_times["gpu_wait"] = round(
                phase_times.get("gpu_wait", 0.0) + (time.time() - t_join), 2)
        tclose = time.time()
        for pid in e["wave"]:
            cpu_nick, gpu_nick = e["nicks"][pid]
            gpu_url = f"{e['stores'][pid]}://{stage1_root}/partition_id={pid}"
            counters = e["counters"][pid]
            if e["stores"][pid] == "postgres":
                manifest.transition(pid, CLOSED, completor=cpu_nick,
                                    gpu_url=gpu_url, counters=counters,
                                    lineage=lineage_base,
                                    output_path=f"{stage1_root}/partition_id={pid}")
            else:
                pairs = e["pairs"].get(pid, 0)
                counters["pairs_scraped"] = pairs
                manifest.transition(pid, GPU, gpu_url=gpu_url)
                manifest.transition(pid, LEASED, completor=gpu_nick)
                manifest.transition(pid, CLOSED, completor=gpu_nick,
                                    counters=counters, lineage=lineage_base,
                                    pairs_scraped=pairs,
                                    output_path=f"{stage2_root}/partition_id={pid}")
        manifest.save_seen_snapshot(e["snapshot"])
        _mark("close_commit", tclose)

    try:
        for w0 in range(0, len(todo), wave_size):
            wave = todo[w0:w0 + wave_size]
            nicks = {pid: (worker_name(cfg.seed + 1, pid % NICKNAME_POOL),
                           worker_name(cfg.seed, pid % NICKNAME_POOL))
                     for pid in wave}
            for pid in wave:
                # claim (≙ reference main.py:549-598 atomic claim dance)
                manifest.transition(pid, LEASED, completor=nicks[pid][0])
                for root in (stage1_root, stage2_root, schedule_root):
                    shutil.rmtree(os.path.join(root, f"partition_id={pid}"),
                                  ignore_errors=True)

            # wave dataflow — everything distributed, no driver round-trips:
            # (1) read → seen/robots/extract, materialized once (two consumers);
            # (2) payload written as the stage-1 artifact; (3) politeness
            # ranking over the SLIM projection only — the groupby(host_bucket)
            # shuffle moves ~32 B/URL, never the payload (SURVEY.md §7
            # hard-part d) — written as a sidecar ``schedule`` parquet keyed by
            # url_hash (late materialization: consumers join payload↔schedule
            # by key only when they need both; see read_stage1_with_schedule).
            tp = time.time()
            files = sorted(str(f) for p in wave
                           for f in Path(staging, f"partition_id={p}").glob("*.parquet"))
            ds = ray.data.read_parquet(files)
            # max_retries=0: the stage mutates shared state (bloom add) and
            # MUST NOT be replayed by Ray's task retry — see _make_cpu_stage.
            # A lost task fails the wave; resume replays it from the manifest
            # + last committed seen-snapshot.
            surv_all = ds.map_batches(cpu_stage, batch_format="pyarrow",
                                      batch_size=cfg.batch_size,
                                      zero_copy_batch=True,
                                      max_retries=0).materialize()
            tp = _mark("cpu_stage", tp)

            # counters derived from data (no per-batch RPCs; exactly-once by
            # construction) — before manifests commit, same atomicity contract
            counters_by_pid = _wave_counters(surv_all, staging, wave)
            tp = _mark("counters", tp)

            surv = (surv_all.filter(expr="allowed == True")
                    .drop_columns(["allowed"]))
            surv.write_parquet(stage1_root, partition_cols=["partition_id"])
            tp = _mark("stage1_write", tp)

            slim = surv.select_columns(["url_hash", "host", "url_canon",
                                        "partition_id"])

            def add_priority(batch: pa.Table) -> pa.Table:
                # seed-listed URLs first within their host (north_rule: dispatch
                # under "the same seed list + politeness budget")
                seeds = ray.get(seed_hashes_ref)
                h = np.asarray(batch.column("url_hash"), dtype=np.uint64)
                pos = np.searchsorted(seeds, h)
                is_seed = (pos < len(seeds)) & (seeds[np.minimum(pos, len(seeds) - 1)] == h) \
                    if len(seeds) else np.zeros(len(h), dtype=bool)
                prio = np.where(is_seed, 0, 1).astype(np.int32)
                return batch.append_column("priority", pa.array(prio, pa.int32()))

            slim = slim.map_batches(add_priority, batch_format="pyarrow",
                                    batch_size=cfg.batch_size)
            # sub_buckets adapts to wave width: total politeness groups per wave
            # = |wave| × sub_buckets, and each map_groups dispatch is a serial
            # driver-side cost (~ms each). Target ≈256 groups/wave: at 16-way
            # (wave 8) that is the measured-good 16 sub-buckets; at 256-way
            # (wave 64) it is 4 — without this, 1024 groups/wave × waves made
            # the politeness phase driver-bound and core-count-invariant
            # (measured ~37 s flat at both 2 and 8 pinned cores).
            sub_buckets = min(16, max(1, 256 // max(1, len(wave))))
            ranked = politeness_ranked(slim, cfg.politeness_budget,
                                       order=("priority", "url_canon"),
                                       max_rounds=cfg.politeness_max_rounds,
                                       align_col="partition_id",
                                       sub_buckets=sub_buckets)
            ranked.write_parquet(schedule_root, partition_cols=["partition_id"])
            tp = _mark("politeness", tp)

            # ---- stage 2 (GPU leg) for non-postgres partitions ----------------
            stores = {pid: upload_store(cfg.seed, pid,
                                        cfg.postgres_shortcircuit_hex)
                      for pid in wave}
            gpu_pids = [p for p in wave if stores[p] != "postgres"]

            # seen-set snapshot for THIS wave, captured BEFORE the next wave's
            # cpu stage mutates the shards — the overlap-correctness barrier:
            # the snapshot committed when this wave closes must contain exactly
            # the additions of waves ≤ this one, or a crash-resume of a later
            # wave would find its own URLs pre-seen and fetch nothing. The GPU
            # leg itself never touches the shards, so it can run behind the
            # next wave freely.
            entry = {"wave": wave, "nicks": nicks, "stores": stores,
                     "counters": counters_by_pid,
                     "snapshot": snapshot_shards(shards),
                     "pairs": {}, "thread": None, "err": None, "gpu_s": 0.0}
            tp = _mark("snapshot", tp)

            if gpu_pids:
                def _gpu_work(e=entry, pids=gpu_pids):
                    t_g = time.time()
                    try:
                        e["pairs"] = _gpu_token_sums(stage1_root, stage2_root,
                                                     pids, cfg)
                    except BaseException as exc:        # re-raised at join
                        e["err"] = exc
                    e["gpu_s"] = time.time() - t_g
                if cfg.gpu_overlap:
                    th = threading.Thread(target=_gpu_work, name="gpu-stage",
                                          daemon=True)
                    entry["thread"] = th
                    th.start()
                else:
                    _gpu_work()

            # close the PREVIOUS wave now (its GPU leg has been overlapping
            # this wave's cpu/politeness phases); this wave becomes pending.
            # Without overlap, close immediately — identical to the old
            # strictly-sequential wave loop.
            prev, pending = pending, entry
            if prev is not None:
                _close_wave(prev)
            if not cfg.gpu_overlap:
                _close_wave(entry)
                pending = None

        if pending is not None:
            _close_wave(pending)
            pending = None
    except BaseException:
        # never leave the overlapped GPU pipeline running into a
        # ray.shutdown / teardown — a Ray Data execution on a dead
        # driver thread segfaults. Join (the leg is short) then
        # propagate; resume replays the un-closed waves.
        if pending is not None and pending["thread"] is not None:
            pending["thread"].join()
        raise

    for a in shards:
        ray.kill(a)  # do not leave zombie actors holding resources

    wall = time.time() - t0
    totals = manifest.totals()
    fetched = totals.get("urls_fetched", 0)
    return {
        "wall_s": wall,
        "urls_per_s": fetched / wall if wall > 0 else 0.0,
        "dispatch_order": order,
        "partitions_closed": sorted(manifest.closed_partitions()),
        "totals": totals,
        "out_root": out_root,
        "phase_times": phase_times,
    }
