"""Pipeline configuration.

Replaces the reference's scattered config constants (reference config.py:1-26:
DB/Redis URLs, IDLE_TIMEOUT=7200, AVERAGE_INTERVAL=900, AVERAGE_DATASET=10,
CACHE_EXPIRY=30, upload pools) with one explicit dataclass. Everything that
was nondeterministic in the reference (``ORDER BY RANDOM()`` dispatch,
``uuid4`` tokens, ``random.choice`` names) is a pure function of ``seed``
here, per the determinism requirement of the rebuild.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # determinism
    seed: int = 42

    # partitioning: partition_id = int(md5(url_canon)[:partition_hex_chars], 16)
    # → 16 partitions with 1 hex char, 256 with 2. Chosen md5-based so the
    # DuckDB oracle can compute the identical partition assignment in SQL.
    partition_hex_chars: int = 1

    # staging layout: sort the bootstrap by partition_id before the hive
    # write (≙ reference update_db.py:107's bootstrap sort). Unsorted, every
    # write task emits a file into every partition dir (blocks × partitions
    # files — at 256 partitions × 100 TB that is object-store-metadata
    # death); sorted blocks are partition-contiguous (~blocks/partitions
    # files per dir) at the cost of one full-data range shuffle. None =
    # auto: sort iff partition_hex_chars >= 2 (at 16 partitions the file
    # count is harmless and skipping the shuffle is measured faster).
    staging_sort: bool | None = None

    # staging layout engine for that one exchange. None = auto:
    # "compact" iff partition_hex_chars >= 2, else "plain"; honours
    # staging_sort when that (older) knob is set. "sort" = global
    # range-shuffle by partition_id (moves every html byte through
    # Ray's sort — its fixed coordination cost is the bootstrap's
    # Amdahl term at small core counts). "compact" = unsorted hive
    # write, then the X63 per-partition compaction inside the .build
    # dir (one independent Ray task per partition — no all-to-all, same
    # few-files-per-partition layout; measured on sfxl/hex2: bootstrap
    # T8 50.2 s → 32 s class, see BASELINE.md round-5 records).
    staging_layout: str | None = None  # None | "plain" | "sort" | "compact"

    # RFC 3986 §6.2.2 percent-encoding normalization in the canonicalizer.
    # Default OFF: the oracle-parity canonical form. Real crawl frontiers
    # turn this on so %7E-vs-~ duplicates dedup together.
    pct_normalize_urls: bool = False

    # politeness: max URLs fetched per host per round (budget), ordering
    # within a host is (warc_ts, url) ascending.
    politeness_budget: int = 3
    # optional crawl-horizon cap: schedule only the first N politeness
    # rounds per host (budget×N URLs). Applied as a pre-shuffle per-batch
    # top-k (stages/politeness.py) — the Zipf-host skew guard. None =
    # rank everything (refsim-golden default).
    politeness_max_rounds: int | None = None

    # URL-seen bloom filter: shard count and bits per shard. Hash-sharded by
    # url_hash % n_seen_shards; each shard is one Ray actor (≙ the reference's
    # single Postgres `seen` set at update_db.py:98-105, sharded for scale).
    n_seen_shards: int = 8
    seen_bits_per_shard: int = 1 << 23  # 1 MiB/shard; FP<1% at ~1M keys/shard
    seen_num_hashes: int = 7
    # "cuckoo" = near-exact membership (16-bit fingerprint, ~2^-13 FP; a
    # delete can evict a fingerprint-colliding other key) with delete
    # support for URL re-opens; "bloom" = append-only, no delete
    seen_filter_kind: str = "bloom"

    # crawl-wave width: partitions processed per streaming execution —
    # the unit of manifest-commit batching; the partition stays the unit of
    # lease/close. ≈ cluster width on a real cluster. One knob shared by
    # run_crawl, the CLI and bench.py.
    wave_size: int = 8

    # overlap wave N's GPU token leg with wave N+1's CPU/politeness
    # phases (one background thread, one wave in flight). The GPU leg
    # never touches the seen shards, and each wave's seen-snapshot is
    # captured BEFORE the next wave's cpu stage mutates them, so crash
    # semantics are unchanged (a wave closes only after its GPU sums
    # land; the committed snapshot always contains exactly the closed
    # waves' additions). Targets the measured core-count-invariant
    # ~per-wave launch floor (BASELINE.md hex2 decomposition).
    gpu_overlap: bool = True

    # lease / reap semantics (reference config.py:8, main.py:750)
    lease_timeout_s: int = 7200

    # ETA sliding window (reference config.py:11-12)
    eta_interval_s: int = 900
    eta_window: int = 10

    # two-stage CPU→GPU routing: partitions whose md5(store|seed|pid) first
    # hex char is in this set hit the "postgres" short-circuit (reference
    # main.py:413-415). Default ("0","1") ⇒ 2/16. Read by BOTH
    # frontier.upload_store and refsim.is_postgres — one knob, no drift.
    postgres_shortcircuit_hex: tuple = ("0", "1")

    # IO
    checkpoint_dir: str = field(default_factory=lambda: os.environ.get(
        "GRAFT_CKPT_DIR", "/tmp/graft_ckpt"))

    # stage sizing (single-node defaults; on a cluster scale with nodes).
    # 32k rows ≈ 16 MB/batch for slim frontier rows — large enough that the
    # per-batch seen-filter/counter RPCs amortize to microseconds/row.
    batch_size: int = 32768
    read_override_num_blocks: int | None = None


DEFAULT_CONFIG = PipelineConfig()
