"""Output-layout maintenance: small-file compaction for the
hive-partitioned parquet trees every stage in this repo writes.

A resumable crawl accumulates many small part files per partition —
one per write task per wave (pipelines/frontier.py stage sinks, the
X47/X61 index generations, snapshot trees). Readers then pay one file
open + footer parse + row-group seek per fragment; at 10^5+ fragments
the scheduler bills more time to metadata than to bytes (the classic
small-files problem; Ray Data's read parallelism is per-file, so tiny
files also cap read concurrency at tiny blocks). Compaction rewrites
each partition directory into ceil(rows/target)-sized files.

Semantics (LSM minor compaction, same family as the X61 posting
merge):

- **per-partition, distributed**: one Ray task per partition directory
  (partitions are independent; the driver holds only the directory
  list), each task streams its fragments through
  ``pyarrow.parquet`` — the whole tree is never driver-resident.
- **atomic per partition**: new files build in a ``<dir>.compact_tmp``
  sibling; the swap is rename(dir → dir.old), rename(tmp → dir),
  delete(dir.old). A crash leaves either the original directory or a
  recoverable ``<dir>.old`` (``recover_partitions`` restores it), never
  a half-compacted mix — the checkpoint-manifest discipline
  (state/checkpoint.py) applied to data layout.
- **idempotent**: partitions already at ≤1 file (or under
  ``min_files``) are skipped; re-running is a no-op.

Reference analog: none — the reference stores state in Postgres rows;
file-layout hygiene is a capability the Parquet-native rebuild needs.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import ray

# Rows per output file. At ~1 KB/row web-page rows this is ~1 GB files —
# the standard object-store sweet spot (big enough that footer/seek cost
# vanishes, small enough to parallelize reads).
COMPACT_TARGET_ROWS = 1 << 20


def _partition_dirs(root: str) -> list[str]:
    """Every directory under ``root`` that directly holds parquet
    fragments (the hive leaves), root itself included."""
    return sorted({os.path.dirname(f) for f in glob.glob(
        os.path.join(root, "**", "*.parquet"), recursive=True)})


@ray.remote
def _compact_one(d: str, target_rows: int) -> tuple[int, int, int]:
    """Rewrite one partition directory; returns
    (files_before, files_after, rows)."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    tmp = d + ".compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    tag = uuid.uuid4().hex[:8]
    # stream fragments through a row-capped writer, COALESCING source
    # row groups to ~64k-row output groups: a partition assembled from
    # thousands of tiny fragments (the unsorted staging write's
    # blocks×partitions shape) would otherwise inherit thousands of
    # ~1k-row row groups, and every later scan pays per-row-group
    # overhead — measured as a 25.5 s → 40.1 s cpu-stage regression at
    # sfxl/hex2 before coalescing. Peak memory is one output row group,
    # never the whole partition.
    group_rows = min(target_rows, 1 << 16)
    writer = None
    n_out = 0
    rows = 0
    in_file = 0
    pending: list = []
    n_pending = 0

    def flush(schema) -> None:
        nonlocal writer, pending, n_pending, in_file
        if not pending:
            return
        import pyarrow as _pa
        t = _pa.concat_tables(pending).combine_chunks()
        pending, n_pending = [], 0
        if writer is None:
            writer = pq.ParquetWriter(
                os.path.join(tmp, f"compact-{tag}-{n_out}.parquet"), schema)
        writer.write_table(t, row_group_size=group_rows)
        in_file += t.num_rows

    try:
        schema = None
        for f in files:
            pf = pq.ParquetFile(f)
            schema = pf.schema_arrow
            for rg in range(pf.num_row_groups):
                t = pf.read_row_group(rg)
                rows += t.num_rows
                pending.append(t)
                n_pending += t.num_rows
                if n_pending >= group_rows:
                    flush(schema)
                if in_file >= target_rows:
                    writer.close()
                    writer = None
                    n_out += 1
                    in_file = 0
        flush(schema)
    finally:
        if writer is not None:
            writer.close()
            n_out += 1
    # atomic swap; a crash leaves dir OR dir.old+dir (recoverable)
    old = d + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(d, old)
    os.rename(tmp, d)
    shutil.rmtree(old)
    return len(files), n_out, rows


def compact_partitions(root: str,
                       target_rows: int = COMPACT_TARGET_ROWS,
                       min_files: int = 2) -> dict:
    """Compact every partition directory under ``root`` holding
    ≥ ``min_files`` parquet fragments. Returns summary stats."""
    stats = {"partitions_seen": 0, "partitions_compacted": 0,
             "files_before": 0, "files_after": 0, "rows_rewritten": 0}
    todo = []
    for d in _partition_dirs(root):
        files = glob.glob(os.path.join(d, "*.parquet"))
        stats["partitions_seen"] += 1
        if len(files) < min_files:
            stats["files_before"] += len(files)
            stats["files_after"] += len(files)
            continue
        todo.append(d)
    for before, after, rows in ray.get(
            [_compact_one.remote(d, target_rows) for d in todo]):
        stats["partitions_compacted"] += 1
        stats["files_before"] += before
        stats["files_after"] += after
        stats["rows_rewritten"] += rows
    return stats


def recover_partitions(root: str) -> list[str]:
    """Crash recovery: restore any partition whose compaction swap was
    interrupted. Rules (matching _compact_one's rename order): a
    ``<dir>.old`` with ``<dir>`` present means the swap completed —
    drop the old copy; a ``<dir>.old`` without ``<dir>`` means the
    crash hit between the two renames — restore the original. Stray
    ``.compact_tmp`` trees are always deleted (never published)."""
    fixed = []
    for tmp in glob.glob(os.path.join(root, "**", "*.compact_tmp"),
                         recursive=True):
        shutil.rmtree(tmp, ignore_errors=True)
        fixed.append(tmp)
    for old in glob.glob(os.path.join(root, "**", "*.old"),
                         recursive=True):
        d = old[:-len(".old")]
        if os.path.exists(d):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, d)
        fixed.append(old)
    return fixed
