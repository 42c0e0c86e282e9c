"""Small-file compaction (pipelines/maintenance.py, SURVEY X63):
content preservation, file-count reduction, idempotence, crash
recovery."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from crawlingathome_server_ray.pipelines.maintenance import (
    compact_partitions, recover_partitions)


def _scatter(root: str, parts: int = 3, files: int = 8,
             rows: int = 100) -> dict[int, set]:
    want = {}
    for p in range(parts):
        d = os.path.join(root, f"bucket={p}")
        os.makedirs(d)
        vals = set()
        for f in range(files):
            lo = (p * files + f) * rows
            col = list(range(lo, lo + rows))
            pq.write_table(
                pa.table({"v": pa.array(col, pa.int64()),
                          "s": pa.array([str(x) for x in col])}),
                os.path.join(d, f"part-{f}.parquet"))
            vals |= set(col)
        want[p] = vals
    return want


def _read_all(root: str) -> dict[int, set]:
    out = {}
    for d in sorted(glob.glob(os.path.join(root, "bucket=*"))):
        p = int(d.rsplit("=", 1)[1])
        vals = set()
        for f in glob.glob(os.path.join(d, "*.parquet")):
            t = pq.read_table(f)
            vals |= set(t.column("v").to_pylist())
            assert t.column("s").to_pylist() == \
                [str(x) for x in t.column("v").to_pylist()]
        out[p] = vals
    return out


def test_compact_preserves_content_and_reduces_files(ray_session, tmp_path):
    root = str(tmp_path / "tree")
    want = _scatter(root)
    before = len(glob.glob(os.path.join(root, "**", "*.parquet"),
                           recursive=True))
    stats = compact_partitions(root, target_rows=1 << 20)
    after = len(glob.glob(os.path.join(root, "**", "*.parquet"),
                          recursive=True))
    assert _read_all(root) == want
    assert stats["partitions_compacted"] == 3
    assert before == 24 and after == 3
    assert stats["files_before"] == 24 and stats["files_after"] == 3
    assert not glob.glob(os.path.join(root, "**", "*.old"),
                         recursive=True)


def test_compact_target_rows_splits_output(ray_session, tmp_path):
    root = str(tmp_path / "tree")
    want = _scatter(root, parts=1, files=6, rows=100)
    compact_partitions(root, target_rows=250)
    files = glob.glob(os.path.join(root, "bucket=0", "*.parquet"))
    # 600 rows at ≥250/file → writer closes after crossing the cap
    assert 2 <= len(files) <= 3
    assert _read_all(root) == want


def test_compact_idempotent_and_skips_single_file(ray_session, tmp_path):
    root = str(tmp_path / "tree")
    want = _scatter(root)
    compact_partitions(root)
    stats2 = compact_partitions(root)
    assert stats2["partitions_compacted"] == 0
    assert stats2["files_before"] == stats2["files_after"] == 3
    assert _read_all(root) == want


def test_recover_restores_interrupted_swap(ray_session, tmp_path):
    root = str(tmp_path / "tree")
    want = _scatter(root, parts=2)
    d = os.path.join(root, "bucket=0")
    # crash between rename(dir→old) and rename(tmp→dir): dir missing
    os.rename(d, d + ".old")
    os.makedirs(d + ".compact_tmp")
    # crash after the full swap but before rmtree(old): both present
    d1 = os.path.join(root, "bucket=1")
    shutil.copytree(d1, d1 + ".old")
    fixed = recover_partitions(root)
    assert len(fixed) == 3
    assert _read_all(root) == want
    assert not glob.glob(os.path.join(root, "**", "*.old"),
                         recursive=True)
    assert not glob.glob(os.path.join(root, "**", "*.compact_tmp"),
                         recursive=True)
