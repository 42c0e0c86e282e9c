"""Bloom seen-filter unit tests (SURVEY.md §5.1)."""

import numpy as np

from crawlingathome_server_ray.stages.seen_filter import BloomFilter, _bloom_indices


def test_no_false_negatives():
    f = BloomFilter(1 << 20, 7)
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**63, size=20_000).astype(np.uint64)
    f.check_and_add(keys)
    again = f.check_and_add(keys)
    assert not again.any(), "a previously-added key was reported new"


def test_first_occurrence_wins_within_batch():
    f = BloomFilter(1 << 16, 5)
    keys = np.array([5, 7, 5, 9, 7, 5], dtype=np.uint64)
    is_new = f.check_and_add(keys)
    assert is_new.tolist() == [True, True, False, True, False, False]


def test_false_positive_rate_bound():
    m, k, n = 1 << 20, 7, 50_000
    f = BloomFilter(m, k)
    rng = np.random.default_rng(1)
    f.check_and_add(rng.integers(0, 2**63, size=n).astype(np.uint64))
    probe = (rng.integers(0, 2**63, size=50_000).astype(np.uint64)
             + np.uint64(2**63))
    fp = (~f.check_and_add(probe)).sum() / len(probe)
    # theoretical ~ (1 - e^(-kn/m))^k ≈ 0.55% at this load; allow 3x slack
    assert fp < 0.02, f"false-positive rate {fp:.4f} above bound"


def test_snapshot_roundtrip():
    f = BloomFilter(1 << 16, 5)
    keys = np.arange(1000, dtype=np.uint64) * 2654435761
    f.check_and_add(keys)
    g = BloomFilter.restore(f.snapshot())
    assert not g.check_and_add(keys).any()
    assert g.n_added == f.n_added


def test_cuckoo_no_false_negatives_and_delete():
    from crawlingathome_server_ray.stages.seen_filter import CuckooFilter
    f = CuckooFilter(1 << 14, 4)
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**63, size=20_000).astype(np.uint64)
    first = f.check_and_add(keys)
    assert first.sum() == len(np.unique(keys))
    assert not f.check_and_add(keys).any()
    # delete re-opens
    victims = np.unique(keys)[:500]
    deleted = f.delete(victims)
    assert deleted.all()
    again = f.check_and_add(victims)
    assert again.all(), "deleted keys must be re-addable as new"


def test_cuckoo_first_occurrence_and_snapshot():
    from crawlingathome_server_ray.stages.seen_filter import CuckooFilter
    f = CuckooFilter(1 << 10, 4)
    keys = np.array([5, 7, 5, 9, 7, 5], dtype=np.uint64)
    assert f.check_and_add(keys).tolist() == [True, True, False, True, False, False]
    g = CuckooFilter.restore(f.snapshot())
    assert not g.check_and_add(np.array([5, 7, 9], dtype=np.uint64)).any()
    assert 5 in g and 12345 not in g


def test_crawl_with_cuckoo_filter(ray_session):
    """Flagship produces identical counters with the cuckoo variant."""
    import shutil
    from conftest import SF
    from crawlingathome_server_ray.config import PipelineConfig
    from crawlingathome_server_ray.pipelines.frontier import run_crawl
    from crawlingathome_server_ray.state.checkpoint import Manifest
    a = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_cuckoo",
                       seen_filter_kind="cuckoo")
    shutil.rmtree(a.checkpoint_dir, ignore_errors=True)
    sa = run_crawl(SF, a, resume=False, stop_after=4)
    b = PipelineConfig(checkpoint_dir="/tmp/graft_ckpt_bloomref")
    shutil.rmtree(b.checkpoint_dir, ignore_errors=True)
    sb = run_crawl(SF, b, resume=False, stop_after=4)
    assert Manifest(sa["out_root"]).totals() == Manifest(sb["out_root"]).totals()


def test_indices_deterministic():
    h = np.array([123456789], dtype=np.uint64)
    a = _bloom_indices(h, 7, 1 << 20)
    b = _bloom_indices(h, 7, 1 << 20)
    assert (a == b).all()
    assert (a >= 0).all() and (a < (1 << 20)).all()
