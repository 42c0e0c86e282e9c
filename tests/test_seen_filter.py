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


def test_cuckoo_vectorized_insert_matches_scalar_loop():
    """The bulk no-kick insert path must return byte-identical novelty
    masks to the original sequential per-key loop — including in-batch
    (fp, bucket-orbit) collisions, cross-batch re-sees, and the
    bucket-overflow → i2 → kick fallback at high load."""
    import numpy as np

    from crawlingathome_server_ray.stages.seen_filter import CuckooFilter

    class ScalarCuckoo(CuckooFilter):
        def check_and_add(self, hashes):
            if len(hashes) == 0:
                return np.zeros(0, dtype=bool)
            uniq, first_idx = np.unique(hashes, return_index=True)
            fp = self._fp(uniq)
            i1 = self._i1(uniq)
            i2 = self._i2(i1, fp)
            out = np.zeros(len(hashes), dtype=bool)
            for k in range(len(uniq)):
                if not self._contains_one(int(i1[k]), int(i2[k]), int(fp[k])):
                    self._insert_one(int(i1[k]), int(i2[k]), int(fp[k]))
                    self.n_added += 1
                    out[first_idx[k]] = True
            return out

    rng = np.random.default_rng(7)
    # small bucket space at moderate load → dense buckets exercise the
    # overflow rounds; repeats within and across batches exercise re-sees
    a, b = CuckooFilter(1 << 10, 4), ScalarCuckoo(1 << 10, 4)
    for r in range(12):
        h = (rng.integers(0, 1 << 12, size=512, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
        ra, rb = a.check_and_add(h.copy()), b.check_and_add(h.copy())
        assert (ra == rb).all(), f"novelty mask mismatch at round {r}"
        assert a.n_added == b.n_added
    q = (rng.integers(0, 1 << 12, size=4096, dtype=np.uint64)
         * np.uint64(0x9E3779B97F4A7C15))
    ma = np.array([int(x) in a for x in q])
    mb = np.array([int(x) in b for x in q])
    assert (ma == mb).all()
