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


def test_indices_deterministic():
    h = np.array([123456789], dtype=np.uint64)
    a = _bloom_indices(h, 7, 1 << 20)
    b = _bloom_indices(h, 7, 1 << 20)
    assert (a == b).all()
    assert (a >= 0).all() and (a < (1 << 20)).all()
