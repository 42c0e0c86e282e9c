"""HLL sketch: accuracy bound, merge associativity, serialization."""

import numpy as np
import pandas as pd

from crawlingathome_server_ray.functions.sketches import HyperLogLog, hll_distinct


def _hashes(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=n).astype(np.uint64)


def test_hll_accuracy():
    for n in (1_000, 50_000, 500_000):
        h = HyperLogLog(14)
        h.add_hashes(_hashes(n, 1))
        err = abs(h.estimate() - n) / n
        assert err < 0.03, f"n={n}: rel err {err:.4f}"


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    ha, hb = _hashes(10_000, 2), _hashes(10_000, 3)
    a.add_hashes(ha)
    b.add_hashes(hb)
    u = HyperLogLog(12)
    u.add_hashes(np.concatenate([ha, hb]))
    merged = a.merge(b)
    assert (merged.registers == u.registers).all()


def test_hll_serialize_roundtrip():
    h = HyperLogLog(10)
    h.add_hashes(_hashes(5_000, 4))
    g = HyperLogLog.deserialize(h.serialize())
    assert g.estimate() == h.estimate()


def test_hll_distinct_on_dataset(ray_session):
    import ray.data
    vals = [f"u{i % 7000}" for i in range(30_000)]
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals}))
    est = hll_distinct(ds, "x")
    assert abs(est - 7000) / 7000 < 0.03


def test_hll_tree_merge_identical_to_flat(ray_session):
    """Forcing many per-batch sketches through the distributed merge level
    must give the bit-identical estimate (register max is associative)."""
    import ray.data
    vals = [f"u{i % 7000}" for i in range(30_000)]
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals}))
    flat = hll_distinct(ds, "x")                       # few sketches
    tree = hll_distinct(ds, "x", sketch_batch_size=512, merge_fanout=8)
    assert tree == flat


def test_mg_tree_merge_same_exact_result(ray_session):
    """heavy_hitters_exact is exact under any merge tree: forcing many
    sketches + small fanout must give identical (key, n) rows."""
    import ray.data
    from crawlingathome_server_ray.functions.sketches import heavy_hitters_exact
    vals = (["hot"] * 4000 + ["warm"] * 1500
            + [f"cold{i}" for i in range(10_000)])
    ds = ray.data.from_pandas(pd.DataFrame({"h": vals}))
    a = heavy_hitters_exact(ds, "h", phi=0.05)
    b = heavy_hitters_exact(ds, "h", phi=0.05,
                            sketch_batch_size=256, merge_fanout=4)
    assert a.equals(b)
    assert set(a["h"]) == {"hot", "warm"}
