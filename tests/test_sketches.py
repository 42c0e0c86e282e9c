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


def test_quantile_sketch_rank_accuracy():
    from crawlingathome_server_ray.functions.sketches import QuantileSketch
    rng = np.random.default_rng(7)
    data = rng.lognormal(3, 1, 100_000)
    s = QuantileSketch(256)
    for chunk in np.array_split(data, 20):
        s.add(chunk)
    srt = np.sort(data)
    for q in (0.5, 0.9, 0.99):
        est = s.quantile(q)
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.02, (q, est, rank)


def test_quantile_sketch_merge_and_roundtrip():
    from crawlingathome_server_ray.functions.sketches import QuantileSketch
    rng = np.random.default_rng(11)
    data = rng.normal(100, 15, 50_000)
    parts = [QuantileSketch(256) for _ in range(8)]
    for p, chunk in zip(parts, np.array_split(data, 8)):
        p.add(chunk)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(QuantileSketch.deserialize(p.serialize()))
    srt = np.sort(data)
    for q in (0.5, 0.9, 0.99):
        rank = np.searchsorted(srt, merged.quantile(q)) / len(srt)
        assert abs(rank - q) < 0.02


def test_quantile_sketch_deterministic():
    from crawlingathome_server_ray.functions.sketches import QuantileSketch
    rng = np.random.default_rng(3)
    data = rng.exponential(5, 30_000)

    def build():
        s = QuantileSketch(128)
        for chunk in np.array_split(data, 10):
            s.add(chunk)
        return s

    assert build().quantile(0.9) == build().quantile(0.9)


def test_price_quantiles_sketch_vs_exact(ray_session):
    """The dataset-level sketch quantiles land within 2% rank of the exact
    DuckDB quantile_disc on lineitem prices."""
    import duckdb
    from crawlingathome_server_ray.pipelines.analytics import \
        q_price_quantiles_sketch
    SF = "/root/testdata/sf0.001"
    out = q_price_quantiles_sketch(SF).iloc[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    prices = np.sort(con.execute(
        "SELECT l_extendedprice FROM lineitem").df()["l_extendedprice"]
        .to_numpy())
    for q in (0.5, 0.9, 0.99):
        rank = np.searchsorted(prices, out[f"p{int(q*100)}"]) / len(prices)
        assert abs(rank - q) < 0.02, (q, rank)
