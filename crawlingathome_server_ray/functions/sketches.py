"""Mergeable sketches for approximate aggregates at scale.

HyperLogLog distinct counting: the per-batch map emits one serialized
sketch (the classic partial-aggregate pattern — sketches are designed to
merge), a tiny final combine unions them. At 10^10 rows this replaces an
exact COUNT(DISTINCT) shuffle with ~few-KB messages per block.

Standard HLL (Flajolet et al. 2007) with the small-range linear-counting
correction; register hash = splitmix64 (shared with the bloom filter).
"""

from __future__ import annotations

import numpy as np

from ..stages.seen_filter import _splitmix64


class HyperLogLog:
    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            h = _splitmix64(h)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of rest + 1, vectorized via float64 exponent
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v = np.where(mask, v << np.uint64(shift), v)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, b: bytes) -> "HyperLogLog":
        h = cls(b[0])
        h.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return h


def hll_distinct(ds, column: str, p: int = 14,
                 sketch_batch_size: int = 65536,
                 merge_fanout: int = 64) -> float:
    """Approximate COUNT(DISTINCT column) over a Dataset: one sketch per
    batch → one distributed tree-reduce merge level (``merge_fanout``
    sketches per task) → driver merge of the few survivors. ~0.8% relative
    error at p=14 (16 KB sketches). The tree level bounds driver work: at
    10^10 rows the driver merges ~150k/fanout ≈ 2.4k sketches instead of
    150k (and a second level could be chained if ever needed). Register
    merge is max() — associative and order-invariant — so the tree-merged
    estimate is bit-identical to a flat merge (tested)."""
    import pandas as pd
    import pyarrow as pa

    def sketch_batch(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(column))
        hashes = pd.util.hash_array(vals).astype(np.uint64)
        h = HyperLogLog(p)
        h.add_hashes(hashes)
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    def merge_level(batch: pa.Table) -> pa.Table:
        acc = None
        for s in batch.column("sketch").to_pylist():
            h = HyperLogLog.deserialize(s)
            acc = h if acc is None else acc.merge(h)
        return pa.table({"sketch": pa.array([acc.serialize()], pa.binary())})

    total = HyperLogLog(p)
    reduced = (ds.map_batches(sketch_batch, batch_format="pyarrow",
                              batch_size=sketch_batch_size)
               .map_batches(merge_level, batch_format="pyarrow",
                            batch_size=merge_fanout))
    for b in reduced.iter_batches(batch_format="pyarrow", batch_size=1024):
        for s in b.column("sketch").to_pylist():
            total.merge(HyperLogLog.deserialize(s))
    return total.estimate()


class MisraGries:
    """Mergeable Misra-Gries heavy-hitters sketch (Misra & Gries 1982;
    mergeability per Agarwal et al. 2013): with capacity k, the estimated
    count of any key is within n/(k+1) of the true count, so every key
    with true frequency > n/(k+1) is guaranteed to survive — the sketch
    finds CANDIDATES with no false negatives, and an exact counting pass
    over just those candidates makes the final answer exact."""

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.counts: dict = {}

    def add_values(self, values: np.ndarray) -> None:
        """Batch update: pre-aggregate the batch (vectorized value_counts)
        then merge — equivalent to item-at-a-time MG with the same bound."""
        import pandas as pd
        vc = pd.Series(values).value_counts()
        for key, n in vc.items():
            self.counts[key] = self.counts.get(key, 0) + int(n)
        self._shrink()

    def merge(self, other: "MisraGries") -> "MisraGries":
        for key, n in other.counts.items():
            self.counts[key] = self.counts.get(key, 0) + int(n)
        self._shrink()
        return self

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = np.sort(np.fromiter(self.counts.values(), dtype=np.int64))
        dec = int(vals[-(self.k + 1)])  # (k+1)-th largest
        self.counts = {key: n - dec for key, n in self.counts.items()
                       if n > dec}

    def candidates(self) -> list:
        return sorted(self.counts, key=lambda key: (-self.counts[key], key))

    def serialize(self) -> bytes:
        import pickle
        return pickle.dumps((self.k, self.counts))

    @classmethod
    def deserialize(cls, b: bytes) -> "MisraGries":
        import pickle
        k, counts = pickle.loads(b)
        mg = cls(k)
        mg.counts = counts
        return mg


def heavy_hitters_exact(ds, column: str, phi: float, k: int = 256,
                        sketch_batch_size: int = 65536,
                        merge_fanout: int = 64):
    """EXACT keys with frequency > phi·n, computed without a full groupby:
    (1) one MG sketch per batch → one distributed tree-reduce merge level
    (``merge_fanout`` sketches per task; MG merging preserves the
    no-false-negative bound under ANY merge tree, Agarwal et al. 2013) →
    driver merge of the few survivors; (2) exact counts for the ≤k
    candidate keys via a broadcast is_in filter + per-batch partial counts
    (the shuffle carries ≤ k rows per block); (3) threshold on the exact
    counts. Returns a pandas DataFrame (key, n) — exactly the SQL
    ``GROUP BY key HAVING count(*) > phi*n`` result, regardless of merge
    order (the counting pass makes it exact)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    assert k + 1 > 1.0 / phi, "MG capacity too small for phi (false negatives)"

    def sketch_batch(batch: pa.Table) -> pa.Table:
        mg = MisraGries(k)
        mg.add_values(np.asarray(batch.column(column)))
        return pa.table({"sketch": pa.array([mg.serialize()], pa.binary()),
                         "n_rows": pa.array([batch.num_rows], pa.int64())})

    def merge_level(batch: pa.Table) -> pa.Table:
        acc = None
        for s in batch.column("sketch").to_pylist():
            mg = MisraGries.deserialize(s)
            acc = mg if acc is None else acc.merge(mg)
        n = int(pc.sum(batch.column("n_rows")).as_py() or 0)
        return pa.table({"sketch": pa.array([acc.serialize()], pa.binary()),
                         "n_rows": pa.array([n], pa.int64())})

    total = MisraGries(k)
    n_total = 0
    reduced = (ds.map_batches(sketch_batch, batch_format="pyarrow",
                              batch_size=sketch_batch_size)
               .map_batches(merge_level, batch_format="pyarrow",
                            batch_size=merge_fanout))
    for b in reduced.iter_batches(batch_format="pyarrow", batch_size=1024):
        n_total += int(pc.sum(b.column("n_rows")).as_py() or 0)
        for s in b.column("sketch").to_pylist():
            total.merge(MisraGries.deserialize(s))
    cand = total.candidates()
    if not cand or n_total == 0:
        return pd.DataFrame({column: pd.array([], dtype="object"),
                             "n_urls": pd.array([], dtype="int64")})
    cand_ref = ray.put(pa.array(cand))

    def count_cand(batch: pa.Table) -> pa.Table:
        keys = ray.get(cand_ref)
        col = batch.column(column)
        hit = batch.filter(pc.is_in(col, value_set=keys))
        vc = pd.Series(np.asarray(hit.column(column))).value_counts()
        return pa.table({column: pa.array(vc.index.to_numpy(dtype=object),
                                          pa.string()),
                         "n_urls": pa.array(vc.to_numpy(), pa.int64())})

    partials = ds.map_batches(count_cand, batch_format="pyarrow",
                              batch_size=65536).to_pandas()
    exact = (partials.groupby(column, sort=False)["n_urls"].sum()
             .reset_index())
    out = exact[exact["n_urls"] > phi * n_total]
    return (out.sort_values(["n_urls", column], ascending=[False, True])
            .reset_index(drop=True).astype({"n_urls": "int64"}))


class QuantileSketch:
    """Mergeable KLL-style quantile sketch (Karnin, Lang & Liberty 2016)
    with DETERMINISTIC compaction: level i holds ≤ k sorted values of
    weight 2^i; an overflowing level sorts and promotes every second
    element (fixed odd offset) to level i+1. KLL randomizes the offset to
    unbias the estimate; the deterministic variant trades a small
    systematic rank bias (still O(levels/k) relative rank error) for
    bit-reproducible pipelines — the right trade here, where the driver
    re-runs jobs and compares results. Merging concatenates levels
    pairwise then re-compacts, so per-batch sketches tree-reduce exactly
    like the HLL/MG sketches above."""

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, buf in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i] = np.concatenate([self.levels[i], buf])
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                buf = np.sort(self.levels[i])
                promoted = buf[1::2]  # deterministic odd-offset selection
                self.levels[i] = np.empty(0, dtype=np.float64)
                if len(self.levels) == i + 1:
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], promoted])
            i += 1

    def quantile(self, q: float) -> float:
        """Discrete quantile by weighted rank — the element whose
        cumulative weight first reaches ceil(q·W) (DuckDB's
        quantile_disc rule applied to the weighted summary)."""
        vals = np.concatenate(self.levels)
        if len(vals) == 0:
            return float("nan")
        wts = np.concatenate([
            np.full(len(buf), 1 << i, dtype=np.int64)
            for i, buf in enumerate(self.levels)])
        order = np.argsort(vals, kind="mergesort")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        rank = max(1, int(np.ceil(q * cum[-1])))
        return float(vals[np.searchsorted(cum, rank)])

    def serialize(self) -> bytes:
        import pickle
        return pickle.dumps((self.k, [buf.tobytes() for buf in self.levels]))

    @classmethod
    def deserialize(cls, b: bytes) -> "QuantileSketch":
        import pickle
        k, bufs = pickle.loads(b)
        s = cls(k)
        s.levels = [np.frombuffer(raw, dtype=np.float64).copy()
                    for raw in bufs]
        return s


def quantiles_sketched(ds, column: str, qs: tuple = (0.5, 0.9, 0.99),
                       k: int = 256, sketch_batch_size: int = 65536,
                       merge_fanout: int = 64) -> dict:
    """Approximate quantiles of an UNBOUNDED/continuous column via
    mergeable sketches — the scale path complementing the exact
    value-count-histogram quantiles (docs_queries.q_doc_length_quantiles),
    which require a bounded discrete domain. Same topology as
    hll_distinct: one sketch per batch → distributed tree-reduce merge
    level → driver merge of the few survivors; at 10^10 rows the shuffle
    carries KB-size summaries, never the values."""
    import pyarrow as pa

    def sketch_batch(batch: pa.Table) -> pa.Table:
        s = QuantileSketch(k)
        s.add(np.asarray(batch.column(column), dtype=np.float64))
        return pa.table({"sketch": pa.array([s.serialize()], pa.binary())})

    def merge_level(batch: pa.Table) -> pa.Table:
        acc = None
        for raw in batch.column("sketch").to_pylist():
            s = QuantileSketch.deserialize(raw)
            acc = s if acc is None else acc.merge(s)
        return pa.table({"sketch": pa.array([acc.serialize()], pa.binary())})

    total = QuantileSketch(k)
    reduced = (ds.map_batches(sketch_batch, batch_format="pyarrow",
                              batch_size=sketch_batch_size)
               .map_batches(merge_level, batch_format="pyarrow",
                            batch_size=merge_fanout))
    for b in reduced.iter_batches(batch_format="pyarrow", batch_size=1024):
        for raw in b.column("sketch").to_pylist():
            total.merge(QuantileSketch.deserialize(raw))
    return {f"p{int(q * 100)}": total.quantile(q) for q in qs}
