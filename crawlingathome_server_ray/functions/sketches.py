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


def hll_distinct(ds, column: str, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT column) over a Dataset: one sketch per
    batch → driver merge. ~0.8% relative error at p=14 (16 KB sketches)."""
    import pandas as pd
    import pyarrow as pa

    def sketch_batch(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(column))
        hashes = pd.util.hash_array(vals).astype(np.uint64)
        h = HyperLogLog(p)
        h.add_hashes(hashes)
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    total = HyperLogLog(p)
    for b in ds.map_batches(sketch_batch, batch_format="pyarrow",
                            batch_size=65536).iter_batches(
            batch_format="pyarrow", batch_size=1024):
        for s in b.column("sketch").to_pylist():
            total.merge(HyperLogLog.deserialize(s))
    return total.estimate()
