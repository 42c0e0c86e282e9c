"""Sharded bloom URL-seen filter (rebuild-new T2, SURVEY.md §2.3).

The reference dedups its frontier once, in-memory, on shard ``number``
(reference update_db.py:98-105 ``if job.number in seen: continue``). The
north_rule upgrades this to a *streaming* seen-set over canonicalized URL
hashes: ``n_shards`` bloom-filter shards, each owned by one Ray actor, keyed
by ``url_hash % n_shards`` — the shared-mutable-index case where raw actors
are warranted (the Dataset API cannot express cross-batch mutable state).

Dataflow: a stateless ``map_batches`` stage splits each batch's hashes by
shard, issues one ``check_and_add`` RPC per touched shard (vectorized numpy
on both sides), and filters the batch by the returned is-new mask.

Guarantees:
- no false negatives (a seen URL is never re-admitted);
- false-positive rate bounded by the classic bloom bound — with the default
  2^23 bits / 7 hashes a shard holds ~500k keys under 1% FP; size shards to
  the frontier (at 10^10 URLs: more shards on more nodes, or cuckoo shards
  for exactness with deletions);
- first-occurrence-wins *within* a single RPC too (within-batch duplicates
  are resolved by first index);
- shards snapshot/restore as bytes for atomic checkpointing together with
  partition manifests (SURVEY.md §7 hard-part b).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (full avalanche per probe; plain
    double hashing clusters badly in a power-of-two table)."""
    z = x + _GOLDEN
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_indices(hashes: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit indices; probe i = splitmix64(h + i*GOLDEN) % m."""
    h = hashes.astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        mixed = _splitmix64(h[:, None] + i * _GOLDEN)
    return (mixed % np.uint64(m)).astype(np.int64)


class BloomFilter:
    """Single bloom shard; pure numpy, snapshot-able."""

    def __init__(self, n_bits: int, n_hashes: int):
        self.m = int(n_bits)
        self.k = int(n_hashes)
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)
        self.n_added = 0

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Returns is_new mask; adds all. First occurrence of a duplicate
        within ``hashes`` is new, later ones are not."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        uniq, first_idx = np.unique(hashes, return_index=True)
        idx = _bloom_indices(uniq, self.k, self.m)
        byte, bit = idx >> 3, (idx & 7).astype(np.uint8)
        present = (self.bits[byte] >> bit) & 1
        uniq_new = ~(present.all(axis=1).astype(bool))
        flat_b, flat_bit = byte.ravel(), bit.ravel()
        np.bitwise_or.at(self.bits, flat_b, np.uint8(1) << flat_bit)
        self.n_added += int(uniq_new.sum())
        out = np.zeros(len(hashes), dtype=bool)
        out[first_idx[uniq_new]] = True
        return out

    def __contains__(self, h: int) -> bool:
        idx = _bloom_indices(np.array([h], dtype=np.uint64), self.k, self.m)[0]
        return bool(((self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).all())

    def snapshot(self) -> dict:
        return {"m": self.m, "k": self.k, "n_added": self.n_added,
                "bits": self.bits.tobytes()}

    @classmethod
    def restore(cls, snap: dict) -> "BloomFilter":
        f = cls(snap["m"], snap["k"])
        f.bits = np.frombuffer(snap["bits"], dtype=np.uint8).copy()
        f.n_added = snap["n_added"]
        return f


@ray.remote(num_cpus=0)
class BloomShardActor:
    # num_cpus=0: the shard does sub-millisecond vectorized bit ops per RPC;
    # reserving CPU slots for 8+ shards would starve the map stages on small
    # nodes (observed deadlock at num_cpus=4 with leftover actors).
    """One bloom shard (≙ one slice of the reference's global ``seen`` set)."""

    def __init__(self, n_bits: int, n_hashes: int):
        self.filter = BloomFilter(n_bits, n_hashes)

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.check_and_add(hashes)

    def snapshot(self) -> dict:
        return self.filter.snapshot()

    def restore(self, snap: dict) -> None:
        self.filter = BloomFilter.restore(snap)

    def stats(self) -> dict:
        return {"n_added": self.filter.n_added, "m": self.filter.m}


def make_shards(n_shards: int, n_bits: int, n_hashes: int,
                snapshots: list[dict] | None = None):
    shards = [BloomShardActor.remote(n_bits, n_hashes) for _ in range(n_shards)]
    if snapshots:
        ray.get([s.restore.remote(snap) for s, snap in zip(shards, snapshots)])
    return shards


def snapshot_shards(shards) -> list[dict]:
    return ray.get([s.snapshot.remote() for s in shards])


class SeenFilter:
    """map_batches stage: drop rows whose ``url_hash`` was already seen.

    Stateless per batch; routes hash slices to the owning shard actors. One
    RPC per (batch, touched shard) — with n_shards ≈ 8-64 and batches of
    8k+ rows the RPC amortizes to microseconds/row.
    """

    def __init__(self, shards: list):
        self.shards = shards
        self.n = len(shards)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = np.asarray(batch.column("url_hash")).astype(np.uint64)
        shard_of = (hashes % np.uint64(self.n)).astype(np.int64)
        is_new = np.zeros(len(hashes), dtype=bool)
        futures, slots = [], []
        for s in np.unique(shard_of):
            sel = np.flatnonzero(shard_of == s)
            futures.append(self.shards[s].check_and_add.remote(hashes[sel]))
            slots.append(sel)
        for sel, res in zip(slots, ray.get(futures)):
            is_new[sel] = res
        return batch.filter(pa.array(is_new))
