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
  for near-exact membership with deletions);
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
        return {"kind": "bloom", "m": self.m, "k": self.k,
                "n_added": self.n_added, "bits": self.bits.tobytes()}

    @classmethod
    def restore(cls, snap: dict) -> "BloomFilter":
        f = cls(snap["m"], snap["k"])
        f.bits = np.frombuffer(snap["bits"], dtype=np.uint8).copy()
        f.n_added = snap["n_added"]
        return f


class CuckooFilter:
    """Cuckoo filter shard (Fan et al. 2014): 4-slot buckets, 16-bit
    fingerprints, partial-key cuckoo hashing — supports DELETE, which the
    bloom variant cannot (needed when a crawl re-opens URLs, e.g. after a
    ``gpuInvalidDownload`` reset). Membership is NEAR-exact, not exact: a
    16-bit partial key gives ~2^-13 false positives, and a delete can evict
    a fingerprint-colliding other key's entry — operators must not rely on
    exactness for re-open semantics. ~μs/op python-loop inserts; the bloom
    shard remains the default for pure-append workloads."""

    MAX_KICKS = 500

    def __init__(self, n_buckets_pow2: int = 1 << 16, slots: int = 4):
        assert n_buckets_pow2 & (n_buckets_pow2 - 1) == 0
        self.nb = n_buckets_pow2
        self.slots = slots
        self.table = np.zeros((self.nb, slots), dtype=np.uint16)  # 0 = empty
        self.n_added = 0

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty marker

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.nb - 1)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            alt = _splitmix64(fp.astype(np.uint64))
        return ((i1.astype(np.uint64) ^ alt) & np.uint64(self.nb - 1)).astype(np.int64)

    def _contains_one(self, i1: int, i2: int, fp: int) -> bool:
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def _insert_one(self, i1: int, i2: int, fp: int) -> bool:
        rng_state = fp
        for idx in (i1, i2):
            row = self.table[idx]
            empties = np.flatnonzero(row == 0)
            if len(empties):
                row[empties[0]] = fp
                return True
        idx = i1
        for _ in range(self.MAX_KICKS):
            rng_state = (rng_state * 1103515245 + 12345) & 0x7FFFFFFF
            slot = rng_state % self.slots
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            alt = int(_splitmix64(np.array([fp], dtype=np.uint64))[0])
            idx = (idx ^ alt) & (self.nb - 1)
            row = self.table[idx]
            empties = np.flatnonzero(row == 0)
            if len(empties):
                row[empties[0]] = fp
                return True
        raise RuntimeError("cuckoo filter full — resize the shard")

    def _bulk_place(self, idxs: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Vectorized no-kick insert round: place each (bucket, fp) into
        the r-th free slot of its bucket, where r is the key's rank among
        this round's keys targeting the same bucket — every (bucket, slot)
        scatter target is unique by construction, so one fancy-index
        assignment is race-free. Returns the placed mask."""
        order = np.argsort(idxs, kind="stable")
        sidx = idxs[order]
        sfp = fps[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], sidx[1:] != sidx[:-1])))
        counts = np.diff(np.append(starts, len(sidx)))
        rank = np.arange(len(sidx)) - np.repeat(starts, counts)
        rows_empty = self.table[sidx] == 0              # gathered copies
        cum = np.cumsum(rows_empty, axis=1)
        want = rows_empty & (cum - 1 == rank[:, None])  # the rank-th empty
        has = want.any(axis=1)
        slot = np.argmax(want, axis=1)
        self.table[sidx[has], slot[has]] = sfp[has]
        placed = np.zeros(len(idxs), dtype=bool)
        placed[order] = has
        return placed

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Same contract as BloomFilter.check_and_add (first-occurrence-wins
        within the call).

        Vectorized: one gathered membership test against the pre-call
        table, an in-batch (fp, bucket-orbit) collision fold reproducing
        the sequential loop's verdicts exactly (two keys share visibility
        iff they share fp AND bucket pair — i2 = i1 ^ splitmix(fp), so the
        pair {i1, i2} is an orbit and min(i1, i2) canonicalizes it), then
        bulk no-kick placement into i1 / i2; only keys whose both buckets
        are full fall back to the per-key kick loop (rare below ~80%
        load). Was a ~μs/op per-key Python loop."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        uniq, first_idx = np.unique(hashes, return_index=True)
        fp = self._fp(uniq)
        i1 = self._i1(uniq)
        i2 = self._i2(i1, fp)
        # in-batch duplicate (fp, orbit) keys: only the first is novel —
        # identical to the sequential loop, where the second would find
        # the first's fingerprint already present in its bucket pair
        packed = (np.minimum(i1, i2).astype(np.uint64) << np.uint64(16)) \
            | fp.astype(np.uint64)
        _, rep_idx = np.unique(packed, return_index=True)
        rep = np.zeros(len(uniq), dtype=bool)
        rep[rep_idx] = True
        contained = ((self.table[i1] == fp[:, None]).any(axis=1)
                     | (self.table[i2] == fp[:, None]).any(axis=1))
        novel = rep & ~contained
        if novel.any():
            n1, f1 = i1[novel], fp[novel]
            placed = self._bulk_place(n1, f1)
            if not placed.all():
                n2 = i2[novel][~placed]
                placed2 = self._bulk_place(n2, f1[~placed])
                if not placed2.all():
                    # both buckets full — the genuine kick path, per key
                    for a, b, f in zip(i1[novel][~placed][~placed2],
                                       n2[~placed2], f1[~placed][~placed2]):
                        self._insert_one(int(a), int(b), int(f))
            self.n_added += int(novel.sum())
        out = np.zeros(len(hashes), dtype=bool)
        out[first_idx[novel]] = True
        return out

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove entries (returns deleted mask) — re-opens URLs for re-crawl."""
        fp = self._fp(hashes.astype(np.uint64))
        i1 = self._i1(hashes.astype(np.uint64))
        i2 = self._i2(i1, fp)
        out = np.zeros(len(hashes), dtype=bool)
        for k in range(len(hashes)):
            for idx in (int(i1[k]), int(i2[k])):
                row = self.table[idx]
                pos = np.flatnonzero(row == fp[k])
                if len(pos):
                    row[pos[0]] = 0
                    self.n_added -= 1
                    out[k] = True
                    break
        return out

    def __contains__(self, h: int) -> bool:
        arr = np.array([h], dtype=np.uint64)
        fp = self._fp(arr)
        i1 = self._i1(arr)
        i2 = self._i2(i1, fp)
        return self._contains_one(int(i1[0]), int(i2[0]), int(fp[0]))

    def snapshot(self) -> dict:
        return {"kind": "cuckoo", "nb": self.nb, "slots": self.slots,
                "n_added": self.n_added, "table": self.table.tobytes()}

    @classmethod
    def restore(cls, snap: dict) -> "CuckooFilter":
        f = cls(snap["nb"], snap["slots"])
        f.table = np.frombuffer(snap["table"], dtype=np.uint16).reshape(
            snap["nb"], snap["slots"]).copy()
        f.n_added = snap["n_added"]
        return f


@ray.remote(num_cpus=0)
class BloomShardActor:
    # num_cpus=0: the shard does sub-millisecond vectorized bit ops per RPC;
    # reserving CPU slots for 8+ shards would starve the map stages on small
    # nodes (observed deadlock at num_cpus=4 with leftover actors).
    """One seen-set shard (≙ one slice of the reference's global ``seen``
    set, update_db.py:98-105): bloom (default) or cuckoo (near-exact
    16-bit-fingerprint membership, supports delete for URL re-opens)."""

    def __init__(self, n_bits: int, n_hashes: int, kind: str = "bloom"):
        self.kind = kind
        if kind == "cuckoo":
            # size cuckoo capacity ≈ bloom bit budget / 16 bits per slot
            self.filter = CuckooFilter(max(1 << 10, n_bits // 64), 4)
        else:
            self.filter = BloomFilter(n_bits, n_hashes)

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.check_and_add(hashes)

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        if not isinstance(self.filter, CuckooFilter):
            raise NotImplementedError("delete requires the cuckoo variant")
        return self.filter.delete(hashes)

    def snapshot(self) -> dict:
        return self.filter.snapshot()

    def restore(self, snap: dict) -> None:
        cls = CuckooFilter if snap.get("kind") == "cuckoo" else BloomFilter
        self.filter = cls.restore(snap)

    def stats(self) -> dict:
        return {"n_added": self.filter.n_added, "kind": self.kind}


def make_shards(n_shards: int, n_bits: int, n_hashes: int,
                snapshots: list[dict] | None = None, kind: str = "bloom"):
    shards = [BloomShardActor.remote(n_bits, n_hashes, kind)
              for _ in range(n_shards)]
    if snapshots:
        # routing is url_hash % n_shards: restoring a snapshot taken under a
        # different shard count would silently misroute hashes (re-admitting
        # seen URLs / dropping new ones). Refuse rather than truncate.
        if len(snapshots) != n_shards:
            raise ValueError(
                f"seen-snapshot has {len(snapshots)} shards but config asks "
                f"for {n_shards}; n_seen_shards must not change across a "
                f"resume (delete the snapshot to rebuild the seen set)")
        snap_kind = snapshots[0].get("kind", "bloom")
        if snap_kind != kind:
            raise ValueError(
                f"seen-snapshot kind {snap_kind!r} != configured "
                f"seen_filter_kind {kind!r}; changing filter kind across a "
                f"resume is not supported")
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
