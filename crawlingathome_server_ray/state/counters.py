"""Pipeline counter registry (≙ the reference's Redis scalar counters
``pairs``/``ml-pairs``/``nl-pairs``/``eta`` and the completion counts,
reference main.py:96-140, 813-818 — recomputed from the pipeline itself
instead of hardcoded, per SURVEY.md A6).

Counters are **sharded by partition_id** across ``n`` actors so no single
actor serializes every batch of the cluster: a batch's updates split by
``pid % n`` and the per-shard RPCs run in parallel, so the per-batch
latency stays one RTT while the throughput scales with shards.

NOTE (round 3): the flagship crawl no longer uses these actors — its
counters are DERIVED from data per wave (staging parquet footers + one
count pass over the materialized wave, pipelines/frontier.py
``_wave_counters``), which removed the per-batch RPC from the hot path
and made counters exactly-once by construction. This module remains the
general-purpose counter registry for stages whose counts cannot be
recomputed from outputs (e.g. a true streaming consumer), and is
routing/merge-tested in tests/test_checkpoint.py.
"""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0)
class CounterActor:
    def __init__(self):
        self._c: dict[int, dict[str, int]] = defaultdict(lambda: defaultdict(int))

    def incr(self, partition_id: int, counts: dict[str, int]) -> None:
        slot = self._c[partition_id]
        for k, v in counts.items():
            slot[k] += int(v)

    def incr_many(self, by_partition: dict[int, dict[str, int]]) -> None:
        """One RPC per batch covering all partitions it touched."""
        for pid, counts in by_partition.items():
            self.incr(pid, counts)

    def snapshot(self, partition_id: int | None = None) -> dict:
        if partition_id is not None:
            return dict(self._c.get(partition_id, {}))
        return {p: dict(v) for p, v in self._c.items()}

    def totals(self) -> dict[str, int]:
        out: dict[str, int] = defaultdict(int)
        for v in self._c.values():
            for k, n in v.items():
                out[k] += n
        return dict(out)

    def reset(self, partition_id: int) -> None:
        self._c.pop(partition_id, None)


class CounterShards:
    """Driver/stage-side facade over ``n`` CounterActor shards, routed by
    ``partition_id % n``. Serializes into map_batches closures (it holds
    only actor handles)."""

    def __init__(self, n_shards: int = 4):
        self.n = max(1, int(n_shards))
        self.shards = [CounterActor.remote() for _ in range(self.n)]

    def incr_many(self, by_partition: dict[int, dict[str, int]]) -> None:
        """One parallel RPC per touched shard; returns when all acked."""
        groups: dict[int, dict[int, dict[str, int]]] = {}
        for pid, counts in by_partition.items():
            groups.setdefault(pid % self.n, {})[pid] = counts
        ray.get([self.shards[s].incr_many.remote(g)
                 for s, g in groups.items()])

    def snapshot(self, partition_id: int) -> dict:
        return ray.get(
            self.shards[partition_id % self.n].snapshot.remote(partition_id))

    def totals(self) -> dict[str, int]:
        out: dict[str, int] = defaultdict(int)
        for t in ray.get([s.totals.remote() for s in self.shards]):
            for k, n in t.items():
                out[k] += n
        return dict(out)

    def kill(self) -> None:
        for a in self.shards:
            ray.kill(a)
