"""Pipeline counter registry (≙ the reference's Redis scalar counters
``pairs``/``ml-pairs``/``nl-pairs``/``eta`` and the completion counts,
reference main.py:96-140, 813-818 — recomputed from the pipeline itself
instead of hardcoded, per SURVEY.md A6).

A single named actor accumulates ``{partition_id: {counter: n}}`` increments
from stages; the driver snapshots it into each partition manifest. Increments
are synchronous (the stage ray.gets the ack) so a partition's counters are
complete before its manifest commits — the atomicity requirement of
SURVEY.md §7 hard-part (b).
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
