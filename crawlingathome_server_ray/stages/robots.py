"""Robots.txt gating stage (rebuild-new T3, SURVEY.md §2.3; north_rule).

The reference has no robots handling (volunteer workers fetched raw WAT
shards); the north_rule adds robots gating as a *cached actor-pool stage*.
With no network in the sandbox, rules are derived deterministically from
``md5(host)`` — and deliberately so in a way DuckDB can reproduce:

    disallow_all     ⇔ substr(md5(host), 1, 2) <= '05'        (≈2.3% of hosts)
    disallow /private ⇔ substr(md5(host), 3, 1) IN ('a', 'b')  (≈12.5%)

Used as ``ds.map_batches(RobotsGate, concurrency=N, batch_format="pyarrow")``:
the per-actor ``__init__`` builds the LRU rule cache once (≙ a real
deployment fetching + caching robots.txt per host), ``__call__`` is
vectorized over the batch's *unique* hosts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ROBOTS_PREFIX = "/private/"
_AUTH_RE = "^[^:]+://[^/?#]*"


def rule_for_host(host: str) -> tuple[bool, str]:
    """(disallow_all, disallow_prefix) — scalar reference impl (refsim/tests)."""
    h = hashlib.md5(host.encode()).hexdigest()
    if h[:2] <= "05":
        return True, ""
    if h[2] in ("a", "b"):
        return False, ROBOTS_PREFIX
    return False, ""


def _rules_cached(hosts: np.ndarray, cache: dict,
                  max_cache: int = 1 << 20) -> tuple[np.ndarray, np.ndarray]:
    dis_all = np.empty(len(hosts), dtype=bool)
    dis_prefix = np.empty(len(hosts), dtype=bool)
    for i, h in enumerate(hosts):
        r = cache.get(h)
        if r is None:
            if len(cache) >= max_cache:
                cache.clear()  # cheap wholesale eviction; rules are cheap to recompute
            r = rule_for_host(h)
            cache[h] = r
        dis_all[i] = r[0]
        dis_prefix[i] = bool(r[1])
    return dis_all, dis_prefix


# per-worker-process rule cache: task-based stages reuse it across batches
# scheduled on the same Ray worker (≙ an actor's state, without pool spin-up)
_PROCESS_CACHE: dict[str, tuple[bool, str]] = {}


def allowed_mask(batch: pa.Table,
                 cache: dict | None = None) -> np.ndarray:
    """Vectorized robots decision for a batch with url_canon + host columns."""
    hosts = np.asarray(batch.column("host"))
    uniq, inv = np.unique(hosts, return_inverse=True)
    dis_all, dis_prefix = _rules_cached(uniq, _PROCESS_CACHE if cache is None else cache)
    canon = batch.column("url_canon")
    if isinstance(canon, pa.ChunkedArray):
        canon = canon.combine_chunks()
    path = pc.replace_substring_regex(canon, _AUTH_RE, "")
    in_private = np.asarray(pc.starts_with(path, ROBOTS_PREFIX))
    return ~(dis_all[inv] | (dis_prefix[inv] & in_private))


class RobotsGate:
    """Actor-pool stage: append boolean ``allowed`` from cached per-host rules."""

    def __init__(self, max_cache: int = 1 << 20):
        self._cache: dict[str, tuple[bool, str]] = {}
        self._max_cache = max_cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        allowed = allowed_mask(batch, cache=self._cache)
        return batch.append_column("allowed", pa.array(allowed))
