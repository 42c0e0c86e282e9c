"""Deterministic partition dispatcher (T1, SURVEY.md §2.3).

The reference's core concurrency primitive is the atomic job claim
(reference models.py:105-131): ``ORDER BY RANDOM() LIMIT 1 FOR UPDATE SKIP
LOCKED`` + a completor-tag two-step (reference main.py:549-598). Inside one
Ray job, the streaming executor already guarantees each block is processed
exactly once, so the *claim* machinery reduces to cross-resume lease state
(see state/checkpoint.py). What must be reproduced deterministically is the
**dispatch ordering**: the rebuild replaces ``ORDER BY RANDOM()`` with a
seeded permutation,

    dispatch_rank(partition) = rank of md5(f"{seed}|{partition_id}")

which is (a) a uniform pseudo-random permutation, (b) identical at any CPU
count / cluster size, and (c) reproducible by the DuckDB oracle
(``ORDER BY md5(seed || '|' || partition_id)``).

Worker naming (reference name.py:7-11: two random words + 0-999) is likewise
seeded from the worker index.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def dispatch_key(seed: int, partition_id: int) -> str:
    return hashlib.md5(f"{seed}|{partition_id}".encode()).hexdigest()


def dispatch_order(partition_ids: list[int], seed: int) -> list[int]:
    """Partitions in dispatch order (ties impossible: md5 of distinct ids)."""
    return sorted(partition_ids, key=lambda p: dispatch_key(seed, p))


def dispatch_table(partition_ids: list[int], seed: int) -> pd.DataFrame:
    order = dispatch_order(partition_ids, seed)
    return pd.DataFrame({
        "partition_id": pd.array(order, dtype="int32"),
        "dispatch_rank": pd.array(range(1, len(order) + 1), dtype="int64"),
    })


def worker_name(seed: int, worker_index: int, words: list[str] | None = None) -> str:
    """Seeded replacement for the reference's random display-name generator
    (reference name.py:7-11): two words + a 0-999 suffix, all drawn from
    md5(seed|index) so names are stable across runs."""
    w = words or _DEFAULT_WORDS
    h = hashlib.md5(f"name|{seed}|{worker_index}".encode()).digest()
    a = int.from_bytes(h[0:4], "big") % len(w)
    b = int.from_bytes(h[4:8], "big") % len(w)
    c = int.from_bytes(h[8:12], "big") % 1000
    return f"{w[a]}-{w[b]}-{c}"


def _make_word_pool(n: int = 1024) -> list[str]:
    """Deterministic pronounceable word pool: 26 curated seed words plus
    CV(C)-syllable products, all distinct, stable across runs/machines.
    Narrows the gap to the reference's 178,187-word names file
    (reference name.py:4-5) without shipping a wordlist — the name
    space is len(pool)² × 1000 ≈ 10^9 combinations at n=1024."""
    pool = (
        "amber basalt cedar delta ember fjord garnet harbor iris juniper "
        "krill lumen maple nectar onyx pollen quartz raven sable tundra "
        "umber vesper willow xenon yonder zephyr").split()
    onsets = ("b br c cr d dr f fl g gl h j k l m n p pr r s st t tr v w "
              "z").split()
    vowels = "a e i o u ai ea ou".split()
    codas = ["", "n", "r", "s", "t", "l", "m", "x"]
    seen = set(pool)
    # round-robin over codas/vowels so early slices of the pool still mix
    for c in codas:
        for v in vowels:
            for o in onsets:
                w = o + v + c
                if w not in seen:
                    seen.add(w)
                    pool.append(w)
                if len(pool) >= n:
                    return pool
    return pool


_DEFAULT_WORDS = _make_word_pool()
