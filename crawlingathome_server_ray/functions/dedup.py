"""Deduplication suite for the training-data pipeline layer (graft brief):
exact (hash + first-wins), MinHash+LSH, SimHash, n-gram Jaccard
verification, and embedding-cosine near-dup. Per-batch sketching is
numpy-vectorized; candidate generation uses the classic
explode→groupby(band) shuffle; final clustering is union-find over the
(small) verified candidate-pair set.

Determinism: every hash is a pure function of content (md5 / splitmix64
derivatives), so results are identical at any parallelism.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# ---------------------------------------------------------------- hashing
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(x: np.ndarray) -> np.ndarray:
    z = x + _GOLD
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash_tokens(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of tokens (pandas siphash with fixed key)."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(np.uint64)


def shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


# ---------------------------------------------------------------- MinHash
def minhash_signature(text: str, n_perm: int = 64, k: int = 3) -> np.ndarray:
    """n_perm-wide signature: min over shingle hashes of splitmix(h + i)."""
    sh = hash_tokens(shingles(text, k))
    if len(sh) == 0:
        return np.full(n_perm, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    i = np.arange(n_perm, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        grid = _splitmix(sh[:, None] + i * _GOLD)      # (n_shingles, n_perm)
    return grid.min(axis=0)


def minhash_batch(df: pd.DataFrame, n_perm: int = 64, k: int = 3,
                  bands: int = 16) -> pd.DataFrame:
    """Per-doc signature → exploded (band_id, band_hash, doc_id) rows for the
    LSH groupby. rows_per_band = n_perm // bands (= r in the b·r scheme)."""
    r = n_perm // bands
    out_doc, out_band, out_hash = [], [], []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        sig = minhash_signature(text, n_perm, k)
        for b in range(bands):
            h = hashlib.md5(sig[b * r:(b + 1) * r].tobytes()).hexdigest()[:16]
            out_doc.append(doc_id)
            out_band.append(b)
            out_hash.append(h)
    return pd.DataFrame({"band_id": np.asarray(out_band, dtype=np.int32),
                         "band_hash": out_hash,
                         "doc_id": np.asarray(out_doc, dtype=np.int64)})


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(shingles(a, k)), set(shingles(b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------- SimHash
def simhash(text: str) -> np.uint64:
    """64-bit simhash over token hashes (unweighted)."""
    h = hash_tokens(text.split())
    if len(h) == 0:
        return np.uint64(0)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    vote = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if vote[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                         "simhash": df["text"].map(simhash).astype("uint64")})


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def simhash_chunks(h: np.ndarray, n_chunks: int = 4) -> np.ndarray:
    """(n, n_chunks) 16-bit chunks — pigeonhole bucketing: any pair within
    hamming distance < n_chunks shares at least one exact chunk."""
    w = 64 // n_chunks
    return np.stack([((h >> np.uint64(i * w)) & np.uint64((1 << w) - 1))
                     for i in range(n_chunks)], axis=1)


# ---------------------------------------------------------------- union-find
def connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """min-label union-find; returns {doc_id: cluster_min_id}."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


# ---------------------------------------------------------------- embeddings
def normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n
