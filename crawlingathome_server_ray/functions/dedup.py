"""Deduplication suite for the training-data pipeline layer (graft brief):
exact (hash + first-wins), MinHash+LSH, SimHash, n-gram Jaccard
verification, and embedding-cosine near-dup.

Sketching is vectorized across the whole batch, not per document: one Arrow
``utf8_split_whitespace`` + one ``pd.util.hash_array`` call tokenizes and
hashes every token of every doc in the batch (str.split() parity asserted in
tests), then numpy segment ops (``minimum.reduceat`` / ``add.reduceat`` over
per-doc offsets) produce all signatures at once. Candidate generation uses
the classic explode→groupby(band-bucket) shuffle; final clustering is
union-find over the (small) verified candidate-pair set only — the driver
never sees signatures or texts (pipelines/docs_queries.py).

Determinism: every hash is a pure function of content (siphash with
pandas' fixed key / splitmix64 derivatives), so results are identical at
any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- hashing
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


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


def batch_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch tokenization + hashing: (flat uint64 token hashes,
    int64 offsets[n+1] — doc i's tokens are flat[offs[i]:offs[i+1]]).

    Arrow's split emits empty strings at leading/trailing whitespace;
    they are dropped so tokens match Python ``str.split()`` exactly
    (→ per-doc hashes equal ``hash_tokens(text.split())``).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array(list(texts), pa.string())
    n = len(texts)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(1, np.int64)
    lists = pc.utf8_split_whitespace(texts)
    flat = lists.flatten()
    raw_counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), raw_counts)
    keep = np.asarray(pc.not_equal(flat, ""))
    doc_of = doc_of[keep]
    flat_obj = np.asarray(flat, dtype=object)[keep]
    h = (pd.util.hash_array(flat_obj).astype(np.uint64)
         if len(flat_obj) else np.zeros(0, np.uint64))
    counts = np.bincount(doc_of, minlength=n).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)))
    return h, offs


def batch_shingle_hashes(h: np.ndarray, offs: np.ndarray,
                         k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc k-token shingle hashes, vectorized over the flat token-hash
    array: shingle(i) = iterated splitmix-fold of h[i..i+k-1] within the
    doc, position-sensitive (acc·GOLD ⊕ next before each splitmix — a
    plain ⊕ fold made the first two tokens commute, so "x y z" and
    "y x z" collided; caught by the exact similarity-join oracle). Docs
    with 0 < t < k tokens get ONE shingle folding all t hashes (mirrors
    ``shingles()``'s short-doc rule); empty docs get none.
    Returns (flat shingle hashes, int64 offsets[n+1])."""
    T = len(h)
    n = len(offs) - 1
    if T == 0:
        return np.zeros(0, np.uint64), np.zeros(n + 1, np.int64)
    counts = np.diff(offs)
    ends_flat = np.repeat(offs[1:], counts)
    starts_flat = np.repeat(offs[:-1], counts)
    pos = np.arange(T, dtype=np.int64)
    acc = h.copy()
    for j in range(1, k):
        take = pos + j
        valid = take < ends_flat
        nxt = np.where(valid, h[np.minimum(take, T - 1)], np.uint64(0))
        acc = np.where(valid, _splitmix((acc * _GOLD) ^ nxt), acc)
    tlen = ends_flat - starts_flat
    valid_sh = (pos + k <= ends_flat) | ((pos == starts_flat) & (tlen < k))
    sh = acc[valid_sh]
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)[valid_sh]
    scounts = np.bincount(doc_of, minlength=n).astype(np.int64)
    soffs = np.concatenate(([0], np.cumsum(scounts)))
    return sh, soffs


# ---------------------------------------------------------------- MinHash
def minhash_signatures(texts, n_perm: int = 64, k: int = 3,
                       perm_chunk: int = 8) -> np.ndarray:
    """(n_docs, n_perm) uint64 signature matrix for a whole batch:
    sig[d, p] = min over d's shingles of splitmix(shingle + p·GOLD).
    Permutations are processed in chunks so the (n_shingles × chunk) grid
    stays tens of MB regardless of batch size. Shingle-less docs get the
    all-max signature (they only ever collide with each other)."""
    sh, soffs = batch_shingle_hashes(*batch_token_hashes(texts), k=k)
    n = len(soffs) - 1
    sig = np.full((n, n_perm), _U64_MAX, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    # reduceat ONLY over non-empty docs' starts: an empty doc shares its
    # start with the next doc, and clipping it would silently truncate the
    # PRECEDING doc's segment (found by hypothesis). Non-empty starts are
    # strictly increasing and in-range by construction.
    nonempty = np.diff(soffs) > 0
    starts_ne = soffs[:-1][nonempty]
    for p0 in range(0, n_perm, perm_chunk):
        ip = np.arange(p0, min(p0 + perm_chunk, n_perm), dtype=np.uint64)
        grid = _splitmix(sh[:, None] + ip[None, :] * _GOLD)
        sig[nonempty, p0:p0 + len(ip)] = np.minimum.reduceat(
            grid, starts_ne, axis=0)
    return sig


def minhash_signature(text: str, n_perm: int = 64, k: int = 3) -> np.ndarray:
    """Scalar twin of :func:`minhash_signatures` (tests/refsim)."""
    return minhash_signatures([text], n_perm=n_perm, k=k)[0]


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) uint64 — splitmix-fold of each band's r rows (the b·r LSH
    scheme; numeric fold replaces the old per-band hashlib.md5 loop)."""
    n, n_perm = sig.shape
    r = n_perm // bands
    g = sig.reshape(n, bands, r)
    acc = g[:, :, 0].copy()
    for j in range(1, r):
        acc = _splitmix(acc ^ g[:, :, j])
    return acc


def minhash_batch(batch: pa.Table, n_perm: int = 64, k: int = 3,
                  bands: int = 16) -> pa.Table:
    """map_batches body (zero-copy Arrow in, Arrow out): exploded
    (band_id, band_hash, doc_id) rows for the LSH groupby — 16 B/row
    through the shuffle, texts never move."""
    ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    sig = minhash_signatures(np.asarray(batch.column("text"), dtype=object),
                             n_perm=n_perm, k=k)
    bh = band_hashes(sig, bands)
    n = len(ids)
    return pa.table({
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                            pa.int32()),
        "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
        "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
    })


def shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(shingles(a, k)), set(shingles(b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def jaccard_pairs_hashed(texts_a, texts_b, k: int = 3,
                         return_counts: bool = False):
    """Vectorized n-gram Jaccard for ALIGNED text pairs — the map_batches
    verify kernel for MinHash candidates. All tokenizing/shingling is one
    whole-batch pass (``batch_token_hashes`` + ``batch_shingle_hashes``)
    over the batch's UNIQUE texts only (a near-dup cluster's doc appears in
    many candidate pairs; its shingle set is computed once), then each
    pair's Jaccard is a numpy sorted-set intersection over uint64 shingle
    hashes — no per-pair Python shingling or ``set`` ops.

    With ``return_counts`` returns ``(sims, inter, na, nb)`` — the exact
    intersection / set sizes behind each Jaccard (int64), which the exact
    similarity-join query emits alongside the ratio.

    Equals the scalar :func:`jaccard` (string shingle sets) up to 64-bit
    hash collisions (~n²/2⁶⁴ — negligible); asserted equal on edge cases in
    tests/test_functions.py."""
    n = len(texts_a)
    if n == 0:
        z = np.zeros(0, np.int64)
        return ((np.zeros(0, np.float64), z, z, z) if return_counts
                else np.zeros(0, np.float64))
    all_texts = np.concatenate([np.asarray(texts_a, dtype=object),
                                np.asarray(texts_b, dtype=object)])
    codes, uniq = pd.factorize(all_texts)
    sh, offs = batch_shingle_hashes(
        *batch_token_hashes(np.asarray(uniq, dtype=object)), k=k)
    sets = [np.unique(sh[offs[i]:offs[i + 1]]) for i in range(len(uniq))]
    ca, cb = codes[:n], codes[n:]
    out = np.empty(n, dtype=np.float64)
    inter_n = np.zeros(n, dtype=np.int64)
    na_n = np.zeros(n, dtype=np.int64)
    nb_n = np.zeros(n, dtype=np.int64)
    for i in range(n):
        sa, sb = sets[ca[i]], sets[cb[i]]
        na_n[i], nb_n[i] = len(sa), len(sb)
        if not len(sa) and not len(sb):
            out[i] = 1.0
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        inter_n[i] = inter
        out[i] = inter / (len(sa) + len(sb) - inter)
    if return_counts:
        return out, inter_n, na_n, nb_n
    return out


def prefix_filter_rows(texts, ids: np.ndarray, threshold: float,
                       k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Candidate-generation kernel of the EXACT set-similarity join
    (prefix filtering, Bayardo/Chaudhuri all-pairs; distributed layout as
    in Vernica et al., SIGMOD'10): for each doc compute its sorted-unique
    k-shingle-hash set S_d (ascending uint64 hash = the global total
    order) and emit only the first ``|S_d| − ⌈t·|S_d|⌉ + 1`` hashes as
    (shingle_hash, doc_id) rows.

    Lemma (no false negatives): J(a,b) ≥ t ⟹ |S_a∩S_b| ≥ t·|S_d| for each
    side, so prefixes of length |S_d| − ⌈t·|S_d|⌉ + 1 under ANY shared
    total order must intersect. The ceil is taken recall-safe against
    float slop (⌈t·n − 1e−9⌉: rounding DOWN only lengthens the prefix).
    Fully vectorized: one lexsort per batch, no per-doc Python loop."""
    sh, offs = batch_shingle_hashes(*batch_token_hashes(texts), k=k)
    n_docs = len(offs) - 1
    if len(sh) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    order = np.lexsort((sh, doc_of))
    d, s = doc_of[order], sh[order]
    first = np.ones(len(s), dtype=bool)
    first[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
    d_u, s_u = d[first], s[first]          # per-doc sorted unique shingles
    n_d = np.bincount(d_u, minlength=n_docs).astype(np.int64)
    alpha = np.ceil(threshold * n_d - 1e-9).astype(np.int64)
    p_d = np.maximum(n_d - alpha + 1, 1)   # prefix length per doc
    starts = np.concatenate(([0], np.cumsum(n_d)))
    rank = np.arange(len(d_u), dtype=np.int64) - starts[d_u]
    keep = rank < p_d[d_u]
    return s_u[keep], np.asarray(ids, np.int64)[d_u[keep]]


# ---------------------------------------------------------------- SimHash
def simhash_many(texts) -> np.ndarray:
    """Vectorized 64-bit simhash for a whole batch: one unpackbits over the
    flat token-hash bytes + one add.reduceat per doc-segment. Bit j set iff
    strictly more than half of the doc's token hashes have bit j set
    (ties → 0, matching the old per-doc scalar)."""
    h, offs = batch_token_hashes(texts)
    n = len(offs) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(h) == 0:
        return out
    counts = np.diff(offs)
    nonempty = counts > 0
    # chunk doc ranges so the (tokens × 64) bit matrix stays ≤ ~32 MB
    step = max(1, int(250_000 / max(1.0, len(h) / max(1, n))))
    for d0 in range(0, n, step):
        d1 = min(n, d0 + step)
        lo, hi = offs[d0], offs[d1]
        ne = nonempty[d0:d1]
        if hi == lo or not ne.any():
            continue
        bits = np.unpackbits(h[lo:hi].view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little").astype(np.uint16)
        # reduceat only over non-empty docs' starts — a clipped empty-doc
        # start would truncate the preceding doc's segment (hypothesis)
        starts_ne = offs[d0:d1][ne] - lo
        cnt = np.add.reduceat(bits, starts_ne, axis=0).astype(np.int64)
        vote = 2 * cnt > counts[d0:d1][ne, None]
        packed = np.packbits(vote, axis=1, bitorder="little")
        vals = np.zeros(d1 - d0, dtype=np.uint64)
        vals[ne] = packed.view(np.uint64).reshape(-1)
        out[d0:d1] = vals
    return out


def simhash(text: str) -> np.uint64:
    """Scalar twin of :func:`simhash_many` (tests verify pair output
    against this)."""
    return simhash_many([text])[0]


def simhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) sketch rows — zero-copy Arrow in, Arrow out."""
    return pa.table({"doc_id": batch.column("doc_id"),
                     "simhash": pa.array(
                         simhash_many(np.asarray(batch.column("text"),
                                                 dtype=object)),
                         pa.uint64())})


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hamming distance: byte-LUT popcount over the
    xor's uint8 view (8 gathers + one sum) instead of 64 shift/mask
    passes."""
    x = np.ascontiguousarray(np.bitwise_xor(a, b))
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    return (_POPCNT8[x.view(np.uint8)].reshape(len(x), 8)
            .sum(axis=1).astype(np.int64))


def simhash_chunks(h: np.ndarray, n_chunks: int = 4) -> np.ndarray:
    """(n, n_chunks) 16-bit chunks — pigeonhole bucketing: any pair within
    hamming distance < n_chunks shares at least one exact chunk."""
    w = 64 // n_chunks
    return np.stack([((h >> np.uint64(i * w)) & np.uint64((1 << w) - 1))
                     for i in range(n_chunks)], axis=1)


# ---------------------------------------------------------------- pairs
def pairs_from_groups(keys: list[np.ndarray], ids: np.ndarray,
                      payload: np.ndarray | None = None,
                      max_group: int = 1024):
    """Within-bucket candidate-pair expansion, shared by the minhash and
    simhash map_groups bodies: group rows by the composite ``keys``, emit
    all (a<b) id pairs of every group with ≥2 members (np.triu_indices per
    multi-group — the loop runs only over multi-groups, which are rare).

    ``payload`` (e.g. simhash values) is returned aligned with the pairs as
    (pay_a, pay_b). Groups larger than ``max_group`` get the all-pairs
    expansion only for their first ``max_group`` members by id order — a
    skew guard: a degenerate group (e.g. all-empty docs) would otherwise
    emit O(n²) pairs. Members beyond the cap are connected by a spanning
    STAR to the group's minimum id (O(n) edges), so the candidate group
    stays one connected component; only the tail's pairwise recall is
    capped (a tail edge that fails downstream verification can still split
    the verified cluster — the cap trades tail recall for boundedness)."""
    order = np.lexsort([ids] + list(keys))
    ids_s = ids[order]
    pay_s = payload[order] if payload is not None else None
    sk = [k[order] for k in keys]
    m = len(ids_s)
    if m < 2:
        z = np.zeros(0, np.int64)
        return (z, z, z, z) if payload is not None else (z, z)
    neq = np.zeros(m - 1, dtype=bool)
    for k in sk:
        neq |= k[1:] != k[:-1]
    starts = np.concatenate(([0], np.flatnonzero(neq) + 1, [m]))
    out_a, out_b, pa_, pb_ = [], [], [], []
    for gi in range(len(starts) - 1):
        s, e_full = starts[gi], starts[gi + 1]
        if e_full - s < 2:
            continue
        e = min(e_full, s + max_group)
        gids = ids_s[s:e]
        ia, ib = np.triu_indices(len(gids), k=1)
        out_a.append(gids[ia])
        out_b.append(gids[ib])
        if pay_s is not None:
            pa_.append(pay_s[s:e][ia])
            pb_.append(pay_s[s:e][ib])
        if e < e_full:
            # spanning star: connect each capped-tail member to the group
            # min id (ids_s ascending within the group ⇒ a < b holds)
            tail = ids_s[e:e_full]
            out_a.append(np.full(len(tail), gids[0], dtype=np.int64))
            out_b.append(tail)
            if pay_s is not None:
                pa_.append(np.full(len(tail), pay_s[s],
                                   dtype=pay_s.dtype))
                pb_.append(pay_s[e:e_full])
    if not out_a:
        z = np.zeros(0, np.int64)
        return (z, z, z, z) if payload is not None else (z, z)
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    if payload is not None:
        return a, b, np.concatenate(pa_), np.concatenate(pb_)
    return a, b


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
    # two passes: the min label must win even when unions arrive out of order
    return {x: find(x) for x in parent}


# ---------------------------------------------------------------- embeddings
def normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def distributed_components(edges, max_iter: int = 20,
                           num_partitions: int | None = None):
    """Distributed connected components over an edge Dataset/DataFrame
    (a_id, b_id) via min-label propagation WITH pointer-doubling label
    shortcutting: each round every node takes the minimum label among
    itself, its neighbors, and ``label(label(node))`` (labels are always
    node ids, so the shortcut is one extra self-join). The shortcut halves
    the remaining distance to the component minimum each round ⇒
    convergence in O(log diameter) rounds instead of O(diameter) — a
    60-node chain converges well inside the default max_iter (tested).
    The fixed point is exactly the union-find result
    (``connected_components``), computed without the edge set ever living
    on the driver.

    Convergence is detected by the monotone invariant sum(labels): labels
    only ever decrease, so an unchanged sum ⇔ a fixed point. One extra
    tiny aggregate per round, no old-vs-new join.

    This is the scale path for clustering verified near-dup pairs when
    they outgrow the driver (the pipelines default to driver union-find,
    which is correct while verified pairs are small); asserted equal to
    union-find in tests/test_functions.py."""
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Min, Sum

    if isinstance(edges, pd.DataFrame):
        edges = ray.data.from_pandas(
            edges[["a_id", "b_id"]].astype("int64"))
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(8, cpus // 2))
    edges = edges.materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        import numpy as np
        ids = np.concatenate([np.asarray(b.column("a_id"), dtype=np.int64),
                              np.asarray(b.column("b_id"), dtype=np.int64)])
        return pa.table({"node": pa.array(np.unique(ids), pa.int64())})

    # NOTE the .repartition after each aggregate: Ray 2.49's hash aggregate
    # emits SCHEMA-LESS empty blocks for partitions that received no
    # groups; a downstream JoinOperator partition that unifies such a block
    # into its build side loses the key column and dies with ArrowInvalid
    # "No match ... FieldRef". repartition() concatenates blocks (labels is
    # the small side — O(nodes) slim rows), squeezing the empties out.
    labels = (edges.map_batches(endpoints, batch_format="pyarrow")
              .groupby("node").aggregate(Min("node", alias_name="label"))
              .repartition(num_partitions).materialize())
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        la = labels.map_batches(
            lambda b: pa.table({"a_id": b.column("node"),
                                "label_a": b.column("label")}),
            batch_format="pyarrow")
        m1 = (edges.join(la, join_type="inner",
                         num_partitions=num_partitions, on=("a_id",))
              .map_batches(lambda b: pa.table({"node": b.column("b_id"),
                                               "label": b.column("label_a")}),
                           batch_format="pyarrow").materialize())
        lb = labels.map_batches(
            lambda b: pa.table({"b_id": b.column("node"),
                                "label_b": b.column("label")}),
            batch_format="pyarrow")
        m2 = (edges.join(lb, join_type="inner",
                         num_partitions=num_partitions, on=("b_id",))
              .map_batches(lambda b: pa.table({"node": b.column("a_id"),
                                               "label": b.column("label_b")}),
                           batch_format="pyarrow").materialize())
        self_msgs = labels.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "label": b.column("label")}),
            batch_format="pyarrow")
        # pointer doubling: node's label L is itself a node; adopt L's
        # label (≤ L) — halves the hop distance to the component min
        lbl_tbl = labels.map_batches(
            lambda b: pa.table({"lbl_key": b.column("node"),
                                "label2": b.column("label")}),
            batch_format="pyarrow")
        m3 = (labels.join(lbl_tbl, join_type="inner",
                          num_partitions=num_partitions, on=("label",),
                          right_on=("lbl_key",))
              .map_batches(lambda b: pa.table({"node": b.column("node"),
                                               "label": b.column("label2")}),
                           batch_format="pyarrow").materialize())
        labels = (self_msgs.union(m1, m2, m3)
                  .groupby("node").aggregate(Min("label", alias_name="label"))
                  .repartition(num_partitions).materialize())
        cur = labels.aggregate(Sum("label", alias_name="s"))
        cur_sum = int(cur["s"])
        if prev_sum is not None and cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # labels only ever decrease; an unreached fixed point means some
        # component (diameter > max_iter) still carries non-minimum labels
        import warnings
        warnings.warn(
            f"distributed_components: no fixed point within max_iter="
            f"{max_iter} rounds (graph diameter too large) — labels may "
            f"split components; raise max_iter", RuntimeWarning)
    return labels  # Dataset (node, label=component min id)


# ------------------------------------------------- substring fingerprints
# Exact shared-substring detection + winnowing document fingerprinting
# (Schleimer–Wilkerson–Aiken, "Winnowing: Local Algorithms for Document
# Fingerprinting", SIGMOD 2003 — the MOSS algorithm), over byte k-grams
# hashed with the same 2^61-1 polynomial family as fingerprint_text
# (functions/text.py). Reference analog: none — north-rule substring-
# dedup capability (Lee et al. 2022, "Deduplicating Training Data Makes
# Language Models Better").
_SS_MOD = np.uint64((1 << 61) - 1)
_SS_BASE = 257
_M31 = np.uint64((1 << 31) - 1)
_M30 = np.uint64((1 << 30) - 1)


def _modmul61(a, b) -> np.ndarray:
    """(a * b) mod 2^61-1 for uint64 inputs ≤ 2^61, fully vectorized.
    31/31-bit limb split: with a = a1·2^31 + a0, b = b1·2^31 + b0 and
    2^61 ≡ 1, 2^62 ≡ 2 (mod p), every intermediate stays < 2^63.4 —
    exact in uint64 with no Python-int fallback."""
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    a1, a0 = a >> np.uint64(31), a & _M31
    b1, b0 = b >> np.uint64(31), b & _M31
    mid = a1 * b0 + a0 * b1                                  # < 2^62
    x = (((a1 * b1) << np.uint64(1))                         # ·2^62 ≡ ·2
         + (mid >> np.uint64(30))                            # ·2^31 split
         + ((mid & _M30) << np.uint64(31))
         + a0 * b0)                                          # < 2^63.4
    x = (x >> np.uint64(61)) + (x & _SS_MOD)
    x = (x >> np.uint64(61)) + (x & _SS_MOD)
    return np.where(x >= _SS_MOD, x - _SS_MOD, x)


# Persistent per-worker scratch for the substring kernels: this sandbox
# (and any memory-overcommitted VM) throttles first-touch page faults, so
# per-batch multi-MB numpy allocations — which glibc serves via mmap and
# returns to the OS on free — re-fault EVERY batch and dominate the
# kernel (measured 28 s first call / 1.5 s steady on the same input).
# Grow-only buffers keyed by (name, dtype) fault once per worker and are
# reused by every subsequent batch; remaining temporaries are tiled
# small enough for the allocator to recycle from the heap.
_SS_SCRATCH: dict[tuple[str, np.dtype], np.ndarray] = {}
_SS_TILE = 256                  # columns per modmul/argmin tile


def _ss_scratch(name: str, shape: tuple, dtype) -> np.ndarray:
    size = int(np.prod(shape))
    key = (name, np.dtype(dtype))
    buf = _SS_SCRATCH.get(key)
    if buf is None or buf.size < size:
        buf = np.empty(size, np.dtype(dtype))
        _SS_SCRATCH[key] = buf
    return buf[:size].reshape(shape)


def gram_hashes_padded(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling-hash values of every k-byte gram of every text, as a
    right-padded matrix: returns (G uint64 (n, n_pos), valid bool same
    shape) with G[i, j] = hash(bytes_i[j:j+k]) and valid[i, j] iff the
    gram lies inside text i. One cheap vectorized column step per byte
    position builds prefix hashes (base 257 keeps the Mersenne split
    overflow-free), then column-tiled _modmul61 turns prefixes into gram
    hashes: h[j:j+k] = pre[j+k] - pre[j]·257^k (mod p). All matrix-sized
    buffers come from the persistent scratch (returned views are only
    valid until the next call — callers copy what they keep)."""
    enc = [t.encode() for t in texts]
    n = len(enc)
    lens = np.fromiter((len(e) for e in enc), np.int64, n)
    l_max = max(int(lens.max(initial=0)), k)
    mat = _ss_scratch("mat", (n, l_max), np.uint64)
    mat[:] = 0
    for i, e in enumerate(enc):                 # ragged → padded copy only
        mat[i, :len(e)] = np.frombuffer(e, np.uint8)
    base = np.uint64(_SS_BASE)
    pre = _ss_scratch("pre", (n, l_max + 1), np.uint64)
    pre[:, 0] = 0
    h = np.zeros(n, np.uint64)
    for j in range(l_max):                      # (n,)-sized temporaries
        t = (h >> np.uint64(31)) * base                      # < 2^40
        x = ((t >> np.uint64(30)) + ((t & _M30) << np.uint64(31))
             + (h & _M31) * base + mat[:, j])                # < 2^61.1
        h = (x >> np.uint64(61)) + (x & _SS_MOD)             # ≤ 2^61
        pre[:, j + 1] = h
    np.subtract(pre, _SS_MOD, out=pre, where=pre >= _SS_MOD)
    n_pos = l_max - k + 1
    bk = np.uint64(pow(_SS_BASE, k, (1 << 61) - 1))
    g = _ss_scratch("g", (n, n_pos), np.uint64)
    wrap = np.uint64((1 << 64) - ((1 << 61) - 1))   # 2^64 - p
    for c0 in range(0, n_pos, _SS_TILE):        # tile: small temporaries
        c1 = min(c0 + _SS_TILE, n_pos)
        sub = _modmul61(pre[:, c0:c1], bk)
        hi = pre[:, k + c0:k + c1]
        gg = g[:, c0:c1]
        np.subtract(hi, sub, out=gg)            # wraps where hi < sub …
        np.subtract(gg, wrap, out=gg, where=hi < sub)  # ... +p via -(2^64-p)
    valid = _ss_scratch("valid", (n, n_pos), bool)
    np.less_equal(np.arange(n_pos)[None, :], (lens - k)[:, None],
                  out=valid)
    return g, valid


def winnow_select(g: np.ndarray, valid: np.ndarray,
                  w: int) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing selection: the minimum gram hash of every w-window of a
    document's own grams is a fingerprint. GUARANTEE (SWA 2003 §3): any
    substring shared between two documents of length ≥ k + w - 1
    contributes at least one shared selected fingerprint — detection
    above the guarantee threshold is exact, not probabilistic. Returns
    (doc_idx, pos) of the selections (ties broken leftmost; density
    ≈ 2/(w+1) of all grams).

    Only windows lying FULLY inside a document's gram range count (the
    SWA definition) — straddling windows into the batch padding would
    add end-of-doc selections whose presence depends on the batch's
    padded width, breaking selection determinism across batch layouts.
    A document with 1..w-1 grams selects its global minimum instead, so
    short docs are fingerprinted too."""
    sent = _U64_MAX
    n, n_pos0 = g.shape
    n_pos = max(n_pos0, w)
    n_grams = valid.sum(axis=1)
    h = _ss_scratch("winnow_h", (n, n_pos), np.uint64)
    h[:, n_pos0:] = sent
    np.copyto(h[:, :n_pos0], g)
    h[:, :n_pos0][~valid] = sent
    win = np.lib.stride_tricks.sliding_window_view(h, w, axis=1)
    n_win = win.shape[1]
    sel = _ss_scratch("winnow_sel", (n, n_win), np.int64)
    for c0 in range(0, n_win, _SS_TILE):        # tiled argmin: the strided
        c1 = min(c0 + _SS_TILE, n_win)          # reduce is the hot op
        np.argmin(win[:, c0:c1], axis=2, out=sel[:, c0:c1])
    sel += np.arange(n_win)[None, :]
    # a window is in-document iff its start ≤ n_grams - w
    win_ok = _ss_scratch("winnow_ok", (n, n_win), bool)
    np.less_equal(np.arange(n_win)[None, :], (n_grams - w)[:, None],
                  out=win_ok)
    okf = win_ok.ravel()
    di = np.repeat(np.arange(n), n_win)[okf]
    flat = np.unique(di * n_pos + sel.ravel()[okf])
    d, p = flat // n_pos, flat % n_pos
    # short docs (0 < n_grams < w): one fingerprint, the global min
    short = np.flatnonzero((n_grams > 0) & (n_grams < w))
    if len(short):
        d = np.concatenate([d, short])
        p = np.concatenate([p, h[short].argmin(axis=1)])
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
    return d, p
