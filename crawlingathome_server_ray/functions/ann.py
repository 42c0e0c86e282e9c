"""Approximate-nearest-neighbor search over the ``embeddings`` table
(list<float> column), per the training-data-pipeline brief:

- **brute force** (the oracle-checkable baseline): broadcast the normalized
  query matrix once (``ray.put``), each ``map_batches`` task does one numpy
  matmul against its batch and emits its local top-k per query; a tiny
  driver-side heap merge produces the global top-k. Scales linearly with
  corpus size and never shuffles the corpus.
- **IVF** (the scale path): k-means-lite coarse centroids (seeded, fitted
  on a sample); ``ivf_build`` writes the corpus bucketed by nearest
  centroid as hive-partitioned parquet (one pass); ``ivf_topk`` then reads
  ONLY the probed cells' files — a partition-pruned read, so search cost
  scales with nprobe/n_clusters of the corpus, not the corpus. Recall
  measured vs brute force in tests; blocks-read reduction asserted via the
  ``stats`` out-param.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .dedup import normalize_rows


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.values, dtype=np.float64)
    m = flat.reshape(len(ids), -1)
    return ids, m


def brute_force_topk(sf_dir: str, n_queries: int = 10, k: int = 10,
                     batch_size: int = 8192):
    """Global top-k cosine neighbors for the first ``n_queries`` vectors.
    Returns (query_id, rank, vec_id) — ties broken by vec_id ascending, self
    excluded. Rank/neighbor only (no float sim column) so the result is
    robust to summation-order ulps vs the DuckDB oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    qt = (ds.filter(expr=f"vec_id < {n_queries}")
          .to_pandas().sort_values("vec_id"))
    q_ids = qt["vec_id"].to_numpy(dtype=np.int64)
    qm = normalize_rows(np.stack(qt["embedding"].to_numpy()).astype(np.float64))
    q_ref = ray.put((q_ids, qm))

    def local_topk(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        qi, qmat = ray.get(q_ref)
        sims = normalize_rows(m) @ qmat.T                 # (n_batch, n_q)
        out_q, out_v, out_s = [], [], []
        kk = min(k + 1, len(ids))
        for j, qid in enumerate(qi):
            col = sims[:, j]
            top = np.argpartition(-col, kk - 1)[:kk]
            for t in top:
                if ids[t] != qid:
                    out_q.append(qid); out_v.append(ids[t]); out_s.append(col[t])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    partial = ds.map_batches(local_topk, batch_format="pyarrow",
                             batch_size=batch_size)
    # merge the (n_blocks × n_queries × k) partials on the driver — small
    pdf = partial.to_pandas()
    pdf = pdf.sort_values(["query_id", "sim", "vec_id"],
                          ascending=[True, False, True], kind="mergesort")
    pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pdf[["query_id", "rank", "vec_id"]].astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64"})


def kmeans_lite(sample: np.ndarray, n_clusters: int, seed: int = 42,
                n_iter: int = 10) -> np.ndarray:
    """Seeded mini k-means on normalized vectors (cosine ≙ dot)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(n_iter):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = sample[mask].mean(axis=0)
                n = np.linalg.norm(v)
                cent[c] = v / n if n > 0 else cent[c]
    return cent


def _dataset_fingerprint(path: str) -> str:
    """Cheap content key for the index cache: mtime+size of the source
    parquet, so a regenerated-in-place dataset never serves a stale
    index."""
    import os
    st = os.stat(path)
    return f"{st.st_mtime_ns:x}_{st.st_size:x}"


def ivf_build(sf_dir: str, n_clusters: int = 16, seed: int = 42,
              index_root: str | None = None, batch_size: int = 8192) -> str:
    """Build (idempotently) the IVF index: the corpus bucketed by nearest
    coarse centroid, written as hive-partitioned parquet (one ``cell=K``
    directory per centroid) + the centroid matrix. This is the real IVF
    layout: searches read ONLY the probed cells' files (partition-pruned
    read), instead of rescanning every corpus block.

    Crash-safe: the build writes into a ``.tmp`` sibling and atomically
    renames it into place, so an interrupted build can never leave
    partial ``cell=*/`` files that a retry would append duplicate corpus
    rows next to. The cache key includes a source-file fingerprint
    (mtime+size), so regenerating the dataset in place invalidates the
    cached index."""
    import os
    import shutil
    src = f"{sf_dir}/embeddings.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    index_root = index_root or (
        f"/tmp/graft_ivf/{tag}_c{n_clusters}_s{seed}"
        f"_{_dataset_fingerprint(src)}")
    marker = os.path.join(index_root, "_BUILT")
    if os.path.exists(marker):
        return index_root
    shutil.rmtree(index_root, ignore_errors=True)  # stale/partial leftovers
    tmp_root = index_root + ".tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)
    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    sample = ds.random_sample(min(1.0, 4096 / max(1, ds.count())), seed=seed)
    sm = normalize_rows(np.stack(sample.to_pandas()["embedding"].to_numpy())
                        .astype(np.float64))
    cent = kmeans_lite(sm, n_clusters, seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        cells = np.argmax(normalize_rows(m) @ ray.get(cent_ref).T, axis=1)
        return batch.append_column("cell",
                                   pa.array(cells.astype(np.int32), pa.int32()))

    (ds.map_batches(assign, batch_format="pyarrow", batch_size=batch_size)
     .write_parquet(tmp_root, partition_cols=["cell"]))
    np.save(os.path.join(tmp_root, "centroids.npy"), cent)
    with open(os.path.join(tmp_root, "_BUILT"), "w") as f:
        f.write("ok")
    os.rename(tmp_root, index_root)  # atomic publish
    return index_root


def ivf_topk(sf_dir: str, n_queries: int = 10, k: int = 10,
             n_clusters: int = 16, nprobe: int = 4, seed: int = 42,
             batch_size: int = 8192, stats: dict | None = None):
    """IVF search: probe only the ``nprobe`` nearest coarse cells per
    query, reading ONLY those cells' parquet files from the bucketed index
    (:func:`ivf_build`). Output schema matches brute_force_topk;
    approximate (recall < 1, measured vs brute force in tests). Pass
    ``stats={}`` to receive {cells_total, cells_read, files_total,
    files_read} — the blocks-read reduction evidence."""
    import glob as _glob
    import os
    index_root = ivf_build(sf_dir, n_clusters, seed, batch_size=batch_size)
    cent = np.load(os.path.join(index_root, "centroids.npy"))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    qt = ds.filter(expr=f"vec_id < {n_queries}").to_pandas().sort_values("vec_id")
    q_ids = qt["vec_id"].to_numpy(dtype=np.int64)
    qm = normalize_rows(np.stack(qt["embedding"].to_numpy()).astype(np.float64))
    q_cells = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    q_ref = ray.put((q_ids, qm, q_cells))

    cells_needed = sorted({int(c) for c in q_cells.ravel()})
    files = [f for c in cells_needed
             for f in sorted(_glob.glob(
                 os.path.join(index_root, f"cell={c}", "*.parquet")))]
    if stats is not None:
        all_files = _glob.glob(os.path.join(index_root, "cell=*", "*.parquet"))
        stats.update(cells_total=len(cent), cells_read=len(cells_needed),
                     files_total=len(all_files), files_read=len(files))

    def local(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        mn = normalize_rows(m)
        cells = np.asarray(batch.column("cell"), dtype=np.int64)
        qi, qmat, qc = ray.get(q_ref)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qi):
            probe = np.isin(cells, qc[j])
            if not probe.any():
                continue
            sub_ids, sub = ids[probe], mn[probe]
            sims = sub @ qmat[j]
            kk = min(k + 1, len(sub_ids))
            top = np.argpartition(-sims, kk - 1)[:kk]
            for t in top:
                if sub_ids[t] != qid:
                    out_q.append(qid); out_v.append(sub_ids[t]); out_s.append(sims[t])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    pdf = (ray.data.read_parquet(files,
                                 columns=["vec_id", "embedding", "cell"])
           .map_batches(local, batch_format="pyarrow", batch_size=batch_size)
           .to_pandas())
    pdf = pdf.sort_values(["query_id", "sim", "vec_id"],
                          ascending=[True, False, True], kind="mergesort")
    pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pdf[["query_id", "rank", "vec_id"]].astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64"})


def cosine_near_dup_ivf(sf_dir: str, threshold: float = 0.4,
                        n_clusters: int = 16, n_assign: int = 2,
                        seed: int = 42, batch_size: int = 8192,
                        limit_ids: int | None = None):
    """All-pairs embedding near-dup via IVF cells — the scale path for
    :func:`cosine_near_dup_pairs` (whose broadcast slice caps one side):
    every vector is multi-assigned to its ``n_assign`` nearest centroids,
    cells are whole groups (groupby(cell).map_groups), and within a cell
    a row-TILED matmul emits all pairs ≥ threshold (tile×cell working
    set, never cell² — a skewed 25k-vector cell would otherwise allocate
    a ~5 GB sims matrix; measured hanging the 200k-doc scale bench
    before tiling). Cell count should scale with the corpus (~3k
    vectors/cell) since pair work is O(cell²). A pair is found iff the two
    vectors share ≥1 of their assigned cells — multi-assignment is the
    standard recall lever (recall vs the exact variant measured in
    tests). Cross-cell dedup of pairs happens in a bucketed groupby.

    Returns the deduped (a_id, b_id) pair DATASET — never driver-resident
    here, so callers can count/threshold it distributed first and collect
    only when it is known driver-sized (:func:`pairs_to_sorted_pandas`)."""
    cent = np.load(
        __import__("os").path.join(
            ivf_build(sf_dir, n_clusters, seed, batch_size=batch_size),
            "centroids.npy"))
    cent_ref = ray.put(cent)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    if limit_ids is not None:
        ds = ds.filter(expr=f"vec_id < {limit_ids}")

    def assign(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        mn = normalize_rows(m)
        sims = mn @ ray.get(cent_ref).T
        cells = np.argsort(-sims, axis=1)[:, :n_assign]        # (n, a)
        dim = mn.shape[1]
        rep = np.repeat(mn, n_assign, axis=0)                  # (n·a, dim)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(rep.reshape(-1), pa.float64()), dim)
        return pa.table({
            "cell": pa.array(cells.reshape(-1).astype(np.int32), pa.int32()),
            "vec_id": pa.array(np.repeat(ids, n_assign), pa.int64()),
            "embedding": emb})

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # tile the within-cell all-pairs matmul into ONE reused
        # preallocated TILE×cell buffer (np.dot out=): a whole-cell sims
        # matrix is O(cell²) floats (a 25k-vector cell would allocate
        # ~5 GB), and even tiled, repeated multi-hundred-MB allocations
        # across 32 concurrent workers stall this VM's memory subsystem
        # (measured: identical 10k-vector cells took 0.1 s or 110 s by
        # allocation luck; 4096-tiles-with-fresh-buffers 123 s,
        # 512-tiles-into-one-buffer 3.3 s for the whole 200k-doc stage)
        TILE = 512
        ids = g["vec_id"].to_numpy(np.int64)
        m = np.stack(g["embedding"].to_numpy())
        n = len(ids)
        buf = np.empty((min(TILE, n), n), np.float64)
        la, lb = [], []
        for s in range(0, n, TILE):
            rows = min(TILE, n - s)
            sims = np.dot(m[s:s + rows], m.T, out=buf[:rows])
            ai, bi = np.nonzero(sims >= threshold)
            a, b = ids[s + ai], ids[bi]
            keep = a < b  # dedups the symmetric hit + multi-assigned twins
            la.append(a[keep])
            lb.append(b[keep])
        lo = np.concatenate(la) if la else np.zeros(0, np.int64)
        hi = np.concatenate(lb) if lb else np.zeros(0, np.int64)
        return pd.DataFrame({"a_id": lo, "b_id": hi,
                             "pair_bucket": (lo % 16).astype(np.int32)})

    return (ds.map_batches(assign, batch_format="pyarrow",
                           batch_size=batch_size)
            .groupby("cell").map_groups(cell_pairs, batch_format="pandas")
            .groupby("pair_bucket")
            .map_groups(lambda g: g.drop_duplicates(["a_id", "b_id"])
                        [["a_id", "b_id"]],
                        batch_format="pandas"))


def pairs_to_sorted_pandas(pairs) -> pd.DataFrame:
    """Collect an (a_id, b_id) pair Dataset to a deterministic sorted
    DataFrame. Call ONLY when the pair set is known driver-sized (toy
    scale, or below a counted threshold) — the scale paths keep the
    Dataset distributed (see q_semantic_dedup)."""
    out = pairs if isinstance(pairs, pd.DataFrame) else pairs.to_pandas()
    if out.empty:
        return pd.DataFrame({"a_id": pd.array([], dtype="int64"),
                             "b_id": pd.array([], dtype="int64")})
    return (out.astype({"a_id": "int64", "b_id": "int64"})
            [["a_id", "b_id"]]
            .sort_values(["a_id", "b_id"]).reset_index(drop=True))


def cosine_near_dup_pairs(sf_dir: str, limit_ids: int = 1000,
                          threshold: float = 0.95, batch_size: int = 8192):
    """Embedding-cosine near-dup pairs (a < b, cos ≥ threshold) among the
    first ``limit_ids`` vectors: broadcast that slice, stream the corpus."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    sub = ds.filter(expr=f"vec_id < {limit_ids}").to_pandas().sort_values("vec_id")
    ids = sub["vec_id"].to_numpy(dtype=np.int64)
    m = normalize_rows(np.stack(sub["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((ids, m))

    def pairs(batch: pa.Table) -> pa.Table:
        bids, bm = _emb_matrix(batch)
        keep = bids < limit_ids
        bids, bm = bids[keep], bm[keep]
        if len(bids) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64())})
        aids, am = ray.get(ref)
        sims = normalize_rows(bm) @ am.T
        bi, ai = np.nonzero(sims >= threshold)
        a, b = bids[bi], aids[ai]
        mask = a < b
        return pa.table({"a_id": pa.array(a[mask], pa.int64()),
                         "b_id": pa.array(b[mask], pa.int64())})

    pdf = ds.map_batches(pairs, batch_format="pyarrow",
                         batch_size=batch_size).to_pandas()
    if pdf.empty:
        return pd.DataFrame({"a_id": pd.array([], dtype="int64"),
                             "b_id": pd.array([], dtype="int64")})
    return pdf.sort_values(["a_id", "b_id"]).reset_index(drop=True)


# ------------------------------------------------------ product quantization
def _pq_lloyd(sub: np.ndarray, n_codes: int, seed: int,
              n_iter: int = 15) -> np.ndarray:
    """Plain (non-spherical) seeded Lloyd's on one subspace's training
    sample — PQ codebooks quantize raw subvectors, so L2 means, not
    direction-only updates. Centroids rounded to 1e-6 per round so the
    fit is reproducible bit-for-bit across platforms (same discipline as
    :func:`kmeans_fit`). Empty cells keep their previous centroid."""
    rng = np.random.default_rng(seed)
    k = min(n_codes, len(sub))
    cent = np.round(sub[rng.choice(len(sub), size=k, replace=False)], 6)
    for _ in range(n_iter):
        # ||x - c||² argmin ≡ argmax(x·c − ||c||²/2); one matmul per round
        d2 = sub @ cent.T - 0.5 * (cent * cent).sum(axis=1)
        a = np.argmax(d2, axis=1)
        cent = cent.copy()
        for c in range(k):
            sel = sub[a == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = np.round(cent, 6)
    if k < n_codes:   # tiny corpus: pad with copies so codes stay uint8-dense
        cent = np.vstack([cent, np.repeat(cent[:1], n_codes - k, axis=0)])
    return cent


def pq_build(sf_dir: str, m_sub: int = 8, n_codes: int = 256, seed: int = 42,
             index_root: str | None = None, batch_size: int = 8192,
             train_sample: int = 4096) -> str:
    """Build (idempotently) the product-quantization index over the
    ``embeddings`` table: ``m_sub`` codebooks of ``n_codes`` centroids each
    (Jégou, Douze & Schmid, "Product quantization for nearest neighbor
    search", TPAMI 2011), trained driver-side on a bounded deterministic
    head sample of NORMALIZED vectors (cosine ≙ inner product after
    normalization, so IP-ADC below estimates cosine), then ONE distributed
    encode pass writing the slim codes table: (vec_id, m_sub uint8 codes)
    — 8 bytes/vector at the defaults vs 512 bytes of float64 (64×; a
    10^10-vector corpus compresses to ~80 GB of scannable codes). The
    codebook tensor (m_sub × n_codes × d/m_sub, ~128 KB) broadcasts via
    ``ray.put``; crash-safe atomic ``.tmp`` rename + mtime/size
    fingerprint cache key, exactly like :func:`ivf_build`.

    Reference analog: none (the reference stores no embeddings); this is
    the memory-bound scale path the brief's similarity-search family
    needs at 100 TB."""
    import os
    import shutil
    src = f"{sf_dir}/embeddings.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    index_root = index_root or (
        f"/tmp/graft_pq/{tag}_m{m_sub}_k{n_codes}_s{seed}"
        f"_{_dataset_fingerprint(src)}")
    marker = os.path.join(index_root, "_BUILT")
    if os.path.exists(marker):
        return index_root
    shutil.rmtree(index_root, ignore_errors=True)
    tmp_root = index_root + ".tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)

    sample = kmeans_head_sample(src, train_sample)      # normalized rows
    d = sample.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    sd = d // m_sub
    cb = np.stack([_pq_lloyd(sample[:, mm * sd:(mm + 1) * sd], n_codes,
                             seed + mm)
                   for mm in range(m_sub)])             # (m, n_codes, sd)
    cb_ref = ray.put(cb)

    def encode(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        mn = normalize_rows(m)
        codebooks = ray.get(cb_ref)
        codes = np.empty((len(ids), m_sub), np.uint8)
        for mm in range(m_sub):
            sub = mn[:, mm * sd:(mm + 1) * sd]
            cent = codebooks[mm]
            d2 = sub @ cent.T - 0.5 * (cent * cent).sum(axis=1)
            codes[:, mm] = np.argmax(d2, axis=1).astype(np.uint8)
        code_col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), pa.uint8()), m_sub)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "code": code_col})

    (ray.data.read_parquet(src, columns=["vec_id", "embedding"])
     .map_batches(encode, batch_format="pyarrow", batch_size=batch_size)
     .write_parquet(os.path.join(tmp_root, "codes")))
    np.save(os.path.join(tmp_root, "codebooks.npy"), cb)
    with open(os.path.join(tmp_root, "_BUILT"), "w") as f:
        f.write("ok")
    os.rename(tmp_root, index_root)
    return index_root


def pq_topk(sf_dir: str, n_queries: int = 10, k: int = 10, m_sub: int = 8,
            n_codes: int = 256, seed: int = 42, batch_size: int = 65536,
            stats: dict | None = None):
    """Asymmetric-distance (ADC) top-k over the PQ codes: the query keeps
    full precision; per query one (m_sub × n_codes) lookup table of
    subspace inner products is built driver-side, and the scan touches
    ONLY the codes parquet (never the raw vectors) — each batch's
    estimated cosine is ``m_sub`` vectorized uint8 gathers + adds, a
    memory-bandwidth-light pass over 8-byte rows. Local per-batch top-k →
    tiny driver heap merge, exactly the :func:`brute_force_topk` shape.
    Output schema matches it (query_id, rank, vec_id); approximate —
    recall vs brute force measured in pytest. Pass ``stats={}`` to
    receive {bytes_raw, bytes_codes} (the compression evidence)."""
    import os
    index_root = pq_build(sf_dir, m_sub, n_codes, seed)
    cb = np.load(os.path.join(index_root, "codebooks.npy"))
    sd = cb.shape[2]

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    qt = (ds.filter(expr=f"vec_id < {n_queries}")
          .to_pandas().sort_values("vec_id"))
    q_ids = qt["vec_id"].to_numpy(dtype=np.int64)
    qm = normalize_rows(np.stack(qt["embedding"].to_numpy())
                        .astype(np.float64))
    # (n_q, m_sub, n_codes): lut[j, mm, c] = q_j[mm-th subspace] · cb[mm][c]
    lut = np.einsum("qms,mcs->qmc",
                    qm.reshape(len(q_ids), m_sub, sd), cb)
    q_ref = ray.put((q_ids, lut))

    if stats is not None:
        n_total = ds.count()
        stats.update(bytes_raw=n_total * qm.shape[1] * 8,
                     bytes_codes=n_total * m_sub)

    def local(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        col = batch.column("code")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = np.asarray(col.values, dtype=np.uint8).reshape(len(ids), -1)
        qi, tables = ray.get(q_ref)
        sims = np.zeros((len(qi), len(ids)), np.float64)
        for mm in range(codes.shape[1]):
            sims += tables[:, mm, :][:, codes[:, mm]]
        out_q, out_v, out_s = [], [], []
        kk = min(k + 1, len(ids))
        for j, qid in enumerate(qi):
            row = sims[j]
            top = np.argpartition(-row, kk - 1)[:kk]
            for t in top:
                if ids[t] != qid:
                    out_q.append(qid); out_v.append(ids[t]); out_s.append(row[t])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    pdf = (ray.data.read_parquet(os.path.join(index_root, "codes"))
           .map_batches(local, batch_format="pyarrow", batch_size=batch_size)
           .to_pandas())
    pdf = pdf.sort_values(["query_id", "sim", "vec_id"],
                          ascending=[True, False, True], kind="mergesort")
    pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pdf[["query_id", "rank", "vec_id"]].astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64"})


def ivfpq_build(sf_dir: str, n_clusters: int = 16, m_sub: int = 8,
                n_codes: int = 256, seed: int = 42,
                index_root: str | None = None, batch_size: int = 8192,
                train_sample: int = 4096) -> str:
    """Build (idempotently) the combined IVF-PQ index — the layout a
    10^10-vector corpus actually ships (Jégou et al. 2011's IVFADC shape,
    minus the residual re-encoding: codes quantize the normalized vectors
    directly, so one codebook set serves every cell): ONE pass assigns
    each vector to its nearest coarse centroid AND product-quantizes it,
    writing hive-partitioned 9-byte rows ``cell=K/(vec_id, code)``.
    Search then composes BOTH scale levers: a partition-pruned read of
    the probed cells only, over codes 64× smaller than the raw vectors.
    Same crash-safe atomic publish + fingerprint cache key as
    :func:`ivf_build` / :func:`pq_build`."""
    import os
    import shutil
    src = f"{sf_dir}/embeddings.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    index_root = index_root or (
        f"/tmp/graft_ivfpq/{tag}_c{n_clusters}_m{m_sub}_k{n_codes}_s{seed}"
        f"_{_dataset_fingerprint(src)}")
    marker = os.path.join(index_root, "_BUILT")
    if os.path.exists(marker):
        return index_root
    shutil.rmtree(index_root, ignore_errors=True)
    tmp_root = index_root + ".tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)

    sample = kmeans_head_sample(src, train_sample)      # normalized rows
    d = sample.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    sd = d // m_sub
    cent = kmeans_lite(sample, n_clusters, seed)
    cb = np.stack([_pq_lloyd(sample[:, mm * sd:(mm + 1) * sd], n_codes,
                             seed + mm)
                   for mm in range(m_sub)])
    refs = ray.put((cent, cb))

    def assign_encode(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        mn = normalize_rows(m)
        coarse, codebooks = ray.get(refs)
        cells = np.argmax(mn @ coarse.T, axis=1).astype(np.int32)
        codes = np.empty((len(ids), m_sub), np.uint8)
        for mm in range(m_sub):
            sub = mn[:, mm * sd:(mm + 1) * sd]
            c = codebooks[mm]
            codes[:, mm] = np.argmax(
                sub @ c.T - 0.5 * (c * c).sum(axis=1), axis=1).astype(np.uint8)
        code_col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), pa.uint8()), m_sub)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "code": code_col,
                         "cell": pa.array(cells, pa.int32())})

    (ray.data.read_parquet(src, columns=["vec_id", "embedding"])
     .map_batches(assign_encode, batch_format="pyarrow",
                  batch_size=batch_size)
     .write_parquet(os.path.join(tmp_root, "codes"),
                    partition_cols=["cell"]))
    np.save(os.path.join(tmp_root, "centroids.npy"), cent)
    np.save(os.path.join(tmp_root, "codebooks.npy"), cb)
    with open(os.path.join(tmp_root, "_BUILT"), "w") as f:
        f.write("ok")
    os.rename(tmp_root, index_root)
    return index_root


def ivfpq_topk(sf_dir: str, n_queries: int = 10, k: int = 10,
               n_clusters: int = 16, m_sub: int = 8, n_codes: int = 256,
               nprobe: int = 4, seed: int = 42, batch_size: int = 65536,
               stats: dict | None = None):
    """IVF-PQ search: probe the ``nprobe`` nearest coarse cells per query
    (reading ONLY those cells' code files — partition-pruned like
    :func:`ivf_topk`) and estimate cosine via the PQ lookup tables (ADC
    like :func:`pq_topk`, never touching a raw vector). Output schema
    matches brute_force_topk; doubly approximate (cell pruning × code
    quantization) — recall measured vs brute force in pytest. Pass
    ``stats={}`` for {cells_total, cells_read, files_total, files_read,
    bytes_raw, bytes_codes}."""
    import glob as _glob
    import os
    index_root = ivfpq_build(sf_dir, n_clusters, m_sub, n_codes, seed,
                             batch_size=batch_size)
    cent = np.load(os.path.join(index_root, "centroids.npy"))
    cb = np.load(os.path.join(index_root, "codebooks.npy"))
    sd = cb.shape[2]

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    qt = (ds.filter(expr=f"vec_id < {n_queries}")
          .to_pandas().sort_values("vec_id"))
    q_ids = qt["vec_id"].to_numpy(dtype=np.int64)
    qm = normalize_rows(np.stack(qt["embedding"].to_numpy())
                        .astype(np.float64))
    q_cells = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    lut = np.einsum("qms,mcs->qmc", qm.reshape(len(q_ids), m_sub, sd), cb)
    q_ref = ray.put((q_ids, lut, q_cells))

    cells_needed = sorted({int(c) for c in q_cells.ravel()})
    codes_root = os.path.join(index_root, "codes")
    files = [f for c in cells_needed
             for f in sorted(_glob.glob(
                 os.path.join(codes_root, f"cell={c}", "*.parquet")))]
    if stats is not None:
        all_files = _glob.glob(os.path.join(codes_root, "cell=*",
                                            "*.parquet"))
        n_total = ds.count()
        stats.update(cells_total=len(cent), cells_read=len(cells_needed),
                     files_total=len(all_files), files_read=len(files),
                     bytes_raw=n_total * qm.shape[1] * 8,
                     bytes_codes=n_total * m_sub)

    def local(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        col = batch.column("code")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = np.asarray(col.values, dtype=np.uint8).reshape(len(ids), -1)
        cells = np.asarray(batch.column("cell"), dtype=np.int64)
        qi, tables, qc = ray.get(q_ref)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qi):
            probe = np.isin(cells, qc[j])
            if not probe.any():
                continue
            sub_ids, sub_codes = ids[probe], codes[probe]
            sims = np.zeros(len(sub_ids), np.float64)
            for mm in range(sub_codes.shape[1]):
                sims += tables[j, mm, sub_codes[:, mm]]
            kk = min(k + 1, len(sub_ids))
            top = np.argpartition(-sims, kk - 1)[:kk]
            for t in top:
                if sub_ids[t] != qid:
                    out_q.append(qid); out_v.append(sub_ids[t])
                    out_s.append(sims[t])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    pdf = (ray.data.read_parquet(files, columns=["vec_id", "code", "cell"])
           .map_batches(local, batch_format="pyarrow", batch_size=batch_size)
           .to_pandas())
    pdf = pdf.sort_values(["query_id", "sim", "vec_id"],
                          ascending=[True, False, True], kind="mergesort")
    pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pdf[["query_id", "rank", "vec_id"]].astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64"})


# ---------------------------------------------------------- k-means (full)
def kmeans_head_sample(path: str, n: int) -> np.ndarray:
    """Bounded deterministic init sample: the first ``n`` rows of the
    (first) embeddings parquet file, read directly with pyarrow on the
    driver — O(n·d) memory regardless of corpus size, and independent of
    Ray's block ordering (``Dataset.limit`` does not guarantee file
    order under streaming execution)."""
    import os

    import pyarrow.parquet as pq
    if os.path.isdir(path):
        path = os.path.join(path, sorted(os.listdir(path))[0])
    pf = pq.ParquetFile(path)
    batches = []
    got = 0
    for b in pf.iter_batches(batch_size=min(n, 8192),
                             columns=["vec_id", "embedding"]):
        batches.append(b)
        got += len(b)
        if got >= n:
            break
    t = pa.Table.from_batches(batches).slice(0, n)
    _, m = _emb_matrix(t)
    return normalize_rows(m)


def kmeans_fit(sf_dir: str, n_clusters: int = 10, n_iter: int = 10,
               seed: int = 42, batch_size: int = 8192,
               init_sample: int = 2048,
               merge_fanout: int = 64) -> np.ndarray:
    """Distributed spherical k-means (Lloyd's) over the ``embeddings``
    table: rows are L2-normalized (cosine ≙ dot), centroids re-normalized
    each round. Unlike :func:`kmeans_lite` (a driver-side fit on a sample,
    used for IVF coarse quantization), every iteration here is one
    STREAMING pass over the full corpus:

    - centroids broadcast once per round (``ray.put``, read per task);
    - each batch emits ONE partial row (per-cluster float64 vector sums +
      int64 counts — k·d + k values, ~5 KB at k=10,d=64);
    - one tree-reduce combine level (``merge_fanout`` partials per task)
      bounds the driver merge at ceil(blocks/fanout) rows — the same
      shape as the HLL/MG sketch merges (``sketches.hll_distinct``);
    - the driver update touches only the k×d matrix.

    Determinism: init is a seeded choice from a bounded head sample
    (:func:`kmeans_head_sample`), and each round's centroids are rounded
    to 1e-6 before broadcast, which absorbs float-sum ordering differences
    between merge trees (partial sums agree to ~1e-12; the rounding
    granularity is 10^6× coarser), so assignments are reproducible and
    match the single-node twin in tests. Empty clusters keep their
    previous centroid. Ties in argmax break to the lowest cluster id on
    both paths (numpy semantics)."""
    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    sample = kmeans_head_sample(path, init_sample)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    cent = np.round(sample[idx], 6)
    k, d = cent.shape

    def combine(bt: pa.Table) -> pa.Table:
        n = np.asarray(bt.column("n").to_pylist(), np.int64).sum(axis=0)
        s = np.asarray(bt.column("s").to_pylist(), np.float64).sum(axis=0)
        return pa.table({"n": pa.array([n.tolist()], pa.list_(pa.int64())),
                         "s": pa.array([s.tolist()],
                                       pa.list_(pa.float64()))})

    for _ in range(n_iter):
        ref = ray.put(cent)

        def partial(bt: pa.Table, _ref=ref) -> pa.Table:
            _, m = _emb_matrix(bt)
            m = normalize_rows(m)
            c = ray.get(_ref)
            a = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((k, d), np.float64)
            np.add.at(sums, a, m)
            n = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {"n": pa.array([n.tolist()], pa.list_(pa.int64())),
                 "s": pa.array([sums.ravel().tolist()], pa.list_(pa.float64()))})

        parts = (ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=batch_size)
                 .map_batches(combine, batch_format="pyarrow",
                              batch_size=merge_fanout)
                 .to_pandas())  # ≤ ceil(blocks/fanout) tiny rows — bounded
        n = np.asarray(parts["n"].tolist(), np.int64).sum(axis=0)
        s = np.asarray(parts["s"].tolist(), np.float64).sum(axis=0)
        new = s.reshape(k, d)
        nz = n > 0
        cent = cent.copy()
        cent[nz] = normalize_rows(new[nz])   # spherical: direction only
        cent = np.round(cent, 6)
    return cent


def kmeans_assign(sf_dir: str, cent: np.ndarray, batch_size: int = 8192):
    """Final assignment pass: (vec_id, cluster_id) Dataset — streams, the
    driver never holds the corpus."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    ref = ray.put(cent)

    def assign(bt: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(bt)
        a = np.argmax(normalize_rows(m) @ ray.get(ref).T, axis=1)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cluster_id": pa.array(a.astype(np.int32),
                                                pa.int32())})

    return ds.map_batches(assign, batch_format="pyarrow",
                          batch_size=batch_size)


def kmeans_reference(mat: np.ndarray, n_clusters: int, n_iter: int,
                     seed: int, init_sample: int = 2048) -> np.ndarray:
    """Single-node twin of :func:`kmeans_fit` (tests): same init, same
    rounding, one flat float64 sum per round. Returns centroids."""
    m = normalize_rows(np.asarray(mat, np.float64))
    sample = m[:init_sample]
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    cent = np.round(sample[idx], 6)
    for _ in range(n_iter):
        a = np.argmax(m @ cent.T, axis=1)
        cent = cent.copy()
        for c in range(len(cent)):
            sel = m[a == c]
            if len(sel):
                cent[c] = normalize_rows(sel.sum(axis=0)[None, :])[0]
        cent = np.round(cent, 6)
    return cent
