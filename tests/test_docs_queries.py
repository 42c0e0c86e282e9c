"""Training-data operators (dedup/text/ANN/multimodal) vs DuckDB oracles
and structural checks at sf0.001."""

import duckdb
import numpy as np
import pytest

from conftest import SF, assert_frames_match, to_pandas
from crawlingathome_server_ray.pipelines import docs_queries as dq
from crawlingathome_server_ray.pipelines.frontier_core import pages_path
from test_analytics import _con


@pytest.mark.parametrize("name", sorted(dq.DOCS_SQL))
def test_docs_query_matches_oracle(ray_session, name):
    con = _con(SF)
    oracle = con.execute(dq.DOCS_SQL[name]).df()
    result = dq.DOCS_QUERIES[name](SF)
    assert_frames_match(result, oracle, name)


def test_binary_meta_matches_oracle(ray_session):
    sql = dq.sql_binary_meta(pages_path(SF))
    oracle = duckdb.sql(sql).df()
    assert_frames_match(dq.q_binary_meta(SF), oracle, "binary_meta")


def test_fingerprint_deterministic(ray_session):
    a = to_pandas(dq.q_doc_fingerprint(SF)).sort_values("doc_id")
    b = to_pandas(dq.q_doc_fingerprint(SF)).sort_values("doc_id")
    assert (a["fingerprint"].to_numpy() == b["fingerprint"].to_numpy()).all()
    from crawlingathome_server_ray.functions.text import fingerprint_text
    assert fingerprint_text("abc") == ((97 * 257 + 98) * 257 + 99) % ((1 << 61) - 1)


def test_minhash_clusters_are_near_dups(ray_session):
    """Every reported cluster member pair passes the Jaccard threshold, and
    exact duplicate texts always cluster together (no false negatives on
    identical docs)."""
    out = to_pandas(dq.q_minhash_dedup(SF))
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    text = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
    from crawlingathome_server_ray.functions.dedup import jaccard
    by_cluster = {}
    for d, c in zip(out["doc_id"], out["cluster_id"]):
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert int(c) == min(int(m) for m in members)
    # exact dup texts must co-cluster
    seen = {}
    for d, t in text.items():
        if t in seen:
            a, b = seen[t], d
            ca = out.loc[out.doc_id == a, "cluster_id"]
            cb = out.loc[out.doc_id == b, "cluster_id"]
            assert len(ca) and len(cb) and ca.iloc[0] == cb.iloc[0], \
                f"exact dups {a},{b} not co-clustered"
        seen.setdefault(t, d)


def test_simhash_pairs_verified(ray_session):
    out = to_pandas(dq.q_simhash_pairs(SF))
    from crawlingathome_server_ray.functions.dedup import hamming64, simhash
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    text = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
    for a, b in zip(out["a_id"], out["b_id"]):
        ha = np.array([simhash(text[int(a)])], dtype=np.uint64)
        hb = np.array([simhash(text[int(b)])], dtype=np.uint64)
        assert hamming64(ha, hb)[0] <= 3


def test_ivf_recall_vs_brute_force(ray_session):
    bf = to_pandas(dq.q_ann_topk(SF))
    ivf = to_pandas(dq.q_ann_ivf_topk(SF))
    bf_sets = bf.groupby("query_id")["vec_id"].apply(set)
    ivf_sets = ivf.groupby("query_id")["vec_id"].apply(set)
    recalls = [len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q])
               for q in bf_sets.index]
    assert sum(recalls) / len(recalls) >= 0.5, f"IVF mean recall too low: {recalls}"


def test_multimodal_stages(ray_session):
    import ray.data
    from crawlingathome_server_ray.stages.multimodal import (DecodeStage,
                                                             FeatureExtractStage,
                                                             FrameSampleStage,
                                                             FEATURE_DIM)
    ds = ray.data.read_parquet(pages_path(SF), columns=["url", "html"]).limit(256)
    dec = ds.map_batches(DecodeStage, fn_constructor_kwargs={"fake": True},
                         batch_size=128, concurrency=2,
                         batch_format="pyarrow").to_pandas()
    assert {"width", "height", "format"} <= set(dec.columns)
    assert dec["width"].between(64, 255).all()
    feat = ds.map_batches(FeatureExtractStage, fn_constructor_kwargs={"fake": True},
                          batch_size=128, concurrency=2,
                          batch_format="pyarrow").to_pandas()
    assert len(feat["features"].iloc[0]) == FEATURE_DIM
    frames = ds.map_batches(FrameSampleStage, batch_size=128, concurrency=2,
                            batch_format="pyarrow").to_pandas()
    assert len(frames) == 256 * 3
    # real decode is an explicit stub
    with pytest.raises(NotImplementedError):
        DecodeStage(fake=False)._decode_real(b"x")


def test_ivf_partition_pruned_read(ray_session):
    """The IVF index search must read only the probed cells' files."""
    import shutil
    from crawlingathome_server_ray.functions import ann
    shutil.rmtree("/tmp/graft_ivf", ignore_errors=True)
    stats = {}
    out = ann.ivf_topk(SF, n_queries=3, k=5, n_clusters=16, nprobe=2,
                       stats=stats)
    assert len(out) > 0
    assert stats["cells_total"] == 16
    assert stats["cells_read"] <= 3 * 2          # ≤ n_queries × nprobe
    assert stats["files_read"] < stats["files_total"]


def test_pq_recall_vs_brute_force(ray_session):
    """PQ-ADC top-k must stay useful: mean recall@10 ≥ 0.5 vs brute force
    (measures 0.7 on the synthetic 64-dim corpus at the 8×256 defaults)."""
    bf = to_pandas(dq.q_ann_topk(SF))
    pq_ = to_pandas(dq.q_ann_pq_topk(SF))
    bf_sets = bf.groupby("query_id")["vec_id"].apply(set)
    pq_sets = pq_.groupby("query_id")["vec_id"].apply(set)
    recalls = [len(bf_sets[q] & pq_sets.get(q, set())) / len(bf_sets[q])
               for q in bf_sets.index]
    assert sum(recalls) / len(recalls) >= 0.5, f"PQ mean recall: {recalls}"


def test_pq_compression_and_determinism(ray_session):
    """The ADC scan touches only the 8-byte code rows (64× smaller than
    the float64 corpus), and a rebuilt-from-cache search is identical."""
    import shutil
    import pandas as pd
    from crawlingathome_server_ray.functions import ann
    stats = {}
    a = ann.pq_topk(SF, n_queries=5, k=5, stats=stats)
    assert stats["bytes_raw"] / stats["bytes_codes"] == 64.0
    shutil.rmtree("/tmp/graft_pq", ignore_errors=True)   # force fresh build
    b = ann.pq_topk(SF, n_queries=5, k=5)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_ivfpq_recall_and_pruned_read(ray_session):
    """IVF-PQ composes both approximations: recall@10 ≥ 0.4 vs brute
    force (doubly approximate), the search reads only the probed cells'
    code files, and the codes stay 64× smaller than the raw corpus."""
    import shutil
    from crawlingathome_server_ray.functions import ann
    shutil.rmtree("/tmp/graft_ivfpq", ignore_errors=True)
    stats = {}
    out = ann.ivfpq_topk(SF, n_queries=10, k=10, nprobe=4, stats=stats)
    assert len(out) > 0
    assert stats["cells_read"] <= 10 * 4
    assert stats["files_read"] < stats["files_total"]
    assert stats["bytes_raw"] / stats["bytes_codes"] == 64.0
    bf = to_pandas(dq.q_ann_topk(SF))
    bf_sets = bf.groupby("query_id")["vec_id"].apply(set)
    pq_sets = out.groupby("query_id")["vec_id"].apply(set)
    recalls = [len(bf_sets[q] & pq_sets.get(q, set())) / len(bf_sets[q])
               for q in bf_sets.index]
    assert sum(recalls) / len(recalls) >= 0.4, f"IVFPQ recall: {recalls}"


def test_cosine_near_dup_ivf_recall(ray_session):
    """IVF-cell near-dup pairs: no false positives (every pair really is
    ≥ threshold) and recall ≥ 0.5 vs the exact broadcast variant."""
    exact = to_pandas(dq.q_cosine_near_dup(SF))
    ivf = to_pandas(dq.q_cosine_near_dup_ivf(SF))
    ex = set(zip(exact["a_id"].astype(int), exact["b_id"].astype(int)))
    iv = set(zip(ivf["a_id"].astype(int), ivf["b_id"].astype(int)))
    assert iv <= ex, f"false positives: {sorted(iv - ex)[:5]}"
    if ex:
        assert len(iv & ex) / len(ex) >= 0.5, (len(iv & ex), len(ex))


def test_minhash_distributed_branch_equals_driver(ray_session):
    """Forcing the distributed clustering path (threshold 0) must produce
    exactly the driver union-find clustering."""
    driver = to_pandas(dq.q_minhash_dedup(SF)).sort_values("doc_id")
    dist = to_pandas(
        dq.q_minhash_dedup(SF, distributed_pairs_threshold=0)
    ).sort_values("doc_id")
    assert driver.reset_index(drop=True).equals(dist.reset_index(drop=True))


def test_token_count_edge_whitespace_matches_split(ray_session):
    """Non-empty token counting ≡ str.split() and ≡ the SQL oracle even on
    edge-whitespace / empty / all-whitespace text (latent in synth data,
    which never has edge whitespace)."""
    import pandas as pd
    import pyarrow as pa
    import duckdb
    from crawlingathome_server_ray.functions.text import (quality_batch,
                                                          token_count_batch)
    texts = ["", " ", "   ", "a", " a", "a ", "  a  b  ", "\ta\nb ",
             "plain text here"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = token_count_batch(t).column("n_tokens").to_pylist()
    want = [len(s.split()) for s in texts]
    assert got == want
    assert quality_batch(t).column("n_tokens").to_pylist() == want
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    oracle = con.execute(dq.SQL_TOKEN_COUNT).df().sort_values("doc_id")
    assert oracle["n_tokens"].tolist() == want


def test_ivf_build_crash_safe_and_content_aware(ray_session):
    """A crashed (partial, no _BUILT marker) build must be wiped and
    rebuilt without duplicate corpus rows, and regenerating the source
    dataset in place must yield a different index root."""
    import os
    import shutil
    import pyarrow.parquet as pq
    from crawlingathome_server_ray.functions import ann
    root = ann.ivf_build(SF, n_clusters=8, seed=7)
    n_rows = sum(pq.read_table(str(f)).num_rows
                 for f in __import__("pathlib").Path(root).glob("cell=*/*.parquet"))
    # simulate a crash: drop the marker, leave the partial cell files
    os.remove(os.path.join(root, "_BUILT"))
    root2 = ann.ivf_build(SF, n_clusters=8, seed=7)
    assert root2 == root
    n_rows2 = sum(pq.read_table(str(f)).num_rows
                  for f in __import__("pathlib").Path(root2).glob("cell=*/*.parquet"))
    assert n_rows2 == n_rows  # retry did not append duplicates
    # content-aware cache key: a different source fingerprint → new root
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        shutil.copy(f"{SF}/embeddings.parquet", f"{td}/embeddings.parquet")
        os.utime(f"{td}/embeddings.parquet", (1, 1))
        r_a = ann.ivf_build(td, n_clusters=8, seed=7)
        os.utime(f"{td}/embeddings.parquet", (2, 2))
        r_b = ann.ivf_build(td, n_clusters=8, seed=7)
        assert r_a != r_b


def test_ngram_jaccard_exact_join_brute_force(ray_session, tmp_path):
    """Prefix-filter exact similarity join == brute-force all-pairs scalar
    Jaccard on an engineered corpus: exact-dup cluster, near-dups, short
    docs (one-shingle rule), empty/whitespace docs (never pair — no grams,
    matching the SQL oracle's inner join), permuted-prefix fold traps, and
    a just-below-threshold pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from crawlingathome_server_ray.functions.dedup import jaccard, shingles

    base = "the quick brown fox jumps over the lazy dog " * 4
    texts = [
        base, base, base,                       # exact-dup cluster
        base.replace("lazy", "sleepy", 1),      # near-dup of the cluster
        base[: len(base) // 2],                 # ~half overlap: below 0.8
        "a b", "a b", "a b c",                  # short docs (one shingle)
        "", "   ",                              # no grams: never pair
        "data stream data data engine x y z w v u t s",   # fold traps
        "stream data data data engine x y z w v u t s",
        "completely unrelated text about volcanoes erupting",
    ]
    ids = list(range(len(texts)))
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   tmp_path / "documents.parquet")

    got = to_pandas(dq.q_ngram_jaccard_dup(str(tmp_path), threshold=0.8))

    want = []
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            sa, sb = set(shingles(texts[a])), set(shingles(texts[b]))
            if not sa or not sb:
                continue
            j = jaccard(texts[a], texts[b])
            if j >= 0.8:
                inter = len(sa & sb)
                want.append((a, b, inter, len(sa | sb), j))
    assert list(map(tuple, got[["a_id", "b_id", "n_inter", "n_union"]]
                    .itertuples(index=False))) == \
        [(a, b, i, u) for a, b, i, u, _ in want]
    assert np.allclose(got["jac"].to_numpy(),
                       [j for *_, j in want])
    # the exact-dup cluster and the short-doc twins must be found
    assert (0, 1) in {(r.a_id, r.b_id) for r in got.itertuples()}
    assert (5, 6) in {(r.a_id, r.b_id) for r in got.itertuples()}


def test_minhash_recall_vs_exact_join(ray_session, tmp_path):
    """Measure MinHash-LSH recall against the EXACT prefix-filter
    similarity join on a mutation-spectrum corpus: base docs with 0..4
    token substitutions straddle the 0.8 threshold from both sides. The
    exact join is ground truth (recall 1 by lemma); every exact pair must
    co-cluster in q_minhash_dedup's output (theoretical LSH recall at
    jac=0.8 with 64 perms / 16 bands is 1-(1-0.8^4)^16 ≈ 0.9996, and the
    pipeline is deterministic, so full recall is a stable assertion on
    this corpus). Conversely no clustered doc may lack an exact partner
    (verify threshold == exact threshold ⟹ cluster edges ⊆ exact pairs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i}" for i in range(500)], dtype=object)
    texts, n_base, n_tok = [], 30, 40
    for _ in range(n_base):
        base = rng.choice(vocab, size=n_tok)
        texts.append(" ".join(base))
        for m in (0, 1, 1, 2, 4):           # jac ≈ 1, .85, .85, .73, .55
            var = base.copy()
            pos = rng.choice(n_tok, size=m, replace=False)
            var[pos] = rng.choice(vocab, size=m)
            texts.append(" ".join(var))
    ids = list(range(len(texts)))
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   tmp_path / "documents.parquet")

    exact = to_pandas(dq.q_ngram_jaccard_dup(str(tmp_path), threshold=0.8))
    clusters = to_pandas(dq.q_minhash_dedup(str(tmp_path)))
    label = dict(zip(clusters["doc_id"].astype(int),
                     clusters["cluster_id"].astype(int)))

    pairs = list(zip(exact["a_id"].astype(int), exact["b_id"].astype(int)))
    assert len(pairs) >= n_base * 3          # the spectrum actually pairs
    hit = sum(1 for a, b in pairs
              if a in label and b in label and label[a] == label[b])
    recall = hit / len(pairs)
    assert recall == 1.0, f"LSH recall {recall:.4f} on {len(pairs)} pairs"
    # soundness: clustered docs all have at least one exact partner
    in_exact = set(exact["a_id"].astype(int)) | set(exact["b_id"].astype(int))
    assert set(label) <= in_exact


def test_kmeans_distributed_matches_twin(ray_session):
    """Distributed Lloyd's == single-node twin on the real synth table:
    same init, same 1e-6 centroid rounding (the rounding absorbs
    float-sum ordering between merge trees), identical final centroids
    AND identical per-row assignments. (The synth ``label`` column is
    NOT cosine-separable — even true-label centroids score purity 0.37
    here — so cluster quality is asserted on an engineered corpus in
    ``test_kmeans_recovers_planted_clusters`` instead.)"""
    import pyarrow.parquet as pq
    from crawlingathome_server_ray.functions.ann import (
        kmeans_fit, kmeans_reference, normalize_rows)

    t = pq.read_table(f"{SF}/embeddings.parquet")
    mat = np.stack(t.column("embedding").to_pandas().to_numpy())
    k = 10

    cent = kmeans_fit(SF, n_clusters=k, n_iter=10, seed=42)
    want = kmeans_reference(mat, n_clusters=k, n_iter=10, seed=42)
    np.testing.assert_array_equal(cent, want)

    got = to_pandas(dq.q_embedding_kmeans(SF, n_clusters=k)) \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(got) == len(mat)
    assert (got["vec_id"].to_numpy() == np.sort(np.asarray(
        t.column("vec_id")))).all()
    tw = np.argmax(normalize_rows(mat.astype(np.float64)) @ want.T, axis=1)
    np.testing.assert_array_equal(got["cluster_id"].to_numpy(), tw)


def test_kmeans_recovers_planted_clusters(ray_session, tmp_path):
    """On a corpus with k genuinely cosine-separated planted clusters
    (unit centers ~90° apart, σ=0.15 noise), distributed k-means recovers
    the planted partition with purity ≥ 0.95."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    k, per, d = 8, 150, 64
    centers = rng.standard_normal((k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per, axis=0) + \
        0.15 * rng.standard_normal((k * per, d))
    planted = np.repeat(np.arange(k, dtype=np.int32), per)
    perm = rng.permutation(k * per)          # shuffle so init sees a mix
    pts, planted = pts[perm], planted[perm]
    pq.write_table(
        pa.table({"vec_id": pa.array(np.arange(k * per), pa.int64()),
                  "embedding": pa.array(
                      [row.astype(np.float32) for row in pts],
                      pa.list_(pa.float32())),
                  "label": pa.array(planted, pa.int32())}),
        tmp_path / "embeddings.parquet")

    got = to_pandas(dq.q_embedding_kmeans(str(tmp_path), n_clusters=k)) \
        .sort_values("vec_id").reset_index(drop=True)
    a = got["cluster_id"].to_numpy()
    purity = sum(np.bincount(planted[a == c]).max()
                 for c in np.unique(a)) / len(a)
    assert purity >= 0.95, purity


def test_pii_scrub_engineered(ray_session, tmp_path):
    """PII scrub on a PII-bearing corpus: Ray output == DuckDB oracle on
    the same parquet (both engines are RE2 — semantics identical by
    construction, this pins it), plus golden redactions."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "contact me at john.doe+spam@example.co.uk or 192.168.0.1",
        "call +1-555-867-5309 now; server 10.0.0.255, alt +44 20 7946 0958",
        "two mails a@b.io c.d@e.org and ip 8.8.8.8 inside one doc",
        "no pii here at all",
        "edge a@b.io. trailing dot. bad ip 999.999.1.1 phone +7 123 4567",
        "",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    oracle = con.execute(dq.DOCS_SQL["doc_pii_scrub"]).df()
    assert_frames_match(dq.q_doc_pii_scrub(str(tmp_path)), oracle,
                        "doc_pii_scrub_engineered")
    got = to_pandas(dq.q_doc_pii_scrub(str(tmp_path))) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.loc[0, "redacted"] == "contact me at <EMAIL> or <IP>"
    assert got.loc[1, "n_phone"] == 2 and got.loc[1, "n_ip"] == 1
    assert got.loc[2, "n_email"] == 2
    assert got.loc[3, "redacted"] == texts[3]
    assert (got[["n_email", "n_ip", "n_phone"]].to_numpy().sum(axis=1)
            >= np.array([2, 3, 3, 0, 3, 0])).all()


def test_normalize_engineered(ray_session, tmp_path):
    """Normalization parity on composed/decomposed accents, ligatures and
    mixed whitespace: Ray == DuckDB oracle on the same parquet, plus
    golden expectations (NFC folds e+combining-acute into é; NFC does
    NOT expand ligatures — that would be NFKC)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["Cafe\u0301", "Caf\u00e9", "  A  B\tC\n", "STRASSE ß",
             "ﬁ ligature", "", "already clean"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    oracle = con.execute(dq.DOCS_SQL["doc_normalize"]).df()
    assert_frames_match(dq.q_doc_normalize(str(tmp_path)), oracle,
                        "doc_normalize_engineered")
    got = to_pandas(dq.q_doc_normalize(str(tmp_path))) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.loc[0, "norm_text"] == got.loc[1, "norm_text"] == "caf\u00e9"
    assert got.loc[2, "norm_text"] == "a b c"
    assert got.loc[4, "norm_text"] == "ﬁ ligature"
    assert not got.loc[6, "changed"]


def test_scrub_pipeline_dedups_normalized_variants(ray_session, tmp_path):
    """The normalize→scrub→gate→dedup composite: case / whitespace /
    unicode-form variants of one doc (which raw-text dedup would treat as
    distinct) collapse to the min-doc_id survivor; PII is counted on the
    normalized text; sub-gate docs drop. Ray == DuckDB whole-chain
    oracle on the same parquet."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away to the deep green forest tonight again " * 2)
    assert len(base) >= 100 and len(base.split()) >= 20
    texts = [
        base,                                   # 0: survivor
        base.upper(),                           # 1: case variant
        "  " + base.replace(" ", "   ") + "\n",  # 2: whitespace variant
        base.replace("e", "é"),           # 3: NOT a variant (accents)
        base + " mail me at Bob@Example.COM ok",  # 4: PII, unique
        "short doc",                            # 5: under gates
        base.replace("é", "é"),      # 6: same as 3 pre-NFC? no-op
    ]
    # 6 is literally base (replace of absent substring) → dup of 0
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    oracle = con.execute(dq.DOCS_SQL["docs_scrub_pipeline"]).df()
    assert_frames_match(dq.q_docs_scrub_pipeline(str(tmp_path)), oracle,
                        "docs_scrub_pipeline_engineered")
    got = to_pandas(dq.q_docs_scrub_pipeline(str(tmp_path))) \
        .sort_values("doc_id").reset_index(drop=True)
    kept = set(got["doc_id"].astype(int))
    assert 0 in kept and {1, 2, 6} & kept == set()   # variants collapsed
    assert 3 in kept and 4 in kept and 5 not in kept
    assert int(got.set_index(got["doc_id"].astype(int))
               .loc[4, "n_pii"]) == 1


def test_dedup_keep_best_prefers_richest_original(ray_session, tmp_path):
    """Engineered collisions: case/whitespace/NFC variants of one
    sentence collide after normalization and the survivor is the
    longest ORIGINAL (doc_id tie-break), not the first seen — the
    distinguishing behavior vs first-wins. Verified against the DuckDB
    oracle on the same engineered table."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    texts = [
        "The Quick  Brown Fox",        # 0: doubled space, mixed case
        "the quick brown fox",         # 1: already canonical (short)
        "  THE QUICK BROWN FOX  ",     # 2: padded + upper → LONGEST (24)
        "a completely different doc",  # 3: its own group
        "the quick brown fox",         # 4: exact twin of 1 (tie → min id)
        "café crawl",             # 5: composed é
        "café crawl",            # 6: decomposed é → NFC-collides w/ 5
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    got = to_pandas(dq.DOCS_QUERIES["doc_dedup_keep_best"](str(tmp_path)))
    winners = dict(zip(got["doc_id"], got["n_chars"]))
    # fox group: doc 2 (23 chars incl. padding) beats all
    assert winners.get(2) == 23 and {0, 1, 4}.isdisjoint(winners)
    assert 3 in winners
    # café group: equal length after the tie (10 vs 11)? doc 6 is longer
    # in raw chars (decomposed é = 2 code points)
    assert winners.get(6) == 11 and 5 not in winners
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    from conftest import assert_frames_match
    assert_frames_match(got, con.execute(
        dq.DOCS_SQL["doc_dedup_keep_best"]).df(), "doc_dedup_keep_best")


def test_pmi_collocations_scalar_twin(ray_session, tmp_path):
    """Engineered corpus: counts equal a brute-force Counter, the
    support threshold filters, and the unigram joins attach the right
    totals (PMI is a pure function of the emitted integers)."""
    import collections

    import pyarrow as pa
    import pyarrow.parquet as pq
    texts = ["red fox red fox jumps", "red fox", "red red red",
             "fox jumps", ""]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    uni = collections.Counter(w for t in texts for w in t.split())
    big = collections.Counter(
        (a, b) for t in texts
        for a, b in zip(t.split(), t.split()[1:]))
    got = to_pandas(dq.q_pmi_collocations(str(tmp_path), min_n=2))
    want = {(a, b): (n, uni[a], uni[b])
            for (a, b), n in big.items() if n >= 2}
    assert {(r.w1, r.w2): (r.n_pair, r.n_w1, r.n_w2)
            for r in got.itertuples()} == want
    assert ("red", "fox") in want and want[("red", "fox")] == (3, 6, 4)


def test_vocab_oov_boundary_tiebreak(ray_session, tmp_path):
    """At the V boundary, equal-count terms resolve alphabetically
    (count desc, term asc) on both sides; zero-token docs are omitted."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    texts = ["b a", "a b", "c d", "d c", "   "]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    got = to_pandas(dq.q_vocab_oov_rate(str(tmp_path), v=2)) \
        .set_index("doc_id")
    # all four words tie at count 2 → vocab = {a, b} alphabetically
    assert got.loc[0, "n_oov"] == 0 and got.loc[1, "n_oov"] == 0
    assert got.loc[2, "n_oov"] == 2 and got.loc[3, "n_oov"] == 2
    assert (got["n_tokens"] == 2).all() and 4 not in got.index


def test_pmi_branches_equal(ray_session):
    """The counted threshold switch: the driver-merge branch and the
    distributed two-join branch produce identical collocation tables."""
    a = to_pandas(dq.q_pmi_collocations(SF)) \
        .sort_values(["w1", "w2"]).reset_index(drop=True)
    b = to_pandas(dq.q_pmi_collocations(SF, join_threshold=0)) \
        .sort_values(["w1", "w2"]).reset_index(drop=True)[a.columns]
    for c in ("n_pair", "n_w1", "n_w2"):
        a[c] = a[c].astype("int64")
        b[c] = b[c].astype("int64")
    assert len(a) > 0 and a.equals(b)
