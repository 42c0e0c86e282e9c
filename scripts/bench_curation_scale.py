#!/usr/bin/env python
"""Curation-family benchmark at realistic corpus scale.

The driver testdata's documents table tops out at 5k rows — too small to
say anything about the curation operators' scale behavior. This script
deterministically synthesizes a 200k-doc word-soup corpus (~40M tokens,
seeded numpy; 1% engineered near-duplicates so dedup has signal; cached
under /tmp as a 32-file parquet directory so reads parallelize), then
times the curation + dedup pipelines over it and prints one JSON line.

Usage: python scripts/bench_curation_scale.py [--docs 200000]
Env: RAY_GRAFT_CPUS (default 32).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS_DEFAULT = 200_000
VOCAB = 5_000
N_FILES = 32
ROOT = "/tmp/graft_curation_scale"


def ensure_corpus(n_docs: int) -> str:
    """Deterministic synthetic corpus: doc lengths 50-400 tokens over a
    5k-word vocab, broken into 25-token '\\n' paragraphs (so line-level
    dedup has real line structure); every 100th doc (i % 100 == 37) is a
    near-copy of doc i-17 (first 90% of its PARAGRAPHS — also a ~90%
    token prefix) so near-dup / repeated-gram / line-dedup operators all
    have signal. Single seeded pass, cached with a done-marker.
    (v3: paragraphs + planted duplicate embeddings; v2 records measured
    the single-line variant — token streams identical, line structure
    new, so token-level timings are comparable across v2→v3.)"""
    out = f"{ROOT}/{n_docs}"
    marker = f"{out}/_DONE_v3"
    if os.path.exists(marker):
        return out
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(f"{out}/documents.parquet", exist_ok=True)
    rng = np.random.default_rng(12345)
    words = np.array([f"w{i:04d}" for i in range(VOCAB)], dtype=object)
    lengths = rng.integers(50, 401, size=n_docs)
    flat = rng.integers(0, VOCAB, size=int(lengths.sum()))
    doc_of = np.repeat(np.arange(n_docs), lengths)
    PARA = 25  # tokens per '\n'-separated paragraph

    def para_join(toks):
        return "\n".join(" ".join(toks[i:i + PARA])
                         for i in range(0, len(toks), PARA))

    texts = (pd.Series(words[flat])
             .groupby(doc_of, sort=True).agg(list)
             .map(para_join).to_numpy(dtype=object))
    dup = np.arange(n_docs) % 100 == 37
    for i in np.nonzero(dup)[0]:
        if i >= 17:
            src = texts[i - 17].split("\n")
            texts[i] = "\n".join(src[: max(1, int(len(src) * 0.9))])
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    langs = np.array(["en", "de", "fr", "es"], dtype=object)[
        rng.integers(0, 4, size=n_docs)]
    per = (n_docs + N_FILES - 1) // N_FILES
    for f in range(N_FILES):
        lo, hi = f * per, min((f + 1) * per, n_docs)
        t = pa.table({
            "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "text": pa.array(texts[lo:hi], pa.string()),
            "lang": pa.array(langs[lo:hi], pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(lo, hi)],
                               pa.string()),
            "n_chars": pa.array(n_chars[lo:hi]),
        })
        pq.write_table(t, f"{out}/documents.parquet/part-{f:03d}.parquet")
    # embeddings twin table (for the k-means / ANN scale measurements):
    # 64-dim float32 around 16 planted unit centers, one row per doc
    k, d = 16, 64
    centers = rng.standard_normal((k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, k, size=n_docs)
    os.makedirs(f"{out}/embeddings.parquet", exist_ok=True)
    # planted exact-duplicate vectors so semantic dedup has signal:
    # every 200th vec (i % 200 == 53, i >= 17) copies vec i-17
    all_pts = (centers[lab] + 0.3 * rng.standard_normal((n_docs, d))
               ).astype(np.float32)
    vdup = (np.arange(n_docs) % 200 == 53) & (np.arange(n_docs) >= 17)
    all_pts[vdup] = all_pts[np.nonzero(vdup)[0] - 17]
    for f in range(N_FILES):
        lo, hi = f * per, min((f + 1) * per, n_docs)
        pts = all_pts[lo:hi]
        pq.write_table(pa.table({
            "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "embedding": pa.array(list(pts), pa.list_(pa.float32())),
            "label": pa.array(lab[lo:hi].astype(np.int32)),
        }), f"{out}/embeddings.parquet/part-{f:03d}.parquet")
    open(marker, "w").write("ok")
    return out


def main() -> None:
    n_docs = N_DOCS_DEFAULT
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    t0 = time.time()
    sf_dir = ensure_corpus(n_docs)
    gen_s = round(time.time() - t0, 1)

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data

    # session + worker-heap warmup (same rationale as bench.py's _warm:
    # steady-state measurement; this VM throttles first-touch page faults
    # per worker, so unwarmed heaps bill ~25 s to the first heavy query)
    def _warm(b):
        import crawlingathome_server_ray.pipelines.docs_queries  # noqa: F401
        x = np.empty(256 << 20, dtype=np.uint8)
        x[::4096] = 1
        del x
        return b

    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 2) \
        .map_batches(_warm, batch_format="pyarrow").materialize()

    from crawlingathome_server_ray.pipelines import curation_queries as cq
    from crawlingathome_server_ray.pipelines import docs_queries as dq

    def consume(r):
        import ray.data
        if isinstance(r, ray.data.Dataset):
            n = 0
            for b in r.iter_batches(batch_size=65536, batch_format="pyarrow"):
                n += b.num_rows
            return n
        return len(r)

    times: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name, fn):
        t = time.time()
        rows[name] = consume(fn())
        times[name] = round(time.time() - t, 3)

    timed("doc_repetition", lambda: cq.q_doc_repetition(sf_dir))
    timed("tfidf_top_terms", lambda: cq.q_tfidf_top_terms(sf_dir))
    timed("doc_decontaminate", lambda: cq.q_doc_decontaminate(sf_dir))
    timed("doc_repeated_ngrams", lambda: cq.q_doc_repeated_ngrams(sf_dir))
    timed("doc_weighted_sample", lambda: cq.q_doc_weighted_sample(sf_dir))
    timed("bm25_topk", lambda: cq.q_bm25_topk(
        sf_dir, query_terms=("w0001", "w0042", "w1234")))
    timed("dsir_select", lambda: cq.q_dsir_select(sf_dir))
    timed("doc_dedup_exact", lambda: dq.q_doc_dedup_exact(sf_dir))
    timed("minhash_dedup", lambda: dq.q_minhash_dedup(sf_dir))
    timed("simhash_pairs", lambda: dq.q_simhash_pairs(sf_dir))
    timed("ngram_jaccard_dup", lambda: dq.q_ngram_jaccard_dup(sf_dir))
    # winnowed first (the scale path), exact second (every gram shuffles
    # — the inherent exactness cost, reported for the comparison)
    timed("doc_substring_winnow",
          lambda: dq.q_doc_substring_winnow(sf_dir))
    timed("doc_substring_dup", lambda: dq.q_doc_substring_dup(sf_dir))
    timed("doc_pii_scrub", lambda: dq.q_doc_pii_scrub(sf_dir))
    timed("doc_lm_score", lambda: cq.q_doc_lm_score(sf_dir))
    timed("embedding_kmeans", lambda: dq.q_embedding_kmeans(
        sf_dir, n_clusters=16))
    from crawlingathome_server_ray.pipelines import training_queries as tq
    timed("seq_pack", lambda: tq.q_seq_pack(sf_dir))
    timed("doc_line_dedup", lambda: tq.q_doc_line_dedup(sf_dir))
    # IVF cells sized to the corpus (~3k vectors/cell): within-cell pair
    # finding is O(cell²) work, so fixed n_clusters stops scaling past ~50k
    timed("semantic_dedup", lambda: tq.q_semantic_dedup(
        sf_dir, threshold=0.99, n_clusters=max(16, n_docs // 3000)))
    # round 5: classifier / data-mix / packaging family (X49-X54)
    timed("doc_quality_classifier",
          lambda: cq.q_doc_quality_classifier(sf_dir))
    timed("lang_temperature_sample",
          lambda: cq.q_lang_temperature_sample(sf_dir))
    timed("training_shard_shuffle",
          lambda: tq.q_training_shard_shuffle(sf_dir))
    timed("source_data_card", lambda: cq.q_source_data_card(sf_dir))
    timed("train_valid_split", lambda: cq.q_train_valid_split(sf_dir))
    timed("corpus_budget_trim", lambda: cq.q_corpus_budget_trim(sf_dir))
    timed("score_auc_eval", lambda: cq.q_score_auc_eval(sf_dir))

    ray.shutdown()
    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "curation_scale_bench", "value": total, "unit": "sec",
        "queries": times, "rows": rows, "n_docs": n_docs,
        "gen_s": gen_s, "num_cpus": num_cpus,
        "docs_per_s_total": round(n_docs * len(times) / total, 1)}))


if __name__ == "__main__":
    main()
