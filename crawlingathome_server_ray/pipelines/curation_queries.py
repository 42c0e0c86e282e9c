"""Corpus-curation operators for LLM training-data pipelines: TF-IDF
term ranking, BM25 retrieval, Gopher-style repetition filtering,
benchmark decontamination, and weighted sampling — all over the
``documents`` table, all with DuckDB oracles.

Scale notes (the patterns, per operator):

- tf-idf / bm25 corpus stats ride the bucketed exact top-k pattern
  (per-batch partial counts → hash-bucketed groupby → per-bucket top-k →
  ≤ buckets·k driver merge) proven by ``docs_queries.q_top_bigrams``.
- Float scores (idf, bm25, sampling keys) are computed identically on
  both sides but NEVER emitted: DuckDB's ``ln`` and numpy's ``log``
  differ in the last ulp (measured), so outputs carry only the integer /
  string / boolean facts and floats are used for ordering alone.
- Selection (top-k / bottom-k) is associative, so per-batch k-selection
  → one shrink level → driver final keeps the driver merge bounded at
  any corpus size (never #batches·k rows on the driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.canonicalize import md5_hash64
from .frontier_core import coalesce_slim

BATCH = 8192


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=columns)


def _tokens_doc_idx(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(tokens, doc_row_index) for a batch — Arrow whitespace split with
    empty tokens dropped (≡ str.split() ≡ the oracle's
    list_filter(regexp_split_to_array(...), x -> x <> ''))."""
    texts = b.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(texts)
    flat = lists.flatten()
    counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    keep = np.asarray(pc.not_equal(flat, ""))
    return np.asarray(flat, dtype=object)[keep], doc_of[keep]


# SQL building block shared by every oracle below: whitespace tokens with
# empties dropped, exactly matching _tokens_doc_idx.
SQL_TOKS = ("list_filter(regexp_split_to_array(text, '\\s+'), "
            "x -> x <> '')")


# ------------------------------------------------------------------ tf-idf
TFIDF_K = 20


def q_tfidf_top_terms(sf_dir: str, k: int = TFIDF_K, n_buckets: int = 16):
    """Global top-k terms by corpus tf·idf (idf = ln(N/df)).

    Per-batch partial (term → tf, docs-in-batch df; exact because a doc
    is one row and never spans batches) → hash-bucketed groupby so
    per-bucket totals are exact → per-bucket top-k by score → ≤
    buckets·k driver merge. The score is recomputed from the exact
    integer (tf, df) at every level, so ordering is consistent; only
    (term, tf, df) is emitted."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    n_docs = float(ds.count())

    empty = pa.table({"term": pa.array([], pa.string()),
                      "tf": pa.array([], pa.int64()),
                      "df": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.int32())})

    def partial(b: pa.Table) -> pa.Table:
        toks, doc_of = _tokens_doc_idx(b)
        if len(toks) == 0:
            return empty
        per = (pd.DataFrame({"doc": doc_of, "term": toks})
               .groupby(["term", "doc"], sort=False).size()
               .reset_index(name="n"))
        agg = per.groupby("term", sort=False)["n"].agg(["sum", "count"])
        terms = agg.index.to_numpy(dtype=object)
        bucket = (pd.util.hash_array(terms) % n_buckets).astype(np.int32)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "tf": pa.array(agg["sum"].to_numpy(), pa.int64()),
                         "df": pa.array(agg["count"].to_numpy(), pa.int64()),
                         "bucket": pa.array(bucket, pa.int32())})

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        # same arithmetic as the oracle: tf * ln(N * 1.0 / df)
        score = (df["tf"].to_numpy(np.float64)
                 * np.log(n_docs / df["df"].to_numpy(np.float64)))
        out = df.assign(_s=score).sort_values(
            ["_s", "term"], ascending=[False, True], kind="mergesort").head(k)
        return out[["term", "tf", "df"]]

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = (g.groupby("term", sort=False)[["tf", "df"]].sum()
               .reset_index())
        return rank(tot)

    per_bucket = (coalesce_slim(ds.map_batches(partial,
                                               batch_format="pyarrow",
                                               batch_size=BATCH))
                  .groupby("bucket").map_groups(bucket_topk,
                                                batch_format="pandas"))
    merged = per_bucket.to_pandas()  # ≤ n_buckets × k rows
    return (rank(merged).reset_index(drop=True)
            .astype({"tf": "int64", "df": "int64"}))


SQL_TFIDF = f"""
WITH t AS (
  SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents),
s AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM t GROUP BY term)
SELECT term, tf, df FROM s
ORDER BY tf * ln((SELECT count(*) FROM documents) * 1.0 / df) DESC, term
LIMIT {TFIDF_K}"""


# ------------------------------------------------------------------ BM25
BM25_TERMS = ("hash", "merge", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_K = 20


def q_bm25_topk(sf_dir: str, k: int = BM25_K, query_terms: tuple = BM25_TERMS):
    """BM25 top-k retrieval for a fixed query (Robertson idf,
    ln((N-df+0.5)/(df+0.5)+1)).

    Two passes: a stats pass reduces (N, total tokens, per-query-term df)
    to one tiny row per batch (driver-combined — the query side is a
    handful of terms, so this is a broadcast-small-side problem, not a
    shuffle); a scoring pass then ranks every doc vectorized per batch,
    keeps a per-batch top-k, one shrink level, final top-k on the
    driver. Scores order the result but are dropped before emit (ulp
    parity, see module docstring)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    terms = list(query_terms)

    def stats_partial(b: pa.Table) -> pa.Table:
        toks, doc_of = _tokens_doc_idx(b)
        row = {"n_docs": [b.num_rows], "n_tokens": [int(len(toks))]}
        for t in terms:
            mask = toks == t
            row[f"df_{t}"] = [int(len(np.unique(doc_of[mask])))]
        return pa.table({c: pa.array(v, pa.int64()) for c, v in row.items()})

    st = (ds.map_batches(stats_partial, batch_format="pyarrow",
                         batch_size=BATCH)
          .to_pandas().sum())  # one int row per batch — tiny at any scale
    n_docs = float(st["n_docs"])
    avgdl = st["n_tokens"] * 1.0 / st["n_docs"]
    idf = {t: np.log((n_docs - st[f"df_{t}"] + 0.5)
                     / (st[f"df_{t}"] + 0.5) + 1.0) for t in terms}

    def score(b: pa.Table) -> pa.Table:
        toks, doc_of = _tokens_doc_idx(b)
        n = b.num_rows
        dl = np.bincount(doc_of, minlength=n).astype(np.float64)
        s = np.zeros(n, dtype=np.float64)
        tfs = {}
        for t in terms:
            tf = np.bincount(doc_of[toks == t],
                             minlength=n).astype(np.float64)
            tfs[t] = tf
            denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            s += idf[t] * (tf * (BM25_K1 + 1.0)) / denom
        hit = np.zeros(n, dtype=bool)
        for t in terms:
            hit |= tfs[t] > 0
        order = np.lexsort((np.asarray(b.column("doc_id")), -s))
        order = order[hit[order]][:k]
        return pa.table({
            "doc_id": pa.array(
                np.asarray(b.column("doc_id"), np.int64)[order], pa.int64()),
            "dl": pa.array(dl[order].astype(np.int64), pa.int64()),
            **{f"tf_{t}": pa.array(tfs[t][order].astype(np.int64),
                                   pa.int64()) for t in terms},
            "_s": pa.array(s[order], pa.float64())})

    def shrink(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["_s", "doc_id"],
                                       ascending=[False, True],
                                       kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cands = (ds.map_batches(score, batch_format="pyarrow", batch_size=BATCH)
             .repartition(4)
             .map_batches(shrink, batch_format="pyarrow", batch_size=None)
             .to_pandas())  # ≤ 4·k rows
    if "_s" not in cands.columns:  # zero hits anywhere: Ray emits only
        # schema-less empty blocks and to_pandas loses the columns
        cols = ["doc_id", "dl"] + [f"tf_{t}" for t in terms]
        return pd.DataFrame({c: pd.array([], dtype="int64") for c in cols})
    out = cands.sort_values(["_s", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(k).drop(columns="_s")
    return out.reset_index(drop=True).astype(
        {c: "int64" for c in out.columns})


def _sql_bm25() -> str:
    tf_cols = ",\n        ".join(
        f"CAST(sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS tf_{t}" for t in BM25_TERMS)
    score_terms = " + ".join(
        f"""(SELECT ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             FROM df WHERE df.term = '{t}')
            * (tf.tf_{t} * ({BM25_K1} + 1.0))
            / (tf.tf_{t} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / st.avgdl))"""
        for t in BM25_TERMS)
    in_list = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH d AS (
  SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         sum(len(toks)) * 1.0 / count(*) AS avgdl FROM d),
t AS (SELECT doc_id, unnest(toks) AS term FROM d),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
  FROM t WHERE term IN ({in_list}) GROUP BY term),
tf AS (
  SELECT doc_id, {tf_cols}
  FROM t WHERE term IN ({in_list}) GROUP BY doc_id),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d)
SELECT tf.doc_id, dl.dl,
       {", ".join(f"tf.tf_{t}" for t in BM25_TERMS)}
FROM tf JOIN dl USING (doc_id), st
ORDER BY {score_terms} DESC, tf.doc_id
LIMIT {BM25_K}"""


# ------------------------------------------------- repetition (Gopher-style)
def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition metrics per doc — total tokens, distinct
    tokens, top-token multiplicity — plus the keep verdict (top token ≤
    20% of the doc AND ≥ 25% of tokens distinct). One streaming pass,
    pandas C-level groupby per batch, no shuffle; all-integer output."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def rep(b: pa.Table) -> pa.Table:
        toks, doc_of = _tokens_doc_idx(b)
        doc_ids = np.asarray(b.column("doc_id"), np.int64)
        if len(toks) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_unique": pa.array([], pa.int64()),
                             "top_tf": pa.array([], pa.int64()),
                             "keep": pa.array([], pa.bool_())})
        per = (pd.DataFrame({"doc": doc_of, "term": toks})
               .groupby(["doc", "term"], sort=False).size())
        g = per.groupby(level=0)
        n_tok = g.sum()
        n_uniq = g.size()
        top = g.max()
        docs = n_tok.index.to_numpy()
        n_tok_v = n_tok.to_numpy(np.int64)
        n_uniq_v = n_uniq.to_numpy(np.int64)
        top_v = top.to_numpy(np.int64)
        keep = (top_v * 5 <= n_tok_v) & (n_uniq_v * 4 >= n_tok_v)
        return pa.table({"doc_id": pa.array(doc_ids[docs], pa.int64()),
                         "n_tokens": pa.array(n_tok_v, pa.int64()),
                         "n_unique": pa.array(n_uniq_v, pa.int64()),
                         "top_tf": pa.array(top_v, pa.int64()),
                         "keep": pa.array(keep)})

    return ds.map_batches(rep, batch_format="pyarrow", batch_size=BATCH)


SQL_REPETITION = f"""
WITH t AS (
  SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents),
c AS (SELECT doc_id, term, count(*) AS n FROM t GROUP BY doc_id, term)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(max(n) AS BIGINT) AS top_tf,
       (max(n) * 5 <= sum(n) AND count(*) * 4 >= sum(n)) AS keep
FROM c GROUP BY doc_id"""


# --------------------------------------------------------- decontamination
DECON_NGRAM = 5
DECON_MOD, DECON_REM = 10, 7  # benchmark := doc_id % 10 == 7


def _gram_hashes(b: pa.Table, n: int = DECON_NGRAM
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(md5-64 hashes of token n-grams, doc_row_index). Grams are built as
    the literal space-joined strings (so the hash keys the exact string
    the oracle compares) and hashed with the vectorized md5 kernel —
    equality of 64-bit md5 prefixes stands in for string equality
    (collision odds ~1e-10 at 1e5 distinct grams; cryptographically
    negligible at any corpus size)."""
    toks, doc_of = _tokens_doc_idx(b)
    if len(toks) < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    adj = doc_of[: -(n - 1)] == doc_of[n - 1:]
    if not adj.any():
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    parts = [pd.Series(toks[j: len(toks) - (n - 1) + j][adj])
             for j in range(n)]
    grams = parts[0].str.cat(parts[1:], sep=" ").to_numpy(dtype=object)
    return md5_hash64(grams), doc_of[: -(n - 1)][adj]


def q_doc_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag corpus docs sharing any token
    5-gram with the held-out benchmark slice (doc_id % 10 == 7) — the
    n-gram-overlap decontamination step of LLM training pipelines.

    Pass 1 streams the benchmark slice into a distinct gram-hash set
    (benchmark suites are small by definition — MBs — so collecting and
    broadcasting the sorted hash array via ray.put is the
    broadcast-small-side pattern, not a scalability cheat). Pass 2
    streams the corpus, membership-tests each doc's grams with
    searchsorted, and emits (doc_id, contaminated) for every
    non-benchmark doc — including gram-less short docs."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def bench_grams(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), np.int64)
        h, _ = _gram_hashes(b.filter(pa.array(ids % DECON_MOD == DECON_REM)))
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    parts = [np.asarray(t.column("h"), np.uint64)
             for t in ds.map_batches(bench_grams, batch_format="pyarrow",
                                     batch_size=BATCH)
             .iter_batches(batch_format="pyarrow")]
    bench = np.unique(np.concatenate(parts)) if parts \
        else np.empty(0, np.uint64)
    bench_ref = ray.put(bench)

    def flag(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), np.int64)
        b = b.filter(pa.array(ids % DECON_MOD != DECON_REM))
        ref = ray.get(bench_ref)
        h, doc_of = _gram_hashes(b)
        cont = np.zeros(b.num_rows, dtype=bool)
        if len(h) and len(ref):
            pos = np.searchsorted(ref, h)
            pos[pos == len(ref)] = 0
            hits = ref[pos] == h
            cont[np.unique(doc_of[hits])] = True
        return pa.table({"doc_id": b.column("doc_id"),
                         "contaminated": pa.array(cont)})

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=BATCH)


def _sql_decontaminate() -> str:
    n = DECON_NGRAM
    concat = " || ' ' || ".join(f"d.toks[t.i + {j}]" for j in range(n))
    return f"""
WITH d AS (
  SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, {concat} AS gram
  FROM d, LATERAL unnest(range(1, len(d.toks) - {n - 2})) AS t(i)),
bench AS (SELECT DISTINCT gram FROM g
          WHERE doc_id % {DECON_MOD} = {DECON_REM}),
hit AS (SELECT DISTINCT doc_id FROM g
        WHERE gram IN (SELECT gram FROM bench))
SELECT doc_id, (doc_id IN (SELECT doc_id FROM hit)) AS contaminated
FROM documents WHERE doc_id % {DECON_MOD} <> {DECON_REM}"""


# ------------------------------------------------- cross-doc repeated n-grams
REPGRAM_BUCKETS = 64


def q_doc_repeated_ngrams(sf_dir: str, n_buckets: int = REPGRAM_BUCKETS):
    """Per-doc count of token 5-gram positions whose gram occurs ≥2 times
    corpus-wide — the measurement step of exact-substring dedup ("how
    much of this doc is boilerplate repeated elsewhere?").

    Unlike decontamination there is no small side to broadcast (the
    repeated-gram set is corpus-scale), so this is the canonical
    explode→bucketed-count→per-doc-reduce shape: per-batch (gram_hash,
    doc_id, multiplicity) partials → groupby(gram bucket) where each
    bucket totals its grams and converts every position into a per-doc
    (n_grams, n_repeated) contribution → groupby(doc bucket) sums. Two
    bucketed shuffles of the shrunk partials; the raw gram explosion
    never leaves the first map. md5-64 gram hashing as in
    decontamination (collision odds negligible; documented there)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        h, doc_of = _gram_hashes(b)
        ids = np.asarray(b.column("doc_id"), np.int64)
        if len(h) == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        per = (pd.DataFrame({"h": h, "doc_id": ids[doc_of]})
               .groupby(["h", "doc_id"], sort=False).size()
               .reset_index(name="m"))
        bucket = (per["h"].to_numpy(np.uint64)
                  % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"h": pa.array(per["h"].to_numpy(np.uint64),
                                       pa.uint64()),
                         "doc_id": pa.array(per["doc_id"].to_numpy(),
                                            pa.int64()),
                         "m": pa.array(per["m"].to_numpy(np.int64),
                                       pa.int64()),
                         "bucket": pa.array(bucket, pa.int32())})

    def gram_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("h", sort=False)["m"].transform("sum")
        rep = np.where(tot.to_numpy() >= 2, g["m"].to_numpy(np.int64), 0)
        out = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                            "n_grams": g["m"].to_numpy(np.int64),
                            "n_repeated": rep})
        out = out.groupby("doc_id", sort=False).sum().reset_index()
        out["doc_bucket"] = (out["doc_id"] % n_buckets).astype(np.int32)
        return out

    def doc_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("doc_id", sort=False)[["n_grams", "n_repeated"]]
               .sum().reset_index())
        return out.astype({"n_grams": "int64", "n_repeated": "int64"})

    return (coalesce_slim(ds.map_batches(partial, batch_format="pyarrow",
                                         batch_size=BATCH))
            .groupby("bucket").map_groups(gram_bucket,
                                          batch_format="pandas")
            .groupby("doc_bucket").map_groups(doc_bucket,
                                              batch_format="pandas")
            .select_columns(["doc_id", "n_grams", "n_repeated"]))


def _sql_repeated_ngrams() -> str:
    n = DECON_NGRAM
    concat = " || ' ' || ".join(f"d.toks[t.i + {j}]" for j in range(n))
    return f"""
WITH d AS (
  SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, {concat} AS gram
  FROM d, LATERAL unnest(range(1, len(d.toks) - {n - 2})) AS t(i)),
c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeated
FROM g JOIN c USING (gram) GROUP BY doc_id"""


# ------------------------------------------------------- weighted sampling
WSAMPLE_K = 32


def q_doc_weighted_sample(sf_dir: str, k: int = WSAMPLE_K):
    """Deterministic weighted sample without replacement, weight =
    n_chars (Efraimidis-Spirakis via exponential keys: keep the k
    smallest e = -ln(u)/w, u a 60-bit md5 uniform — so longer docs are
    proportionally likelier, and the sample is a pure function of the
    data). Per-batch bottom-k → one shrink level → driver final; the
    float key orders but is never emitted."""
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def keys(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), np.int64)
        w = np.asarray(b.column("n_chars"), np.float64)
        h = md5_hash64(np.char.mod("%d", ids))
        u = (h >> np.uint64(4)).astype(np.float64) / np.float64(2 ** 60)
        e = -np.log(u) / w
        order = np.lexsort((ids, e))[:k]
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "_e": pa.array(e[order], pa.float64())})

    def shrink(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["_e", "doc_id"],
                                       kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cands = (ds.map_batches(keys, batch_format="pyarrow", batch_size=BATCH)
             .repartition(4)
             .map_batches(shrink, batch_format="pyarrow", batch_size=None)
             .to_pandas())  # ≤ 4·k rows
    out = cands.sort_values(["_e", "doc_id"], kind="mergesort").head(k)
    return out[["doc_id"]].reset_index(drop=True).astype({"doc_id": "int64"})


SQL_WSAMPLE = f"""
WITH keyed AS (
  SELECT doc_id,
         -ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             AS UBIGINT) / 1152921504606846976.0) / n_chars AS e
  FROM documents)
SELECT doc_id FROM keyed ORDER BY e, doc_id LIMIT {WSAMPLE_K}"""


# ------------------------------------------------- language-mix rebalance
def q_lang_mix_sample(sf_dir: str):
    """Deterministic corpus rebalancing to a uniform language mixture
    (the multilingual-training data-mix step; CCNet/DoReMi downsample
    the over-represented slices the same way): per-language accept rate
    r_l = n_min / n_l — the largest proportional downsampling with no
    upsampling — applied as a pure function of doc_id (a 60-bit md5
    uniform, the ``doc_weighted_sample`` key construction), so the
    sample is reproducible row-for-row in SQL.

    Two streaming passes: (1) per-batch language partial counts → one
    groupby-sum bounded by #languages, collected once; (2) vectorized
    keep-mask per batch (rates mapped via searchsorted, no Python row
    loop). No shuffle touches document text; pass 2 reads only
    (doc_id, lang)."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("lang").aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=BATCH)
              .groupby("lang").aggregate(Sum("n", alias_name="n"))
              .to_pandas())                       # bounded by #languages
    langs = counts["lang"].to_numpy(dtype=object)
    order = np.argsort(langs)
    langs_sorted = langs[order]
    n = counts["n"].to_numpy(np.float64)[order]
    rates = float(n.min()) / n                    # n_min / n_l, float64

    def pick(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), np.int64)
        lg = np.asarray(b.column("lang"), dtype=object)
        r = rates[np.searchsorted(langs_sorted, lg)]
        h = md5_hash64(np.char.mod("%d", ids))
        u = (h >> np.uint64(4)).astype(np.float64) / np.float64(2 ** 60)
        keep = u < r
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "lang": pa.array(lg[keep], pa.string())})

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=BATCH)


SQL_LANG_MIX = """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
m AS (SELECT min(n) AS mn FROM c)
SELECT d.doc_id, d.lang
FROM documents d JOIN c USING (lang), m
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
           AS UBIGINT) / 1152921504606846976.0
      < CAST(mn AS DOUBLE) / CAST(n AS DOUBLE)"""


# -------------------------------------------------- char-trigram LM score
def q_doc_lm_score(sf_dir: str):
    """CCNet-style LM quality score, two distributed passes:

    1. **model build** — per-batch hashed-char-trigram counts
       (``char_trigram_buckets``: one utf-32 decode + splitmix fold per
       batch, 2^18 buckets) emitted as SPARSE (bucket, n) rows → one
       pandas-groupby combine level → driver final sum into the dense
       2 MB count table. Driver work is bounded by 2^18 rows per combine
       output regardless of corpus size.
    2. **score** — Laplace-smoothed log2 probabilities broadcast once
       (``ray.put``, 2 MB float64); each batch scores its docs with one
       table lookup + ``segment_sums`` (per-doc independent reduceat, so
       results are bit-identical at any batching — the single-node twin
       test asserts exact equality).

    Output (doc_id, n_trigrams, bits_per_trigram): lower = more like the
    corpus; gibberish scores high (pinned in tests). Rows-only for the
    driver (a trained-model score has no SQL twin)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    ref = ray.put(_lm_logp(ds))

    def score(b: pa.Table) -> pa.Table:
        t, bits = _lm_score_arrays(b, ray.get(ref))
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_trigrams": pa.array(t, pa.int64()),
                         "bits_per_trigram": pa.array(bits, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow", batch_size=BATCH)


def _lm_logp(ds) -> np.ndarray:
    """Model-build pass of the CCNet LM score (see q_doc_lm_score §1):
    dense Laplace-smoothed log2-probability table from one streaming
    sparse-count pass; driver work bounded by 2^18 rows per combine."""
    from ..functions.text import LM_BUCKETS, char_trigram_buckets

    def partial(b: pa.Table) -> pa.Table:
        h, _ = char_trigram_buckets(
            np.asarray(b.column("text"), dtype=object))
        cnt = np.bincount(h, minlength=LM_BUCKETS)
        nz = np.nonzero(cnt)[0]
        return pa.table({"b": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("b", sort=False, as_index=False)["n"].sum()

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=BATCH)
             .map_batches(combine, batch_format="pandas",
                          batch_size=1 << 20)
             .to_pandas())  # ≤ 2^18 rows per combine output — bounded
    counts = np.zeros(LM_BUCKETS, dtype=np.int64)
    np.add.at(counts, parts["b"].to_numpy(np.int64),
              parts["n"].to_numpy(np.int64))
    total = int(counts.sum())
    return np.log2((counts + 1.0) / (total + LM_BUCKETS))


def _lm_score_arrays(b: pa.Table, lp: np.ndarray):
    """Scoring kernel of the CCNet LM score (see q_doc_lm_score §2):
    (n_trigrams, bits_per_trigram) arrays for one batch, bit-identical
    at any batching (segment_sums is a per-doc independent reduceat)."""
    from ..functions.text import (char_trigram_buckets,
                                  gather_into_scratch, segment_sums)
    texts = np.asarray(b.column("text"), dtype=object)
    h, offs = char_trigram_buckets(texts)
    # gather into per-worker scratch: a fresh lp[h] is ~100 MB/batch
    # of first-touch pages (see char_trigram_buckets on why that is
    # the dominant cost on this VM)
    g = gather_into_scratch(lp, h, "lmg")
    s = segment_sums(g, offs)
    t = np.diff(offs)
    bits = np.where(t > 0, -s / np.maximum(t, 1), 0.0)
    return t, bits


# CCNet head/middle/tail: 2^12 fixed-point steps per bit bounds the
# per-lang histogram at (score range in bits)·4096 rows — metadata-scale
# at any corpus size — while keeping bucket assignment deterministic
# (thresholds and scores quantize with the same rule).
PPL_QUANT = 4096


def q_doc_ppl_buckets(sf_dir: str):
    """CCNet perplexity bucketing (SURVEY X62; Wenzek et al. 2020 §4.3):
    split each language's documents into head / middle / tail thirds by
    LM score (lower bits-per-trigram = more fluent = head) — the
    standard corpus-quality tiering that downstream mixes sample from.

    Two trigram passes, all driver state bounded: (1) the shared
    trigram model build (`_lm_logp`); (2) ONE scoring pass materializes
    the slim (doc_id, lang, q) table — q the int64 fixed-point score —
    which then serves BOTH the per-(lang, q) histogram (the X56
    exact-histogram-quantile pattern, driver table ≤ #langs ×
    score-range·4096 rows, yielding the 1/3 and 2/3 rank thresholds)
    AND the final vectorized bucket assignment (text never re-read,
    never re-scored; the slim table is 24 B/doc in the object store —
    the politeness-sidecar discipline). Documents never shuffle.
    Rows-only for the driver (LM scores have no SQL twin); twin/balance
    tests pin the semantics."""
    ds = _docs(sf_dir, ["doc_id", "lang", "text"])
    lp_ref = ray.put(_lm_logp(ds))

    def score_slim(b: pa.Table) -> pa.Table:
        _, bits = _lm_score_arrays(b, ray.get(lp_ref))
        return pa.table({"doc_id": b.column("doc_id"),
                         "lang": b.column("lang"),
                         "q": pa.array(np.floor(bits * PPL_QUANT)
                                       .astype(np.int64))})

    scored = ds.map_batches(score_slim, batch_format="pyarrow",
                            batch_size=BATCH).materialize()

    def hist_partial(b: pa.Table) -> pd.DataFrame:
        out = (pd.DataFrame({"lang": np.asarray(b.column("lang"),
                                                dtype=object),
                             "q": np.asarray(b.column("q"), np.int64)})
               .groupby(["lang", "q"], sort=False).size()
               .reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    def hist_combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["lang", "q"], sort=False, as_index=False)
                ["n"].sum())

    # no shuffle: per-block partials → one combine level → driver fold
    # (≤ #langs × score-range·4096 rows — the _lm_logp discipline; a
    # Ray sort-aggregate here billed ~5 s of fixed shuffle cost to a
    # metadata-scale table)
    hist = (scored.map_batches(hist_partial, batch_format="pyarrow",
                               batch_size=1 << 16)
            .map_batches(hist_combine, batch_format="pandas",
                         batch_size=1 << 20)
            .to_pandas())
    hist = (hist.groupby(["lang", "q"], sort=False, as_index=False)
            ["n"].sum().sort_values(["lang", "q"]))
    thr: dict[str, tuple[int, int]] = {}
    for lang, g in hist.groupby("lang", sort=False):
        qv = g["q"].to_numpy(np.int64)
        cum = g["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        r1 = max(1, int(np.ceil(n / 3)))
        r2 = max(1, int(np.ceil(2 * n / 3)))
        thr[lang] = (int(qv[np.searchsorted(cum, r1)]),
                     int(qv[np.searchsorted(cum, r2)]))
    langs_sorted = np.array(sorted(thr), dtype=object)
    t1 = np.array([thr[lg][0] for lg in langs_sorted], np.int64)
    t2 = np.array([thr[lg][1] for lg in langs_sorted], np.int64)
    thr_ref = ray.put((langs_sorted, t1, t2))

    def assign(b: pa.Table) -> pa.Table:
        q = np.asarray(b.column("q"), np.int64)
        lgs, a1, a2 = ray.get(thr_ref)
        pos = np.searchsorted(lgs, np.asarray(b.column("lang"),
                                              dtype=object))
        bucket = np.where(q <= a1[pos], "head",
                          np.where(q <= a2[pos], "middle", "tail"))
        return pa.table({"doc_id": b.column("doc_id"),
                         "lang": b.column("lang"),
                         "ppl_bucket": pa.array(bucket.astype(object),
                                                pa.string())})

    return scored.map_batches(assign, batch_format="pyarrow",
                              batch_size=1 << 16)


# --------------------------------------------- DSIR importance selection
DSIR_BUCKETS = 1024
DSIR_K = 64
DSIR_TARGET_LANG = "en"


def q_dsir_select(sf_dir: str, k: int = DSIR_K,
                  n_buckets: int = DSIR_BUCKETS,
                  target_lang: str = DSIR_TARGET_LANG):
    """DSIR-style data selection (Xie et al. 2023, public): pick the k
    docs whose hashed-unigram distribution is most target-like, where
    the target is the ``lang == target_lang`` slice of the corpus.

    Two streaming passes:

    1. **feature models** — per-batch dense bucket-count vectors for
       target and raw token streams (bucket = 60-bit md5 of the token
       mod ``n_buckets``, the exact integer recipe the weighted-sample
       oracle proves against DuckDB) → one tree-combine level → driver
       final; driver state is two length-``n_buckets`` int vectors
       regardless of corpus size. λ_b = ln-likelihood ratio with add-1
       smoothing.
    2. **score + select** — λ broadcast once (``ray.put``); each batch
       scores its docs with one gather + scatter-add, keeps a per-batch
       top-k, one shrink level, driver final (the bm25 shape). Zero-
       token docs are excluded (they have no features, matching the
       oracle's join semantics). Per module doctrine the float weight
       orders but is never emitted — output is (doc_id, n_toks).
    """
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def counts(b: pa.Table) -> pa.Table:
        toks, doc_of = _tokens_doc_idx(b)
        if len(toks) == 0:
            t = r = np.zeros(n_buckets, np.int64)
        else:
            bk = ((md5_hash64(toks) >> np.uint64(4))
                  % np.uint64(n_buckets)).astype(np.int64)
            is_t = np.asarray(pc.equal(b.column("lang"),
                                       target_lang))[doc_of]
            r = np.bincount(bk, minlength=n_buckets)
            t = np.bincount(bk[is_t], minlength=n_buckets)
        return pa.table({
            "t": pa.array([t.tolist()], pa.list_(pa.int64())),
            "r": pa.array([r.tolist()], pa.list_(pa.int64()))})

    def combine(bt: pa.Table) -> pa.Table:
        t = np.asarray(bt.column("t").to_pylist(), np.int64).sum(axis=0)
        r = np.asarray(bt.column("r").to_pylist(), np.int64).sum(axis=0)
        return pa.table({
            "t": pa.array([t.tolist()], pa.list_(pa.int64())),
            "r": pa.array([r.tolist()], pa.list_(pa.int64()))})

    parts = (ds.map_batches(counts, batch_format="pyarrow",
                            batch_size=BATCH)
             .map_batches(combine, batch_format="pyarrow", batch_size=64)
             .take_all())
    tb = np.sum([np.asarray(p["t"], np.int64) for p in parts], axis=0)
    rb = np.sum([np.asarray(p["r"], np.int64) for p in parts], axis=0)
    lam = (np.log((tb + 1.0) / (tb.sum() + n_buckets))
           - np.log((rb + 1.0) / (rb.sum() + n_buckets)))
    ref = ray.put(lam)

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_toks": pa.array([], pa.int64()),
                      "_w": pa.array([], pa.float64())})

    def score(b: pa.Table) -> pa.Table:
        toks, doc_of = _tokens_doc_idx(b)
        if len(toks) == 0:
            return empty
        ids = np.asarray(b.column("doc_id"), np.int64)
        bk = ((md5_hash64(toks) >> np.uint64(4))
              % np.uint64(n_buckets)).astype(np.int64)
        lam_ = ray.get(ref)
        w = np.zeros(b.num_rows, np.float64)
        np.add.at(w, doc_of, lam_[bk])
        ntok = np.bincount(doc_of, minlength=b.num_rows)
        order = np.lexsort((ids, -w))
        order = order[ntok[order] > 0][:k]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_toks": pa.array(ntok[order].astype(np.int64), pa.int64()),
            "_w": pa.array(w[order], pa.float64())})

    def shrink(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["_w", "doc_id"],
                                       ascending=[False, True],
                                       kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cands = (ds.map_batches(score, batch_format="pyarrow", batch_size=BATCH)
             .repartition(4)
             .map_batches(shrink, batch_format="pyarrow", batch_size=None)
             .to_pandas())  # ≤ 4·k rows
    if "_w" not in cands.columns:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "n_toks": pd.array([], dtype="int64")})
    out = (cands.sort_values(["_w", "doc_id"], ascending=[False, True],
                             kind="mergesort").head(k).drop(columns="_w"))
    return out.reset_index(drop=True).astype({c: "int64"
                                              for c in out.columns})


SQL_DSIR = f"""
WITH t AS (
  SELECT doc_id, lang, unnest({SQL_TOKS}) AS term FROM documents),
b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(term), 1, 15)) AS UBIGINT)
           % {DSIR_BUCKETS} AS bk
  FROM t),
c AS (
  SELECT bk,
         count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS tb,
         count(*) AS rb
  FROM b GROUP BY bk),
tot AS (SELECT sum(tb)::DOUBLE AS tt, sum(rb)::DOUBLE AS rr FROM c),
lam AS (
  SELECT bk, ln((tb + 1.0) / (tt + {DSIR_BUCKETS}))
           - ln((rb + 1.0) / (rr + {DSIR_BUCKETS})) AS l
  FROM c, tot),
sc AS (
  SELECT doc_id, sum(l) AS w, CAST(count(*) AS BIGINT) AS n_toks
  FROM b JOIN lam USING (bk) GROUP BY doc_id)
SELECT doc_id, n_toks FROM sc ORDER BY w DESC, doc_id LIMIT {DSIR_K}"""


# ------------------------------------------------------- inverted index
PROBE_TERMS = ("join", "window", "spark", "dup")
INVIDX_BUCKETS = 32


def inverted_index_build(sf_dir: str, n_buckets: int = INVIDX_BUCKETS,
                         index_root: str | None = None,
                         doc_mask=None, tag_suffix: str = "") -> str:
    """Build (idempotently) a distributed inverted index over the
    documents table: (term, doc_id, tf) posting rows, hive-partitioned
    by ``bucket = hash(term) % n_buckets`` so a term lookup reads ONLY
    its bucket's parquet files — the partition-pruned-read layout the
    IVF index (functions/ann.py ivf_build) established, applied to text
    retrieval (the at-scale serving path for the X16 BM25 scorer: score
    against postings for the query's terms instead of rescanning the
    corpus). Tokenization is the corpus-wide whitespace rule
    (:func:`_tokens_doc_idx`), identical to every other curation oracle.

    Build is one streaming pass: per-batch (term, doc_id)→tf partials
    are exact because a document is one row and never spans batches; no
    shuffle at all — the hive write IS the term partitioning. Postings
    within a fragment are sorted by (term, doc_id). Crash-safe .tmp +
    atomic rename, fingerprinted cache key (ivf_build precedent).

    Reference analog: none — the reference serves shard metadata, not
    content; this is the retrieval index a curated corpus ships with."""
    import os
    import shutil

    from ..functions.ann import _dataset_fingerprint

    src = f"{sf_dir}/documents.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir)) + tag_suffix
    index_root = index_root or (
        f"/tmp/graft_invidx/{tag}_b{n_buckets}_{_dataset_fingerprint(src)}")
    marker = os.path.join(index_root, "_BUILT")
    if os.path.exists(marker):
        return index_root
    shutil.rmtree(index_root, ignore_errors=True)
    tmp_root = index_root + ".tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)

    def postings(b: pa.Table) -> pa.Table:
        if doc_mask is not None:
            b = b.filter(pa.array(doc_mask(
                np.asarray(b.column("doc_id"), np.int64))))
        toks, doc_of = _tokens_doc_idx(b)
        ids = np.asarray(b.column("doc_id"), np.int64)[doc_of]
        per = (pd.DataFrame({"term": toks, "doc_id": ids})
               .groupby(["term", "doc_id"], sort=True).size()
               .reset_index(name="tf"))
        terms = per["term"].to_numpy(dtype=object)
        bucket = (pd.util.hash_array(terms) % n_buckets).astype(np.int32)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(per["doc_id"].to_numpy(np.int64)),
                         "tf": pa.array(per["tf"].to_numpy(np.int64)),
                         "bucket": pa.array(bucket, pa.int32())})

    (_docs(sf_dir, ["doc_id", "text"])
     .map_batches(postings, batch_format="pyarrow", batch_size=BATCH)
     .write_parquet(tmp_root, partition_cols=["bucket"]))
    with open(os.path.join(tmp_root, "_BUILT"), "w") as f:
        f.write("ok")
    os.rename(tmp_root, index_root)  # atomic publish
    return index_root


def term_postings(sf_dir: str, terms=PROBE_TERMS,
                  n_buckets: int = INVIDX_BUCKETS,
                  stats: dict | None = None,
                  index_root: str | None = None):
    """Posting lookup against the bucketed inverted index: compute the
    probe terms' buckets, read ONLY those ``bucket=K`` directories, and
    filter to the exact terms. Returns (term, doc_id, tf). Pass
    ``stats`` to capture how many of the index's buckets were read (the
    pruned-read evidence, tested). ``index_root`` probes an existing
    index layout (the X61 merged generation) instead of building."""
    import os

    root = index_root or inverted_index_build(sf_dir, n_buckets)
    terms_arr = np.asarray(sorted(set(terms)), dtype=object)
    # NB: array mod, not per-scalar — np.uint64 scalar % python int
    # promotes through float64 and corrupts the bucket id
    buckets = sorted(set(
        (pd.util.hash_array(terms_arr) % np.uint64(n_buckets))
        .astype(np.int64).tolist()))
    import glob as _glob
    paths = [f for k in buckets
             for f in sorted(_glob.glob(
                 os.path.join(root, f"bucket={k}", "*.parquet")))]
    if stats is not None:
        stats["buckets_read"] = len(buckets)
        stats["buckets_total"] = sum(
            1 for d in os.listdir(root) if d.startswith("bucket="))
    if not paths:
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             "doc_id": pd.Series(dtype="int64"),
                             "tf": pd.Series(dtype="int64")})
    term_set_ref = ray.put(terms_arr)

    def probe(b: pa.Table) -> pa.Table:
        t = b.column("term")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        want = ray.get(term_set_ref)
        pos = np.searchsorted(want, np.asarray(t, dtype=object))
        pos = np.minimum(pos, len(want) - 1)
        keep = want[pos] == np.asarray(t, dtype=object)
        return b.filter(pa.array(keep)).select(["term", "doc_id", "tf"])

    return ray.data.read_parquet(paths).map_batches(
        probe, batch_format="pyarrow", batch_size=65536)


def q_term_postings(sf_dir: str):
    return term_postings(sf_dir)


def _sql_term_postings(terms=PROBE_TERMS) -> str:
    lst = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH t AS (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents)
SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
FROM t WHERE term IN ({lst}) GROUP BY term, doc_id"""


# ----------------------------------------- incremental index merge (LSM)
IDXMERGE_SALT = "idxdelta:"
IDXMERGE_MOD = 4          # every 4th doc (by salted md5) is the delta


def _idx_delta_mask(ids: np.ndarray) -> np.ndarray:
    h = md5_hash64(np.char.add(IDXMERGE_SALT, np.char.mod("%d", ids)))
    return (h >> np.uint64(4)) % np.uint64(IDXMERGE_MOD) == 0


def inverted_index_merge(sf_dir: str,
                         n_buckets: int = INVIDX_BUCKETS) -> str:
    """Incremental inverted-index maintenance (SURVEY X61): the
    LSM-style merge every living corpus needs — a new crawl increment
    arrives, its postings are folded into the served index WITHOUT
    rebuilding from the full corpus (Lucene segment merging / LSM-tree
    compaction, O'Neil et al. 1996). Deterministic split for the
    fixture: every ``IDXMERGE_MOD``-th document (salted md5) is the
    delta; the rest are the already-indexed base.

    Merge = ONE slim bucketed shuffle over posting rows (term, doc_id,
    tf): base postings stream straight from the base index's parquet
    (never re-tokenized — the point of incrementality), the delta is
    one tokenize pass over the delta docs only, and the per-bucket fold
    re-sums tf by (term, doc_id) — correct under doc UPDATES too, not
    just inserts, because a re-crawled doc's old and new postings meet
    in the same bucket. Output layout is identical to the base index
    (hive ``bucket=K``, atomic ``.tmp``→rename publish, fingerprinted
    cache), so probes are layout-oblivious; the equality
    "merged index ≡ full rebuild" is the driver-checked oracle
    (`term_postings_merged` uses the SAME full-corpus SQL as
    `term_postings`). At production scale only buckets whose delta is
    non-empty need rewriting — here the whitespace vocab touches all
    32, the general pruning is the ``bucket=`` layout itself."""
    import glob as _glob
    import os
    import shutil

    from ..functions.ann import _dataset_fingerprint

    src = f"{sf_dir}/documents.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_root = (f"/tmp/graft_invidx/{tag}_merged_b{n_buckets}_"
                f"{_dataset_fingerprint(src)}")
    marker = os.path.join(out_root, "_BUILT")
    if os.path.exists(marker):
        return out_root
    base_root = inverted_index_build(
        sf_dir, n_buckets, doc_mask=lambda ids: ~_idx_delta_mask(ids),
        tag_suffix="_base")
    shutil.rmtree(out_root, ignore_errors=True)
    tmp_root = out_root + ".tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)

    base = ray.data.read_parquet(
        sorted(_glob.glob(os.path.join(base_root, "bucket=*", "*.parquet"))),
        columns=["term", "doc_id", "tf"])

    def delta_postings(b: pa.Table) -> pa.Table:
        b = b.filter(pa.array(_idx_delta_mask(
            np.asarray(b.column("doc_id"), np.int64))))
        toks, doc_of = _tokens_doc_idx(b)
        ids = np.asarray(b.column("doc_id"), np.int64)[doc_of]
        per = (pd.DataFrame({"term": toks, "doc_id": ids})
               .groupby(["term", "doc_id"], sort=True).size()
               .reset_index(name="tf"))
        return pa.table({
            "term": pa.array(per["term"].to_numpy(dtype=object),
                             pa.string()),
            "doc_id": pa.array(per["doc_id"].to_numpy(np.int64)),
            "tf": pa.array(per["tf"].to_numpy(np.int64))})

    delta = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        delta_postings, batch_format="pyarrow", batch_size=BATCH)

    def add_bucket(b: pa.Table) -> pa.Table:
        terms = b.column("term").to_pandas().to_numpy(dtype=object)
        bucket = (pd.util.hash_array(terms) % n_buckets).astype(np.int32)
        return b.append_column("bucket", pa.array(bucket, pa.int32()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["term", "doc_id"], sort=True,
                         as_index=False)["tf"].sum())
        out["bucket"] = g["bucket"].iloc[0]
        return out.astype({"tf": "int64"})

    (coalesce_slim(base.union(delta).map_batches(
        add_bucket, batch_format="pyarrow", batch_size=65536))
     .groupby("bucket").map_groups(fold, batch_format="pandas")
     .write_parquet(tmp_root, partition_cols=["bucket"]))
    with open(os.path.join(tmp_root, "_BUILT"), "w") as f:
        f.write("ok")
    os.rename(tmp_root, out_root)
    return out_root


def q_term_postings_merged(sf_dir: str):
    """Probe the base+delta MERGED index; the oracle is the full-corpus
    rebuild SQL — the merged generation must be indistinguishable."""
    return term_postings(sf_dir,
                         index_root=inverted_index_merge(sf_dir))


# -------------------------------------- hashed-logreg quality classifier
CLF_BUCKETS = 1024
CLF_ITERS = 30
CLF_LR = 20.0
CLF_TRAIN_FRAC = 0.5
CLF_TARGET_LANG = "en"


def q_doc_quality_classifier(sf_dir: str,
                             n_buckets: int = CLF_BUCKETS,
                             iters: int = CLF_ITERS,
                             lr: float = CLF_LR,
                             train_frac: float = CLF_TRAIN_FRAC,
                             target_lang: str = CLF_TARGET_LANG,
                             batch_size: int = BATCH):
    """CCNet/GPT-3-style quality-classifier pipeline (SURVEY X49): train
    a hashed-unigram logistic regression on a deterministic doc_id-hash
    sample of the corpus (labels: ``lang == target_lang``), then score
    every document in one streaming pass.

    The training sample's slim feature rows are materialized ONCE and
    iterated by synchronized full-batch GD with int64 fixed-point
    gradient partials — trained weights and emitted logits are
    bit-identical at any batch size or partitioning (twin-tested).
    Rows-only for the driver (a trained-model score has no SQL twin).
    See functions/classifier.py for the full scale discussion."""
    from ..functions.classifier import (featurize_batch, score_batch,
                                        train_quality_classifier,
                                        train_sample_mask)

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def feats_sample(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), np.int64)
        f = featurize_batch(b, n_buckets, target_lang)
        return f.filter(pa.array(train_sample_mask(ids, train_frac)))

    train_feats = ds.map_batches(feats_sample, batch_format="pyarrow",
                                 batch_size=batch_size).materialize()
    w = train_quality_classifier(train_feats, n_buckets=n_buckets,
                                 iters=iters, lr=lr,
                                 batch_size=batch_size)
    wref = ray.put(w)

    def score(b: pa.Table) -> pa.Table:
        return score_batch(b, ray.get(wref), n_buckets, target_lang)

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=batch_size)


# --------------------------------------- temperature-sampled language mix
TEMP_ALPHA = 0.5


def q_lang_temperature_sample(sf_dir: str, alpha: float = TEMP_ALPHA):
    """Temperature-based multinomial language rebalancing (SURVEY X50):
    the mC4 / XLM-R data-mix rule (Conneau et al. 2020 §3.1) — sample
    language l with probability p_l ∝ (n_l / N)^alpha, which upweights
    low-resource slices relative to their natural share. The realized
    per-language accept rate against a fixed corpus is
    r_l = min(1, S * p_l / n_l) with budget S chosen as the largest
    value that needs no upsampling (S = min_l n_l / p_l), so the rarest
    language is kept whole and every other slice is downsampled toward
    the tempered mix — the α→1 limit keeps everything, the α→0 limit
    is the uniform rebalance of ``lang_mix_sample``.

    Same two-pass shape as ``q_lang_mix_sample``: one bounded
    language-count aggregate, then a vectorized keep-mask pass over
    (doc_id, lang) driven by the md5 uniform key — reproducible
    row-for-row in SQL. Only the integer facts are emitted; the float
    rate appears on both sides of a strict inequality computed with
    the same double-precision formula."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("lang").aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=BATCH)
              .groupby("lang").aggregate(Sum("n", alias_name="n"))
              .to_pandas())                       # bounded by #languages
    langs = counts["lang"].to_numpy(dtype=object)
    order = np.argsort(langs)
    langs_sorted = langs[order]
    n = counts["n"].to_numpy(np.float64)[order]
    p = n ** alpha
    p = p / p.sum()                               # tempered mix
    budget = (n / p).min()                        # largest no-upsample S
    rates = np.minimum(1.0, budget * p / n)

    def pick(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), np.int64)
        lg = np.asarray(b.column("lang"), dtype=object)
        r = rates[np.searchsorted(langs_sorted, lg)]
        h = md5_hash64(np.char.mod("%d", ids))
        u = (h >> np.uint64(4)).astype(np.float64) / np.float64(2 ** 60)
        keep = u < r
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "lang": pa.array(lg[keep], pa.string())})

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=BATCH)


SQL_LANG_TEMP = f"""
WITH c AS (SELECT lang, count(*)::DOUBLE AS n FROM documents GROUP BY lang),
p AS (SELECT lang, n, pow(n, {TEMP_ALPHA}) / sum(pow(n, {TEMP_ALPHA})) OVER ()
        AS pl FROM c),
b AS (SELECT min(n / pl) AS s FROM p),
r AS (SELECT lang, least(1.0, s * pl / n) AS rate FROM p, b)
SELECT d.doc_id, d.lang
FROM documents d JOIN r USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
           AS UBIGINT) / 1152921504606846976.0 < rate"""


# ----------------------------------------------------- source data cards
def q_source_data_card(sf_dir: str):
    """Per-source corpus data card (SURVEY X52): the dataset-
    documentation aggregate every released corpus ships (C4's and
    Dolma's per-domain composition tables) — docs, token and char
    volume, English share, and language diversity per source.

    ONE streaming pass emits per-batch (source, lang) partials (counts
    + token/char sums), then one groupby bounded by #sources × #langs —
    a metadata-scale table at any corpus size — finished vectorized on
    the driver. Only integer facts are emitted."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        toks, doc_of = _tokens_doc_idx(b)
        ntok = np.bincount(doc_of, minlength=b.num_rows).astype(np.int64)
        t = pa.table({
            "source": b.column("source"),
            "lang": b.column("lang"),
            "n_toks": pa.array(ntok, pa.int64()),
            "n_chars": b.column("n_chars"),
        })
        g = t.group_by(["source", "lang"]).aggregate(
            [([], "count_all"), ("n_toks", "sum"), ("n_chars", "sum")])
        return g.rename_columns(["source", "lang", "n_docs",
                                 "total_tokens", "total_chars"])

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=BATCH)
             .groupby(["source", "lang"])
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("total_tokens", alias_name="total_tokens"),
                        Sum("total_chars", alias_name="total_chars"))
             .to_pandas())              # bounded: #sources × #langs rows
    en = parts[parts.lang == "en"].groupby("source")["n_docs"].sum()
    out = parts.groupby("source").agg(
        n_docs=("n_docs", "sum"), n_langs=("lang", "nunique"),
        total_tokens=("total_tokens", "sum"),
        total_chars=("total_chars", "sum")).reset_index()
    out["n_en"] = out["source"].map(en).fillna(0).astype("int64")
    out = out[["source", "n_docs", "n_en", "n_langs",
               "total_tokens", "total_chars"]]
    return out.sort_values("source").reset_index(drop=True)


SQL_DATA_CARD = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(len({SQL_TOKS})) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source ORDER BY source"""


# ----------------------------------------- leakage-free train/valid split
SPLIT_SALT = "split3:"
SPLIT_VALID_FRAC = 0.125


def q_train_valid_split(sf_dir: str, valid_frac: float = SPLIT_VALID_FRAC):
    """Contamination-safe train/valid split (SURVEY X53): the split key
    is the SOURCE (domain), not the document — every doc from one source
    lands on the same side, so near-duplicates within a domain can never
    straddle the split (the leakage mode document-level splits suffer;
    the C4/Pile eval-split discipline). Assignment is the md5 uniform
    key of the salted source name: a pure function of the data, no
    shuffle at all — one vectorized map over (doc_id, source)."""
    ds = _docs(sf_dir, ["doc_id", "source"])

    def tag(b: pa.Table) -> pa.Table:
        src = np.asarray(b.column("source"), dtype=object)
        h = md5_hash64(np.char.add(SPLIT_SALT, src.astype(str)))
        u = (h >> np.uint64(4)).astype(np.float64) / np.float64(2 ** 60)
        split = np.where(u < valid_frac, "valid", "train")
        return pa.table({"doc_id": b.column("doc_id"),
                         "source": b.column("source"),
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=BATCH)


SQL_SPLIT = f"""
SELECT doc_id, source,
       CASE WHEN CAST(('0x' || substr(md5('{SPLIT_SALT}' || source), 1, 15))
                 AS UBIGINT) / 1152921504606846976.0 < {SPLIT_VALID_FRAC}
            THEN 'valid' ELSE 'train' END AS split
FROM documents"""


# ------------------------------------- per-group percentile quality gate
PCTL_Q = 0.25


def q_quality_percentile_filter(sf_dir: str, q: float = PCTL_Q):
    """Per-language percentile quality gate (SURVEY X56): drop each
    language's bottom quartile by length — the relative-threshold form
    of the Gopher/CCNet quality gates (absolute cutoffs misfire across
    languages whose length distributions differ; the percentile is
    per-group by construction).

    Pass 1 reuses the exact histogram-quantile shape of
    ``docs_queries.q_doc_length_quantiles`` (value-count partials → one
    groupby bounded by #langs × #distinct lengths → DuckDB
    quantile_disc rank rule ceil(q·n)); thresholds — one row per
    language — broadcast in the closure; pass 2 is a vectorized
    keep-mask. No shuffle ever touches the documents themselves."""
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["lang", "n_chars"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    hist = (ds.map_batches(partial, batch_format="pandas",
                           batch_size=BATCH)
            .groupby(["lang", "n_chars"])
            .sum("n")
            .to_pandas())            # ≤ #langs × #distinct lengths rows
    hist = hist.rename(columns={"sum(n)": "n"}).sort_values(
        ["lang", "n_chars"])
    thr: dict[str, int] = {}
    for lang, g in hist.groupby("lang", sort=False):
        vals = g["n_chars"].to_numpy(np.int64)
        cum = g["n"].to_numpy(np.int64).cumsum()
        rank = max(1, int(np.ceil(q * int(cum[-1]))))
        thr[lang] = int(vals[np.searchsorted(cum, rank)])
    langs_sorted = np.array(sorted(thr), dtype=object)
    thr_arr = np.array([thr[lg] for lg in langs_sorted], np.int64)

    def keep(b: pa.Table) -> pa.Table:
        lg = np.asarray(b.column("lang"), dtype=object)
        nch = np.asarray(b.column("n_chars"), np.int64)
        t = thr_arr[np.searchsorted(langs_sorted, lg)]
        return b.filter(pa.array(nch >= t))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=BATCH)


SQL_PCTL_FILTER = f"""
WITH t AS (SELECT lang, quantile_disc(n_chars, {PCTL_Q}) AS thr
           FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN t USING (lang)
WHERE d.n_chars >= t.thr"""


# ------------------------------------------------ model-eval AUC (rank sum)
def q_score_auc_eval(sf_dir: str):
    """Distributed classifier evaluation (SURVEY X55): the AUC /
    Mann-Whitney U of a score against a binary label, computed exactly
    from per-score counts — the eval every filter model (X49, CCNet,
    fastText quality) needs at corpus scale. Demonstrated on a
    data-derived score (n_chars predicting lang='en') so DuckDB can
    recompute it bit-for-bit; a model-score AUC quantizes logits first
    (standard practice) and reuses this exact machinery.

    The ties-averaged U = Σ_s n_pos(s)·(cum_neg_below(s) + n_neg(s)/2)
    needs only (score → n_pos, n_neg): ONE partial-aggregated groupby
    bounded by the distinct-score count (a metadata-scale table — doc
    lengths, or quantized logits), then an exact integer fold on the
    driver. Emitted as 2U (doubling clears the half-credit ties term),
    so the output is all-int64 and the oracle hash-matches: AUC =
    u2 / (2·n_pos·n_neg)."""
    ds = _docs(sf_dir, ["n_chars", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        is_p = np.asarray(pc.equal(b.column("lang"), "en"))
        nch = np.asarray(b.column("n_chars"), np.int64)
        t = pa.table({"score": pa.array(nch, pa.int64()),
                      "np_": pa.array(is_p.astype(np.int64), pa.int64()),
                      "nn_": pa.array((~is_p).astype(np.int64),
                                      pa.int64())})
        g = t.group_by("score").aggregate([("np_", "sum"), ("nn_", "sum")])
        return g.rename_columns(["score", "np_", "nn_"])

    from ray.data.aggregate import Sum
    per_score = (ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=BATCH)
                 .groupby("score")
                 .aggregate(Sum("np_", alias_name="np_"),
                            Sum("nn_", alias_name="nn_"))
                 .to_pandas())          # bounded by #distinct scores
    per_score = per_score.sort_values("score")
    np_ = per_score["np_"].to_numpy(np.int64)
    nn_ = per_score["nn_"].to_numpy(np.int64)
    cum_nn = np.concatenate(([0], np.cumsum(nn_)[:-1]))
    u2 = int((np_ * (2 * cum_nn + nn_)).sum())
    return pd.DataFrame({"n_pos": pd.array([int(np_.sum())], "int64"),
                         "n_neg": pd.array([int(nn_.sum())], "int64"),
                         "u2": pd.array([u2], "int64")})


SQL_AUC = """
WITH s AS (
  SELECT n_chars AS score,
         count(*) FILTER (WHERE lang = 'en') AS np_,
         count(*) FILTER (WHERE lang <> 'en') AS nn_
  FROM documents GROUP BY n_chars),
o AS (
  SELECT score, np_, nn_,
         coalesce(sum(nn_) OVER (ORDER BY score
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS cum_nn
  FROM s)
SELECT CAST(sum(np_) AS BIGINT) AS n_pos,
       CAST(sum(nn_) AS BIGINT) AS n_neg,
       CAST(sum(np_ * (2 * cum_nn + nn_)) AS BIGINT) AS u2
FROM o"""


# ------------------------------------------------- token-budget trimming
TRIM_SALT = "trim5:"
TRIM_FRAC = 0.25
TRIM_BUCKETS = 64


def q_corpus_budget_trim(sf_dir: str, frac: float = TRIM_FRAC):
    """Char-budget corpus trim in seeded order (SURVEY X54): keep the
    prefix of the md5-shuffled corpus whose cumulative size fits the
    budget — how a fixed-token-budget training run selects its subset
    without biasing toward any source or crawl order (the seeded
    permutation IS the unbiased sampler).

    The global running sum is an ordered-bucket prefix sum, not a
    driver sort: bucket = top-6-bits of the 60-bit key (order-
    preserving across buckets), (1) per-bucket char totals → driver
    prefix over 64 rows, (2) per-bucket vectorized sort + cumsum +
    bucket base, keep rows with cum ≤ budget. Both passes move only
    (doc_id, key, n_chars) — text never shuffles; exact int64
    arithmetic end-to-end so the DuckDB window-sum oracle matches
    row-for-row."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def keyed(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), np.int64)
        h = md5_hash64(np.char.add(TRIM_SALT, np.char.mod("%d", ids)))
        key = (h >> np.uint64(4)).astype(np.int64)
        return pa.table({
            "bucket": pa.array(key >> (60 - 6), pa.int64()),
            "key": pa.array(key, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": b.column("n_chars")})

    slim = coalesce_slim(ds.map_batches(keyed, batch_format="pyarrow",
                                        batch_size=BATCH))
    totals = (slim.groupby("bucket")
              .aggregate(Sum("n_chars", alias_name="chars"))
              .to_pandas())                     # ≤ TRIM_BUCKETS rows
    tb = np.zeros(TRIM_BUCKETS, np.int64)
    tb[totals["bucket"].to_numpy(np.int64)] = \
        totals["chars"].to_numpy(np.int64)
    bases = np.concatenate(([0], np.cumsum(tb)[:-1]))
    budget = int(np.int64(tb.sum()) * frac)     # floor, exact at int64
    bases_ref = ray.put(bases)

    def trim(g: pa.Table) -> pa.Table:
        key = np.asarray(g.column("key"), np.int64)
        ids = np.asarray(g.column("doc_id"), np.int64)
        nch = np.asarray(g.column("n_chars"), np.int64)
        order = np.lexsort((ids, key))
        cum = np.cumsum(nch[order]) + ray.get(bases_ref)[key[0] >> (60 - 6)]
        keep = cum <= budget
        return pa.table({"doc_id": pa.array(ids[order][keep], pa.int64()),
                         "n_chars": pa.array(nch[order][keep], pa.int64())})

    return slim.groupby("bucket").map_groups(trim, batch_format="pyarrow")


SQL_BUDGET_TRIM = f"""
WITH k AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substr(md5('{TRIM_SALT}' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) AS key
  FROM documents),
tot AS (SELECT CAST(floor(sum(n_chars) * {TRIM_FRAC}) AS BIGINT) AS b FROM k),
c AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY key, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM k)
SELECT doc_id, n_chars FROM c, tot WHERE cum <= b"""


# ------------------------------------- cross-source n-gram overlap matrix
def q_source_overlap_matrix(sf_dir: str, n: int = DECON_NGRAM,
                            n_buckets: int = 64):
    """Cross-source overlap matrix (SURVEY X65): for every source pair,
    how many DISTINCT token n-grams appear in both — the provenance
    contamination report a multi-source corpus needs before mixing
    (Lee et al. 2022's cross-split overlap measure at source grain:
    shared text inflates a source's apparent contribution and leaks
    across source-keyed train/valid splits, X53).

    The X45 mirror-host shape on (gram, source): per-batch DISTINCT
    (md5-64(gram), source) partials → ONE gram-bucketed slim shuffle (a
    gram never spans buckets; cross-batch duplicates collapse in the
    fold) → per-gram source-pair emission (≤ C(#sources, 2) rows per
    gram — bounded) → final groupby bounded by #sources². Gram strings
    never shuffle — 64-bit hashes stand in for string equality (the
    `_gram_hashes` collision bound)."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        h, doc_of = _gram_hashes(b, n)
        src = np.asarray(b.column("source"), dtype=object)[doc_of]
        d = pd.DataFrame({"h": h.astype(np.int64), "source": src}
                         ).drop_duplicates()
        hv = d["h"].to_numpy(np.int64)
        return pa.table({
            "h": pa.array(hv),
            "source": pa.array(d["source"].to_numpy(dtype=object),
                               pa.string()),
            "bucket": pa.array((hv.astype(np.uint64)
                                % np.uint64(n_buckets)).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["h", "source"])
        m = d.merge(d, on="h")
        m = m[m["source_x"] < m["source_y"]]
        out = (m.groupby(["source_x", "source_y"], sort=False)
               .size().reset_index(name="n_shared"))
        return pd.DataFrame({
            "source_a": out["source_x"],
            "source_b": out["source_y"],
            "n_shared": out["n_shared"].astype("int64")})

    return (coalesce_slim(ds.map_batches(partial, batch_format="pyarrow",
                                         batch_size=BATCH))
            .groupby("bucket").map_groups(fold, batch_format="pandas")
            .groupby(["source_a", "source_b"])
            .aggregate(Sum("n_shared", alias_name="n_shared")))


def _sql_source_overlap() -> str:
    n = DECON_NGRAM
    concat = " || ' ' || ".join(f"d.toks[t.i + {j}]" for j in range(n))
    return f"""
WITH d AS (SELECT source, {SQL_TOKS} AS toks FROM documents),
g AS (SELECT DISTINCT source, {concat} AS gram
      FROM d, LATERAL unnest(range(1, len(d.toks) - {n - 2})) AS t(i))
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2"""


# ------------------------------------------------ rollup cube (source×lang)
def q_corpus_rollup(sf_dir: str):
    """Multi-level corpus rollup (SURVEY X60): doc and char volumes at
    every grouping level of (source, lang) — the GROUPING SETS cube a
    dataset card's summary tables are cut from ((source, lang),
    (source), (lang), ()), absent keys as the '*' sentinel.

    ONE streaming partial pass + one groupby bounded by
    #sources × #langs computes the finest grain; the three coarser
    levels are re-aggregations of that metadata-scale table on the
    driver (re-reading the corpus once per level — what GROUPING SETS
    does naively — would be 4 full scans for zero extra information).
    Exact int64 end-to-end."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["source", "lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["source", "lang"], sort=False)
             .agg(n_docs=("n_chars", "size"), chars=("n_chars", "sum"))
             .reset_index())
        return g.astype({"n_docs": "int64", "chars": "int64"})

    fine = (ds.map_batches(partial, batch_format="pandas",
                           batch_size=BATCH)
            .groupby(["source", "lang"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("chars", alias_name="chars"))
            .to_pandas())               # ≤ #sources × #langs rows
    cols = ["n_docs", "chars"]
    by_src = fine.groupby("source", as_index=False)[cols].sum()
    by_src["lang"] = "*"
    by_lang = fine.groupby("lang", as_index=False)[cols].sum()
    by_lang["source"] = "*"
    total = pd.DataFrame({"source": ["*"], "lang": ["*"],
                          "n_docs": [fine["n_docs"].sum()],
                          "chars": [fine["chars"].sum()]})
    out = pd.concat([fine, by_src, by_lang, total], ignore_index=True)
    out = out[["source", "lang", "n_docs", "chars"]]
    return out.astype({"n_docs": "int64", "chars": "int64"})


SQL_ROLLUP = """
SELECT coalesce(source, '*') AS source, coalesce(lang, '*') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())"""


CURATION_QUERIES = {
    "term_postings": q_term_postings,
    "term_postings_merged": q_term_postings_merged,
    "tfidf_top_terms": q_tfidf_top_terms,
    "bm25_topk": q_bm25_topk,
    "doc_repetition": q_doc_repetition,
    "doc_decontaminate": q_doc_decontaminate,
    "doc_repeated_ngrams": q_doc_repeated_ngrams,
    "doc_weighted_sample": q_doc_weighted_sample,
    "lang_mix_sample": q_lang_mix_sample,
    "lang_temperature_sample": q_lang_temperature_sample,
    "doc_quality_classifier": q_doc_quality_classifier,
    "source_data_card": q_source_data_card,
    "corpus_rollup": q_corpus_rollup,
    "source_overlap_matrix": q_source_overlap_matrix,
    "train_valid_split": q_train_valid_split,
    "corpus_budget_trim": q_corpus_budget_trim,
    "score_auc_eval": q_score_auc_eval,
    "quality_percentile_filter": q_quality_percentile_filter,
    "doc_lm_score": q_doc_lm_score,
    "doc_ppl_buckets": q_doc_ppl_buckets,   # rows-only (LM score)
    "dsir_select": q_dsir_select,
}

CURATION_SQL = {
    "term_postings": _sql_term_postings(),
    "term_postings_merged": _sql_term_postings(),
    "tfidf_top_terms": SQL_TFIDF,
    "bm25_topk": _sql_bm25(),
    "doc_repetition": SQL_REPETITION,
    "doc_decontaminate": _sql_decontaminate(),
    "doc_repeated_ngrams": _sql_repeated_ngrams(),
    "doc_weighted_sample": SQL_WSAMPLE,
    "lang_mix_sample": SQL_LANG_MIX,
    "lang_temperature_sample": SQL_LANG_TEMP,
    "source_data_card": SQL_DATA_CARD,
    "corpus_rollup": SQL_ROLLUP,
    "source_overlap_matrix": _sql_source_overlap(),
    "train_valid_split": SQL_SPLIT,
    "corpus_budget_trim": SQL_BUDGET_TRIM,
    "score_auc_eval": SQL_AUC,
    "quality_percentile_filter": SQL_PCTL_FILTER,
    "dsir_select": SQL_DSIR,
}
