"""Curation operators (tf-idf / BM25 / repetition / decontamination /
weighted sampling) vs DuckDB oracles, plus semantic checks."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from conftest import SF, assert_frames_match, to_pandas
from crawlingathome_server_ray.pipelines import curation_queries as cq
from test_analytics import _con


@pytest.mark.parametrize("name", sorted(cq.CURATION_SQL))
def test_curation_query_matches_oracle(ray_session, name):
    con = _con(SF)
    oracle = con.execute(cq.CURATION_SQL[name]).df()
    result = cq.CURATION_QUERIES[name](SF)
    assert_frames_match(result, oracle, name)


def test_weighted_sample_prefers_long_docs(ray_session):
    """E-S exponential keys with weight = n_chars must overrepresent long
    docs: the sample's mean length exceeds the corpus mean (deterministic
    — the sample is a pure function of the data)."""
    sample = to_pandas(cq.q_doc_weighted_sample(SF))
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    sampled = docs[docs.doc_id.isin(sample.doc_id)]
    assert len(sample) == cq.WSAMPLE_K
    assert sampled.n_chars.mean() > docs.n_chars.mean()


def test_decontaminate_flags_share_a_gram(ray_session):
    """Every contaminated doc genuinely shares a token 5-gram with the
    benchmark slice (scalar recheck, no hashing)."""
    out = to_pandas(cq.q_doc_decontaminate(SF))
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    text = dict(zip(docs.doc_id, docs.text))

    def grams(s):
        t = s.split()
        return {" ".join(t[i:i + cq.DECON_NGRAM])
                for i in range(len(t) - cq.DECON_NGRAM + 1)}

    bench = set()
    for d, s in text.items():
        if d % cq.DECON_MOD == cq.DECON_REM:
            bench |= grams(s)
    flagged = out[out.contaminated].doc_id.tolist()
    assert len(flagged) > 0  # calibrated: ~1% of the synthetic corpus
    for d in flagged:
        assert grams(text[int(d)]) & bench, f"doc {d} flagged but clean"
    clean = out[~out.contaminated].doc_id.tolist()
    for d in clean[:50]:  # spot-check the negative direction
        assert not (grams(text[int(d)]) & bench), f"doc {d} clean but dirty"


def test_bm25_scores_are_query_term_driven(ray_session):
    """Every BM25 hit contains at least one query term, and the top hit's
    summed query-term tf is positive."""
    out = to_pandas(cq.q_bm25_topk(SF))
    tf_cols = [f"tf_{t}" for t in cq.BM25_TERMS]
    assert (out[tf_cols].sum(axis=1) > 0).all()


def test_repetition_keep_rule(ray_session):
    out = to_pandas(cq.q_doc_repetition(SF))
    expect = ((out.top_tf * 5 <= out.n_tokens)
              & (out.n_unique * 4 >= out.n_tokens))
    assert (out.keep == expect).all()
    assert 0 < out.keep.sum() < len(out)  # the filter actually splits


def test_bm25_no_hits_returns_empty_typed_frame(ray_session):
    """Query terms absent from the corpus: every block is empty (Ray drops
    the schema on all-empty output) — the query must still return the
    typed empty frame, not crash."""
    out = to_pandas(cq.q_bm25_topk(SF, query_terms=("zzz_nope",)))
    assert list(out.columns) == ["doc_id", "dl", "tf_zzz_nope"]
    assert len(out) == 0


def test_lm_score_matches_single_node_twin(ray_session):
    """Distributed two-pass LM score == a single-node twin built from the
    same kernels, bit-exact: integer trigram counts are order-invariant,
    and per-doc log-prob sums use independent reduceat segments, so
    batching cannot perturb the floats."""
    import numpy as np
    import pyarrow.parquet as pq
    from crawlingathome_server_ray.functions.text import (
        LM_BUCKETS, char_trigram_buckets, segment_sums)

    got = to_pandas(cq.q_doc_lm_score(SF)).sort_values("doc_id") \
        .reset_index(drop=True)
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).sort_by("doc_id")
    texts = np.asarray(t.column("text"), dtype=object)
    h, offs = char_trigram_buckets(texts)
    counts = np.bincount(h, minlength=LM_BUCKETS).astype(np.int64)
    logp = np.log2((counts + 1.0) / (int(counts.sum()) + LM_BUCKETS))
    s = segment_sums(logp[h], offs)
    nt = np.diff(offs)
    bits = np.where(nt > 0, -s / np.maximum(nt, 1), 0.0)
    assert (got["doc_id"].to_numpy() ==
            np.asarray(t.column("doc_id"))).all()
    assert (got["n_trigrams"].to_numpy() == nt).all()
    np.testing.assert_array_equal(got["bits_per_trigram"].to_numpy(), bits)


def test_lm_score_flags_gibberish(ray_session, tmp_path):
    """A model trained on repetitive natural-ish text scores an
    out-of-distribution gibberish doc strictly worse (higher bits) than
    every in-distribution doc."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    vocab = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dog", "runs", "fast", "table", "row", "data", "query"]
    texts = [" ".join(rng.choice(vocab, size=60)) for _ in range(50)]
    gib = "".join(rng.choice(list("zqxjkvw@#%&*"), size=300))
    texts.append(gib)
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    got = to_pandas(cq.q_doc_lm_score(str(tmp_path))) \
        .sort_values("doc_id").reset_index(drop=True)
    bits = got["bits_per_trigram"].to_numpy()
    assert bits[-1] > bits[:-1].max() + 1.0


def test_dsir_select_prefers_target_like_docs(ray_session, tmp_path):
    """Engineered corpus: 'en' docs use vocabulary A, others vocabulary
    B, plus B-docs written in vocabulary A ('target-like strays'). DSIR
    must select A-vocabulary docs — including the strays — ahead of any
    B-vocabulary doc."""
    import pandas as pd
    import pyarrow as pa

    rng = np.random.default_rng(5)
    voc_a = [f"alpha{i}" for i in range(30)]
    voc_b = [f"beta{i}" for i in range(30)]
    rows = []
    for i in range(60):
        if i < 20:          # target slice
            lang, voc = "en", voc_a
        elif i < 30:        # strays: raw lang, target vocabulary
            lang, voc = "de", voc_a
        else:
            lang, voc = "de", voc_b
        text = " ".join(rng.choice(voc, size=40))
        rows.append((i, text, lang, "src0", len(text)))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                     "source", "n_chars"])
    d = tmp_path / "dsir"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "documents.parquet"))
    out = to_pandas(cq.q_dsir_select(str(d), k=30))
    assert len(out) == 30
    assert set(out.doc_id) == set(range(30))   # all A-vocab, no B-vocab
    assert (out.n_toks == 40).all()


def test_lang_mix_sample_balances_and_keeps_rarest(ray_session):
    """The rarest language survives entirely (rate 1.0), every language's
    output is a subset of its input, and the output mix is near-uniform
    (each language's expected count is n_min)."""
    import pandas as pd
    from crawlingathome_server_ray.pipelines.curation_queries import \
        q_lang_mix_sample
    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "lang"])
    out = q_lang_mix_sample(sf).to_pandas()
    n_in = docs.groupby("lang").size()
    n_out = out.groupby("lang").size().reindex(n_in.index, fill_value=0)
    rare = n_in.idxmin()
    assert n_out[rare] == n_in[rare]              # rarest kept fully
    assert (n_out <= n_in).all()
    # each language's count concentrates around n_min (binomial, 5σ)
    n_min = int(n_in.min())
    for lang in n_in.index:
        sd = (n_min * max(0.0, 1 - n_min / n_in[lang])) ** 0.5
        assert abs(n_out[lang] - n_min) <= 5 * sd + 1, (lang, n_out[lang])
    # pure function of the data: a second run is identical
    again = q_lang_mix_sample(sf).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))


def test_inverted_index_pruned_read_and_fingerprint(ray_session, tmp_path):
    """The posting lookup reads only the probe terms' bucket partitions,
    and regenerating the source table in place invalidates the cached
    index (new fingerprinted root)."""
    import os
    import shutil
    import time

    stats = {}
    out = to_pandas(cq.term_postings(SF, stats=stats))
    assert stats["buckets_read"] < stats["buckets_total"]
    assert set(out["term"]) <= set(cq.PROBE_TERMS)

    # fingerprint: a touched source yields a different index root
    src_dir = tmp_path / "sfcopy"
    src_dir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", src_dir / "documents.parquet")
    r1 = cq.inverted_index_build(str(src_dir))
    os.utime(src_dir / "documents.parquet",
             ns=(time.time_ns(), time.time_ns()))
    r2 = cq.inverted_index_build(str(src_dir))
    assert r1 != r2
    # identical source bytes => identical postings either way
    import duckdb
    a = duckdb.sql(f"SELECT term, doc_id, tf FROM read_parquet('{r1}/bucket=*/*.parquet') ORDER BY 1,2").df()
    b = duckdb.sql(f"SELECT term, doc_id, tf FROM read_parquet('{r2}/bucket=*/*.parquet') ORDER BY 1,2").df()
    assert a.equals(b)


def test_quality_classifier_twin_bit_exact(ray_session):
    """Distributed classifier training == a single-process run of the
    same per-batch kernels, BIT-exact, at two very different batch
    sizes: int64 fixed-point gradient partials make aggregation
    associative (grouping cannot perturb the sum), and logits are
    per-segment independent reduceat sums."""
    import pyarrow as pa
    from crawlingathome_server_ray.functions import classifier as clf

    iters, lr, frac = 8, 20.0, 0.5
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    f = clf.featurize_batch(t, clf.N_BUCKETS, "en")
    ids = np.asarray(t.column("doc_id"), np.int64)
    ftrain = f.filter(pa.array(clf.train_sample_mask(ids, frac)))
    w = np.zeros(clf.N_BUCKETS + 1, np.float64)
    for _ in range(iters):   # twin: whole training set as ONE batch
        g = clf.gradient_partial(ftrain, w, clf.N_BUCKETS)
        w = w - lr * (g.astype(np.float64) / clf._SCALE) / ftrain.num_rows
    z_twin = clf._logits(f, w)

    for bs in (8192, 37):
        got = to_pandas(cq.q_doc_quality_classifier(
            SF, iters=iters, lr=lr, train_frac=frac, batch_size=bs)) \
            .sort_values("doc_id").reset_index(drop=True)
        assert (got["doc_id"].to_numpy() == ids).all()
        np.testing.assert_array_equal(got["logit"].to_numpy(), z_twin)


def test_quality_classifier_learns_planted_signal(ray_session, tmp_path):
    """Disjoint-vocabulary corpus ('en' docs speak alpha*, others
    beta*): the trained classifier separates the classes perfectly —
    every en logit above every non-en logit, all predictions right."""
    import pandas as pd
    import pyarrow as pa

    rng = np.random.default_rng(5)
    voc_a = [f"alpha{i}" for i in range(30)]
    voc_b = [f"beta{i}" for i in range(30)]
    rows = []
    for i in range(60):
        lang, voc = ("en", voc_a) if i < 20 else ("de", voc_b)
        text = " ".join(rng.choice(voc, size=40))
        rows.append((i, text, lang, "src0", len(text)))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                     "source", "n_chars"])
    d = tmp_path / "clf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "documents.parquet"))
    out = to_pandas(cq.q_doc_quality_classifier(str(d), train_frac=1.0)) \
        .sort_values("doc_id").reset_index(drop=True)
    z = out["logit"].to_numpy()
    assert z[:20].min() > z[20:].max()          # clean margin
    assert (out["pred"].to_numpy() == (df.lang == "en").to_numpy()).all()


def test_lang_temperature_sample_tempers_the_mix(ray_session):
    """α=0.5 multinomial rebalance: the rarest language is kept whole
    (it has the largest n/p, so it sets the budget), every slice is a
    subset of its input, each non-capped language lands within
    binomial noise of n_min * (n_l/n_min)^α, and the whole thing is a
    pure function of the data (rerun identical)."""
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    out = to_pandas(cq.q_lang_temperature_sample(SF))
    n_in = docs.groupby("lang").size()
    n_out = out.groupby("lang").size().reindex(n_in.index, fill_value=0)
    rare = n_in.idxmin()
    assert n_out[rare] == n_in[rare]              # rarest kept fully
    assert (n_out <= n_in).all()
    n_min = float(n_in.min())
    for lang in n_in.index:
        exp = n_min * (n_in[lang] / n_min) ** cq.TEMP_ALPHA
        rate = exp / n_in[lang]
        sd = (n_in[lang] * rate * (1 - rate)) ** 0.5
        assert abs(n_out[lang] - exp) <= 5 * sd + 1, (lang, n_out[lang])
    # tempered spread sits strictly between uniform and natural
    spread_nat = n_in.max() / n_min
    spread_out = n_out.max() / n_out.min()
    assert 1.0 <= spread_out < spread_nat
    again = to_pandas(cq.q_lang_temperature_sample(SF))
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))


def test_source_data_card_totals_are_consistent(ray_session):
    """Card rows reconcile with the corpus: doc counts, char totals and
    the en-share bound all add up."""
    import pandas as pd

    card = to_pandas(cq.q_source_data_card(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "lang", "n_chars"])
    assert card.n_docs.sum() == len(docs)
    assert card.total_chars.sum() == docs.n_chars.sum()
    assert (card.n_en <= card.n_docs).all()
    assert card.n_en.sum() == (docs.lang == "en").sum()
    per_src = docs.groupby("source").lang.nunique()
    assert (card.set_index("source").n_langs == per_src).all()


def test_train_valid_split_is_source_disjoint(ray_session):
    """No source straddles the split (the leakage guarantee), both
    sides exist at this scale, and docs of one source share a side."""
    out = to_pandas(cq.q_train_valid_split(SF))
    sides = out.groupby("source").split.nunique()
    assert (sides == 1).all()
    assert set(out.split.unique()) == {"train", "valid"}


def test_corpus_budget_trim_is_the_maximal_seeded_prefix(ray_session):
    """Scalar twin: recompute the seeded order with hashlib, take the
    maximal prefix under the budget — the distributed trim returns
    exactly that set, and one more doc would overflow the budget."""
    import pandas as pd
    from crawlingathome_server_ray.functions.canonicalize import \
        md5_hash64_slow

    out = to_pandas(cq.q_corpus_budget_trim(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    keys = (md5_hash64_slow(
        [f"{cq.TRIM_SALT}{d}" for d in docs.doc_id]) >> np.uint64(4)) \
        .astype(np.int64)
    docs = docs.assign(key=keys).sort_values(["key", "doc_id"])
    budget = int(docs.n_chars.sum() * cq.TRIM_FRAC)
    cum = docs.n_chars.cumsum()
    expect = docs[cum <= budget]
    assert set(out.doc_id) == set(expect.doc_id)
    assert out.n_chars.sum() == expect.n_chars.sum() <= budget
    nxt = docs[cum > budget]
    if len(nxt):
        assert out.n_chars.sum() + nxt.n_chars.iloc[0] > budget  # maximal


def test_quality_classifier_degenerate_edges(ray_session, tmp_path):
    """Zero-token docs score bias-only and an empty training sample
    (train_frac=0) yields zero weights — no crash, typed output."""
    import pandas as pd
    import pyarrow as pa

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta", "", "   "],
        "lang": ["en", "de", "en"],
        "source": ["s"] * 3, "n_chars": [10, 0, 3]})
    d = tmp_path / "edge"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "documents.parquet"))
    out = to_pandas(cq.q_doc_quality_classifier(str(d), train_frac=0.0)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out.logit == 0.0).all()          # zero weights, zero bias
    assert (out.n_toks.to_numpy() == [2, 0, 0]).all()
    out2 = to_pandas(cq.q_doc_quality_classifier(str(d), iters=3)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out2) == 3                    # trained path also survives


def test_score_auc_eval_equals_scalar_rank_twin(ray_session):
    """2U from per-score counts == the scalar ties-averaged rank AUC
    computed doc-by-doc, and the implied AUC lands in [0, 1]."""
    import pandas as pd

    out = to_pandas(cq.q_score_auc_eval(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["n_chars", "lang"])
    y = (docs.lang == "en").to_numpy()
    s = docs.n_chars.to_numpy(np.float64)
    # scalar twin: average ranks with ties, U = R_pos - n_pos(n_pos+1)/2
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), np.float64)
    sorted_s = s[order]
    i = 0
    r = np.arange(1, len(s) + 1, dtype=np.float64)
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        ranks[order[i:j + 1]] = r[i:j + 1].mean()
        i = j + 1
    n_pos, n_neg = int(y.sum()), int((~y).sum())
    u = ranks[y].sum() - n_pos * (n_pos + 1) / 2
    assert out.n_pos[0] == n_pos and out.n_neg[0] == n_neg
    assert out.u2[0] == int(round(2 * u))
    auc = out.u2[0] / (2 * n_pos * n_neg)
    assert 0.0 <= auc <= 1.0


def test_quality_percentile_filter_keeps_top_three_quartiles(ray_session):
    """Per language: every survivor is >= that language's exact
    quantile_disc(0.25) threshold, at least ~75% of the slice survives,
    and every dropped doc is strictly below the threshold."""
    import pandas as pd

    out = to_pandas(cq.q_quality_percentile_filter(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    for lang, g in docs.groupby("lang"):
        v = np.sort(g.n_chars.to_numpy())
        thr = v[max(1, int(np.ceil(cq.PCTL_Q * len(v)))) - 1]
        kept = out[out.lang == lang]
        assert (kept.n_chars >= thr).all()
        dropped = g[~g.doc_id.isin(kept.doc_id)]
        assert (dropped.n_chars < thr).all()
        assert len(kept) >= 0.70 * len(g)


def test_corpus_rollup_reconciles(ray_session):
    """Every coarser rollup level reconciles exactly with the finest
    (source, lang) grain, and the '*' total matches the corpus."""
    got = to_pandas(cq.q_corpus_rollup(SF))
    fine = got[(got.source != "*") & (got.lang != "*")]
    tot = got[(got.source == "*") & (got.lang == "*")]
    assert len(tot) == 1
    for col in ("n_docs", "chars"):
        assert tot[col].iloc[0] == fine[col].sum()
        by_src = got[(got.source != "*") & (got.lang == "*")]
        assert by_src.set_index("source")[col].equals(
            fine.groupby("source")[col].sum().reindex(
                by_src.set_index("source").index))
    import duckdb
    n, c = duckdb.sql(
        f"SELECT count(*), sum(n_chars) FROM "
        f"read_parquet('{SF}/documents.parquet')").fetchone()
    assert tot["n_docs"].iloc[0] == n and tot["chars"].iloc[0] == c


def test_index_merge_equals_full_rebuild(ray_session):
    """The merged (base+delta) index generation is probe-for-probe
    identical to the full-rebuild index, and the split is real (both
    sides non-empty)."""
    import numpy as np
    got_m = to_pandas(cq.q_term_postings_merged(SF)) \
        .sort_values(["term", "doc_id"]).reset_index(drop=True)
    got_f = to_pandas(cq.q_term_postings(SF)) \
        .sort_values(["term", "doc_id"]).reset_index(drop=True)
    assert got_m.equals(got_f) and len(got_m) > 0
    frac = cq._idx_delta_mask(np.arange(2000, dtype=np.int64)).mean()
    assert 0.1 < frac < 0.5


def test_ppl_buckets_balance_and_ordering(ray_session):
    """Per language: buckets split ~1/3 each (histogram-quantile rank
    rule), and every head doc scores strictly below every tail doc in
    the same quantized units the thresholds use."""
    import numpy as np
    got = to_pandas(cq.q_doc_ppl_buckets(SF))
    sc = to_pandas(cq.q_doc_lm_score(SF))
    m = got.merge(sc, on="doc_id")
    m["q"] = np.floor(m.bits_per_trigram * cq.PPL_QUANT).astype("int64")
    assert set(m.ppl_bucket) == {"head", "middle", "tail"}
    for lang, g in m.groupby("lang"):
        counts = g.ppl_bucket.value_counts()
        assert counts.max() - counts.min() <= max(3, len(g) // 10), lang
        h = g[g.ppl_bucket == "head"]["q"]
        t = g[g.ppl_bucket == "tail"]["q"]
        if len(h) and len(t):
            assert h.max() < t.min(), lang
    # deterministic across runs
    again = to_pandas(cq.q_doc_ppl_buckets(SF))
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True))
