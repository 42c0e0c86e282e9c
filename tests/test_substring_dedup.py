"""Shared-substring detection tests: modular-arithmetic twins for the
gram-hash kernels, the winnowing guarantee (SWA 2003 §3) as a property,
and the exact-vs-oracle / winnow-sandwich checks at query level."""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlingathome_server_ray.functions.dedup import (_modmul61,
                                                       gram_hashes_padded,
                                                       winnow_select)

_P = (1 << 61) - 1
SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ kernel twins
@settings(max_examples=200)
@given(st.integers(0, 2**61), st.integers(0, 2**61))
def test_modmul61_twin(a, b):
    """Vectorized Mersenne modmul ≡ Python big-int math (inputs may carry
    the prefix loop's ≤2^61 deferred-reduction slack)."""
    got = int(_modmul61(np.uint64(a), np.uint64(b)))
    assert got == (a * b) % _P


def _ref_gram_hashes(text: str, k: int) -> list[int]:
    e = text.encode()
    out = []
    for j in range(max(len(e) - k + 1, 0)):
        h = 0
        for c in e[j:j + k]:
            h = (h * 257 + c) % _P
        out.append(h)
    return out


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=8),
       st.integers(2, 9))
def test_gram_hashes_twin(texts, k):
    g, valid = gram_hashes_padded(texts, k)
    for i, t in enumerate(texts):
        ref = _ref_gram_hashes(t, k)
        got = g[i][valid[i]].tolist()
        assert got == ref


def test_gram_hash_injective_on_distinct_grams():
    # equal grams at different positions/docs hash equal; sampled
    # distinct grams hash distinct (collision odds 2^-61)
    texts = ["abcdefabcdef", "xxabcdeyy"]
    g, valid = gram_hashes_padded(texts, 5)
    assert g[0, 0] == g[0, 6]                  # "abcde" twice in doc 0
    assert g[0, 0] == g[1, 2]                  # and once in doc 1
    vals = np.concatenate([g[0][valid[0]], g[1][valid[1]]])
    grams = ([texts[0].encode()[j:j + 5] for j in range(8)]
             + [texts[1].encode()[j:j + 5] for j in range(5)])
    assert len(set(vals.tolist())) == len(set(grams))


# ------------------------------------------------------ winnowing guarantee
def test_winnow_guarantee_planted_spans():
    """Any substring of length ≥ k+w-1 shared by two docs yields at least
    one shared selected fingerprint — exact, for every planted pair."""
    rng = np.random.default_rng(7)
    k, w = 8, 5
    t = k + w - 1
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", np.uint8)

    def rand_text(n):
        return bytes(alpha[rng.integers(0, len(alpha), n)]).decode()

    texts, planted = [], []
    for pair in range(40):
        span = rand_text(t + int(rng.integers(0, 10)))
        a = rand_text(int(rng.integers(0, 40))) + span + \
            rand_text(int(rng.integers(0, 40)))
        b = rand_text(int(rng.integers(0, 40))) + span + \
            rand_text(int(rng.integers(0, 40)))
        planted.append((len(texts), len(texts) + 1))
        texts += [a, b]
    g, valid = gram_hashes_padded(texts, k)
    d, pos = winnow_select(g, valid, w)
    fps_by_doc = {}
    for di, pi in zip(d.tolist(), pos.tolist()):
        fps_by_doc.setdefault(di, set()).add(int(g[di, pi]))
    for a, b in planted:
        assert fps_by_doc[a] & fps_by_doc[b], (a, b)


def test_winnow_short_docs_and_density():
    k, w = 4, 8
    texts = ["abcd",                      # exactly one gram (< w window)
             "abcdefghij" * 10,           # long doc
             "xy"]                        # shorter than k: no grams
    g, valid = gram_hashes_padded(texts, k)
    d, pos = winnow_select(g, valid, w)
    assert 0 in d.tolist()                # single-gram doc fingerprinted
    assert 2 not in d.tolist()            # sub-k doc has nothing to select
    n_sel = (d == 1).sum()
    n_grams = valid[1].sum()
    assert 0 < n_sel <= n_grams
    # winnowing must select at least one fp per w-window span
    assert n_sel >= n_grams // w


def test_winnow_selection_is_deterministic_and_content_local():
    """The same text selects the same fingerprints regardless of batch
    company — selection depends only on the doc's own grams."""
    k, w = 6, 4
    doc = "the quick brown fox jumps over the lazy dog"
    g1, v1 = gram_hashes_padded([doc], k)
    d1, p1 = winnow_select(g1, v1, w)
    g2, v2 = gram_hashes_padded(["padding text that is rather long " * 4,
                                 doc], k)
    d2, p2 = winnow_select(g2, v2, w)
    assert np.array_equal(p1[d1 == 0], p2[d2 == 1])


# --------------------------------------------------------------- query level
def test_substring_queries_end_to_end(ray_session):
    from crawlingathome_server_ray.pipelines.docs_queries import (
        SUBSTR_K, SUBSTR_W, _sql_substring_dup, q_doc_substring_dup,
        q_doc_substring_winnow)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    # oracle validity precondition: byte grams ≡ char grams
    assert con.execute(
        r"SELECT count(*) FROM documents WHERE text ~ '[^\x00-\x7f]'"
    ).fetchone()[0] == 0

    want = con.execute(_sql_substring_dup()).df()
    got = q_doc_substring_dup(SF)
    assert list(got.columns) == ["a_id", "b_id"]
    assert len(got) == len(want)
    assert (set(zip(got.a_id.astype(int), got.b_id.astype(int)))
            == set(zip(want.a_id.astype(int), want.b_id.astype(int))))
    assert (got.a_id < got.b_id).all()

    winn = q_doc_substring_winnow(SF)
    wset = set(zip(winn.a_id.astype(int), winn.b_id.astype(int)))
    eset = set(zip(got.a_id.astype(int), got.b_id.astype(int)))
    assert wset <= eset                   # soundness: never a false pair

    # guarantee at query level: every pair sharing a span ≥ k+w-1 chars
    # (ground truth via t-gram set intersection) must be in the winnowed
    # result
    t = SUBSTR_K + SUBSTR_W - 1
    docs = con.execute("SELECT doc_id, text FROM documents").df()
    tgrams = {int(r.doc_id): {r.text[i:i + t]
                              for i in range(len(r.text) - t + 1)}
              for r in docs.itertuples()}
    ids = sorted(tgrams)
    truth = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
             if tgrams[a] & tgrams[b]}
    assert truth <= wset, truth - wset


def test_substring_distributed_pair_branch(ray_session):
    """Above the driver-pairs threshold the pair set stays a Dataset
    (never driver-resident) with the identical pair set."""
    import ray.data
    from crawlingathome_server_ray.pipelines.docs_queries import (
        q_doc_substring_dup)
    small = q_doc_substring_dup(SF)
    big = q_doc_substring_dup(SF, driver_pairs_threshold=0)
    assert isinstance(big, ray.data.Dataset)
    df = big.to_pandas()
    assert (set(zip(df.a_id.astype(int), df.b_id.astype(int)))
            == set(zip(small.a_id.astype(int), small.b_id.astype(int))))
