"""Property-based and golden unit tests for the scalar/vector kernels
(SURVEY.md §5.1): canonicalizer, extractor, politeness math, dispatch."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlingathome_server_ray.functions.canonicalize import (canonicalize_array,
                                                              canonicalize_url,
                                                              host_of)
from crawlingathome_server_ray.functions.extract import extract_text_array
from crawlingathome_server_ray.refsim import sim
from crawlingathome_server_ray.schemas import HTML_PREFIX, HTML_SUFFIX
from crawlingathome_server_ray.stages.dispatch import (dispatch_order,
                                                       worker_name)

GOLDEN = [
    ("https://Example.COM:443/a/b?x=1#frag", "https://example.com/a/b?x=1"),
    ("http://HOST.net:80/", "http://host.net/"),
    ("http://host.net:8080/p", "http://host.net:8080/p"),
    ("https://h.org", "https://h.org/"),
    ("HTTPS://H.ORG/UPPER/Path", "https://h.org/UPPER/Path"),
    ("http://h.com/a#b#c", "http://h.com/a"),
    ("ftp://F.com:443/x", "ftp://f.com:443/x"),  # non-http keeps port
]


@pytest.mark.parametrize("url,want", GOLDEN)
def test_canonicalize_golden(url, want):
    assert canonicalize_url(url) == want
    got = canonicalize_array(pa.array([url]))[0].to_pylist()[0]
    assert got == want
    assert sim.canon(url) == want  # refsim independent impl agrees


_host = st.from_regex(r"[A-Za-z][A-Za-z0-9\-]{0,10}(\.[A-Za-z]{2,5}){1,2}",
                      fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._\-]{0,8}){0,4}", fullmatch=True)
_urls = st.builds(
    lambda sch, h, port, p, q, f: f"{sch}://{h}{port}{p}{q}{f}",
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    _host,
    st.sampled_from(["", ":80", ":443", ":8080"]),
    _path,
    st.sampled_from(["", "?a=1", "?a=1&b=2"]),
    st.sampled_from(["", "#x", "#a#b"]),
)


@settings(max_examples=300, deadline=None)
@given(_urls)
def test_canonicalize_properties(url):
    c = canonicalize_url(url)
    # idempotent
    assert canonicalize_url(c) == c
    # vector == scalar == refsim
    v = canonicalize_array(pa.array([url]))[0].to_pylist()[0]
    assert v == c
    assert sim.canon(url) == c
    # host agreement
    assert host_of(c) == sim.host_of(c)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=200))
def test_extract_inverse(text):
    html = HTML_PREFIX + text.encode("ascii") + HTML_SUFFIX
    out = extract_text_array(pa.array([html], pa.binary())).to_pylist()[0]
    assert out == text


def test_politeness_budget_math():
    import pandas as pd
    from crawlingathome_server_ray.stages.politeness import rank_host_group
    df = pd.DataFrame({"host": ["h1"] * 7 + ["h2"] * 2,
                       "warc_ts": np.arange(9),
                       "url_canon": [f"u{i}" for i in range(9)]})
    out = rank_host_group(df, budget=3)
    h1 = out[out.host == "h1"]
    assert h1["politeness_rank"].tolist() == [1, 2, 3, 4, 5, 6, 7]
    assert h1["fetch_round"].tolist() == [0, 0, 0, 1, 1, 1, 2]
    # ≤ budget rows per (host, round)
    per_round = out.groupby(["host", "fetch_round"]).size()
    assert (per_round <= 3).all()


def test_dispatch_deterministic_and_seed_sensitive():
    pids = list(range(16))
    a = dispatch_order(pids, 42)
    assert a == dispatch_order(pids, 42)
    assert sorted(a) == pids
    assert a != dispatch_order(pids, 43)
    assert a == sim.dispatch_order(pids, 42)


def test_worker_name_seeded():
    assert worker_name(42, 0) == worker_name(42, 0)
    assert worker_name(42, 0) != worker_name(42, 1)
    assert "-" in worker_name(42, 0)


def test_md5_vectorized_kernel_matches_hashlib():
    """The DuckDB md5 kernel must be bit-identical to the hashlib loop —
    the whole oracle-parity story rides on this."""
    import hashlib
    import pyarrow as pa
    from crawlingathome_server_ray.functions.canonicalize import (
        md5_hash64, md5_hash64_slow, md5_hex, md5_partition)
    strs = [f"https://h{i}.example.com/p/{i}?q={i*3}" for i in range(2000)]
    strs += ["", "x" * 300, "ünïcode/π", " "]
    fast, slow = md5_hash64(strs), md5_hash64_slow(strs)
    assert (fast == slow).all()
    for hc in (1, 2):
        ref = np.array([int(hashlib.md5(s.encode()).hexdigest()[:hc], 16)
                        for s in strs])
        assert (md5_partition(strs, hc) == ref).all()
    hx = md5_hex(pa.array(strs))
    assert hx[1].as_py() == hashlib.md5(strs[1].encode()).hexdigest()
    # chunked + sliced arrow inputs (zero-copy paths)
    ch = pa.chunked_array([pa.array(strs[:50]), pa.array(strs[50:])])
    assert (md5_hash64(ch) == slow).all()
    sl = pa.array(strs).slice(7, 100)
    assert (md5_hash64(sl) == slow[7:107]).all()
    assert len(md5_hash64([])) == 0 and len(md5_hex([])) == 0


def test_politeness_host_precap(ray_session):
    """Skew guard: one pathological host ≫ all others. With max_rounds the
    pre-cap must (a) produce exactly the uncapped ranking restricted to
    fetch_round < max_rounds, (b) leave other hosts' ranks unchanged."""
    import pandas as pd
    import ray.data
    from crawlingathome_server_ray.stages.politeness import politeness_ranked
    rng = np.random.default_rng(7)
    n_hot = 5000
    hot = pd.DataFrame({
        "host": "hot.example.com",
        "warc_ts": pd.to_datetime(rng.permutation(n_hot), unit="s"),
        "url_canon": [f"https://hot.example.com/{i}" for i in range(n_hot)]})
    cold = pd.DataFrame({
        "host": [f"h{i}.com" for i in range(20) for _ in range(10)],
        "warc_ts": pd.to_datetime(np.arange(200), unit="s"),
        "url_canon": [f"https://h{i}.com/{j}" for i in range(20)
                      for j in range(10)]})
    df = pd.concat([hot, cold], ignore_index=True).sample(
        frac=1.0, random_state=3).reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(8)

    def norm(x):
        return x.sort_values(["host", "politeness_rank"]).reset_index(drop=True)

    full = politeness_ranked(ds, budget=3).to_pandas()
    capped = politeness_ranked(ds, budget=3, max_rounds=2).to_pandas()
    expect = norm(full[full.fetch_round < 2])
    got = norm(capped)
    pd.testing.assert_frame_equal(
        got[["host", "url_canon", "politeness_rank", "fetch_round"]],
        expect[["host", "url_canon", "politeness_rank", "fetch_round"]])
    # hot host capped to budget*max_rounds rows; cold hosts fully present
    assert (got[got.host == "hot.example.com"].shape[0] == 6)
    assert (got[got.host != "hot.example.com"].shape[0]
            == (cold.groupby("host").size().clip(upper=6).sum()))


_texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60),
    min_size=0, max_size=12)


@given(_texts)
@settings(max_examples=60, deadline=None)
def test_batch_sketching_matches_per_doc(texts):
    """The whole-batch vectorized sketching (one split + reduceat over doc
    segments) must equal the per-doc computation for every doc — catches
    segment-boundary off-by-ones across adjacent docs."""
    from crawlingathome_server_ray.functions.dedup import (
        _splitmix, batch_shingle_hashes, batch_token_hashes, hash_tokens,
        simhash_many)
    h, offs = batch_token_hashes(texts)
    for i, t in enumerate(texts):
        ref = hash_tokens(t.split())
        got = h[offs[i]:offs[i + 1]]
        assert len(ref) == len(got) and (ref == got).all(), (i, t)

    # simhash vs an independent per-doc majority-vote reference
    sm = simhash_many(texts)
    for i, t in enumerate(texts):
        th = hash_tokens(t.split())
        if len(th) == 0:
            assert sm[i] == np.uint64(0)
            continue
        want = np.uint64(0)
        for j in range(64):
            bits = ((th >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
            if (2 * bits - 1).sum() > 0:
                want |= np.uint64(1) << np.uint64(j)
        assert sm[i] == want, (i, t)

    # minhash signatures: batch vs one-doc-at-a-time (no cross-doc
    # boundaries in the latter — catches reduceat segment corruption)
    from crawlingathome_server_ray.functions.dedup import minhash_signatures
    sig = minhash_signatures(texts, n_perm=16)
    for i, t in enumerate(texts):
        solo = minhash_signatures([t], n_perm=16)[0]
        assert (sig[i] == solo).all(), (i, t)

    # shingle folds vs a per-doc scalar fold (k=3 incl. the short-doc rule)
    sh, soffs = batch_shingle_hashes(h, offs, k=3)
    for i, t in enumerate(texts):
        th = hash_tokens(t.split())
        want = []
        GOLD = np.uint64(0x9E3779B97F4A7C15)
        if 0 < len(th) < 3:
            acc = th[0]
            for x in th[1:]:
                acc = _splitmix((np.array([acc], dtype=np.uint64) * GOLD)
                                ^ x)[0]
            want = [acc]
        else:
            for s0 in range(len(th) - 2):
                acc = th[s0]
                for x in th[s0 + 1:s0 + 3]:
                    acc = _splitmix((np.array([acc], dtype=np.uint64) * GOLD)
                                    ^ x)[0]
                want.append(acc)
        got = sh[soffs[i]:soffs[i + 1]]
        assert list(got) == [np.uint64(w) for w in want], (i, t)


def test_distributed_components_equals_union_find(ray_session):
    """Min-label propagation over an edge Dataset must reproduce the
    driver union-find exactly (chains force multiple rounds; isolated
    pairs, a cycle, and a star cover the shapes)."""
    import pandas as pd
    from crawlingathome_server_ray.functions.dedup import (
        connected_components, distributed_components)
    edges = [(10, 2), (2, 30), (30, 4),          # chain with min inside
             (100, 101),                          # pair
             (7, 8), (8, 9), (9, 7),              # cycle
             (50, 51), (50, 52), (50, 53)]        # star
    want = connected_components(edges)
    df = pd.DataFrame(edges, columns=["a_id", "b_id"])
    got_ds = distributed_components(df)
    got = {int(r["node"]): int(r["label"]) for r in got_ds.take_all()}
    assert got == want


def test_jaccard_pairs_hashed_matches_scalar():
    """The vectorized hashed-shingle Jaccard must equal the scalar
    string-shingle jaccard() on edge cases (collisions are 2^-64-rare)."""
    from crawlingathome_server_ray.functions.dedup import (
        jaccard, jaccard_pairs_hashed)
    docs = ["", " ", "a", "a b", "a b c", "a b c d e f g",
            "  leading and trailing  ", "the quick brown fox jumps",
            "the quick brown fox leaps", "x " * 50, "x " * 49 + "y",
            # permuted-prefix regression: a plain xor fold made the first
            # two shingle tokens commute ("x y z" ≡ "y x z"), so docs
            # containing both orders undercounted distinct shingles
            "data stream data data engine", "stream data data data engine",
            "a fast vector and fast a vector"]
    pairs_a, pairs_b = [], []
    for a in docs:
        for b in docs:
            pairs_a.append(a)
            pairs_b.append(b)
    got = jaccard_pairs_hashed(pairs_a, pairs_b)
    want = np.array([jaccard(a, b) for a, b in zip(pairs_a, pairs_b)])
    assert np.allclose(got, want), list(zip(pairs_a, pairs_b, got, want))


def test_pairs_from_groups_spanning_star():
    """Members beyond max_group must stay connected to the group via the
    spanning star (one component), with O(n) not O(n²) tail edges."""
    from crawlingathome_server_ray.functions.dedup import (
        connected_components, pairs_from_groups)
    n = 10
    keys = [np.zeros(n, dtype=np.int64)]          # one giant group
    ids = np.arange(100, 100 + n, dtype=np.int64)
    a, b = pairs_from_groups(keys, ids, max_group=4)
    comp = connected_components(list(zip(a.tolist(), b.tolist())))
    assert set(comp) == set(ids.tolist())          # nobody dropped
    assert len(set(comp.values())) == 1            # one component
    # head: all-pairs of 4; tail: one star edge per capped member
    assert len(a) == 4 * 3 // 2 + (n - 4)
    # payload stays aligned through the star edges
    pay = ids * 7
    a2, b2, pa_, pb_ = pairs_from_groups(keys, ids, payload=pay, max_group=4)
    assert (pa_ == a2 * 7).all() and (pb_ == b2 * 7).all()


@settings(deadline=None, max_examples=60)
@given(st.lists(st.text(max_size=400), max_size=40))
def test_fingerprint_many_matches_scalar(texts):
    """Vectorized Horner fingerprint ≡ the per-byte scalar twin."""
    from crawlingathome_server_ray.functions.text import (fingerprint_many,
                                                          fingerprint_text)
    got = fingerprint_many(texts, budget_elems=512, min_group=3)  # tiny groups cross edges
    want = np.array([fingerprint_text(t) for t in texts], dtype=np.uint64)
    assert (got == want).all()


PCT_GOLDEN = [
    # unreserved escapes decode
    ("http://ex.com/%7Euser", "http://ex.com/~user"),
    ("http://ex.com/%41%62%30%2D%5F%2E", "http://ex.com/Ab0-_."),
    # reserved escapes stay encoded, hex uppercased
    ("http://ex.com/a%2fb?q=%3d", "http://ex.com/a%2Fb?q=%3D"),
    # %23 ('#') stays encoded — never becomes a new fragment
    ("http://ex.com/a%23b", "http://ex.com/a%23b"),
    # malformed escapes untouched
    ("http://ex.com/100%", "http://ex.com/100%"),
    ("http://ex.com/a%g1b", "http://ex.com/a%g1b"),
    # decode happens before case-folding: %41 in the authority → 'a'
    ("http://EX%41MPLE.com/", "http://example.com/"),
]


@pytest.mark.parametrize("url,want", PCT_GOLDEN)
def test_pct_normalize_golden(url, want):
    got_scalar = canonicalize_url(url, pct_normalize=True)
    assert got_scalar == want
    canon, _ = canonicalize_array(pa.array([url]), pct_normalize=True)
    assert canon.to_pylist() == [want]


@settings(deadline=None, max_examples=80)
@given(st.lists(st.from_regex(
    r"https?://[a-zA-Z0-9.%-]{1,20}(:[0-9]{1,4})?/[a-zA-Z0-9%/._~?=-]{0,30}",
    fullmatch=True), max_size=10))
def test_pct_normalize_vector_matches_scalar(urls):
    canon, _ = canonicalize_array(pa.array(urls, pa.string()),
                                  pct_normalize=True)
    want = [canonicalize_url(u, pct_normalize=True) for u in urls]
    assert canon.to_pylist() == want
    # flag OFF remains byte-identical to the oracle-parity form
    off, _ = canonicalize_array(pa.array(urls, pa.string()))
    assert off.to_pylist() == [canonicalize_url(u) for u in urls]


def test_distributed_components_long_chain_converges(ray_session):
    """Pointer-doubling shortcut: a 60-hop chain (diameter ≫ plain-propagation
    budget of 8 rounds) must still converge to the union-find labels with NO
    unconverged warning."""
    import warnings
    import pandas as pd
    from crawlingathome_server_ray.functions.dedup import (
        connected_components, distributed_components)
    edges = [(i, i + 1) for i in range(60)]
    want = connected_components(edges)
    df = pd.DataFrame(edges, columns=["a_id", "b_id"])
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got_ds = distributed_components(df, max_iter=8)
    got = {int(r["node"]): int(r["label"]) for r in got_ds.take_all()}
    assert got == want


_uni_texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
            max_size=40),
    min_size=0, max_size=10)


@given(_uni_texts)
@settings(max_examples=60, deadline=None)
def test_char_trigram_buckets_matches_scalar(texts):
    """Whole-batch trigram hashing (one utf-32 decode + shifted-view
    splitmix fold) == per-doc scalar twin: same bucket sequence per doc,
    no trigram leaks across the NUL separators, short docs contribute
    none."""
    from crawlingathome_server_ray.functions.dedup import _GOLD, _splitmix
    from crawlingathome_server_ray.functions.text import (LM_BUCKETS,
                                                          char_trigram_buckets)

    b, offs = char_trigram_buckets(texts)
    assert len(offs) == len(texts) + 1
    for i, t in enumerate(texts):
        got = b[offs[i]:offs[i + 1]]
        want = []
        for j in range(max(len(t) - 2, 0)):
            c0, c1, c2 = (np.uint64(ord(c)) for c in t[j:j + 3])
            h = _splitmix(
                (_splitmix((np.array([c0]) * _GOLD) ^ c1) * _GOLD) ^ c2)[0]
            want.append(int(h % np.uint64(LM_BUCKETS)))
        assert got.tolist() == want
