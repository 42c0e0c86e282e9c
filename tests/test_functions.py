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
