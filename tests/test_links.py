"""Link-graph family: synth determinism, the Arrow outlink-extraction
kernel vs a re.findall twin, DuckDB oracle equivalence without Ray, the
Ray queries end-to-end, and PageRank vs a dense numpy twin."""

import os
import re
import tempfile

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlingathome_server_ray.functions.links import host_of, outlinks_batch
from crawlingathome_server_ray.pipelines.link_queries import (
    _host_edges_partial, link_oracle_sql)
from crawlingathome_server_ray.sources.link_synth import generate_linkpages

SF = "/root/testdata/sf0.001"


def _twin_edges(t: pa.Table) -> list[tuple[str, str]]:
    exp = []
    for u, h in zip(t.column("url").to_pylist(),
                    t.column("html").to_pylist()):
        pre = re.match(r"^(https?://[^/]+)", u).group(1)
        for link in re.findall(r'href="([^"]+)"', h.decode()):
            exp.append((u, link if link.startswith("http") else pre + link))
    return exp


def test_linkpages_deterministic_and_shaped():
    t = generate_linkpages(42, 400, 30)
    assert t.equals(generate_linkpages(42, 400, 30))
    htmls = t.column("html").to_pylist()
    dangling = sum(1 for h in htmls if b"href" not in h)
    assert 0.03 < dangling / len(htmls) < 0.25     # dangling hosts exist
    # Zipf skew: host 0 hoards in-links
    dst = host_of(outlinks_batch(t).column("dst_url").combine_chunks())
    counts = {}
    for h in dst.to_pylist():
        counts[h] = counts.get(h, 0) + 1
    top = max(counts.values())
    assert top > 3 * (sum(counts.values()) / 30)   # ≫ uniform share


def test_linkpages_slice_identical_to_full():
    """[start, stop) slices are bit-identical to the same rows of the
    full serial build — the invariant ensure_links' parallel fan-out
    (one Ray task per file slice) rests on."""
    full = generate_linkpages(42, 400, 30)
    parts = [generate_linkpages(42, 400, 30, start=s, stop=s + 93)
             for s in range(0, 400, 93)]
    assert pa.concat_tables(parts).equals(full)
    # and a stop past the end clamps
    assert generate_linkpages(42, 400, 30, start=372, stop=10**9).equals(
        full.slice(372))


def test_outlinks_kernel_twin_exact():
    for seed in (1, 7, 42):
        t = generate_linkpages(seed, 250, 20)
        out = outlinks_batch(t)
        got = list(zip(out.column("src_url").to_pylist(),
                       out.column("dst_url").to_pylist()))
        assert got == _twin_edges(t)   # order, duplicates and all


def test_outlinks_edge_cases():
    t = pa.table({
        "url": pa.array(["https://x.org/a", "http://y.net/b/c"]),
        "html": pa.array([
            b"<html>no anchors at all</html>",
            b'x<a href="/r">r</a><a href="/r">r</a>'
            b'<a href="https://z.io/q?k=1#f">z</a>'], pa.binary())})
    out = outlinks_batch(t)
    assert out.column("src_url").to_pylist() == ["http://y.net/b/c"] * 3
    assert out.column("dst_url").to_pylist() == [
        "http://y.net/r", "http://y.net/r", "https://z.io/q?k=1#f"]
    empty = outlinks_batch(t.slice(0, 1))
    assert empty.num_rows == 0
    assert empty.column_names == ["src_url", "dst_url"]


def test_link_oracles_exact_without_ray():
    """The DuckDB SQL and the Arrow kernels state the same grammar."""
    t = generate_linkpages(42, 300, 25)
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "p.parquet"))
    sqls = link_oracle_sql(os.path.join(d, "*.parquet"))
    con = duckdb.connect()
    oe = (con.execute(sqls["outlink_extract"]).df()
          .sort_values(["src_url", "dst_url"]).reset_index(drop=True))
    ge = (outlinks_batch(t).to_pandas()
          .sort_values(["src_url", "dst_url"]).reset_index(drop=True))
    assert oe.equals(ge)
    hg = (con.execute(sqls["host_link_graph"]).df()
          .sort_values(["src_host", "dst_host"]).reset_index(drop=True))
    pg = (_host_edges_partial(outlinks_batch(t)).to_pandas()
          .astype({"n_links": "int64"})
          .sort_values(["src_host", "dst_host"]).reset_index(drop=True))
    assert hg.equals(pg[hg.columns])


_ORACLED = ["outlink_extract", "host_link_graph", "anchor_text",
            "host_degree", "reciprocal_hosts", "inlink_anchor_topk",
            "frontier_expand", "host_bfs_depth",
            "host_outlink_similarity"]


def test_bfs_depth_scalar_twin(ray_session):
    """bfs_depth_fit ≡ a spec-literal single-threaded BFS over the same
    host graph and seed rule (min directed hops, unreached omitted)."""
    from crawlingathome_server_ray.functions.canonicalize import md5_hash64
    from crawlingathome_server_ray.pipelines.link_queries import (
        _all_hosts, BFS_SEED_MOD, bfs_depth_fit, q_host_link_graph)
    g = q_host_link_graph(SF).to_pandas()
    adj: dict[str, set[str]] = {}
    for s, t in zip(g["src_host"], g["dst_host"]):
        adj.setdefault(s, set()).add(t)
    hosts = _all_hosts(SF)
    depth = {h: 0 for h in hosts
             if (int(md5_hash64([h])[0]) >> 4) % BFS_SEED_MOD == 0}
    frontier, d = list(depth), 0
    while frontier:
        d += 1
        frontier = [t for h in frontier for t in sorted(adj.get(h, ()))
                    if t not in depth]
        for t in frontier:
            depth.setdefault(t, d)
        frontier = sorted(set(frontier))
    got = bfs_depth_fit(SF)
    assert dict(zip(got["host"], got["depth"])) == depth
    # seeds exist, and some hosts are only reached via edges
    assert {0} < set(depth.values())


def test_frontier_expand_excludes_crawled(ray_session):
    """Every expansion candidate is a real outlink target, none is an
    already-crawled page, and inlink support sums to the number of
    edges pointing outside the crawled set."""
    from crawlingathome_server_ray.pipelines.link_queries import (
        LINK_QUERIES, links_ds, q_outlink_extract)
    crawled = set(links_ds(SF).unique("url"))
    out = LINK_QUERIES["frontier_expand"](SF).to_pandas()
    cand = set(out["url"])
    assert cand and not (cand & crawled)
    edges = q_outlink_extract(SF).to_pandas()
    outside = edges[~edges["dst_url"].isin(crawled)]
    assert set(outside["dst_url"]) == cand
    assert out["n_inlinks"].sum() == len(outside)


@pytest.mark.parametrize("name", _ORACLED)
def test_link_query_matches_oracle(ray_session, name):
    from conftest import assert_frames_match
    from crawlingathome_server_ray.pipelines.link_queries import LINK_QUERIES
    from crawlingathome_server_ray.sources.link_synth import ensure_links
    root = ensure_links(SF)
    sqls = link_oracle_sql(os.path.join(root, "linkpages", "*.parquet"))
    oracle = duckdb.connect().execute(sqls[name]).df()
    assert_frames_match(LINK_QUERIES[name](SF), oracle, name)


def test_link_queries_end_to_end(ray_session):
    from crawlingathome_server_ray.pipelines.link_queries import links_ds
    from crawlingathome_server_ray.sources.link_synth import ensure_links
    ensure_links(SF)
    # every page host appears in the universe even with zero anchors
    n_pages = links_ds(SF).count()
    assert n_pages >= 600


def _dense_pagerank(edges, hosts, damping=0.85, n_iter=20):
    """Spec-literal dense twin of pagerank_fit (same rounding rule)."""
    n = len(hosts)
    idx = {h: i for i, h in enumerate(hosts)}
    w = np.zeros((n, n))
    for s, t, c in edges:
        w[idx[s], idx[t]] = c
    out = w.sum(axis=1)
    dang = out == 0
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        scaled = np.where(dang, 0.0, r / np.maximum(out, 1))
        c = w.T @ scaled
        r = (1.0 - damping) / n + damping * (c + r[dang].sum() / n)
        r = np.round(r, 12)
    return r


def test_anchors_kernel_twin_exact():
    from crawlingathome_server_ray.functions.links import anchors_batch
    for seed in (3, 42):
        t = generate_linkpages(seed, 250, 20)
        out = anchors_batch(t)
        got = list(zip(out.column("src_url").to_pylist(),
                       out.column("dst_url").to_pylist(),
                       out.column("anchor").to_pylist()))
        exp = []
        for u, h in zip(t.column("url").to_pylist(),
                        t.column("html").to_pylist()):
            pre = re.match(r"^(https?://[^/]+)", u).group(1)
            for link, a in re.findall(r'href="([^"]*)"[^>]*>([^<]*)<',
                                      h.decode()):
                exp.append((u, link if link.startswith("http")
                            else pre + link, a))
        assert got == exp


def test_host_degree_consistent_with_graph(ray_session):
    from crawlingathome_server_ray.pipelines.link_queries import (
        q_host_degree, q_host_link_graph)
    hg = q_host_link_graph(SF).to_pandas()
    deg = (q_host_degree(SF).to_pandas()
           .set_index("host").astype("int64").sort_index())
    out = hg.groupby("src_host").agg(out_links=("n_links", "sum"),
                                     out_hosts=("dst_host", "count"))
    inn = hg.groupby("dst_host").agg(in_links=("n_links", "sum"),
                                     in_hosts=("src_host", "count"))
    want = out.join(inn, how="outer").fillna(0).astype("int64").sort_index()
    want.index.name = "host"
    assert deg[want.columns].equals(want)
    assert int(deg["out_links"].sum()) == int(deg["in_links"].sum())


def _dense_hits(edges, hosts, n_iter=20):
    """Spec-literal dense twin of hits_fit (same rounding rule)."""
    n = len(hosts)
    idx = {h: i for i, h in enumerate(hosts)}
    w = np.zeros((n, n))
    for s, t, c in edges:
        w[idx[s], idx[t]] = c
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.full(n, 1.0 / np.sqrt(n))

    def norm(v):
        nv = np.linalg.norm(v)
        return np.round(v / nv, 12) if nv > 0 else v

    for _ in range(n_iter):
        a = norm(w.T @ h)
        h = norm(w @ a)
    return a, h


def test_hits_dense_twin(ray_session):
    from crawlingathome_server_ray.pipelines.link_queries import (
        hits_fit, q_host_link_graph)
    got = hits_fit(SF)
    hg = q_host_link_graph(SF).to_pandas()
    edges = list(zip(hg["src_host"], hg["dst_host"], hg["n_links"]))
    hosts = got["host"].tolist()
    a, h = _dense_hits(edges, hosts)
    assert np.allclose(got["authority"].to_numpy(), a, atol=2e-12)
    assert np.allclose(got["hub"].to_numpy(), h, atol=2e-12)
    assert abs(np.linalg.norm(got["authority"]) - 1.0) < 1e-9
    # the Zipf-head host is the top authority
    assert got.loc[got["authority"].idxmax(), "host"] == \
        "h00000.crawl-test.org"


def test_pagerank_dense_twin(ray_session):
    from crawlingathome_server_ray.pipelines.link_queries import (
        pagerank_fit, q_host_link_graph)
    got = pagerank_fit(SF)
    hg = q_host_link_graph(SF).to_pandas()
    edges = list(zip(hg["src_host"], hg["dst_host"], hg["n_links"]))
    hosts = got["host"].tolist()
    want = _dense_pagerank(edges, hosts)
    assert np.allclose(got["rank"].to_numpy(), want, atol=2e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9        # probability mass
    assert (got["rank"] > 0).all()
    # the Zipf-head host outranks the median host decisively
    r0 = got.loc[got["host"] == "h00000.crawl-test.org", "rank"].iloc[0]
    assert r0 > 5 * got["rank"].median()


def _dense_lpa(edges, hosts, n_iter=10):
    """Spec-literal dense twin of label_prop_fit: symmetric vote matrix,
    synchronous adoption, max-weight then min-label, convergence break."""
    n = len(hosts)
    idx = {h: i for i, h in enumerate(hosts)}
    W = np.zeros((n, n))
    for s, d, w in edges:
        si, di = idx[s], idx[d]
        if si != di:
            W[si, di] += w
            W[di, si] += w
    labels = np.arange(n)
    for _ in range(n_iter):
        new = labels.copy()
        for i in range(n):
            nb = np.nonzero(W[i])[0]
            if not len(nb):
                continue
            votes = {}
            for j in nb:
                votes[labels[j]] = votes.get(labels[j], 0.0) + W[i, j]
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[i] = best[0]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def test_label_prop_dense_twin(ray_session):
    from crawlingathome_server_ray.pipelines.link_queries import (
        label_prop_fit, q_host_link_graph)
    got = label_prop_fit(SF)
    hg = q_host_link_graph(SF).to_pandas()
    edges = list(zip(hg["src_host"], hg["dst_host"],
                     hg["n_links"].astype(float)))
    hosts = got["host"].tolist()
    want = _dense_lpa(edges, hosts)
    assert got["community"].tolist() == [hosts[i] for i in want]
    # labels are real community ids: every community label is a member
    assert set(got["community"]) <= set(got["host"])


def test_label_prop_planted_cliques():
    """Two tight triangles bridged by a weak edge resolve to exactly two
    communities under the pure adoption step."""
    from crawlingathome_server_ray.pipelines.link_queries import _lpa_adopt
    n = 6
    und = [(0, 1, 2.0), (0, 2, 2.0), (1, 2, 2.0),
           (3, 4, 2.0), (3, 5, 2.0), (4, 5, 2.0), (2, 3, 0.5)]

    def partials(labels):
        votes = {}
        for a, b, w in und:
            votes[(a, labels[b])] = votes.get((a, labels[b]), 0.0) + w
            votes[(b, labels[a])] = votes.get((b, labels[a]), 0.0) + w
        keys = np.array([node * n + lab for node, lab in votes], np.int64)
        w = np.fromiter(votes.values(), np.float64, len(votes))
        return keys, w

    labels = np.arange(n, dtype=np.int64)
    for _ in range(10):
        new = _lpa_adopt(*partials(labels), labels, n)
        if np.array_equal(new, labels):
            break
        labels = new
    assert len(set(labels[:3])) == 1 and len(set(labels[3:])) == 1
    assert labels[0] != labels[3]


def test_outlink_similarity_invariants(ray_session):
    """Jaccard bounds and a scalar set twin: every emitted pair's
    jaccard must equal |out(a) ∩ out(b)| / |out(a) ∪ out(b)| computed
    from the raw edge sets, and respect the (min_shared, tau) gate."""
    from crawlingathome_server_ray.pipelines.link_queries import (
        SIM_MIN_SHARED, SIM_TAU, q_host_link_graph,
        q_host_outlink_similarity)

    out = q_host_outlink_similarity(SF).to_pandas()
    assert len(out) > 0
    assert (out["shared"] >= SIM_MIN_SHARED).all()
    assert (out["jaccard"] >= SIM_TAU).all() and (out["jaccard"] <= 1).all()

    g = q_host_link_graph(SF).to_pandas()
    sets = {h: set(grp["dst_host"]) for h, grp in g.groupby("src_host")}
    for r in out.sample(n=min(25, len(out)), random_state=7).itertuples():
        a, b = sets[r.host_a], sets[r.host_b]
        inter, union = len(a & b), len(a | b)
        assert r.shared == inter
        assert r.deg_a == len(a) and r.deg_b == len(b)
        assert abs(r.jaccard - inter / union) < 1e-12
