"""Crawl link-graph queries: outlink extraction → host link graph →
host PageRank, over the deterministic link-pages table
(sources/link_synth.py, schema (url, html binary)).

- **outlink_extract** (SQL oracle): every ``href="..."`` anchor as one
  (src_url, dst_url) edge row, relative links resolved against the
  source page's scheme+host. Extraction is pure Arrow kernels
  (functions/links.py); the DuckDB oracle re-states the same grammar as
  ``regexp_extract_all`` + a CASE resolve, so the comparison is exact.
- **host_link_graph** (SQL oracle): edges aggregated to
  (src_host, dst_host, n_links) — per-batch Arrow partial counts first,
  then one bounded groupby-sum shuffle (the slim combiner-then-shuffle
  shape used by top_bigrams/tfidf).
- **host_pagerank** (rows-only; numpy dense twin in tests): damped
  weighted PageRank over the host graph with proper dangling-mass
  redistribution. Each iteration is ONE streaming pass over the slim
  integer edge list (src_id, dst_id, n — materialized once): the rank
  vector broadcasts via ``ray.put``, each batch emits one partial
  contribution row, a tree-combine level bounds the driver merge (the
  kmeans_fit shape, functions/ann.py). Per-iteration rounding to 1e-12
  absorbs float-sum ordering between merge trees, so ranks are
  deterministic and twin-exact.

Scale notes: the host universe (NOT the page universe) bounds driver
state — the host→id map and rank vector are O(#hosts) (80 MB at 10^7
hosts). Beyond that, the id map becomes a distributed dictionary encode
and contributions shard by dst bucket (documented assumption, same
class as the politeness host table). Edges stay distributed throughout.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.links import anchors_batch, host_of, outlinks_batch
from ..sources.link_synth import ensure_links

LINK_BATCH = 4096


def links_ds(sf_dir: str):
    root = ensure_links(sf_dir)
    return ray.data.read_parquet(os.path.join(root, "linkpages"))


def q_outlink_extract(sf_dir: str):
    """(url, html) → one (src_url, dst_url) row per anchor (duplicates
    are real edges and are kept)."""
    return links_ds(sf_dir).map_batches(
        outlinks_batch, batch_format="pyarrow", batch_size=LINK_BATCH)


def q_anchor_text(sf_dir: str):
    """(src_url, dst_url, anchor) — link target plus visible anchor
    text per ``<a>`` element, one Arrow pass (functions/links.py)."""
    return links_ds(sf_dir).map_batches(
        anchors_batch, batch_format="pyarrow", batch_size=LINK_BATCH)


def _host_edges_partial(batch: pa.Table) -> pa.Table:
    """Map-side combiner: per-batch (src_host, dst_host) counts."""
    src = host_of(batch.column("src_url").combine_chunks()
                  if isinstance(batch.column("src_url"), pa.ChunkedArray)
                  else batch.column("src_url"))
    dst = host_of(batch.column("dst_url").combine_chunks()
                  if isinstance(batch.column("dst_url"), pa.ChunkedArray)
                  else batch.column("dst_url"))
    g = (pa.table({"src_host": src, "dst_host": dst})
         .group_by(["src_host", "dst_host"]).aggregate([([], "count_all")]))
    return g.rename_columns(["src_host", "dst_host", "n_links"])


def q_host_link_graph(sf_dir: str):
    """(src_host, dst_host, n_links): partial-count inside each batch,
    then one slim groupby-sum shuffle over the combined keys."""
    from ray.data.aggregate import Sum
    partial = q_outlink_extract(sf_dir).map_batches(
        _host_edges_partial, batch_format="pyarrow", batch_size=LINK_BATCH)
    agg = partial.groupby(["src_host", "dst_host"]).aggregate(
        Sum("n_links", alias_name="n_links"))
    return agg


def _all_hosts(sf_dir: str) -> np.ndarray:
    """Sorted unique host universe: every page's own host (dangling hosts
    included) ∪ every link-target host. Bounded by #hosts, not #pages."""
    page_hosts = links_ds(sf_dir).map_batches(
        lambda b: pa.table({"host": host_of(
            b.column("url").combine_chunks()
            if isinstance(b.column("url"), pa.ChunkedArray)
            else b.column("url"))}),
        batch_format="pyarrow", batch_size=LINK_BATCH).unique("host")
    dst_hosts = q_outlink_extract(sf_dir).map_batches(
        lambda b: pa.table({"host": host_of(
            b.column("dst_url").combine_chunks()
            if isinstance(b.column("dst_url"), pa.ChunkedArray)
            else b.column("dst_url"))}),
        batch_format="pyarrow", batch_size=LINK_BATCH).unique("host")
    return np.asarray(sorted(set(page_hosts) | set(dst_hosts)))


def _edge_ids(sf_dir: str):
    """(hosts, edges): host universe + the materialized slim integer
    edge list (src_id, dst_id, n) every iterative graph query streams
    over. Materialized ONCE; a few int columns per distinct host pair."""
    hosts = _all_hosts(sf_dir)

    def to_ids(batch: pa.Table) -> pa.Table:
        s = np.searchsorted(hosts, np.asarray(batch.column("src_host")))
        d = np.searchsorted(hosts, np.asarray(batch.column("dst_host")))
        return pa.table({
            "src_id": pa.array(s.astype(np.int32), pa.int32()),
            "dst_id": pa.array(d.astype(np.int32), pa.int32()),
            "n": batch.column("n_links").cast(pa.int64())})

    edges = q_host_link_graph(sf_dir).map_batches(
        to_ids, batch_format="pyarrow",
        batch_size=LINK_BATCH).materialize()
    return hosts, edges


def _vector_pass(edges, n: int, scatter, dtype=np.float64,
                 merge_fanout: int = 64) -> np.ndarray:
    """One streaming pass over the edge list producing a dense length-n
    vector: ``scatter(bt) -> np.ndarray`` per batch, one tree-combine
    level bounds the driver merge to ~#batches/merge_fanout rows."""
    pa_t = pa.int64() if dtype == np.int64 else pa.float64()

    def partial(bt: pa.Table) -> pa.Table:
        v = scatter(bt)
        return pa.table({"v": pa.array([v.tolist()], pa.list_(pa_t))})

    def combine(bt: pa.Table) -> pa.Table:
        v = np.asarray(bt.column("v").to_pylist(), dtype).sum(axis=0)
        return pa.table({"v": pa.array([v.tolist()], pa.list_(pa_t))})

    parts = (edges.map_batches(partial, batch_format="pyarrow",
                               batch_size=LINK_BATCH)
             .map_batches(combine, batch_format="pyarrow",
                          batch_size=merge_fanout).take_all())
    return (np.sum([np.asarray(p["v"], dtype) for p in parts], axis=0)
            if parts else np.zeros(n, dtype))


def pagerank_fit(sf_dir: str, damping: float = 0.85, n_iter: int = 20,
                 merge_fanout: int = 64) -> pd.DataFrame:
    """Weighted host-level PageRank; see module docstring for the
    distribution scheme. Returns (host, rank) with sum(rank) == 1."""
    hosts, edges = _edge_ids(sf_dir)
    n = len(hosts)

    def out_scatter(bt: pa.Table) -> np.ndarray:
        v = np.zeros(n, np.int64)
        np.add.at(v, np.asarray(bt.column("src_id")),
                  np.asarray(bt.column("n")))
        return v

    out_strength = _vector_pass(edges, n, out_scatter, np.int64,
                                merge_fanout)

    rank = np.full(n, 1.0 / n)
    dangling = out_strength == 0
    for _ in range(n_iter):
        scaled = np.where(dangling, 0.0, rank / np.maximum(out_strength, 1))
        ref = ray.put(scaled)

        def contrib(bt: pa.Table, _ref=ref) -> np.ndarray:
            s = ray.get(_ref)
            v = np.zeros(n, np.float64)
            np.add.at(v, np.asarray(bt.column("dst_id")),
                      np.asarray(bt.column("n"), dtype=np.float64)
                      * s[np.asarray(bt.column("src_id"))])
            return v

        c = _vector_pass(edges, n, contrib, np.float64, merge_fanout)
        dangling_mass = rank[dangling].sum()
        rank = (1.0 - damping) / n + damping * (c + dangling_mass / n)
        rank = np.round(rank, 12)   # absorb merge-tree sum ordering

    return pd.DataFrame({"host": hosts, "rank": rank})


def hits_fit(sf_dir: str, n_iter: int = 20,
             merge_fanout: int = 64) -> pd.DataFrame:
    """Weighted HITS (Kleinberg): hub/authority scores over the host
    graph. Each iteration is two streaming passes over the materialized
    edge list — authority a ∝ Σ_src w·h(src) scattered to dst, hub
    h ∝ Σ_dst w·a(dst) scattered back to src — with L2 normalization
    and the same 1e-12 per-iteration rounding as PageRank, so results
    are deterministic and dense-twin-exact. Returns (host, authority,
    hub)."""
    hosts, edges = _edge_ids(sf_dir)
    n = len(hosts)
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.full(n, 1.0 / np.sqrt(n))

    def _norm(v: np.ndarray) -> np.ndarray:
        nv = np.linalg.norm(v)
        return np.round(v / nv, 12) if nv > 0 else v

    for _ in range(n_iter):
        ref = ray.put(hub)

        def to_auth(bt: pa.Table, _ref=ref) -> np.ndarray:
            h = ray.get(_ref)
            v = np.zeros(n, np.float64)
            np.add.at(v, np.asarray(bt.column("dst_id")),
                      np.asarray(bt.column("n"), dtype=np.float64)
                      * h[np.asarray(bt.column("src_id"))])
            return v

        auth = _norm(_vector_pass(edges, n, to_auth, np.float64,
                                  merge_fanout))
        aref = ray.put(auth)

        def to_hub(bt: pa.Table, _ref=aref) -> np.ndarray:
            a = ray.get(_ref)
            v = np.zeros(n, np.float64)
            np.add.at(v, np.asarray(bt.column("src_id")),
                      np.asarray(bt.column("n"), dtype=np.float64)
                      * a[np.asarray(bt.column("dst_id"))])
            return v

        hub = _norm(_vector_pass(edges, n, to_hub, np.float64,
                                 merge_fanout))

    return pd.DataFrame({"host": hosts, "authority": auth, "hub": hub})


def _degree_partial(bt: pa.Table) -> pa.Table:
    """Emit each (src_host, dst_host, n_links) edge twice — once as the
    source's out-side, once as the target's in-side — so ONE groupby-sum
    produces the full degree table without an outer join. The input is
    already unique per host pair, so count-partials are distinct-host
    degrees."""
    n = np.asarray(bt.column("n_links"), np.int64)
    one = np.ones(len(n), np.int64)
    zero = np.zeros(len(n), np.int64)
    host = pa.concat_arrays([bt.column("src_host").combine_chunks()
                             if isinstance(bt.column("src_host"),
                                           pa.ChunkedArray)
                             else bt.column("src_host"),
                             bt.column("dst_host").combine_chunks()
                             if isinstance(bt.column("dst_host"),
                                           pa.ChunkedArray)
                             else bt.column("dst_host")])
    return pa.table({
        "host": host,
        "out_links": pa.array(np.concatenate([n, zero]), pa.int64()),
        "in_links": pa.array(np.concatenate([zero, n]), pa.int64()),
        "out_hosts": pa.array(np.concatenate([one, zero]), pa.int64()),
        "in_hosts": pa.array(np.concatenate([zero, one]), pa.int64())})


def q_host_degree(sf_dir: str):
    """Per linked host: total out/in link counts plus distinct out/in
    neighbor-host counts — the two-sided emit + one slim groupby-sum
    (no outer join, no second shuffle)."""
    from ray.data.aggregate import Sum
    return (q_host_link_graph(sf_dir)
            .map_batches(_degree_partial, batch_format="pyarrow",
                         batch_size=LINK_BATCH)
            .groupby("host")
            .aggregate(Sum("out_links", alias_name="out_links"),
                       Sum("in_links", alias_name="in_links"),
                       Sum("out_hosts", alias_name="out_hosts"),
                       Sum("in_hosts", alias_name="in_hosts")))


def q_host_pagerank(sf_dir: str):
    """Rows-only: (host, rank), damping 0.85, 20 iterations; twin-tested
    against a dense numpy transition-matrix PageRank in tests."""
    return pagerank_fit(sf_dir)


def q_host_hits(sf_dir: str):
    """Rows-only: (host, authority, hub), 20 iterations; twin-tested
    against a dense numpy HITS in tests."""
    return hits_fit(sf_dir)


def link_oracle_sql(linkpages_glob: str) -> dict[str, str]:
    """DuckDB oracles over the SAME parquet files the Ray queries read."""
    edges = f"""
      SELECT src_url,
             CASE WHEN link LIKE 'http%' THEN link
                  ELSE regexp_extract(src_url, '^(https?://[^/]+)', 1)
                       || link END AS dst_url
      FROM (
        SELECT url AS src_url,
               unnest(regexp_extract_all(decode(html),
                                         'href="([^"]+)"', 1)) AS link
        FROM read_parquet('{linkpages_glob}'))"""
    host_graph = f"""
      SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
             regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host,
             count(*) AS n_links
      FROM ({edges})
      GROUP BY 1, 2"""
    return {
        "outlink_extract": edges,
        "host_link_graph": host_graph,
        "anchor_text": f"""
          SELECT src_url,
                 CASE WHEN link LIKE 'http%' THEN link
                      ELSE regexp_extract(src_url, '^(https?://[^/]+)', 1)
                           || link END AS dst_url,
                 anchor
          FROM (
            SELECT url AS src_url,
                   unnest(regexp_extract_all(decode(html),
                          'href="([^"]*)"[^>]*>([^<]*)<', 1)) AS link,
                   unnest(regexp_extract_all(decode(html),
                          'href="([^"]*)"[^>]*>([^<]*)<', 2)) AS anchor
            FROM read_parquet('{linkpages_glob}'))""",
        "host_degree": f"""
          WITH e AS ({host_graph}),
          o AS (SELECT src_host AS host,
                       CAST(sum(n_links) AS BIGINT) AS out_links,
                       CAST(count(*) AS BIGINT) AS out_hosts
                FROM e GROUP BY 1),
          i AS (SELECT dst_host AS host,
                       CAST(sum(n_links) AS BIGINT) AS in_links,
                       CAST(count(*) AS BIGINT) AS in_hosts
                FROM e GROUP BY 1)
          SELECT coalesce(o.host, i.host) AS host,
                 coalesce(out_links, 0) AS out_links,
                 coalesce(in_links, 0) AS in_links,
                 coalesce(out_hosts, 0) AS out_hosts,
                 coalesce(in_hosts, 0) AS in_hosts
          FROM o FULL OUTER JOIN i ON o.host = i.host""",
    }


LINK_QUERIES = {
    "outlink_extract": q_outlink_extract,
    "host_link_graph": q_host_link_graph,
    "anchor_text": q_anchor_text,
    "host_degree": q_host_degree,
    "host_pagerank": q_host_pagerank,   # rows-only (iterative)
    "host_hits": q_host_hits,           # rows-only (iterative)
}
