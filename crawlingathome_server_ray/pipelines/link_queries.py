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

from ..functions.links import host_of, outlinks_batch
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


def pagerank_fit(sf_dir: str, damping: float = 0.85, n_iter: int = 20,
                 merge_fanout: int = 64) -> pd.DataFrame:
    """Weighted host-level PageRank; see module docstring for the
    distribution scheme. Returns (host, rank) with sum(rank) == 1."""
    hosts = _all_hosts(sf_dir)
    n = len(hosts)

    def to_ids(batch: pa.Table) -> pa.Table:
        s = np.searchsorted(hosts, np.asarray(batch.column("src_host")))
        d = np.searchsorted(hosts, np.asarray(batch.column("dst_host")))
        return pa.table({
            "src_id": pa.array(s.astype(np.int32), pa.int32()),
            "dst_id": pa.array(d.astype(np.int32), pa.int32()),
            "n": batch.column("n_links").cast(pa.int64())})

    edges = q_host_link_graph(sf_dir).map_batches(
        to_ids, batch_format="pyarrow",
        batch_size=LINK_BATCH).materialize()   # slim ints, reused per iter

    # out-strength per host: one pass, same partial/combine shape
    def out_partial(bt: pa.Table) -> pa.Table:
        v = np.zeros(n, np.int64)
        np.add.at(v, np.asarray(bt.column("src_id")),
                  np.asarray(bt.column("n")))
        return pa.table({"v": pa.array([v.tolist()], pa.list_(pa.int64()))})

    def combine_i64(bt: pa.Table) -> pa.Table:
        v = np.asarray(bt.column("v").to_pylist(), np.int64).sum(axis=0)
        return pa.table({"v": pa.array([v.tolist()], pa.list_(pa.int64()))})

    parts = (edges.map_batches(out_partial, batch_format="pyarrow",
                               batch_size=LINK_BATCH)
             .map_batches(combine_i64, batch_format="pyarrow",
                          batch_size=merge_fanout).take_all())
    out_strength = np.sum([np.asarray(p["v"], np.int64) for p in parts],
                          axis=0) if parts else np.zeros(n, np.int64)

    rank = np.full(n, 1.0 / n)
    dangling = out_strength == 0
    for _ in range(n_iter):
        scaled = np.where(dangling, 0.0, rank / np.maximum(out_strength, 1))
        ref = ray.put(scaled)

        def contrib(bt: pa.Table, _ref=ref) -> pa.Table:
            s = ray.get(_ref)
            v = np.zeros(n, np.float64)
            np.add.at(v, np.asarray(bt.column("dst_id")),
                      np.asarray(bt.column("n"), dtype=np.float64)
                      * s[np.asarray(bt.column("src_id"))])
            return pa.table(
                {"v": pa.array([v.tolist()], pa.list_(pa.float64()))})

        def combine_f64(bt: pa.Table) -> pa.Table:
            v = np.asarray(bt.column("v").to_pylist(), np.float64).sum(axis=0)
            return pa.table(
                {"v": pa.array([v.tolist()], pa.list_(pa.float64()))})

        parts = (edges.map_batches(contrib, batch_format="pyarrow",
                                   batch_size=LINK_BATCH)
                 .map_batches(combine_f64, batch_format="pyarrow",
                              batch_size=merge_fanout).take_all())
        c = np.sum([np.asarray(p["v"], np.float64) for p in parts],
                   axis=0) if parts else np.zeros(n, np.float64)
        dangling_mass = rank[dangling].sum()
        rank = (1.0 - damping) / n + damping * (c + dangling_mass / n)
        rank = np.round(rank, 12)   # absorb merge-tree sum ordering

    return pd.DataFrame({"host": hosts, "rank": rank})


def q_host_pagerank(sf_dir: str):
    """Rows-only: (host, rank), damping 0.85, 20 iterations; twin-tested
    against a dense numpy transition-matrix PageRank in tests."""
    return pagerank_fit(sf_dir)


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
    return {
        "outlink_extract": edges,
        "host_link_graph": f"""
          SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
                 regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host,
                 count(*) AS n_links
          FROM ({edges})
          GROUP BY 1, 2""",
    }


LINK_QUERIES = {
    "outlink_extract": q_outlink_extract,
    "host_link_graph": q_host_link_graph,
    "host_pagerank": q_host_pagerank,   # rows-only (iterative)
}
