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
- **host_pagerank / host_hits** (rows-only; numpy dense twins in
  tests): damped weighted PageRank (dangling-mass redistribution) and
  HITS hubs/authorities over the host graph. The slim integer edge
  list (src_id, dst_id, n) loads ONCE into an edge-shard actor pool
  (``_EdgeShardActor`` — iterative fixed-point is the documented
  'raw actors where the Dataset API can't express it' case; a Dataset
  relaunch per iteration bills ~20 pipeline startups to scheduling).
  Each iteration broadcasts the rank vector via ``ray.put`` and runs
  one sparse scatter per shard; per-iteration rounding to 1e-12
  absorbs float-sum ordering between shard merges, so results are
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
from .frontier_core import coalesce_slim

# HTML-parsing stages: payloads are fat (whole pages), keep batches small.
LINK_BATCH = 4096
# Slim-input combiner stages (url strings / host pairs / counts): large
# batches mean 16× better map-side combining AND far fewer blocks feeding
# the bucket shuffle (see frontier_core.coalesce_slim on why block count
# entering a Ray sort must stay small — the object matrix is quadratic).
SLIM_BATCH = 65536


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


# per-process cache of the materialized host graph — the graph-analytics
# family (degree, reciprocal, pagerank, hits) all consume it, and
# re-parsing every page's HTML per query doubled their wall time (the
# frontier_queries._SLIM_CACHE precedent; at production scale this is the
# host graph staged to parquet once per crawl snapshot, not re-derived).
# Keyed by (sf_dir, mtime+size fingerprint of the linkpages tree) so a
# regenerated-in-place fixture invalidates the cache.
_GRAPH_CACHE: dict[tuple[str, str], object] = {}


def q_host_link_graph(sf_dir: str):
    """(src_host, dst_host, n_links): partial-count inside each batch,
    then ONE integer-bucket shuffle + per-bucket pandas sum (a host pair
    never spans buckets ⇒ exact). The first version's
    ``groupby([src_host, dst_host])`` was a Ray sort-aggregate over
    ~10^5-10^6 distinct string-PAIR groups (the documented pathology;
    measured 23.9 s at sfbench, the bucketed fold ~9 s)."""
    from .frontier_core import tree_fingerprint
    key = (sf_dir,
           tree_fingerprint(os.path.join(ensure_links(sf_dir), "linkpages")))
    if key not in _GRAPH_CACHE:
        for k in [k for k in _GRAPH_CACHE if k[0] == sf_dir]:
            del _GRAPH_CACHE[k]  # drop the stale generation, keep other sfs
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        n_buckets = max(64, cpus * 8)

        def partial(b: pa.Table) -> pa.Table:
            g = _host_edges_partial(b)
            src = g.column("src_host").to_pandas().to_numpy(dtype=object)
            dst = g.column("dst_host").to_pandas().to_numpy(dtype=object)
            # asymmetric combiner (golden-ratio multiply on the src hash):
            # a plain XOR maps every self-loop edge (src == dst, the most
            # common edge class in web graphs) to bucket 0 — the exact
            # group-skew pathology this bucketed fold exists to avoid
            with np.errstate(over="ignore"):
                mixed = (pd.util.hash_array(src)
                         * np.uint64(0x9E3779B97F4A7C15)
                         ^ pd.util.hash_array(dst))
            bucket = (mixed % n_buckets).astype(np.int32)
            return g.append_column("bucket", pa.array(bucket, pa.int32()))

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            out = (g.groupby(["src_host", "dst_host"], sort=False,
                             as_index=False)["n_links"].sum())
            out["n_links"] = out["n_links"].astype("int64")
            return out[["src_host", "dst_host", "n_links"]]

        _GRAPH_CACHE[key] = (coalesce_slim(
                                q_outlink_extract(sf_dir)
                                .map_batches(partial,
                                             batch_format="pyarrow",
                                             batch_size=SLIM_BATCH))
                                .groupby("bucket")
                                .map_groups(fold, batch_format="pandas")
                                .materialize())
    return _GRAPH_CACHE[key]


def _all_hosts(sf_dir: str, host_graph=None) -> np.ndarray:
    """Sorted unique host universe: every page's own host (dangling hosts
    included) ∪ every link-target host. Bounded by #hosts, not #pages.
    Page hosts come from a url-column-only read (never re-parses HTML);
    link-target hosts from the already-aggregated host graph."""
    root = ensure_links(sf_dir)
    page_hosts = ray.data.read_parquet(
        os.path.join(root, "linkpages"), columns=["url"]).map_batches(
        lambda b: pa.table({"host": host_of(
            b.column("url").combine_chunks()
            if isinstance(b.column("url"), pa.ChunkedArray)
            else b.column("url"))}),
        batch_format="pyarrow", batch_size=LINK_BATCH).unique("host")
    if host_graph is None:
        host_graph = q_host_link_graph(sf_dir).materialize()
    dst_hosts = host_graph.unique("dst_host")
    return np.asarray(sorted(set(page_hosts) | set(dst_hosts)))


@ray.remote
class _EdgeShardActor:
    """One shard of the integer edge list pinned in worker memory for
    iterative graph algorithms. Power iterations are fixed-point loops
    whose per-round work is a sparse matrix-vector product — relaunching
    a Dataset pipeline per round bills ~20 pipeline startups to pure
    scheduling, so the edges load ONCE into an actor pool (the SURVEY
    §2 'raw actors only where the Dataset API can't express it' case)
    and each round is one tiny method call per shard with the rank
    vector passed as a shared object-store ref."""

    def __init__(self, refs, n_hosts: int):
        tables = [t for t in ray.get(list(refs)) if t.num_rows]
        if tables:
            t = pa.concat_tables(tables)
            self.src = np.asarray(t.column("src_id"), np.int64)
            self.dst = np.asarray(t.column("dst_id"), np.int64)
            self.w = np.asarray(t.column("n"), np.float64)
        else:
            self.src = self.dst = np.zeros(0, np.int64)
            self.w = np.zeros(0, np.float64)
        self.n = n_hosts

    def out_strength(self) -> np.ndarray:
        v = np.zeros(self.n, np.int64)
        np.add.at(v, self.src, self.w.astype(np.int64))
        return v

    def push_dst(self, vec: np.ndarray) -> np.ndarray:
        """Σ over edges of w·vec[src] scattered to dst."""
        v = np.zeros(self.n, np.float64)
        np.add.at(v, self.dst, self.w * vec[self.src])
        return v

    def push_src(self, vec: np.ndarray) -> np.ndarray:
        """Σ over edges of w·vec[dst] scattered back to src."""
        v = np.zeros(self.n, np.float64)
        np.add.at(v, self.src, self.w * vec[self.dst])
        return v

    def push_reach(self, mask: np.ndarray) -> np.ndarray:
        """One BFS expansion step: bool mask over hosts → bool mask of
        hosts reachable via one directed edge from any masked host."""
        v = np.zeros(self.n, bool)
        if len(self.src):
            v[self.dst[mask[self.src]]] = True
        return v

    def label_weights(self, labels: np.ndarray):
        """Per-(node, neighbor-label) edge-weight partials for label
        propagation, the graph treated as UNDIRECTED (each directed edge
        votes both ways) with self-loops excluded (a self-vote only damps
        propagation). Returns (packed int64 node·n+label keys, weights),
        combined within the shard so the driver merge is bounded by the
        shard's distinct (node, label) pairs, not its edge count. The
        int64 packing holds for n_hosts < 3·10^9 — beyond that the key
        becomes a (node, label) struct column."""
        m = self.src != self.dst
        nodes = np.concatenate([self.dst[m], self.src[m]])
        labs = np.concatenate([labels[self.src[m]], labels[self.dst[m]]])
        w = np.concatenate([self.w[m], self.w[m]])
        key = nodes * np.int64(self.n) + labs
        uniq, inv = np.unique(key, return_inverse=True)
        ws = np.zeros(len(uniq), np.float64)
        np.add.at(ws, inv, w)
        return uniq, ws


class _EdgePool:
    """Host universe + edge-shard actor pool shared by PageRank/HITS.

    Scale note: driver state is O(#hosts) per shard-merge (the module-
    docstring host-universe bound); the edge list itself stays sharded
    across actors and is never driver-resident."""

    def __init__(self, sf_dir: str, n_shards: int | None = None):
        graph = q_host_link_graph(sf_dir).materialize()
        self.hosts = _all_hosts(sf_dir, host_graph=graph)
        n = len(self.hosts)
        # broadcast the host universe once (ray.put), never in a task
        # closure — the closure pickles per task and hosts is O(#hosts)
        hosts_ref = ray.put(self.hosts)

        def to_ids(batch: pa.Table) -> pa.Table:
            hosts = ray.get(hosts_ref)
            s = np.searchsorted(hosts, np.asarray(batch.column("src_host")))
            d = np.searchsorted(hosts, np.asarray(batch.column("dst_host")))
            return pa.table({
                "src_id": pa.array(s.astype(np.int32), pa.int32()),
                "dst_id": pa.array(d.astype(np.int32), pa.int32()),
                "n": batch.column("n_links").cast(pa.int64())})

        refs = (graph.map_batches(to_ids, batch_format="pyarrow",
                                  batch_size=LINK_BATCH)
                .materialize().to_arrow_refs())
        if n_shards is None:
            cpus = int(ray.cluster_resources().get("CPU", 4)) \
                if ray.is_initialized() else 4
            n_shards = max(1, min(8, cpus // 2, len(refs) or 1))
        groups = [refs[i::n_shards] for i in range(n_shards)]
        self.actors = [_EdgeShardActor.remote(g, n) for g in groups]
        self.n = n

    def _merge(self, futs, dtype=np.float64) -> np.ndarray:
        parts = ray.get(futs)
        return (np.sum(parts, axis=0, dtype=dtype) if parts
                else np.zeros(self.n, dtype))

    def out_strength(self) -> np.ndarray:
        return self._merge([a.out_strength.remote() for a in self.actors],
                           np.int64)

    def push_dst(self, vec: np.ndarray) -> np.ndarray:
        ref = ray.put(vec)
        return self._merge([a.push_dst.remote(ref) for a in self.actors])

    def push_src(self, vec: np.ndarray) -> np.ndarray:
        ref = ray.put(vec)
        return self._merge([a.push_src.remote(ref) for a in self.actors])

    def push_reach(self, mask: np.ndarray) -> np.ndarray:
        ref = ray.put(mask)
        parts = ray.get([a.push_reach.remote(ref) for a in self.actors])
        return (np.logical_or.reduce(parts) if parts
                else np.zeros(self.n, bool))

    def label_weights(self, labels: np.ndarray):
        """Merged (packed key, weight) arrays across shards; driver-side
        size is the graph's distinct (node, neighbor-label) pair count —
        the same O(#host-graph-edges) bound as the materialized host
        graph itself, never O(#pages)."""
        ref = ray.put(labels)
        parts = ray.get([a.label_weights.remote(ref) for a in self.actors])
        keys = np.concatenate([p[0] for p in parts]) if parts \
            else np.zeros(0, np.int64)
        ws = np.concatenate([p[1] for p in parts]) if parts \
            else np.zeros(0, np.float64)
        uniq, inv = np.unique(keys, return_inverse=True)
        tot = np.zeros(len(uniq), np.float64)
        np.add.at(tot, inv, ws)
        return uniq, tot

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def pagerank_fit(sf_dir: str, damping: float = 0.85,
                 n_iter: int = 20) -> pd.DataFrame:
    """Weighted host-level PageRank; see module docstring for the
    distribution scheme. Returns (host, rank) with sum(rank) == 1."""
    pool = _EdgePool(sf_dir)
    try:
        n = pool.n
        out_strength = pool.out_strength()
        rank = np.full(n, 1.0 / n)
        dangling = out_strength == 0
        for _ in range(n_iter):
            scaled = np.where(dangling, 0.0,
                              rank / np.maximum(out_strength, 1))
            c = pool.push_dst(scaled)
            dangling_mass = rank[dangling].sum()
            rank = (1.0 - damping) / n + damping * (c + dangling_mass / n)
            rank = np.round(rank, 12)   # absorb shard-merge sum ordering
        return pd.DataFrame({"host": pool.hosts, "rank": rank})
    finally:
        pool.shutdown()


def hits_fit(sf_dir: str, n_iter: int = 20) -> pd.DataFrame:
    """Weighted HITS (Kleinberg): hub/authority scores over the host
    graph. Each iteration is two shard-pool passes — authority
    a ∝ Σ_src w·h(src) scattered to dst, hub h ∝ Σ_dst w·a(dst)
    scattered back to src — with L2 normalization and the same 1e-12
    per-iteration rounding as PageRank, so results are deterministic
    and dense-twin-exact. Returns (host, authority, hub)."""
    pool = _EdgePool(sf_dir)
    try:
        n = pool.n
        hub = np.full(n, 1.0 / np.sqrt(n))
        auth = np.full(n, 1.0 / np.sqrt(n))

        def _norm(v: np.ndarray) -> np.ndarray:
            nv = np.linalg.norm(v)
            return np.round(v / nv, 12) if nv > 0 else v

        for _ in range(n_iter):
            auth = _norm(pool.push_dst(hub))
            hub = _norm(pool.push_src(auth))
        return pd.DataFrame({"host": pool.hosts, "authority": auth,
                             "hub": hub})
    finally:
        pool.shutdown()


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
    neighbor-host counts — the two-sided emit + one slim bucketed
    shuffle (no outer join, no second shuffle, and no sort-aggregate
    over 10^5+ host STRING groups at web scale: hosts hash into
    integer buckets, never spanning one, so per-bucket pandas sums
    are exact)."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    n_buckets = max(64, cpus * 8)
    cols = ["out_links", "in_links", "out_hosts", "in_hosts"]

    def partial(b: pa.Table) -> pa.Table:
        g = _degree_partial(b)
        hosts = g.column("host").to_pandas().to_numpy(dtype=object)
        bucket = (pd.util.hash_array(hosts) % n_buckets).astype(np.int32)
        return g.append_column("bucket", pa.array(bucket, pa.int32()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("host", sort=False, as_index=False)[cols].sum()
        return out.astype({c: "int64" for c in cols})[["host"] + cols]

    return (coalesce_slim(q_host_link_graph(sf_dir)
                          .map_batches(partial, batch_format="pyarrow",
                                       batch_size=SLIM_BATCH))
            .groupby("bucket").map_groups(fold, batch_format="pandas"))


def q_reciprocal_hosts(sf_dir: str):
    """Host pairs that link to each other in BOTH directions (the
    classic link-exchange / mutual-citation signal): the host graph
    hash-joined with its own column-swap on the (src, dst) pair key —
    Ray's native Dataset.join, partitioned on the pair. Output one row
    per unordered pair: (host_a < host_b, n_ab, n_ba)."""
    g = q_host_link_graph(sf_dir).materialize()

    def fwd(b: pa.Table) -> pa.Table:
        keep = pc.less(b.column("src_host"), b.column("dst_host"))
        b = b.filter(keep)
        return pa.table({"host_a": b.column("src_host"),
                         "host_b": b.column("dst_host"),
                         "n_ab": b.column("n_links").cast(pa.int64())})

    def rev(b: pa.Table) -> pa.Table:
        keep = pc.greater(b.column("src_host"), b.column("dst_host"))
        b = b.filter(keep)
        return pa.table({"host_a": b.column("dst_host"),
                         "host_b": b.column("src_host"),
                         "n_ba": b.column("n_links").cast(pa.int64())})

    a = g.map_batches(fwd, batch_format="pyarrow", batch_size=SLIM_BATCH)
    b = g.map_batches(rev, batch_format="pyarrow", batch_size=SLIM_BATCH)
    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    return a.join(b, join_type="inner",
                  num_partitions=max(8, min(64, cpus)),
                  on=("host_a", "host_b"))


ANCHOR_TOPK = 3


def q_inlink_anchor_topk(sf_dir: str, k: int = ANCHOR_TOPK,
                         n_buckets: int = 64):
    """Top-k inbound anchor strings per target host (the web-search
    relevance signal anchor text carries): per-batch (dst_host, anchor)
    partial counts → ONE shuffle keyed by hash-bucket(dst_host) (a host
    never spans buckets, so per-host totals stay exact; 64 groups
    instead of one tiny map_groups call per host) → per-bucket exact
    sum + rank. The shuffle carries pre-combined (host, anchor, n)
    rows, never raw edges."""
    def partial(b: pa.Table) -> pa.Table:
        dst = b.column("dst_url")
        if isinstance(dst, pa.ChunkedArray):
            dst = dst.combine_chunks()
        g = (pa.table({"dst_host": host_of(dst),
                       "anchor": b.column("anchor")})
             .group_by(["dst_host", "anchor"])
             .aggregate([([], "count_all")]))
        g = g.rename_columns(["dst_host", "anchor", "n"])
        hosts = g.column("dst_host").to_pandas().to_numpy(dtype=object)
        bucket = (pd.util.hash_array(hosts) % n_buckets).astype(np.int32)
        return g.append_column("bucket", pa.array(bucket, pa.int32()))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        tot = (g.groupby(["dst_host", "anchor"], sort=False,
                         as_index=False)["n"].sum()
               .sort_values(["dst_host", "n", "anchor"],
                            ascending=[True, False, True],
                            kind="mergesort"))
        tot["anchor_rank"] = (tot.groupby("dst_host", sort=False)
                              .cumcount() + 1).astype(np.int64)
        tot = tot[tot["anchor_rank"] <= k]
        tot["n"] = tot["n"].astype("int64")
        return tot[["dst_host", "anchor", "n", "anchor_rank"]]

    return (coalesce_slim(q_anchor_text(sf_dir)
                          .map_batches(partial, batch_format="pyarrow",
                                       batch_size=SLIM_BATCH))
            .groupby("bucket").map_groups(final, batch_format="pandas"))


def q_frontier_expand(sf_dir: str):
    """Next-wave frontier expansion — the crawl loop's missing edge:
    aggregate every outlink target into (url, n_inlinks) support counts
    and drop targets already crawled. Output: the uncrawled candidate
    URLs with their inlink support — what a continuous crawler feeds
    back into the frontier, priority-weighted by how many crawled pages
    point at them.

    ONE integer-bucket shuffle does BOTH the count fold and the
    anti-join (a url never spans buckets ⇒ exact): per-batch Arrow
    partial counts over the edges union with the crawled url universe
    tagged ``is_page=1``, then ``groupby(bucket).map_groups`` sums
    support and drops any url a page row claims. No join operator, and
    no Ray sort-aggregate over millions of distinct URL STRING groups
    (the measured 10^5+-string-group pathology — the first version's
    ``groupby(url).Sum`` + native anti-join spent 13 s at sf0.1, this
    shape ~3 s). ``n_buckets`` scales with cluster width; the shuffle
    carries pre-combined (url, n) rows, never raw edges.

    Reference analog: the reference's frontier is a FIXED WAT shard list
    (update_db.py:31-40); discovered-link expansion is the capability a
    self-sustaining crawler adds on top."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    n_buckets = max(64, cpus * 8)

    def add_bucket(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pandas().to_numpy(dtype=object)
        bucket = (pd.util.hash_array(urls) % n_buckets).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def partial(b: pa.Table) -> pa.Table:
        g = (pa.table({"url": b.column("dst_url")})
             .group_by("url").aggregate([([], "count_all")]))
        g = g.rename_columns(["url", "n"])
        return add_bucket(g.append_column(
            "is_page", pa.array(np.zeros(g.num_rows, np.int64), pa.int64())))

    def pages(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return add_bucket(pa.table({
            "url": b.column("url"),
            "n": pa.array(np.zeros(n, np.int64), pa.int64()),
            "is_page": pa.array(np.ones(n, np.int64), pa.int64())}))

    cand = q_outlink_extract(sf_dir).map_batches(
        partial, batch_format="pyarrow", batch_size=SLIM_BATCH)
    root = ensure_links(sf_dir)
    crawled = ray.data.read_parquet(
        os.path.join(root, "linkpages"), columns=["url"]).map_batches(
        pages, batch_format="pyarrow", batch_size=SLIM_BATCH)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("url", sort=False)[["n", "is_page"]].sum()
        keep = (agg["is_page"].to_numpy() == 0)
        return pd.DataFrame({
            "url": agg.index.to_numpy(dtype=object)[keep],
            "n_inlinks": agg["n"].to_numpy(np.int64)[keep]})

    return (coalesce_slim(cand.union(crawled)).groupby("bucket")
            .map_groups(fold, batch_format="pandas"))


def _lpa_adopt(keys: np.ndarray, w: np.ndarray, labels: np.ndarray,
               n: int) -> np.ndarray:
    """One synchronous label-propagation adoption step from merged
    (node·n+label, weight) partials: each node present in ``keys`` takes
    the label with the greatest total incident weight (ties → smallest
    label id); absent (isolated) nodes keep their label."""
    if not len(keys):
        return labels.copy()
    node = keys // n
    lab = keys % n
    # lexsort keys, last = primary: node asc, weight desc, label asc
    order = np.lexsort((lab, -w, node))
    node_o = node[order]
    first = np.ones(len(node_o), bool)
    first[1:] = node_o[1:] != node_o[:-1]
    new = labels.copy()
    new[node_o[first]] = lab[order][first]
    return new


def label_prop_fit(sf_dir: str, n_iter: int = 10) -> pd.DataFrame:
    """Deterministic synchronous label propagation over the UNDIRECTED
    weighted host graph (public basis: Raghavan, Albert & Kumara,
    "Near linear time algorithm to detect community structures in
    large-scale networks", Phys. Rev. E 76, 2007) — the community
    operator complementing PageRank/HITS on the same edge-shard pool.

    Every node starts as its own label (its index in the sorted host
    universe). Each round, every shard scatters its edges' endpoint
    labels both ways (self-loops excluded) into combined-per-shard
    (node, label)→weight partials; the driver merges them and each node
    adopts the neighbor label with the greatest total incident edge
    weight, ties broken by the SMALLEST label id — fully deterministic,
    no RNG. Isolated nodes keep their own label. Synchronous updates can
    2-cycle on bipartite-ish structures (the published caveat), so the
    loop stops at convergence or ``n_iter``, whichever first.

    Output: (host, community) where community is the winning label's
    host string. Rows-only (iterative); twin-tested against a dense
    numpy implementation and a planted two-clique graph in tests.

    Reference analog: none — the reference has no link graph at all;
    this is the mirror-farm / link-ring clustering a crawl post-pass
    runs on the host graph."""
    pool = _EdgePool(sf_dir)
    try:
        n = pool.n
        labels = np.arange(n, dtype=np.int64)
        for _ in range(n_iter):
            keys, w = pool.label_weights(labels)
            new = _lpa_adopt(keys, w, labels, n)
            if np.array_equal(new, labels):
                break
            labels = new
        return pd.DataFrame({"host": pool.hosts,
                             "community": pool.hosts[labels]})
    finally:
        pool.shutdown()


# Seeded BFS crawl depth: every 13th host (by 60-bit md5) is a seed —
# the deterministic stand-in for a curated seed list; depth capped so
# the recursive oracle terminates on cyclic graphs.
BFS_SEED_MOD = 13
BFS_MAX_DEPTH = 32


def bfs_depth_fit(sf_dir: str, max_depth: int = BFS_MAX_DEPTH) -> pd.DataFrame:
    """Crawl-depth estimation (SURVEY X57): level-synchronous BFS from a
    seeded host set over the DIRECTED host graph — min #link-hops from
    any seed, the "crawl frontier ring" a breadth-first crawler reaches
    each wave (Najork & Wiener, WWW'01: breadth-first order finds
    high-quality pages early). Unreached hosts are omitted.

    Same execution scheme as PageRank: the slim integer edge list loads
    ONCE into the edge-shard actor pool; each BFS level is one boolean
    scatter per shard with the frontier mask broadcast via ``ray.put``
    (#levels ≤ graph diameter ≤ ``max_depth`` rounds, each O(#hosts)
    driver state — the module-docstring host-universe bound). Exact
    integer semantics end-to-end, so the DuckDB recursive-CTE oracle
    hash-matches: this is the family's one ORACLED iterative operator
    (PageRank/HITS/LPA are float fixed-points, rows-only)."""
    from ..functions.canonicalize import md5_hash64
    pool = _EdgePool(sf_dir)
    try:
        hosts = pool.hosts
        depth = np.full(pool.n, -1, np.int64)
        frontier = (md5_hash64(hosts) >> np.uint64(4)) \
            % np.uint64(BFS_SEED_MOD) == 0
        depth[frontier] = 0
        for d in range(1, max_depth + 1):
            reached = pool.push_reach(frontier) & (depth < 0)
            if not reached.any():
                break
            depth[reached] = d
            frontier = reached
        keep = depth >= 0
        return pd.DataFrame({"host": hosts[keep], "depth": depth[keep]})
    finally:
        pool.shutdown()


def q_host_bfs_depth(sf_dir: str):
    """(host, depth): min directed link-hops from the seeded host set;
    oracled by a DuckDB recursive CTE over the same edge grammar."""
    return bfs_depth_fit(sf_dir)


def q_host_communities(sf_dir: str):
    """Rows-only: (host, community) from 10 synchronous label-propagation
    rounds; twin-tested against dense numpy + a planted-clique graph."""
    return label_prop_fit(sf_dir)


def q_host_pagerank(sf_dir: str):
    """Rows-only: (host, rank), damping 0.85, 20 iterations; twin-tested
    against a dense numpy transition-matrix PageRank in tests."""
    return pagerank_fit(sf_dir)


def q_host_hits(sf_dir: str):
    """Rows-only: (host, authority, hub), 20 iterations; twin-tested
    against a dense numpy HITS in tests."""
    return hits_fit(sf_dir)


SIM_MIN_SHARED = 3
SIM_TAU = 0.30


def q_host_outlink_similarity(sf_dir: str, min_shared: int = SIM_MIN_SHARED,
                              tau: float = SIM_TAU, n_buckets: int = 64):
    """Related-site detection by outlink Jaccard (SURVEY X69): host
    pairs whose DISTINCT outlink-target sets overlap — the structural
    'similar sites' signal (co-citation on the host graph; complements
    X45's content-based mirror_hosts). Emits pairs with
    ``shared >= min_shared`` and ``jaccard >= tau``.

    Shape: the X65 overlap discipline on (dst_host, src_host), all
    integer after stage 0 — the host graph's rows are already DISTINCT
    (src, dst) pairs, so stage 1 is ONE dst-bucketed slim shuffle of
    12-byte (dst_h, src_id) rows (a dst never spans buckets; src hosts
    are dictionary-encoded against the #hosts-bounded broadcast
    universe, dsts by 64-bit hash — the X65/snapshot_delta collision
    bound, ~(8·10⁴)²/2⁶⁵ at sfscale). Per bucket, pairs are emitted by
    batched ``triu_indices`` over same-in-degree dst groups (pure
    numpy; the first pandas string self-merge measured 24 s at sf0.1 —
    object-dtype pair keys dominated) and folded to int64-packed
    ``a·H+b`` keys; stage 2 folds pair partials in a second
    integer-bucket shuffle and only the ≤ C(#hosts,2) survivors decode
    back to strings. Out-degrees broadcast as sorted arrays +
    searchsorted (the seq_pack discipline). At 10^10 hosts the scale
    knob is the standard df-cut: drop stop-dsts with in-host-degree >
    K before pairing (Bayardo prefix-filter class) — not applied here
    so the DuckDB oracle stays exact."""
    import ray as _ray

    g = q_host_link_graph(sf_dir)  # materialized, rows = distinct pairs

    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    nb = max(n_buckets, cpus * 4)

    # out-degree per src host over distinct dsts: per-batch partial
    # counts, driver fold bounded by #hosts, broadcast once
    frames = [b.to_pandas() for b in g.map_batches(
        lambda b: (pa.table({"src_host": b.column("src_host")})
                   .group_by("src_host").aggregate([([], "count_all")])
                   .rename_columns(["src_host", "n"])),
        batch_format="pyarrow", batch_size=SLIM_BATCH)
        .iter_batches(batch_format="pyarrow", batch_size=65536)]
    deg = (pd.concat(frames).groupby("src_host")["n"].sum()
           .sort_index())
    hosts_sorted = deg.index.to_numpy(dtype=object)
    degs_sorted = deg.to_numpy(np.int64)
    H = len(hosts_sorted)
    hosts_ref = _ray.put(hosts_sorted)
    degs_ref = _ray.put(degs_sorted)

    def tag_dst(b: pa.Table) -> pa.Table:
        src = b.column("src_host").to_pandas().to_numpy(dtype=object)
        dst = b.column("dst_host").to_pandas().to_numpy(dtype=object)
        src_id = np.searchsorted(_ray.get(hosts_ref), src).astype(np.int32)
        dst_h = pd.util.hash_array(dst).astype(np.int64)
        return pa.table({"dst_h": pa.array(dst_h),
                         "src_id": pa.array(src_id),
                         "bucket": pa.array(
                             (dst_h % nb).astype(np.int32), pa.int32())})

    def pair_fold(gdf: pd.DataFrame) -> pd.DataFrame:
        # sort by (dst, src): groups contiguous, src ascending ⇒ a < b
        order = np.lexsort((gdf["src_id"].to_numpy(np.int32),
                            gdf["dst_h"].to_numpy(np.int64)))
        dst = gdf["dst_h"].to_numpy(np.int64)[order]
        src = gdf["src_id"].to_numpy(np.int32)[order]
        n = len(dst)
        starts = np.concatenate(
            ([0], np.flatnonzero(dst[1:] != dst[:-1]) + 1))
        lens = np.diff(np.append(starts, n))
        keys = []
        # batch all same-in-degree dst groups through one triu_indices
        for k in np.unique(lens):
            if k < 2:
                continue
            s = starts[lens == k]
            mat = src[(s[:, None] + np.arange(k)[None, :])]
            iu, ju = np.triu_indices(int(k), 1)
            a = mat[:, iu].ravel().astype(np.int64)
            b2 = mat[:, ju].ravel().astype(np.int64)
            keys.append(a * H + b2)
        if not keys:
            return pd.DataFrame({"key": pd.Series(dtype="int64"),
                                 "shared": pd.Series(dtype="int64"),
                                 "bucket2": pd.Series(dtype="int32")})
        key, shared = np.unique(np.concatenate(keys), return_counts=True)
        return pd.DataFrame({"key": key, "shared": shared.astype(np.int64),
                             "bucket2": (key % nb).astype(np.int32)})

    def final_fold(gdf: pd.DataFrame) -> pd.DataFrame:
        out = gdf.groupby("key", sort=False, as_index=False)["shared"].sum()
        key = out["key"].to_numpy(np.int64)
        sh = out["shared"].to_numpy(np.int64)
        ia, ib = key // H, key % H
        dv = _ray.get(degs_ref)
        da, db = dv[ia], dv[ib]
        jac = sh.astype(np.float64) / (da + db - sh)
        keep = (sh >= min_shared) & (jac >= tau)
        hosts = _ray.get(hosts_ref)
        return pd.DataFrame({
            "host_a": hosts[ia[keep]], "host_b": hosts[ib[keep]],
            "shared": sh[keep], "deg_a": da[keep], "deg_b": db[keep],
            "jaccard": jac[keep]})

    return (coalesce_slim(
                coalesce_slim(g.map_batches(tag_dst, batch_format="pyarrow",
                                            batch_size=SLIM_BATCH))
                .groupby("bucket")
                .map_groups(pair_fold, batch_format="pandas"))
            .groupby("bucket2")
            .map_groups(final_fold, batch_format="pandas"))


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
        "frontier_expand": f"""
          WITH c AS (
            SELECT dst_url AS url, CAST(count(*) AS BIGINT) AS n_inlinks
            FROM ({edges}) GROUP BY 1)
          SELECT url, n_inlinks FROM c
          WHERE url NOT IN
            (SELECT url FROM read_parquet('{linkpages_glob}'))""",
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
        "reciprocal_hosts": f"""
          WITH e AS ({host_graph})
          SELECT a.src_host AS host_a, a.dst_host AS host_b,
                 CAST(a.n_links AS BIGINT) AS n_ab,
                 CAST(b.n_links AS BIGINT) AS n_ba
          FROM e a JOIN e b
            ON a.src_host = b.dst_host AND a.dst_host = b.src_host
          WHERE a.src_host < a.dst_host""",
        "host_bfs_depth": f"""
          WITH RECURSIVE e AS ({host_graph}),
          hosts AS (
            SELECT DISTINCT regexp_extract(url, '^https?://([^/]+)', 1)
                     AS host
            FROM read_parquet('{linkpages_glob}')
            UNION
            SELECT DISTINCT dst_host FROM e),
          bfs AS (
            SELECT host, 0 AS depth FROM hosts
            WHERE CAST(('0x' || substr(md5(host), 1, 15)) AS BIGINT)
                  % {BFS_SEED_MOD} = 0
            UNION
            SELECT e.dst_host AS host, b.depth + 1 AS depth
            FROM bfs b JOIN e ON e.src_host = b.host
            WHERE b.depth < {BFS_MAX_DEPTH})
          SELECT host, CAST(min(depth) AS BIGINT) AS depth
          FROM bfs GROUP BY host""",
        "inlink_anchor_topk": f"""
          WITH t AS (
            SELECT regexp_extract(dst_url, '^https?://([^/]+)', 1)
                     AS dst_host, anchor
            FROM (
              SELECT CASE WHEN link LIKE 'http%' THEN link
                          ELSE regexp_extract(src_url,
                               '^(https?://[^/]+)', 1) || link END
                       AS dst_url, anchor
              FROM (
                SELECT url AS src_url,
                       unnest(regexp_extract_all(decode(html),
                              'href="([^"]*)"[^>]*>([^<]*)<', 1)) AS link,
                       unnest(regexp_extract_all(decode(html),
                              'href="([^"]*)"[^>]*>([^<]*)<', 2)) AS anchor
                FROM read_parquet('{linkpages_glob}')))),
          c AS (SELECT dst_host, anchor, CAST(count(*) AS BIGINT) AS n
                FROM t GROUP BY 1, 2)
          SELECT dst_host, anchor, n,
                 row_number() OVER (PARTITION BY dst_host
                                    ORDER BY n DESC, anchor) AS anchor_rank
          FROM c QUALIFY anchor_rank <= {ANCHOR_TOPK}""",
        "host_outlink_similarity": f"""
          WITH he AS ({host_graph}),
          e AS (SELECT DISTINCT src_host, dst_host FROM he),
          deg AS (SELECT src_host, CAST(count(*) AS BIGINT) AS deg
                  FROM e GROUP BY 1),
          p AS (SELECT a.src_host AS host_a, b.src_host AS host_b,
                       CAST(count(*) AS BIGINT) AS shared
                FROM e a JOIN e b ON a.dst_host = b.dst_host
                                 AND a.src_host < b.src_host
                GROUP BY 1, 2)
          SELECT host_a, host_b, shared,
                 da.deg AS deg_a, db.deg AS deg_b,
                 CAST(shared AS DOUBLE) / (da.deg + db.deg - shared)
                   AS jaccard
          FROM p JOIN deg da ON p.host_a = da.src_host
                 JOIN deg db ON p.host_b = db.src_host
          WHERE shared >= {SIM_MIN_SHARED}
            AND CAST(shared AS DOUBLE) / (da.deg + db.deg - shared)
                >= {SIM_TAU}""",
    }


LINK_QUERIES = {
    "outlink_extract": q_outlink_extract,
    "host_link_graph": q_host_link_graph,
    "anchor_text": q_anchor_text,
    "host_degree": q_host_degree,
    "reciprocal_hosts": q_reciprocal_hosts,
    "inlink_anchor_topk": q_inlink_anchor_topk,
    "frontier_expand": q_frontier_expand,
    "host_bfs_depth": q_host_bfs_depth,
    "host_outlink_similarity": q_host_outlink_similarity,
    "host_pagerank": q_host_pagerank,   # rows-only (iterative)
    "host_hits": q_host_hits,           # rows-only (iterative)
    "host_communities": q_host_communities,  # rows-only (iterative)
}
