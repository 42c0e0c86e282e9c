"""Frontier operator queries — Ray Data implementations.

Each function takes ``sf_dir`` (a /root/testdata/sf* path; the matching
synthetic frontier is materialized idempotently under /tmp/graft_frontier)
and returns a Dataset / pandas DataFrame whose columns exactly match the
DuckDB oracle in :mod:`.oracle` (same names, same dtypes) so the driver's
order-insensitive value-hash comparison passes.

Operator ↔ reference mapping is in SURVEY.md §2 (M8/M9 canonicalize, D1
dedup, T3 robots, O5 politeness, T1/O3 dispatch, M10 extract, A6 counters).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.extract import fetch_extract_batch
from ..stages.dispatch import dispatch_table
from ..stages.politeness import politeness_ranked
from . import frontier_core as core


# per-process cache of the canonicalized slim frontier (url, warc_ts,
# url_canon, host), materialized once per sf_dir — the dedup/robots/
# politeness query chain consumes it multiple times, and re-running the
# regex canonicalization per pass doubled every query's wall time. ~150 MB
# at sf0.1; at production scale this would be the staged frontier on disk
# (pipelines/frontier.py bootstrap), not an in-memory cache. Keyed by
# (sf_dir, mtime+size fingerprint) so a regenerated-in-place fixture
# invalidates the cache instead of serving stale rows.
_SLIM_CACHE: dict[tuple[str, str], object] = {}


def _slim(sf_dir: str, cfg: PipelineConfig):
    key = (sf_dir, core.tree_fingerprint(core.pages_path(sf_dir)))
    if key not in _SLIM_CACHE:
        for k in [k for k in _SLIM_CACHE if k[0] == sf_dir]:
            del _SLIM_CACHE[k]   # drop the stale generation, keep other sfs
        ds = core.with_canon(core.pages_ds(sf_dir, ["url", "warc_ts"]),
                             cfg, light=True)
        _SLIM_CACHE[key] = ds.materialize()
    return _SLIM_CACHE[key]


def q_url_canonicalize(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    ds = core.pages_ds(sf_dir, columns=["url"])
    return core.with_canon(ds, cfg, light=True).select_columns(
        ["url", "url_canon", "host"])


def q_url_dedup_exact(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    return core.dedup_survivors(_slim(sf_dir, cfg)).select_columns(
        ["url_canon", "url", "warc_ts"])


def q_robots_gate(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    return core.robots_gated(core.dedup_survivors(_slim(sf_dir, cfg)),
                             cfg).select_columns(["url_canon", "host", "allowed"])


def q_politeness_rank(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    allowed = core.robots_allowed_only(core.dedup_survivors(_slim(sf_dir, cfg)), cfg)
    slim = allowed.select_columns(["host", "url_canon", "warc_ts"])
    return politeness_ranked(slim, cfg.politeness_budget).select_columns(
        ["host", "url_canon", "politeness_rank", "fetch_round"])


def q_dispatch_order(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Partition universe from the *unique hosts* of allowed survivors —
    md5 per host (thousands), never per row (millions)."""
    from ..functions.canonicalize import md5_partition
    import numpy as np
    allowed = core.robots_allowed_only(core.dedup_survivors(_slim(sf_dir, cfg)), cfg)
    hosts = np.asarray(allowed.unique("host"), dtype=object)
    parts = sorted(set(md5_partition(hosts, cfg.partition_hex_chars).tolist()))
    return dispatch_table(parts, cfg.seed)


def q_extract_text(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    ds = core.pages_ds(sf_dir, ["url", "warc_ts", "html", "text"])
    return ds.map_batches(fetch_extract_batch, batch_format="pyarrow",
                          batch_size=cfg.batch_size,
                          zero_copy_batch=True).select_columns(
        ["url", "warc_ts", "text_extracted"])


def q_url_distinct_hll(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Approximate distinct canonical URLs via mergeable HLL sketches
    (rows-only for the driver; accuracy asserted vs exact in pytest)."""
    import pandas as pd
    from ..functions.sketches import hll_distinct
    ds = _slim(sf_dir, cfg)
    est = hll_distinct(ds, "url_canon")
    return pd.DataFrame({"n_distinct_est": pd.array([int(round(est))], "int64")})


HH_PHI = 0.01  # heavy-hitter threshold: hosts holding > 1% of the frontier


def q_host_heavy_hitters(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """EXACT hosts with > φ·n frontier rows WITHOUT a full groupby(host):
    mergeable Misra-Gries sketches per batch (KB messages, no false
    negatives at k+1 > 1/φ) find ≤k candidates; a broadcast is_in pass
    counts exactly those; threshold on exact counts ⇒ identical to SQL
    ``GROUP BY host HAVING count(*) > φ·n``. The pattern that replaces a
    10^9-host shuffle with two streaming passes at 100 TB."""
    from ..functions.sketches import heavy_hitters_exact
    return heavy_hitters_exact(_slim(sf_dir, cfg), "host", HH_PHI, k=256)


def q_frontier_counters(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """All frontier counters from ONE tagged pass (the flagship's
    counter-derivation shape, pipelines/frontier.py:_wave_counters):
    dedup → robots gate → per-batch (host, n_rows, n_allowed) partials →
    a driver fold bounded by #hosts. The politeness-round count needs no
    ranking shuffle at all: rank is dense 1..c per host, so
    count(rank ≤ B) ≡ Σ_host min(B, allowed_count) — the host counts
    already carry it. (The first version ran four separate count passes
    with two materializes.)"""
    import numpy as np

    ds = _slim(sf_dir, cfg)
    n_pages = ds.count()                    # metadata — ds is materialized
    gated = core.robots_gated(core.dedup_survivors(ds), cfg)

    def host_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"host": b.column("host"),
                      "ok": b.column("allowed").cast(pa.int64())})
        g = t.group_by("host").aggregate([("ok", "sum"), ("ok", "count")])
        return g.rename_columns(["host", "n_ok", "n_rows"])

    hosts = (gated.map_batches(host_partial, batch_format="pyarrow")
             .to_pandas().groupby("host")[["n_rows", "n_ok"]].sum())
    n_unique = int(hosts["n_rows"].sum())
    n_allowed = int(hosts["n_ok"].sum())
    n_hosts = int((hosts["n_ok"] > 0).sum())
    n_round0 = int(np.minimum(hosts["n_ok"].to_numpy(np.int64),
                              cfg.politeness_budget).sum())
    return pd.DataFrame({
        "n_pages": pd.array([n_pages], dtype="int64"),
        "n_unique": pd.array([n_unique], dtype="int64"),
        "n_dups_removed": pd.array([n_pages - n_unique], dtype="int64"),
        "n_blocked": pd.array([n_unique - n_allowed], dtype="int64"),
        "n_allowed": pd.array([n_allowed], dtype="int64"),
        "n_hosts": pd.array([n_hosts], dtype="int64"),
        "n_round0": pd.array([n_round0], dtype="int64"),
    })


def q_crawl_schedule_occupancy(sf_dir: str,
                               cfg: PipelineConfig = DEFAULT_CONFIG):
    """Politeness-schedule occupancy (SURVEY X70): per fetch round, how
    many URLs are scheduled and how many hosts are active — the
    capacity-planning curve of the crawl (early rounds saturate every
    host; the long tail is a few deep hosts fetching alone, the Zipf
    makespan signature).

    No ranking shuffle at all: within a host, politeness ranks are
    dense 1..k, so round r receives ``min(B, k_h - r·B)`` URLs from
    every host with ``k_h > r·B`` — per-round occupancy is a pure
    function of the per-host ALLOWED counts. One streaming per-batch
    partial → a #hosts-bounded driver fold → an O(rounds · log hosts)
    searchsorted/suffix-sum evaluation. The SQL oracle states the naive
    form (GROUP BY fetch_round over the ranked CTE)."""
    import numpy as np

    gated = core.robots_gated(core.dedup_survivors(_slim(sf_dir, cfg)), cfg)

    def host_partial(b: pa.Table) -> pa.Table:
        b = b.filter(b.column("allowed"))
        g = pa.table({"host": b.column("host")}).group_by("host") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["host", "n"])

    hosts = (gated.map_batches(host_partial, batch_format="pyarrow")
             .to_pandas().groupby("host")["n"].sum())
    k = np.sort(hosts.to_numpy(np.int64))           # ascending host sizes
    B = cfg.politeness_budget
    suffix = np.concatenate((np.cumsum(k[::-1])[::-1], [0]))  # Σ k[i:]
    n_rounds = int(-(-int(k[-1]) // B)) if len(k) else 0
    rounds = np.arange(n_rounds, dtype=np.int64)
    rows = []
    for r in rounds:
        lo = int(np.searchsorted(k, r * B, side="right"))   # k > rB
        hi = int(np.searchsorted(k, (r + 1) * B, side="left"))  # k < (r+1)B
        full = len(k) - max(hi, lo)                  # hosts giving B urls
        part_sum = int(suffix[lo] - suffix[max(hi, lo)]) - (max(hi, lo) - lo) * r * B
        rows.append((int(r), part_sum + full * B, len(k) - lo))
    return pd.DataFrame(rows, columns=["fetch_round", "n_urls", "n_hosts"]) \
        .astype({"fetch_round": "int64", "n_urls": "int64",
                 "n_hosts": "int64"})


RECRAWL_K = 100


def q_recrawl_priority(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                       k: int = RECRAWL_K):
    """Recrawl scheduling: the k frontier URLs most worth re-fetching,
    priority = staleness × host importance (age in µs since the newest
    crawl × ln(1 + host page count) over deduped survivors).

    Two streaming passes over the slim frontier: (1) per-batch (host, n,
    max_ts) partials → one groupby-sum bounded by #hosts, collected and
    broadcast once (``ray.put`` of two sorted arrays — the politeness
    host-table class of driver state); (2) vectorized score + per-batch
    top-k → one shrink level → driver final. The float priority orders
    but is never emitted (module doctrine); output carries the exact
    integers (age_us, host_pages) the oracle recomputes.

    Reference analog: none — the reference crawls each WAT shard once
    (models.py:31-32 closed is terminal); this is the recrawl-frequency
    extension a continuous crawler needs."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Max, Sum

    dedup = core.dedup_survivors(_slim(sf_dir, cfg)).select_columns(
        ["url_canon", "host", "warc_ts"]).materialize()

    def host_partial(b: pa.Table) -> pa.Table:
        return (b.select(["host", "warc_ts"])
                .group_by("host")
                .aggregate([("warc_ts", "count"), ("warc_ts", "max")])
                .rename_columns(["host", "n", "mx"]))

    hc = (dedup.map_batches(host_partial, batch_format="pyarrow",
                            batch_size=cfg.batch_size)
          .groupby("host").aggregate(Sum("n", alias_name="host_pages"),
                                     Max("mx", alias_name="mx"))
          .to_pandas())               # bounded by #hosts
    hosts_arr = hc["host"].to_numpy(dtype=object)
    order = np.argsort(hosts_arr)
    hosts_sorted = hosts_arr[order]
    pages_sorted = hc["host_pages"].to_numpy(np.int64)[order]
    max_us = int(pd.to_datetime(hc["mx"].max()).value // 1000)
    ref = ray.put((hosts_sorted, pages_sorted))

    empty = pa.table({"url_canon": pa.array([], pa.string()),
                      "host": pa.array([], pa.string()),
                      "age_us": pa.array([], pa.int64()),
                      "host_pages": pa.array([], pa.int64()),
                      "_p": pa.array([], pa.float64())})

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        hs, ps = ray.get(ref)
        h = np.asarray(b.column("host"), dtype=object)
        hp = ps[np.searchsorted(hs, h)]
        ts = np.asarray(b.column("warc_ts").cast(pa.timestamp("us"))
                        .cast(pa.int64()))
        age = max_us - ts
        p = age.astype(np.float64) * np.log1p(hp.astype(np.float64))
        u = np.asarray(b.column("url_canon"), dtype=object)
        sel = np.lexsort((u, -p))[:k]
        return pa.table({
            "url_canon": pa.array(u[sel], pa.string()),
            "host": pa.array(h[sel], pa.string()),
            "age_us": pa.array(age[sel], pa.int64()),
            "host_pages": pa.array(hp[sel], pa.int64()),
            "_p": pa.array(p[sel], pa.float64())})

    def shrink(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["_p", "url_canon"],
                                       ascending=[False, True],
                                       kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cands = (dedup.map_batches(score, batch_format="pyarrow",
                               batch_size=cfg.batch_size)
             .repartition(4)
             .map_batches(shrink, batch_format="pyarrow", batch_size=None)
             .to_pandas())            # ≤ 4·k rows
    out = (cands.sort_values(["_p", "url_canon"], ascending=[False, True],
                             kind="mergesort").head(k).drop(columns="_p"))
    return out.reset_index(drop=True).astype(
        {"age_us": "int64", "host_pages": "int64"})


def q_snapshot_delta(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Incremental-crawl snapshot delta: which URLs were added, removed,
    or content-changed between crawl snapshot A (the pages frontier) and
    snapshot B (``sources/synth.ensure_snapshot2`` — a pure url-keyed
    derivation, so the oracle only reads the two parquet trees).

    ONE shuffle total, keyed by an INTEGER hash bucket (url never spans
    buckets ⇒ exact): each side is slimmed per batch to distinct
    (url, 63-bit content-hash) rows with the other side's hash column
    at the −1 sentinel, the two Datasets union, and a single
    ``groupby(bucket).map_groups`` folds both sides with a pandas
    max — no join operator, no driver set, and crucially no Ray
    sort-aggregate over millions of distinct URL STRING groups (the
    measured 10^5+-string-group pathology; first version spent 18 s
    here at sf0.1, the bucketed fold ~3 s). Status falls out
    vectorized: hb sentinel → removed, ha sentinel → added, both
    present but different → changed; unchanged rows are dropped
    in-group. Content identity is the top 63 bits of md5(text)
    (``md5_hash64``), exactly reproducible in DuckDB (the oracle
    compares full md5 — equality verdicts agree up to 2^-63
    truncation collisions, and the text-equality twin test pins it).

    ``n_buckets`` scales with cluster width (buckets ≈ 8 × cores;
    urls hash uniformly, so per-bucket group size is corpus/buckets —
    the knob a 256-node run raises).

    Reference analog: none — the reference crawls each shard once
    (models.py:31-32); this is the snapshot-diff a continuous crawler
    runs between recrawl rounds to size its update frontier."""
    import os

    import numpy as np
    import ray
    import ray.data

    from ..functions.canonicalize import md5_hash64
    from ..sources.synth import ensure_snapshot2, frontier_dir

    p2 = ensure_snapshot2(sf_dir)
    p1 = os.path.join(frontier_dir(sf_dir), "pages")
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    n_buckets = max(64, cpus * 8)

    def hashed(side: str):
        def fn(b: pa.Table) -> pa.Table:
            h = (md5_hash64(b.column("text")) >> np.uint64(1)) \
                .astype(np.int64)                     # 63-bit, always ≥ 0
            t = (pa.table({"url": b.column("url"),
                           "h": pa.array(h, pa.int64())})
                 .group_by(["url", "h"]).aggregate([]))     # local distinct
            n = t.num_rows
            urls = t.column("url").to_pandas().to_numpy(dtype=object)
            bucket = (pd.util.hash_array(urls) % n_buckets).astype(np.int32)
            sent = pa.array(np.full(n, -1, np.int64), pa.int64())
            ha = t.column("h") if side == "a" else sent
            hb = t.column("h") if side == "b" else sent
            return pa.table({"url": t.column("url"), "ha": ha, "hb": hb,
                             "bucket": pa.array(bucket, pa.int32())})
        return fn

    a = ray.data.read_parquet(p1, columns=["url", "text"]).map_batches(
        hashed("a"), batch_format="pyarrow", batch_size=cfg.batch_size)
    b = ray.data.read_parquet(p2, columns=["url", "text"]).map_batches(
        hashed("b"), batch_format="pyarrow", batch_size=cfg.batch_size)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # contract: each url carries ONE content hash per snapshot.  The
        # DuckDB oracle full-outer-joins DISTINCT (url, md5) rows, so a
        # url with two different texts inside one snapshot would make the
        # oracle emit multiple rows while the max-fold below collapses to
        # one — assert the precondition instead of silently diverging.
        # (Rows here are per-BATCH-distinct (url, h) only, so the same
        # pair can arrive once per input batch — dedup globally first,
        # then a url with k>1 distinct hashes on a side keeps k rows.)
        gd = g.drop_duplicates(["url", "ha", "hb"])
        na = (gd.assign(_a=(gd["ha"].to_numpy(np.int64) != -1).astype(np.int64),
                        _b=(gd["hb"].to_numpy(np.int64) != -1).astype(np.int64))
              .groupby("url", sort=False)[["_a", "_b"]].sum())
        if (na.to_numpy(np.int64) > 1).any():
            bad = na.index[(na["_a"] > 1) | (na["_b"] > 1)][:3].tolist()
            raise ValueError(
                "snapshot_delta: url(s) with multiple distinct content "
                f"hashes within one snapshot (e.g. {bad}); the delta is "
                "defined on single-version snapshots — dedup upstream "
                "(doc_dedup_keep_best) before diffing")
        agg = g.groupby("url", sort=False)[["ha", "hb"]].max()
        ha = agg["ha"].to_numpy(np.int64)
        hb = agg["hb"].to_numpy(np.int64)
        removed = hb == -1
        added = ha == -1
        keep = removed | added | (ha != hb)
        status = np.where(removed, "removed",
                          np.where(added, "added", "changed"))
        return pd.DataFrame({"url": agg.index.to_numpy(dtype=object)[keep],
                             "status": status[keep]})

    return (core.coalesce_slim(a.union(b)).groupby("bucket")
            .map_groups(fold, batch_format="pandas"))


def sql_snapshot_delta(pages_path: str, pages2_path: str) -> str:
    """DuckDB oracle: full outer join of the two snapshots' distinct
    (url, md5(text)) projections. The Ray side compares the first 8
    bytes of the same md5, so (in)equality verdicts are identical."""
    return f"""
WITH a AS (SELECT DISTINCT url, md5(text) AS h
           FROM read_parquet('{pages_path}/*.parquet')),
     b AS (SELECT DISTINCT url, md5(text) AS h
           FROM read_parquet('{pages2_path}/*.parquet'))
SELECT coalesce(a.url, b.url) AS url,
       CASE WHEN b.url IS NULL THEN 'removed'
            WHEN a.url IS NULL THEN 'added'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.url = b.url
WHERE b.url IS NULL OR a.url IS NULL OR a.h <> b.h"""


def q_host_change_rate(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Per-host content change-rate between crawl snapshots A and B — the
    change-frequency estimate a continuous crawler feeds into its recrawl
    scheduler (public basis: Cho & Garcia-Molina, "Synchronizing a database
    to improve freshness", SIGMOD 2000 — per-source change rates set
    revisit frequency; ``q_recrawl_priority`` supplies the importance
    term, this supplies the freshness term).

    Same ONE-shuffle shape as :func:`q_snapshot_delta` but keyed by
    hash-bucket(HOST) (a url's host is a pure function of the url, so
    every row of a url — and every url of a host — lands in one bucket ⇒
    exact). Each side slims per batch to distinct (url, 63-bit content
    hash) with the other side's hash at the −1 sentinel; a single
    ``groupby(bucket).map_groups`` folds per url, classifies
    added/removed/changed/unchanged vectorized, then aggregates counts
    per host in-group. The shuffle carries one slim row per distinct
    (url, hash) — no text, no join operator, no driver state; buckets ≈
    8 × cores is the knob a 256-node run raises.

    Output: (host, n_added, n_removed, n_changed, n_unchanged,
    change_rate) where change_rate = changed / (changed + unchanged)
    over the urls that persist in both snapshots (0.0 when none do).

    The per-HOST result (bounded by #hosts) is materialized once per
    (snapshot A, snapshot B) fingerprint pair and cached per process —
    ``q_crawl_budget_alloc`` consumes the same aggregate, and at
    production scale this table would be staged parquet derived once per
    recrawl round (the ``_SLIM_CACHE`` / ``_GRAPH_CACHE`` precedent);
    regenerating either snapshot in place invalidates it (tested).

    Reference analog: none — the reference crawls each shard exactly once
    (models.py:31-32); this is the continuous-crawl extension."""
    import os

    import numpy as np
    import ray
    import ray.data
    import pyarrow.compute as pc

    from ..functions.canonicalize import md5_hash64
    from ..sources.synth import ensure_snapshot2, frontier_dir

    p2 = ensure_snapshot2(sf_dir)
    p1 = os.path.join(frontier_dir(sf_dir), "pages")
    key = (sf_dir, core.tree_fingerprint(p1), core.tree_fingerprint(p2))
    if key in _RATES_CACHE:
        return _RATES_CACHE[key]
    for k in [k for k in _RATES_CACHE if k[0] == sf_dir]:
        del _RATES_CACHE[k]   # drop the stale generation, keep other sfs
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    n_buckets = max(64, cpus * 8)

    def hashed(side: str):
        def fn(b: pa.Table) -> pa.Table:
            h = (md5_hash64(b.column("text")) >> np.uint64(1)) \
                .astype(np.int64)                     # 63-bit, always ≥ 0
            t = (pa.table({"url": b.column("url"),
                           "h": pa.array(h, pa.int64())})
                 .group_by(["url", "h"]).aggregate([]))     # local distinct
            urls = t.column("url")
            if isinstance(urls, pa.ChunkedArray):
                urls = urls.combine_chunks()
            # raw-url host: lowercased authority, any :port stripped —
            # mirrored verbatim by the oracle's regexp_replace/lower pair
            host = pc.replace_substring_regex(
                pc.utf8_lower(pc.replace_substring_regex(
                    urls, pattern=r"^[^:/?#]+://([^/?#]*).*$",
                    replacement=r"\1")),
                pattern=":[0-9]*$", replacement="")
            n = t.num_rows
            bucket = (pd.util.hash_array(
                host.to_pandas().to_numpy(dtype=object)) % n_buckets
            ).astype(np.int32)
            sent = pa.array(np.full(n, -1, np.int64), pa.int64())
            ha = t.column("h") if side == "a" else sent
            hb = t.column("h") if side == "b" else sent
            return pa.table({"url": urls, "host": host, "ha": ha, "hb": hb,
                             "bucket": pa.array(bucket, pa.int32())})
        return fn

    a = ray.data.read_parquet(p1, columns=["url", "text"]).map_batches(
        hashed("a"), batch_format="pyarrow", batch_size=cfg.batch_size)
    b = ray.data.read_parquet(p2, columns=["url", "text"]).map_batches(
        hashed("b"), batch_format="pyarrow", batch_size=cfg.batch_size)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # same single-version-per-snapshot contract as q_snapshot_delta:
        # rows are per-batch-distinct, so dedup globally, then a url with
        # two distinct hashes on one side would silently mis-classify —
        # assert instead (dedup upstream with doc_dedup_keep_best first)
        gd = g.drop_duplicates(["url", "ha", "hb"])
        na = (gd.assign(_a=(gd["ha"].to_numpy(np.int64) != -1).astype(np.int64),
                        _b=(gd["hb"].to_numpy(np.int64) != -1).astype(np.int64))
              .groupby("url", sort=False)[["_a", "_b"]].sum())
        if (na.to_numpy(np.int64) > 1).any():
            bad = na.index[(na["_a"] > 1) | (na["_b"] > 1)][:3].tolist()
            raise ValueError(
                "host_change_rate: url(s) with multiple distinct content "
                f"hashes within one snapshot (e.g. {bad}); change rates "
                "are defined on single-version snapshots")
        agg = g.groupby("url", sort=False).agg(
            ha=("ha", "max"), hb=("hb", "max"), host=("host", "first"))
        ha = agg["ha"].to_numpy(np.int64)
        hb = agg["hb"].to_numpy(np.int64)
        removed = hb == -1
        added = ha == -1
        changed = ~removed & ~added & (ha != hb)
        unchanged = ~removed & ~added & (ha == hb)
        per = pd.DataFrame({
            "host": agg["host"].to_numpy(dtype=object),
            "n_added": added.astype(np.int64),
            "n_removed": removed.astype(np.int64),
            "n_changed": changed.astype(np.int64),
            "n_unchanged": unchanged.astype(np.int64),
        }).groupby("host", sort=False, as_index=False).sum()
        persist = (per["n_changed"] + per["n_unchanged"]).to_numpy(np.int64)
        with np.errstate(invalid="ignore"):
            rate = np.where(persist == 0, 0.0,
                            per["n_changed"].to_numpy(np.float64)
                            / np.maximum(persist, 1))
        per["change_rate"] = rate
        return per

    out = (core.coalesce_slim(a.union(b)).groupby("bucket")
           .map_groups(fold, batch_format="pandas")).materialize()
    _RATES_CACHE[key] = out
    return out


# per-process cache of the per-host change aggregate, keyed by the two
# snapshots' tree fingerprints (see q_host_change_rate docstring)
_RATES_CACHE: dict[tuple[str, str, str], object] = {}


def sql_host_change_rate(pages_path: str, pages2_path: str) -> str:
    """DuckDB oracle: full outer join of the two snapshots' distinct
    (url, md5(text)) projections, host extracted from the raw url with
    the same lowercase-authority / strip-port rule, grouped per host."""
    return f"""
WITH a AS (SELECT DISTINCT url, md5(text) AS h
           FROM read_parquet('{pages_path}/*.parquet')),
     b AS (SELECT DISTINCT url, md5(text) AS h
           FROM read_parquet('{pages2_path}/*.parquet')),
     j AS (SELECT coalesce(a.url, b.url) AS url, a.h AS ha, b.h AS hb
           FROM a FULL OUTER JOIN b ON a.url = b.url),
     s AS (SELECT regexp_replace(
                    lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
                    ':[0-9]*$', '') AS host,
                  CASE WHEN hb IS NULL THEN 'removed'
                       WHEN ha IS NULL THEN 'added'
                       WHEN ha <> hb THEN 'changed'
                       ELSE 'unchanged' END AS st
           FROM j)
SELECT host,
       CAST(count(*) FILTER (WHERE st = 'added')     AS BIGINT) AS n_added,
       CAST(count(*) FILTER (WHERE st = 'removed')   AS BIGINT) AS n_removed,
       CAST(count(*) FILTER (WHERE st = 'changed')   AS BIGINT) AS n_changed,
       CAST(count(*) FILTER (WHERE st = 'unchanged') AS BIGINT) AS n_unchanged,
       CASE WHEN count(*) FILTER (WHERE st IN ('changed', 'unchanged')) = 0
            THEN 0.0
            ELSE CAST(count(*) FILTER (WHERE st = 'changed') AS DOUBLE)
                 / count(*) FILTER (WHERE st IN ('changed', 'unchanged'))
       END AS change_rate
FROM s GROUP BY host"""


BUDGET_TOTAL = 10_000


def q_crawl_budget_alloc(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                         budget: int = BUDGET_TOTAL):
    """Adaptive crawl-budget apportionment: divide a global per-round
    fetch budget across hosts proportional to their observed change
    signals, using the Hamilton / largest-remainder method (exact integer
    apportionment — the same scheme legislatures use for seats; every
    quantity below is int64, so the DuckDB oracle matches bit-for-bit,
    no float division anywhere).

    Weight per host: ``w = 2·n_changed + n_added + 1`` (changed pages
    need recrawl, new pages need first crawl, +1 keeps dormant hosts
    eligible); base share = floor(B·w / W); the L = B − Σbase leftover
    slots go to the L largest remainders ``(B·w) mod W`` (ties: host
    ascending). Σ fetch_budget == B by construction (asserted).

    The heavy part — per-url change classification from the two
    snapshots — is the distributed host-bucketed fold of
    :func:`q_host_change_rate`; the apportionment itself runs on the
    per-HOST aggregate, O(#hosts) driver state with the same documented
    bound as the PageRank rank vector (link_queries X31) — at 10^8 hosts
    that is three int64 vectors, and the fold never ships urls to the
    driver.

    Reference analog: the politeness budget (north_rule) made adaptive;
    the reference's frontier has no per-host budget at all."""
    import numpy as np

    per = q_host_change_rate(sf_dir, cfg).to_pandas()
    hosts = per["host"].to_numpy(dtype=object)
    w = (2 * per["n_changed"].to_numpy(np.int64)
         + per["n_added"].to_numpy(np.int64) + 1)
    W = int(w.sum())
    bw = np.int64(budget) * w
    base = bw // W
    rem = bw % W
    n_left = int(budget - base.sum())
    order = np.lexsort((hosts, -rem))        # rem desc, host asc
    out = base.copy()
    out[order[:n_left]] += 1
    assert int(out.sum()) == budget
    return pd.DataFrame({"host": hosts, "w": w,
                         "fetch_budget": out}).astype(
        {"w": "int64", "fetch_budget": "int64"})


def sql_crawl_budget_alloc(pages_path: str, pages2_path: str,
                           budget: int = BUDGET_TOTAL) -> str:
    """DuckDB oracle: the same integer Hamilton apportionment over the
    host change-rate CTE — `//` and `%` on BIGINT, a window rank on
    (remainder DESC, host) for the leftover slots."""
    rates = sql_host_change_rate(pages_path, pages2_path)
    return f"""
WITH rates AS ({rates}),
w AS (SELECT host, CAST(2 * n_changed + n_added + 1 AS BIGINT) AS w
      FROM rates),
tot AS (SELECT sum(w) AS tw, CAST({budget} AS BIGINT) AS b FROM w),
calc AS (SELECT host, w, (b * w) // tw AS base, (b * w) % tw AS rem
         FROM w, tot),
l AS (SELECT (SELECT b FROM tot) - sum(base) AS n_left FROM calc)
SELECT host, w,
       CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, host)
                             <= (SELECT n_left FROM l)
                        THEN 1 ELSE 0 END AS BIGINT) AS fetch_budget
FROM calc"""


PATTERN_TOPK = 3


def q_url_pattern_mine(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                       k: int = PATTERN_TOPK, n_buckets: int = 64):
    """URL structure mining: the top-k first path segments per host over
    the canonicalized frontier (crawl analytics — which site sections
    dominate a host's URL space). Per-batch (host, seg) partial counts →
    ONE shuffle keyed by hash-bucket(host) (hosts never span buckets ⇒
    exact totals; 64 groups, not one map_groups call per host) →
    per-bucket exact sum + rank; the shuffle carries pre-combined
    counts, never raw URLs."""
    import numpy as np
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        uc = b.column("url_canon")
        if isinstance(uc, pa.ChunkedArray):
            uc = uc.combine_chunks()
        # canon always has "/" after the authority, so this always matches
        seg = pc.replace_substring_regex(
            uc, pattern=r"^[a-z]+://[^/]+/([^/?#]*).*$", replacement=r"\1")
        g = (pa.table({"host": b.column("host"), "seg": seg})
             .group_by(["host", "seg"]).aggregate([([], "count_all")]))
        g = g.rename_columns(["host", "seg", "n"])
        hosts = g.column("host").to_pandas().to_numpy(dtype=object)
        bucket = (pd.util.hash_array(hosts) % n_buckets).astype(np.int32)
        return g.append_column("bucket", pa.array(bucket, pa.int32()))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        tot = (g.groupby(["host", "seg"], sort=False, as_index=False)
               ["n"].sum()
               .sort_values(["host", "n", "seg"],
                            ascending=[True, False, True],
                            kind="mergesort"))
        tot["seg_rank"] = (tot.groupby("host", sort=False)
                           .cumcount() + 1).astype(np.int64)
        tot = tot[tot["seg_rank"] <= k]
        tot["n"] = tot["n"].astype("int64")
        return tot[["host", "seg", "n", "seg_rank"]]

    slim = _slim(sf_dir, cfg)
    return (core.coalesce_slim(slim.map_batches(partial,
                                                batch_format="pyarrow",
                                                batch_size=cfg.batch_size))
            .groupby("bucket").map_groups(final, batch_format="pandas"))


# --- crawl-trap detection (X44) -------------------------------------------

TRAP_RATIO = 50.0       # distinct-urls per distinct-template to flag a host
TRAP_MIN_URLS = 100     # ignore hosts too small for the ratio to mean much

_HOST_RE = r"^[^:/?#]+://([^/?#]*).*$"


def _raw_host(urls: pa.Array):
    """Lowercased authority with any :port stripped, from the RAW url —
    the same rule (and the same regex, verbatim) as the
    ``q_host_change_rate`` oracle pair."""
    import pyarrow.compute as pc
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pc.replace_substring_regex(
        pc.utf8_lower(pc.replace_substring_regex(
            urls, pattern=_HOST_RE, replacement=r"\1")),
        pattern=":[0-9]*$", replacement="")


def trap_score_from_pages(pages_path: str,
                          cfg: PipelineConfig = DEFAULT_CONFIG,
                          ratio: float = TRAP_RATIO,
                          min_urls: int = TRAP_MIN_URLS,
                          n_buckets: int = 64):
    """Crawl-trap detection over a pages parquet tree: per host, the ratio
    of distinct URLs to distinct URL TEMPLATES (digit runs collapsed to
    ``N``). A host whose URL space explodes while its template space stays
    tiny is the classic spider-trap signature — calendars, session ids,
    pagination counters (public basis: Heydon & Najork, "Mercator: a
    scalable, extensible web crawler", WWW 1999 §4.2 traps; the
    digit-collapse template is the standard URL-normalization heuristic).

    Shape: per-batch local distinct (host, url-hash, template-hash) — the
    template is a pure function of the url, so distinct urls carry their
    template along — then ONE shuffle keyed by hash-bucket(host) (hosts
    never span buckets ⇒ exact) and a per-bucket pandas nunique. The
    shuffle carries three int64s per distinct url, never url strings.
    Distinct counts use the 63-bit md5 prefix (``md5_hash64``), exactly
    the ``q_snapshot_delta`` precedent: equal to DuckDB's
    count(DISTINCT string) up to 2^-63 truncation collisions.

    Output: (host, n_urls, n_templates, urls_per_template, is_trap).

    Reference analog: none — the reference dispatches pre-sharded WAT
    chunks (models.py:20-24) and never sees a live URL frontier; this is
    the frontier-hygiene operator a real crawler runs continuously."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    from ..functions.canonicalize import md5_hash64

    def partial(b: pa.Table) -> pa.Table:
        urls = b.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        host = _raw_host(urls)
        tmpl = pc.replace_substring_regex(urls, pattern="[0-9]+",
                                          replacement="N")
        uh = (md5_hash64(urls) >> np.uint64(1)).astype(np.int64)
        th = (md5_hash64(tmpl) >> np.uint64(1)).astype(np.int64)
        t = (pa.table({"host": host,
                       "uh": pa.array(uh, pa.int64()),
                       "th": pa.array(th, pa.int64())})
             .group_by(["host", "uh", "th"]).aggregate([]))  # local distinct
        hosts = t.column("host").to_pandas().to_numpy(dtype=object)
        bucket = (pd.util.hash_array(hosts) % n_buckets).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("host", sort=False).agg(
            n_urls=("uh", "nunique"), n_templates=("th", "nunique"))
        nu = agg["n_urls"].to_numpy(np.int64)
        nt = agg["n_templates"].to_numpy(np.int64)
        upt = nu.astype(np.float64) / nt
        return pd.DataFrame({
            "host": agg.index.to_numpy(dtype=object),
            "n_urls": nu, "n_templates": nt, "urls_per_template": upt,
            "is_trap": (nu >= min_urls) & (upt >= ratio)})

    ds = ray.data.read_parquet(pages_path, columns=["url"]).map_batches(
        partial, batch_format="pyarrow", batch_size=cfg.batch_size)
    return (core.coalesce_slim(ds).groupby("bucket")
            .map_groups(fold, batch_format="pandas"))


def q_crawl_trap_score(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    import os

    from ..sources.synth import ensure_frontier, frontier_dir
    ensure_frontier(sf_dir)
    return trap_score_from_pages(os.path.join(frontier_dir(sf_dir), "pages"),
                                 cfg)


def sql_crawl_trap_score(pages_path: str, ratio: float = TRAP_RATIO,
                         min_urls: int = TRAP_MIN_URLS) -> str:
    """DuckDB oracle: the same host / digit-collapse template rules over
    the raw url, with count(DISTINCT …) on the strings themselves."""
    return f"""
WITH t AS (SELECT regexp_replace(
                    lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
                    ':[0-9]*$', '') AS host,
                  url,
                  regexp_replace(url, '[0-9]+', 'N', 'g') AS tmpl
           FROM read_parquet('{pages_path}/*.parquet')),
     g AS (SELECT host, count(DISTINCT url) AS n_urls,
                  count(DISTINCT tmpl) AS n_templates
           FROM t GROUP BY host)
SELECT host, CAST(n_urls AS BIGINT) AS n_urls,
       CAST(n_templates AS BIGINT) AS n_templates,
       CAST(n_urls AS DOUBLE) / n_templates AS urls_per_template,
       (n_urls >= {min_urls}
        AND CAST(n_urls AS DOUBLE) / n_templates >= {ratio}) AS is_trap
FROM g"""


# --- mirror-host detection (X45) ------------------------------------------

MIRROR_HOST_CAP = 16     # content shared by more hosts than this is
                         # boilerplate, not mirroring — skip it (both sides)
MIRROR_MIN_SHARED = 1    # pairs must share at least this many documents


def mirror_hosts_from_pages(pages_path: str,
                            cfg: PipelineConfig = DEFAULT_CONFIG,
                            cap: int = MIRROR_HOST_CAP,
                            min_shared: int = MIRROR_MIN_SHARED,
                            n_buckets: int = 64):
    """Mirror-host detection: pairs of hosts serving identical content,
    scored by the Jaccard resemblance of their distinct content-hash sets
    (public basis: Bharat & Broder, "Mirror, mirror on the web", WWW 1999
    — shared-fingerprint host pairing with a frequency cap on
    overly-common fingerprints).

    Shape: per-batch local distinct (host, 63-bit content hash) → ONE
    shuffle keyed by hash-bucket(CONTENT hash) (a hash never spans
    buckets ⇒ the per-hash host set is complete in its bucket). Each
    bucket group emits two kinds of slim partial rows in one schema:
    per-host distinct-hash counts (summable across buckets because
    (host, hash) is globally distinct and hashes don't span buckets) and
    per-pair shared counts for every hash held by 2..cap hosts. Pair
    emission iterates only the MIRRORED hashes — a vanishing fraction of
    the corpus by construction, each bounded by cap·(cap−1)/2 — the hot
    path (distinct + counts) stays vectorized. Partials then fold: host
    totals are bounded by #hosts (driver combine, the A4 leaderboard
    precedent), and pair totals take the counted threshold switch —
    driver fold below 10^6 distinct pairs, a second bucketed shuffle
    above (the X2/X27 discipline). Content identity is the 63-bit md5
    prefix, the ``q_snapshot_delta`` precedent (oracle compares full
    md5; verdicts agree up to 2^-63 truncation collisions).

    Output: (host_a, host_b, shared, n_a, n_b, resemblance) with
    host_a < host_b, resemblance = shared / (n_a + n_b − shared).

    Reference analog: none — the reference's frontier is pre-deduped WAT
    shard ids; this is the crawl-hygiene operator that collapses mirror
    farms before they eat fetch budget."""
    from itertools import combinations

    import numpy as np
    import ray.data

    from ..functions.canonicalize import md5_hash64

    def partial(b: pa.Table) -> pa.Table:
        urls = b.column("url")
        host = _raw_host(urls)
        h = (md5_hash64(b.column("text")) >> np.uint64(1)).astype(np.int64)
        t = (pa.table({"host": host, "h": pa.array(h, pa.int64())})
             .group_by(["host", "h"]).aggregate([]))       # local distinct
        bucket = (t.column("h").to_numpy() % n_buckets).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        gd = g.drop_duplicates(["host", "h"])               # global distinct
        hosts = gd.groupby("host", sort=False).size()
        out_a = [pd.DataFrame({"host_a": hosts.index.to_numpy(dtype=object),
                               "host_b": "",
                               "n": hosts.to_numpy(np.int64)})]
        sizes = gd.groupby("h", sort=False)["host"].transform("size")
        elig = gd[(sizes >= 2) & (sizes <= cap)]
        if len(elig):
            pairs: dict[tuple[str, str], int] = {}
            for _, grp in elig.groupby("h", sort=False):
                for a, b in combinations(sorted(grp["host"]), 2):
                    pairs[(a, b)] = pairs.get((a, b), 0) + 1
            if pairs:
                ka = np.array([p[0] for p in pairs], dtype=object)
                kb = np.array([p[1] for p in pairs], dtype=object)
                out_a.append(pd.DataFrame({
                    "host_a": ka, "host_b": kb,
                    "n": np.fromiter(pairs.values(), np.int64, len(pairs))}))
        return pd.concat(out_a, ignore_index=True)

    ds = ray.data.read_parquet(pages_path, columns=["url", "text"]) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=cfg.batch_size)
    folded = (core.coalesce_slim(ds).groupby("bucket")
              .map_groups(fold, batch_format="pandas")).materialize()

    totals = (folded.filter(expr="host_b == ''").select_columns(
        ["host_a", "n"]).to_pandas()
        .groupby("host_a", sort=True)["n"].sum())      # bounded by #hosts
    t_hosts = totals.index.to_numpy(dtype=object)
    t_counts = totals.to_numpy(np.int64)

    pair_ds = folded.filter(expr="host_b != ''")
    n_pairs = pair_ds.count()
    if n_pairs == 0:
        return pd.DataFrame({"host_a": pd.Series(dtype=object),
                             "host_b": pd.Series(dtype=object),
                             "shared": pd.Series(dtype="int64"),
                             "n_a": pd.Series(dtype="int64"),
                             "n_b": pd.Series(dtype="int64"),
                             "resemblance": pd.Series(dtype="float64")})

    def finish(p: pd.DataFrame) -> pd.DataFrame:
        shared = p["n"].to_numpy(np.int64)
        na = t_counts[np.searchsorted(t_hosts, p["host_a"].to_numpy(object))]
        nb = t_counts[np.searchsorted(t_hosts, p["host_b"].to_numpy(object))]
        res = shared.astype(np.float64) / (na + nb - shared)
        out = pd.DataFrame({"host_a": p["host_a"].to_numpy(object),
                            "host_b": p["host_b"].to_numpy(object),
                            "shared": shared, "n_a": na, "n_b": nb,
                            "resemblance": res})
        return out[out["shared"] >= min_shared].reset_index(drop=True)

    if n_pairs < 1 << 20:                       # counted threshold switch
        p = (pair_ds.to_pandas()
             .groupby(["host_a", "host_b"], sort=False, as_index=False)
             ["n"].sum())
        return finish(p)
    # distributed branch: second bucketed fold keyed by the pair
    def pair_bucket(b: pa.Table) -> pa.Table:
        k = (pd.util.hash_array(
            b.column("host_a").to_pandas().to_numpy(dtype=object)) * 31
            + pd.util.hash_array(
                b.column("host_b").to_pandas().to_numpy(dtype=object)))
        return b.set_column(b.schema.get_field_index("bucket"), "bucket",
                            pa.array((k % n_buckets).astype(np.int32)))

    def pair_fold(g: pd.DataFrame) -> pd.DataFrame:
        return finish(g.groupby(["host_a", "host_b"], sort=False,
                                as_index=False)["n"].sum())

    return (pair_ds.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(pair_fold, batch_format="pandas"))


def q_mirror_hosts(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    import os

    from ..sources.synth import ensure_frontier, frontier_dir
    ensure_frontier(sf_dir)
    return mirror_hosts_from_pages(
        os.path.join(frontier_dir(sf_dir), "pages"), cfg)


def sql_mirror_hosts(pages_path: str, cap: int = MIRROR_HOST_CAP,
                     min_shared: int = MIRROR_MIN_SHARED) -> str:
    """DuckDB oracle: distinct (host, md5) self-join on the hash with the
    same 2..cap host-frequency window, host pair ordered lexicographically,
    Jaccard resemblance over the per-host distinct counts."""
    return f"""
WITH d AS (SELECT DISTINCT regexp_replace(
                    lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
                    ':[0-9]*$', '') AS host,
                  md5(text) AS h
           FROM read_parquet('{pages_path}/*.parquet')),
     hc AS (SELECT host, count(*) AS n FROM d GROUP BY host),
     elig AS (SELECT h FROM d GROUP BY h
              HAVING count(*) BETWEEN 2 AND {cap}),
     p AS (SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
           FROM d a JOIN d b ON a.h = b.h AND a.host < b.host
           WHERE a.h IN (SELECT h FROM elig)
           GROUP BY 1, 2)
SELECT host_a, host_b, CAST(shared AS BIGINT) AS shared,
       CAST(ha.n AS BIGINT) AS n_a, CAST(hb.n AS BIGINT) AS n_b,
       CAST(shared AS DOUBLE) / (ha.n + hb.n - shared) AS resemblance
FROM p JOIN hc ha ON ha.host = p.host_a
       JOIN hc hb ON hb.host = p.host_b
WHERE shared >= {min_shared}"""


# --- incremental snapshot compaction (X48) ---------------------------------

def q_snapshot_compact(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                       n_buckets: int | None = None):
    import os

    from ..sources.synth import ensure_snapshot2, frontier_dir
    p2 = ensure_snapshot2(sf_dir)
    p1 = os.path.join(frontier_dir(sf_dir), "pages")
    return snapshot_compact_from(p1, p2, cfg, n_buckets)


def snapshot_compact_from(p1: str, p2: str,
                          cfg: PipelineConfig = DEFAULT_CONFIG,
                          n_buckets: int | None = None):
    """Incremental-crawl snapshot compaction (upsert): merge crawl
    snapshots A and B into one latest-version-per-url view — the
    compaction pass a continuous crawler runs so downstream consumers
    read ONE current corpus instead of every historical snapshot
    (public basis: the LSM-style merge of log-structured storage applied
    to crawl snapshots; the reference crawls each shard once,
    models.py:31-32, so it never needs this).

    Winner per url = newest ``warc_ts``; equal-timestamp versions break
    ties by content hash descending, then side 'b' over 'a' — fully
    deterministic. Same ONE-shuffle discipline as ``q_snapshot_delta``:
    each side slims per batch to (url, ts int64, 63-bit content hash,
    side) — never html/text — keyed by hash-bucket(url) (a url never
    spans buckets ⇒ exact), and the per-bucket fold is a vectorized
    lexicographic sort + first-row-per-url. The 63-bit hash tie-break
    matches the oracle's md5-hex-desc ordering (hex order ≡ big-endian
    digest order) up to top-63-bit ties, the established
    ``q_snapshot_delta`` truncation precedent.

    Output: (url, warc_ts, side). At production scale the same fold
    would also carry the winning row's source file+offset so the
    compacted corpus can be re-materialized by a pruned read."""
    import os

    import numpy as np
    import ray
    import ray.data

    from ..functions.canonicalize import md5_hash64

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    nb = n_buckets or max(64, cpus * 8)

    def slimmed(side: str):
        def fn(b: pa.Table) -> pa.Table:
            h = (md5_hash64(b.column("text")) >> np.uint64(1)) \
                .astype(np.int64)
            urls = b.column("url")
            if isinstance(urls, pa.ChunkedArray):
                urls = urls.combine_chunks()
            bucket = (pd.util.hash_array(
                urls.to_pandas().to_numpy(dtype=object)) % nb
            ).astype(np.int32)
            return pa.table({
                "url": urls,
                "ts": b.column("warc_ts").cast(pa.int64()),
                "h": pa.array(h, pa.int64()),
                "side": pa.array(np.full(b.num_rows, side), pa.string()),
                "bucket": pa.array(bucket, pa.int32())})
        return fn

    a = ray.data.read_parquet(p1, columns=["url", "warc_ts", "text"]) \
        .map_batches(slimmed("a"), batch_format="pyarrow",
                     batch_size=cfg.batch_size)
    b = ray.data.read_parquet(p2, columns=["url", "warc_ts", "text"]) \
        .map_batches(slimmed("b"), batch_format="pyarrow",
                     batch_size=cfg.batch_size)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        w = (g.sort_values(["url", "ts", "h", "side"],
                           ascending=[True, False, False, False],
                           kind="mergesort")
             .drop_duplicates("url", keep="first"))
        return pd.DataFrame({
            "url": w["url"].to_numpy(dtype=object),
            "warc_ts": pd.to_datetime(w["ts"].to_numpy(np.int64),
                                      unit="us"),
            "side": w["side"].to_numpy(dtype=object)})

    return (core.coalesce_slim(a.union(b)).groupby("bucket")
            .map_groups(fold, batch_format="pandas"))


def sql_snapshot_compact(pages_path: str, pages2_path: str) -> str:
    """DuckDB oracle: window rank per url over (warc_ts DESC, md5 DESC,
    side DESC) across the union of both snapshots."""
    return f"""
WITH u AS (
  SELECT url, warc_ts, md5(text) AS h, 'a' AS side
  FROM read_parquet('{pages_path}/*.parquet')
  UNION ALL
  SELECT url, warc_ts, md5(text) AS h, 'b' AS side
  FROM read_parquet('{pages2_path}/*.parquet')),
r AS (SELECT url, warc_ts, side,
             row_number() OVER (PARTITION BY url
                                ORDER BY warc_ts DESC, h DESC, side DESC)
               AS rn
      FROM u)
SELECT url, warc_ts, side FROM r WHERE rn = 1"""


# --------------------------------------------------- SURT / CDX (X66-X68)
CDX_BUCKETS = 64
CDX_PROBE_K = 3


def _with_surt(b: pa.Table) -> pa.Table:
    from ..functions.surt import surt_array
    return b.append_column("surt",
                           surt_array(b.column("url_canon"), b.column("host")))


def q_url_surt_key(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """SURT key + per-host CDX ordinal over the deduped frontier (X66).

    surt = reversed comma-joined host labels + ')' + lowercased
    path+query (the public CommonCrawl/pywb CDXJ sort key); cdx_pos =
    1-based position within the host's captures ordered by (surt,
    url_canon) — the index order a CDX shard stores. The ranking reuses
    the politeness machinery: ONE bucketed groupby (hash(host) % 256,
    whole hosts per bucket) with an Arrow-native sort + boundary-diff
    rank inside each bucket — no per-host dispatch, no pandas object
    round-trip, same skew story as O5 (stages/politeness.py).
    Reference analog: none (the reference serves shard numbers, not a
    URL index); SQL-oracled."""
    import pyarrow.compute as pc

    slim = core.dedup_survivors(_slim(sf_dir, cfg)) \
        .select_columns(["url_canon", "host"]) \
        .map_batches(_with_surt, batch_format="pyarrow")
    ranked = politeness_ranked(slim, budget=1, order=("surt", "url_canon"))

    def finish(b: pa.Table) -> pa.Table:
        pos = b.column("politeness_rank").cast(pa.int64())
        return (b.drop_columns(["politeness_rank", "fetch_round"])
                .append_column("cdx_pos", pos)
                .select(["host", "url_canon", "surt", "cdx_pos"]))

    return ranked.map_batches(finish, batch_format="pyarrow")


def cdx_index_build(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                    n_buckets: int = CDX_BUCKETS) -> str:
    """Build (idempotently) a CDX-style capture index over the deduped
    frontier: rows (host, surt, url_canon, ts_us) hive-partitioned by
    ``bucket = hash(host) % n_buckets`` with every fragment sorted by
    surt — the partition-pruned lookup layout of the inverted index
    (curation_queries.inverted_index_build) applied to the crawl's URL
    index. A domain/prefix query reads ONLY its hosts' buckets. Build is
    one streaming pass (the hive write IS the partitioning, no shuffle);
    crash-safe .tmp → atomic rename, fingerprint-keyed cache
    (functions/ann.ivf_build precedent).

    At 10^10 URLs the real layout would range-partition on surt itself
    (CommonCrawl's cdx-*.gz shards are surt-sorted ranges); the hash
    layout keeps the fixture's 549-host universe balanced while
    exercising the same pruned-read path."""
    import os
    import shutil

    import numpy as np

    root = (f"/tmp/graft_cdx/{os.path.basename(os.path.normpath(sf_dir))}"
            f"_b{n_buckets}_{core.tree_fingerprint(core.pages_path(sf_dir))}")
    marker = os.path.join(root, "_BUILT")
    if os.path.exists(marker):
        return root
    shutil.rmtree(root, ignore_errors=True)
    tmp_root = root + ".tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = _with_surt(b)
        hosts = b.column("host")
        if isinstance(hosts, pa.ChunkedArray):
            hosts = hosts.combine_chunks()
        bucket = (pd.util.hash_array(hosts.to_pandas().to_numpy(dtype=object))
                  % n_buckets).astype(np.int32)
        t = pa.table({"host": hosts, "surt": b.column("surt"),
                      "url_canon": b.column("url_canon"),
                      "ts_us": b.column("warc_ts").cast(pa.int64()),
                      "bucket": pa.array(bucket, pa.int32())})
        return t.take(pc.sort_indices(t, sort_keys=[("surt", "ascending")]))

    (core.dedup_survivors(_slim(sf_dir, cfg))
     .map_batches(prep, batch_format="pyarrow", batch_size=cfg.batch_size)
     .write_parquet(tmp_root, partition_cols=["bucket"]))
    with open(os.path.join(tmp_root, "_BUILT"), "w") as f:
        f.write("ok")
    os.rename(tmp_root, root)  # atomic publish
    return root


def _probe_hosts(sf_dir: str, cfg: PipelineConfig, k: int) -> list[str]:
    """The k lexicographically-smallest hosts — the deterministic CDX
    domain probes. Driver state is one string per distinct host
    (bounded by #hosts, the recrawl_priority precedent), shrunk to the
    running min-k as batches stream."""
    import heapq

    import pyarrow.compute as pc

    parts = _slim(sf_dir, cfg).select_columns(["host"]).map_batches(
        lambda t: pa.table({"host": pc.unique(t.column("host").combine_chunks()
                                              if isinstance(t.column("host"),
                                                            pa.ChunkedArray)
                                              else t.column("host"))}),
        batch_format="pyarrow")
    top: list[str] = []   # max-heap of negated? strings — use nlargest trick
    seen: set[str] = set()
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=65536):
        seen.update(b.column("host").to_pylist())
        if len(seen) > 16 * k:
            seen = set(heapq.nsmallest(k, seen))
    return sorted(heapq.nsmallest(k, seen))


def q_cdx_prefix_lookup(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                        k: int = CDX_PROBE_K,
                        n_buckets: int = CDX_BUCKETS,
                        stats: dict | None = None):
    """CDX domain lookup (X67): all captures of the k smallest hosts,
    served from the bucketed CDX index with a PRUNED read — only the
    probe hosts' ``bucket=`` directories are opened (≤ k of n_buckets;
    ``stats`` records how many, tested). Output (host, surt, url_canon,
    ts_us) — the CDXJ line fields. SQL-oracled via a semi-join on the
    same probe rule."""
    import os

    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    root = cdx_index_build(sf_dir, cfg, n_buckets)
    probes = _probe_hosts(sf_dir, cfg, k)
    buckets = sorted(set(
        (pd.util.hash_array(np.asarray(probes, dtype=object))
         % np.uint64(n_buckets)).astype(np.int64).tolist()))
    if stats is not None:
        stats["buckets_read"] = len(buckets)
        stats["buckets_total"] = len(
            [d for d in os.listdir(root) if d.startswith("bucket=")])
    import glob as _glob
    paths = [f for b in buckets
             for f in sorted(_glob.glob(
                 os.path.join(root, f"bucket={b}", "*.parquet")))]
    probe_arr = pa.array(probes, pa.string())

    def only_probes(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("host"), value_set=probe_arr)) \
            .select(["host", "surt", "url_canon", "ts_us"])

    return ray.data.read_parquet(paths).map_batches(
        only_probes, batch_format="pyarrow")


def q_url_features(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Frontier URL feature extraction (X68): path depth, query-param
    count, extension token per deduped canonical URL — the cheap
    vectorized features a frontier prioritizer feeds on (crawl-depth
    caps, asset filtering, param-explosion traps). One Arrow pass
    (functions/surt.url_features_table); SQL-oracled."""
    from ..functions.surt import url_features_table

    return core.dedup_survivors(_slim(sf_dir, cfg)) \
        .select_columns(["url_canon"]) \
        .map_batches(lambda b: url_features_table(b.column("url_canon")),
                     batch_format="pyarrow")


# -------------------------------------------- host look-alikes (X71)
def q_host_lookalikes(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                      n_buckets: int = 64):
    """Look-alike / typosquat host detection (SURVEY X71): every host
    pair at edit distance exactly 1, via the public FastSS/SymSpell
    deletion-neighborhood scheme — two hosts are distance-1 iff they
    share a deletion variant at the SAME position (substitution) or one
    IS a deletion variant of the other (insertion/deletion). No pairwise
    edit-distance matrix: each host emits len(host) variant rows plus
    one identity row, ONE variant-hash-bucketed shuffle co-locates every
    witness string (a pair's witness is a single string ⇒ never spans
    buckets), and the per-bucket fold is two int-indexed pandas merges.
    Variant generation is vectorized Arrow slicing per position (~25
    kernel calls, no per-host loop). Distinct-host dedup needs no
    separate pass: duplicate hosts across batches emit identical variant
    rows, collapsed by the fold's drop_duplicates.

    Crawl hygiene analog of X45's content-based mirror_hosts: catches
    look-alike DOMAINS (typosquats, spam host farms) before any content
    is fetched. SQL-oracled via LATERAL deletion variants."""
    import numpy as np
    import pyarrow.compute as pc

    def variants(b: pa.Table) -> pa.Table:
        hosts = b.column("host")
        if isinstance(hosts, pa.ChunkedArray):
            hosts = hosts.combine_chunks()
        hosts = pc.unique(hosts)
        lens = pc.utf8_length(hosts)
        max_len = int(pc.max(lens).as_py() or 0)
        out_h, out_i, out_v = [hosts], [np.zeros(len(hosts), np.int32)], \
            [hosts]                                   # identity rows (i=0)
        for i in range(1, max_len + 1):
            keep = pc.greater_equal(lens, i)
            h = hosts.filter(keep)
            v = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(h, 0, i - 1),
                pc.utf8_slice_codeunits(h, i, 1 << 30), "")
            out_h.append(h)
            out_i.append(np.full(len(h), i, np.int32))
            out_v.append(v)
        h = pa.concat_arrays([a.combine_chunks() if isinstance(
            a, pa.ChunkedArray) else a for a in out_h])
        v = pa.concat_arrays([a.combine_chunks() if isinstance(
            a, pa.ChunkedArray) else a for a in out_v])
        i = pa.array(np.concatenate(out_i), pa.int32())
        bucket = (pd.util.hash_array(v.to_pandas().to_numpy(dtype=object))
                  % n_buckets).astype(np.int32)
        return pa.table({"host": h, "i": i, "v": v,
                         "bucket": pa.array(bucket, pa.int32())})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["host", "i", "v"])
        vars_ = g[g["i"] > 0]
        ident = g[g["i"] == 0][["host", "v"]]
        # substitution: same deletion variant at the same position
        m = vars_.merge(vars_, on=["v", "i"])
        m = m[m["host_x"] < m["host_y"]]
        sub = (m[["host_x", "host_y"]].drop_duplicates()
               .rename(columns={"host_x": "host_a", "host_y": "host_b"}))
        sub["kind"] = "substitution"
        # insertion/deletion: a variant equals another host verbatim
        d = vars_.merge(ident, left_on="v", right_on="v",
                        suffixes=("", "_short"))
        d = d[d["host"] != d["host_short"]]
        if len(d):
            lo = np.minimum(d["host"].to_numpy(dtype=object),
                            d["host_short"].to_numpy(dtype=object))
            hi = np.maximum(d["host"].to_numpy(dtype=object),
                            d["host_short"].to_numpy(dtype=object))
            indel = pd.DataFrame({"host_a": lo, "host_b": hi}) \
                .drop_duplicates()
            indel["kind"] = "indel"
        else:
            indel = pd.DataFrame({"host_a": pd.Series(dtype=object),
                                  "host_b": pd.Series(dtype=object),
                                  "kind": pd.Series(dtype=object)})
        return pd.concat([sub, indel], ignore_index=True)

    return (core.coalesce_slim(
                _slim(sf_dir, cfg).select_columns(["host"])
                .map_batches(variants, batch_format="pyarrow",
                             batch_size=65536))
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas"))
