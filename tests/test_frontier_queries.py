"""Frontier operators vs the DuckDB oracle at sf0.001 (fast) — the same
comparison the driver runs at sf0.01 via __ray_entry__."""

import duckdb
import pytest

from conftest import SF, assert_frames_match
from crawlingathome_server_ray.pipelines import frontier_queries as fq
from crawlingathome_server_ray.pipelines.frontier_core import pages_path
from crawlingathome_server_ray.pipelines.oracle import frontier_oracle_sql

QUERIES = {
    "url_canonicalize": fq.q_url_canonicalize,
    "url_dedup_exact": fq.q_url_dedup_exact,
    "robots_gate": fq.q_robots_gate,
    "politeness_rank": fq.q_politeness_rank,
    "dispatch_order": fq.q_dispatch_order,
    "extract_text": fq.q_extract_text,
    "frontier_counters": fq.q_frontier_counters,
    "host_heavy_hitters": fq.q_host_heavy_hitters,
    "recrawl_priority": fq.q_recrawl_priority,
    "url_pattern_mine": fq.q_url_pattern_mine,
    "url_surt_key": fq.q_url_surt_key,
    "cdx_prefix_lookup": fq.q_cdx_prefix_lookup,
    "url_features": fq.q_url_features,
    "crawl_schedule_occupancy": fq.q_crawl_schedule_occupancy,
    "host_lookalikes": fq.q_host_lookalikes,
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_frontier_query_matches_oracle(ray_session, name):
    sql = frontier_oracle_sql(pages_path=pages_path(SF))[name]
    oracle = duckdb.sql(sql).df()
    result = QUERIES[name](SF)
    assert_frames_match(result, oracle, name)


def test_dedup_bucketed_equals_broadcast(ray_session):
    """The distributed bucketed first-wins dedup must produce exactly the
    rows of the broadcast survivor-set twin."""
    from crawlingathome_server_ray.pipelines import frontier_core as core
    from crawlingathome_server_ray.config import DEFAULT_CONFIG
    ds = core.with_canon(core.pages_ds(SF, ["url", "warc_ts"]),
                         DEFAULT_CONFIG, light=True).materialize()
    a = (core.dedup_survivors_bucketed(ds).to_pandas()
         .sort_values("url_canon").reset_index(drop=True))
    b = (core.filter_survivors(ds, core.survivor_ts_set(ds)).to_pandas()
         .sort_values("url_canon").reset_index(drop=True))
    import pandas as pd
    cols = ["url", "warc_ts", "url_canon", "host"]
    pd.testing.assert_frame_equal(a[cols], b[cols])


def test_snapshot_delta_matches_oracle(ray_session):
    from crawlingathome_server_ray.sources.synth import ensure_snapshot2
    p2 = ensure_snapshot2(SF)
    sql = fq.sql_snapshot_delta(pages_path(SF), p2)
    assert_frames_match(fq.q_snapshot_delta(SF), duckdb.sql(sql).df(),
                        "snapshot_delta")


def test_host_change_rate_matches_oracle(ray_session):
    from crawlingathome_server_ray.sources.synth import ensure_snapshot2
    p2 = ensure_snapshot2(SF)
    sql = fq.sql_host_change_rate(pages_path(SF), p2)
    assert_frames_match(fq.q_host_change_rate(SF), duckdb.sql(sql).df(),
                        "host_change_rate")


def test_host_change_rate_consistent_with_delta(ray_session):
    """Semantic twin: per-host added/removed/changed counts must equal the
    url-level snapshot_delta grouped by host, and every host's persisting
    rate must live in [0, 1]."""
    import numpy as np
    import pandas as pd

    rates = fq.q_host_change_rate(SF).to_pandas()
    delta = fq.q_snapshot_delta(SF).to_pandas()
    delta["host"] = (delta["url"].str.extract(r"^[^:/?#]+://([^/?#]*)")[0]
                     .str.lower().str.replace(r":[0-9]*$", "", regex=True))
    per = (delta.pivot_table(index="host", columns="status", values="url",
                             aggfunc="count", fill_value=0)
           .reindex(columns=["added", "removed", "changed"], fill_value=0))
    merged = rates.set_index("host").join(per, how="left").fillna(0)
    assert (merged["n_added"].to_numpy(np.int64)
            == merged["added"].to_numpy(np.int64)).all()
    assert (merged["n_removed"].to_numpy(np.int64)
            == merged["removed"].to_numpy(np.int64)).all()
    assert (merged["n_changed"].to_numpy(np.int64)
            == merged["changed"].to_numpy(np.int64)).all()
    r = rates["change_rate"].to_numpy(np.float64)
    assert ((r >= 0.0) & (r <= 1.0)).all()
    # the synthetic snapshot changes ~1/16 of urls: some host must change
    assert rates["n_changed"].sum() > 0


def test_crawl_budget_alloc_matches_oracle(ray_session):
    from crawlingathome_server_ray.sources.synth import ensure_snapshot2
    p2 = ensure_snapshot2(SF)
    sql = fq.sql_crawl_budget_alloc(pages_path(SF), p2)
    assert_frames_match(fq.q_crawl_budget_alloc(SF), duckdb.sql(sql).df(),
                        "crawl_budget_alloc")


def test_crawl_budget_alloc_invariants(ray_session):
    """Hamilton apportionment: budgets sum exactly to B, and every host
    gets its floor share or floor+1 (the quota property)."""
    import numpy as np
    out = fq.q_crawl_budget_alloc(SF)
    B = fq.BUDGET_TOTAL
    assert int(out["fetch_budget"].sum()) == B
    w = out["w"].to_numpy(np.int64)
    W = int(w.sum())
    base = (np.int64(B) * w) // W
    got = out["fetch_budget"].to_numpy(np.int64)
    assert ((got == base) | (got == base + 1)).all()


def test_snapshot_delta_text_equality_twin(ray_session):
    """Independent pandas twin comparing the TEXTS directly (no md5):
    validates that the hash-compare delta equals the text-compare delta
    — i.e. the 64-bit content hash introduces no verdict error."""
    import pandas as pd
    import pyarrow.dataset as pads
    from crawlingathome_server_ray.sources.synth import (ensure_snapshot2,
                                                         frontier_dir)
    import os
    p2 = ensure_snapshot2(SF)
    p1 = os.path.join(frontier_dir(SF), "pages")
    a = pads.dataset(p1).to_table(columns=["url", "text"]).to_pandas() \
        .drop_duplicates("url").set_index("url")["text"]
    b = pads.dataset(p2).to_table(columns=["url", "text"]).to_pandas() \
        .drop_duplicates("url").set_index("url")["text"]
    removed = set(a.index) - set(b.index)
    added = set(b.index) - set(a.index)
    both = a.index.intersection(b.index)
    changed = set(both[(a.loc[both] != b.loc[both]).to_numpy()])
    assert removed and added and changed          # every leg is exercised
    out = fq.q_snapshot_delta(SF).to_pandas()
    got = {s: set(g["url"]) for s, g in out.groupby("status")}
    assert got.get("removed", set()) == removed
    assert got.get("added", set()) == added
    assert got.get("changed", set()) == changed
    # unchanged urls never appear
    assert len(out) == len(removed) + len(added) + len(changed)


def test_dataset_caches_invalidate_on_fixture_change(ray_session):
    """Regenerating a fixture in place (here: touching a source file so
    its mtime moves) must invalidate the per-process Dataset caches —
    both the slim frontier and the host-graph cache key on a mtime+size
    tree fingerprint (the ann.ivf_build precedent)."""
    import os
    import time
    from pathlib import Path

    from crawlingathome_server_ray.config import DEFAULT_CONFIG
    from crawlingathome_server_ray.pipelines import link_queries as lq
    from crawlingathome_server_ray.sources.link_synth import ensure_links

    a = fq._slim(SF, DEFAULT_CONFIG)
    assert fq._slim(SF, DEFAULT_CONFIG) is a          # warm hit
    f = next(Path(pages_path(SF)).glob("*.parquet"))
    os.utime(f, ns=(time.time_ns(), time.time_ns()))
    b = fq._slim(SF, DEFAULT_CONFIG)
    assert b is not a                                 # stale entry evicted
    assert b.count() == a.count()

    g1 = lq.q_host_link_graph(SF)
    assert lq.q_host_link_graph(SF) is g1
    lf = next(Path(ensure_links(SF), "linkpages").glob("*.parquet"))
    os.utime(lf, ns=(time.time_ns(), time.time_ns()))
    g2 = lq.q_host_link_graph(SF)
    assert g2 is not g1
    assert g2.count() == g1.count()

    r1 = fq.q_host_change_rate(SF)
    assert fq.q_host_change_rate(SF) is r1            # warm hit
    os.utime(f, ns=(time.time_ns(), time.time_ns()))  # touch snapshot A
    r2 = fq.q_host_change_rate(SF)
    assert r2 is not r1
    assert r2.count() == r1.count()


def test_crawl_trap_score_matches_oracle(ray_session):
    sql = fq.sql_crawl_trap_score(pages_path(SF))
    assert_frames_match(fq.q_crawl_trap_score(SF), duckdb.sql(sql).df(),
                        "crawl_trap_score")


def test_mirror_hosts_matches_oracle(ray_session):
    # sf0.001 has zero cross-host duplicate content — the planted test
    # below covers the non-empty path; sf0.01 (2 pairs) runs in driver_sim
    sql = fq.sql_mirror_hosts(pages_path(SF))
    assert_frames_match(fq.q_mirror_hosts(SF), duckdb.sql(sql).df(),
                        "mirror_hosts")


def _write_pages(tmpdir, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({"url": [r[0] for r in rows],
                  "text": [r[1] for r in rows]})
    pq.write_table(t, f"{tmpdir}/part-0.parquet")
    return str(tmpdir)


def test_mirror_hosts_planted(ray_session, tmp_path):
    """Engineered mirror: m1/m2 share 5 of 8 docs; boilerplate text on 20
    hosts is excluded by the frequency cap; a singleton pair shares 1."""
    rows = []
    for i in range(8):
        rows.append((f"https://m1.example.org/p{i}", f"mirrored doc {i}"
                     if i < 5 else f"m1 only {i}"))
        rows.append((f"https://m2.example.org/p{i}", f"mirrored doc {i}"
                     if i < 5 else f"m2 only {i}"))
    for j in range(20):                      # boilerplate above the cap
        rows.append((f"https://b{j:02d}.example.org/tos", "terms of service"))
    rows.append(("https://s1.example.org/x", "single shared"))
    rows.append(("https://s2.example.org/x", "single shared"))
    p = _write_pages(tmp_path, rows)

    out = fq.mirror_hosts_from_pages(p)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    df = df.sort_values(["host_a", "host_b"]).reset_index(drop=True)
    got = {(r.host_a, r.host_b): (r.shared, r.n_a, r.n_b)
           for r in df.itertuples()}
    assert got[("m1.example.org", "m2.example.org")] == (5, 8, 8)
    assert got[("s1.example.org", "s2.example.org")] == (1, 1, 1)
    assert not any("b0" in a or "b1" in a for a, _ in got)   # cap applied
    # resemblance = 5 / (8 + 8 - 5)
    m = df[(df.host_a == "m1.example.org")]["resemblance"].iloc[0]
    assert abs(m - 5 / 11) < 1e-12
    # and the DuckDB oracle agrees on the planted tree
    sql = fq.sql_mirror_hosts(p)
    assert_frames_match(df, duckdb.sql(sql).df(), "mirror_hosts_planted")


def test_crawl_trap_planted(ray_session, tmp_path):
    """A calendar-style trap host (200 urls, 1 template) is flagged; a
    diverse host of the same size is not."""
    rows = [(f"https://trap.example.org/cal?y=2026&m={i%12}&d={i}", f"t{i}")
            for i in range(200)]
    rows += [(f"https://ok.example.org/{chr(97 + i % 26)}{chr(97 + (i // 26) % 26)}/page{i}",
              f"o{i}") for i in range(200)]
    p = _write_pages(tmp_path, rows)
    out = fq.trap_score_from_pages(p)
    df = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
        .set_index("host")
    assert bool(df.loc["trap.example.org", "is_trap"])
    assert df.loc["trap.example.org", "n_templates"] == 1
    assert not bool(df.loc["ok.example.org", "is_trap"])
    sql = fq.sql_crawl_trap_score(p)
    assert_frames_match(df.reset_index(), duckdb.sql(sql).df(),
                        "crawl_trap_planted")


def test_snapshot_compact_matches_oracle(ray_session):
    from crawlingathome_server_ray.sources.synth import ensure_snapshot2
    p2 = ensure_snapshot2(SF)
    sql = fq.sql_snapshot_compact(pages_path(SF), p2)
    assert_frames_match(fq.q_snapshot_compact(SF), duckdb.sql(sql).df(),
                        "snapshot_compact")


def test_snapshot_compact_planted_tiebreaks(ray_session, tmp_path):
    """Newest warc_ts wins; equal timestamps fall back to content-hash
    desc then side 'b' — both checked against the DuckDB oracle on an
    engineered pair of snapshots."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(dirname, rows):
        d = tmp_path / dirname
        d.mkdir()
        t = pa.table({
            "url": [r[0] for r in rows],
            "warc_ts": pa.array([r[1] for r in rows],
                                pa.timestamp("us")),
            "text": [r[2] for r in rows]})
        pq.write_table(t, d / "part-0.parquet")
        return str(d)

    t0, t1 = 1_000_000, 2_000_000
    a = write("snapA", [
        ("https://x.org/newer-in-a", t1, "a wins by time"),
        ("https://x.org/tie-hash", t0, "candidate one"),
        ("https://x.org/tie-side", t0, "same text"),
        ("https://x.org/a-only", t0, "only in a"),
    ])
    b = write("snapB", [
        ("https://x.org/newer-in-a", t0, "older b version"),
        ("https://x.org/tie-hash", t0, "candidate two"),
        ("https://x.org/tie-side", t0, "same text"),
        ("https://x.org/b-only", t0, "only in b"),
    ])
    out = fq.snapshot_compact_from(a, b)
    df = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
        .set_index("url")
    assert df.loc["https://x.org/newer-in-a", "side"] == "a"
    assert df.loc["https://x.org/a-only", "side"] == "a"
    assert df.loc["https://x.org/b-only", "side"] == "b"
    assert df.loc["https://x.org/tie-side", "side"] == "b"   # side tiebreak
    import hashlib
    h1 = hashlib.md5(b"candidate one").hexdigest()
    h2 = hashlib.md5(b"candidate two").hexdigest()
    want = "a" if h1 > h2 else "b"
    assert df.loc["https://x.org/tie-hash", "side"] == want
    sql = fq.sql_snapshot_compact(a, b)
    assert_frames_match(df.reset_index(), duckdb.sql(sql).df(),
                        "snapshot_compact_planted")


def test_surt_kernel_matches_scalar_twin():
    """surt_array ≡ the per-row python twin on edge shapes: multi-label
    hosts, single label, uppercase path, query strings, root path."""
    import pyarrow as pa

    from crawlingathome_server_ray.functions.surt import surt_array, surt_str

    cases = [
        ("http://h1.crawl-test.org/docs/0/Doc1.HTML?id=1&z=2",
         "h1.crawl-test.org"),
        ("https://localhost/", "localhost"),
        ("http://a.b.c.d.example.com/P/Q.jpg", "a.b.c.d.example.com"),
        ("https://x.y/private/%41bc", "x.y"),
    ]
    urls = pa.array([u for u, _ in cases])
    hosts = pa.array([h for _, h in cases])
    got = surt_array(urls, hosts).to_pylist()
    want = [surt_str(u, h) for u, h in cases]
    assert got == want
    assert got[0] == "org,crawl-test,h1)/docs/0/doc1.html?id=1&z=2"


def test_cdx_lookup_reads_only_probe_buckets(ray_session):
    """The CDX domain lookup must open only the probe hosts' bucket
    directories (partition pruning), and the pruned result must equal a
    full-index scan filtered to the same hosts."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from crawlingathome_server_ray.pipelines.frontier_queries import (
        cdx_index_build, CDX_BUCKETS)

    stats = {}
    pruned = (fq.q_cdx_prefix_lookup(SF, stats=stats).to_pandas()
              .sort_values(["surt", "url_canon"]).reset_index(drop=True))
    assert 0 < stats["buckets_read"] <= 3
    assert stats["buckets_read"] < stats["buckets_total"] <= CDX_BUCKETS

    import glob
    root = cdx_index_build(SF)
    all_paths = sorted(glob.glob(f"{root}/bucket=*/*.parquet"))
    probes = sorted(pruned["host"].unique())
    full = ray.data.read_parquet(all_paths).map_batches(
        lambda t: t.filter(pc.is_in(t.column("host"),
                                    value_set=pa.array(probes)))
        .select(["host", "surt", "url_canon", "ts_us"]),
        batch_format="pyarrow").to_pandas() \
        .sort_values(["surt", "url_canon"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pruned, full[pruned.columns.tolist()])


def test_lookalikes_indel_leg_and_twin(ray_session):
    """The synth hosts are fixed-width (substitution pairs only), so the
    insertion/deletion leg needs a crafted host list; verify both legs
    of the variant+fold machinery against a brute-force Levenshtein-1
    twin (same code path as the query, driven via a stub source)."""
    import itertools

    hosts = ["ab.com", "abc.com", "abd.com", "xabc.com", "ab.org",
             "zzz.net", "ab.comm", "b.com"]

    def dist1(a, b):
        if a == b:
            return False
        la, lb = len(a), len(b)
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if abs(la - lb) != 1:
            return False
        s, l = (a, b) if la < lb else (b, a)
        return any(l[:i] + l[i + 1:] == s for i in range(len(l)))

    want = sorted((min(a, b), max(a, b))
                  for a, b in itertools.combinations(hosts, 2)
                  if dist1(a, b))
    assert want, "fixture must contain distance-1 pairs"

    out = _run_lookalike_fold(hosts)
    got = set()
    for r in out.itertuples():
        assert dist1(r.host_a, r.host_b), (r.host_a, r.host_b)
        expected_kind = ("substitution"
                         if len(r.host_a) == len(r.host_b) else "indel")
        assert r.kind == expected_kind
        got.add((r.host_a, r.host_b))
    assert sorted(got) == want
    assert ("ab.com", "ab.comm") in got               # indel leg exercised


def _run_lookalike_fold(hosts):
    """Drive q_host_lookalikes' real variant+fold stages over an explicit
    host list by stubbing the source Dataset (single-bucket fold — the
    bucketing only partitions work, a witness never spans buckets)."""
    import types

    import pandas as pd
    import pyarrow as pa

    from crawlingathome_server_ray.pipelines import frontier_queries as fqm

    class _FakeDs:
        def __init__(self, t):
            self.t = t

        def select_columns(self, cols):
            return self

        def map_batches(self, fn, **kw):
            return _FakeDs(fn(self.t))

    orig_slim = fqm._slim
    orig_coalesce = fqm.core.coalesce_slim
    try:
        fqm._slim = lambda sf, cfg: _FakeDs(
            pa.table({"host": pa.array(hosts)}))
        fqm.core.coalesce_slim = lambda ds: types.SimpleNamespace(
            groupby=lambda col: types.SimpleNamespace(
                map_groups=lambda fn, **kw: fn(ds.t.to_pandas())))
        out = fqm.q_host_lookalikes("/nonexistent")
    finally:
        fqm._slim = orig_slim
        fqm.core.coalesce_slim = orig_coalesce
    assert isinstance(out, pd.DataFrame)
    return out
