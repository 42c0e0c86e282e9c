"""Analytics operators — the reference's counting / leaderboard / join /
window endpoints re-expressed as Ray Data pipelines over the driver's
relational test tables, each with an exactly-matching DuckDB oracle.

Mapping (SURVEY.md §2):
- A1 completion counts (reference main.py:96-97, 153-154)  → ``completion_counts``
- A2 per-type client counts (main.py:110-112)              → ``clients_per_type``
- A4+O2 leaderboard grouped sums + top-k desc
  (main.py:428-435, 196-197)                               → ``leaderboard_topk``
- O1 worker listing sort+limit (main.py:102-108)           → ``worker_listing``
- J3 isCompleted semi+anti join (main.py:467-478)          → ``is_completed``
- J2 lookup-wat count gate (main.py:382-401)               → ``lookup_chunks``
- D2 union of partitions (update_db.py:44-96)              → ``union_partitions``
- A5/W2 sliding-window ETA rate (main.py:762-808)          → ``eta_window``
- plus ``lineitem_agg`` — the wide-groupby workhorse used for bench.

Float determinism: every aggregate that feeds the driver's value-hash is
either an integer sum (money in cents via ``floor(x*100+0.5)``) or a
single well-defined double division, so Ray's parallel combine and
DuckDB's sequential scan produce bit-identical results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .frontier_core import coalesce_slim

BATCH = 65536


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------- A1
def q_completion_counts(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderstatus"])

    def partial(b: pa.Table) -> pa.Table:
        st = b.column("o_orderstatus")
        return pa.table({
            "n_total": pa.array([b.num_rows], pa.int64()),
            "n_closed": pa.array([pc.sum(pc.equal(st, "F")).as_py() or 0], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=BATCH)
    tot = parts.sum(["n_total", "n_closed"])
    n_total, n_closed = int(tot["sum(n_total)"]), int(tot["sum(n_closed)"])
    return pd.DataFrame({"n_total": pd.array([n_total], "int64"),
                         "n_closed": pd.array([n_closed], "int64"),
                         "pct_complete": [n_closed * 100.0 / n_total]})


SQL_COMPLETION = """
SELECT count(*) AS n_total,
       count(*) FILTER (o_orderstatus = 'F') AS n_closed,
       (count(*) FILTER (o_orderstatus = 'F') * 100.0) / count(*) AS pct_complete
FROM orders"""


# ---------------------------------------------------------------- A2
def q_clients_per_type(sf_dir: str):
    """Bounded-domain count (5 market segments ≙ 3 worker types): per-batch
    partial counts + a ≤5-rows-per-block driver combine — no Aggregate
    operator, no shuffle."""
    ds = _read(sf_dir, "customer", ["c_mktsegment"])

    def partial(b: pa.Table) -> pd.DataFrame:
        vc = pd.Series(np.asarray(b.column("c_mktsegment"))).value_counts()
        return pd.DataFrame({"c_mktsegment": vc.index.to_numpy(object),
                             "n_clients": vc.to_numpy(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=BATCH).to_pandas()
    out = (parts.groupby("c_mktsegment", sort=True)["n_clients"].sum()
           .reset_index())
    return out.astype({"n_clients": "int64"})


SQL_CLIENTS = """
SELECT c_mktsegment, count(*) AS n_clients FROM customer GROUP BY c_mktsegment"""


# ---------------------------------------------------------------- A4 + O2
def q_leaderboard_topk(sf_dir: str, k: int = 20, n_buckets: int = 64):
    """Grouped sums + top-k desc, two-phase: per-batch partial aggregation
    (the shuffle carries ≤ |distinct custkeys| rows per block, pre-summed)
    → bucketed exact final combine + per-bucket top-k → driver merge of
    ≤ n_buckets·k rows. Replaces Ray's hash-Aggregate operator (measured
    ~1.9 s fixed cost at any size) with one bucketed map_groups; same
    asymptotics, exact result."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pd.DataFrame:
        c = pc.floor(pc.add(pc.multiply(b.column("o_totalprice"), 100.0),
                            0.5)).cast(pa.int64())
        df = pd.DataFrame({"o_custkey": np.asarray(b.column("o_custkey"),
                                                   dtype=np.int64),
                           "price_cents": np.asarray(c)})
        g = (df.groupby("o_custkey", sort=False)["price_cents"]
             .agg(n_jobs="size", total_cents="sum").reset_index())
        g["bucket"] = (pd.util.hash_array(g["o_custkey"].to_numpy(np.int64))
                       % n_buckets).astype(np.int32)
        return g

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        t = (g.groupby("o_custkey", sort=False)[["n_jobs", "total_cents"]]
             .sum().reset_index())
        return t.sort_values(["total_cents", "o_custkey"],
                             ascending=[False, True],
                             kind="mergesort").head(k)

    merged = (coalesce_slim(orders.map_batches(partial,
                                               batch_format="pyarrow",
                                               batch_size=BATCH))
              .groupby("bucket").map_groups(bucket_topk,
                                            batch_format="pandas")
              .to_pandas())  # ≤ n_buckets × k rows
    out = (merged.sort_values(["total_cents", "o_custkey"],
                              ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))
    return out.astype({"o_custkey": "int64", "n_jobs": "int64",
                       "total_cents": "int64"})


SQL_LEADERBOARD = """
SELECT o_custkey, count(*) AS n_jobs,
       CAST(sum(floor(o_totalprice * 100.0 + 0.5)) AS BIGINT) AS total_cents
FROM orders GROUP BY o_custkey
ORDER BY total_cents DESC, o_custkey LIMIT 20"""


# ---------------------------------------------------------------- O1
def q_worker_listing(sf_dir: str, k: int = 50, n_buckets: int = 64):
    """first-seen top-k: per-batch partial min per user → bucketed exact
    final min + per-bucket top-k asc → driver merge of ≤ n_buckets·k rows
    (same two-phase shape as leaderboard_topk)."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"user_id": np.asarray(b.column("user_id"),
                                                 dtype=np.int64),
                           "first_seen": b.column("ts").to_pandas()})
        g = df.groupby("user_id", sort=False)["first_seen"].min().reset_index()
        g["bucket"] = (pd.util.hash_array(g["user_id"].to_numpy(np.int64))
                       % n_buckets).astype(np.int32)
        return g

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        t = (g.groupby("user_id", sort=False)["first_seen"].min()
             .reset_index())
        return t.sort_values(["first_seen", "user_id"],
                             kind="mergesort").head(k)[["user_id",
                                                        "first_seen"]]

    merged = (coalesce_slim(ev.map_batches(partial,
                                           batch_format="pyarrow",
                                           batch_size=BATCH))
              .groupby("bucket").map_groups(bucket_topk,
                                            batch_format="pandas")
              .to_pandas())
    return (merged.sort_values(["first_seen", "user_id"], kind="mergesort")
            .head(k).reset_index(drop=True))


SQL_WORKERS = """
SELECT user_id, min(ts) AS first_seen FROM events GROUP BY user_id
ORDER BY first_seen, user_id LIMIT 50"""


# ---------------------------------------------------------------- J3
def q_is_completed(sf_dir: str):
    """Semi+anti join: a customer is 'completed' iff it has no order that is
    still open (status <> 'F') — including customers with no orders at all
    (the reference reports unknown addresses complete, main.py:469-477)."""
    open_keys = (_read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
                 .map_batches(lambda b: b.filter(
                     pc.not_equal(b.column("o_orderstatus"), "F"))
                     .select(["o_custkey"]),
                     batch_format="pyarrow", batch_size=BATCH)
                 .unique("o_custkey"))
    ref = ray.put(np.asarray(open_keys, dtype=np.int64))

    def flag(b: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        in_open = pc.is_in(b.column("c_custkey"),
                           value_set=pa.array(keys, pa.int64()))
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "is_completed": pc.invert(in_open)})

    return _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        flag, batch_format="pyarrow", batch_size=BATCH)


SQL_IS_COMPLETED = """
SELECT c_custkey,
       c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus <> 'F')
       AS is_completed
FROM customer"""


# ---------------------------------------------------------------- J2
def q_lookup_chunks(sf_dir: str):
    """Orders with exactly 2 lineitems (≙ the 2-shard chunk gate at
    reference main.py:382-401 ``len(body) < 2``)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    agg = li.groupby("l_orderkey").aggregate(Count(alias_name="n_lines"))
    return agg.map_batches(lambda b: b.filter(pc.equal(b.column("n_lines"), 2)),
                           batch_format="pyarrow", batch_size=BATCH)


SQL_LOOKUP = """
SELECT l_orderkey, count(*) AS n_lines FROM lineitem
GROUP BY l_orderkey HAVING count(*) = 2"""


# ---------------------------------------------------------------- D2
def q_union_partitions(sf_dir: str):
    """ds.union of per-state partitions → per-state counts (≙ the bootstrap
    merging open/closed/gpu job lists, reference update_db.py:44-96)."""
    orders = _read(sf_dir, "orders", ["o_orderstatus"])
    f = orders.filter(expr="o_orderstatus == 'F'")
    o = orders.filter(expr="o_orderstatus == 'O'")
    p = orders.filter(expr="o_orderstatus == 'P'")
    u = f.union(o, p)
    return u.groupby("o_orderstatus").aggregate(Count(alias_name="n"))


SQL_UNION = """
SELECT o_orderstatus, count(*) AS n FROM orders
WHERE o_orderstatus IN ('F', 'O', 'P') GROUP BY o_orderstatus"""


# ---------------------------------------------------------------- A5 / W2
ETA_INTERVAL_S = 900
ETA_WINDOW = 10


def q_eta_window(sf_dir: str):
    """Sliding-window rate: events per 900 s bucket, mean of the last ≤10
    buckets (the reference's ETA estimator, main.py:762-808). The windowed
    mean is integer-sum / count → bit-exact vs SQL AVG."""
    ev = _read(sf_dir, "events", ["ts"])

    def bucketize(b: pa.Table) -> pd.DataFrame:
        us = b.column("ts")
        if isinstance(us, pa.ChunkedArray):
            us = us.combine_chunks()
        bucket = pc.divide(us.cast(pa.int64()),
                           ETA_INTERVAL_S * 1_000_000)
        # partial counts per batch: the 900 s-bucket domain is bounded by
        # the data's time span, so the driver combine is ≤ |buckets| rows
        # per block — no Aggregate operator, no shuffle
        vc = pd.Series(np.asarray(bucket)).value_counts()
        return pd.DataFrame({"bucket": vc.index.to_numpy(np.int64),
                             "n_events": vc.to_numpy(np.int64)})

    parts = ev.map_batches(bucketize, batch_format="pyarrow",
                           batch_size=BATCH).to_pandas()
    agg = (parts.groupby("bucket", sort=True)["n_events"].sum()
           .reset_index())
    counts = agg["n_events"].astype("int64").tolist()
    rate = []
    for i in range(len(counts)):
        w = counts[max(0, i - ETA_WINDOW + 1): i + 1]
        rate.append(sum(w) / len(w))
    agg["rate_mean"] = rate
    agg["bucket"] = agg["bucket"].astype("int64")
    agg["n_events"] = agg["n_events"].astype("int64")
    return agg[["bucket", "n_events", "rate_mean"]]


SQL_ETA = f"""
WITH b AS (
  SELECT CAST(floor(epoch(ts) / {ETA_INTERVAL_S}) AS BIGINT) AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1)
SELECT bucket, n_events,
       avg(n_events) OVER (ORDER BY bucket
                           ROWS BETWEEN {ETA_WINDOW - 1} PRECEDING AND CURRENT ROW)
       AS rate_mean
FROM b ORDER BY bucket"""


# ---------------------------------------------------------------- streaming
SESSION_GAP_S = 1800


def _user_bucketed(ds, n_buckets: int = 64):
    """Whole-user hash buckets: the shuffle key for every per-user
    streaming op (64 python dispatches instead of one per user; exactness
    unchanged because a user's rows never split across buckets)."""
    def add_bucket(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("user_id"))
        return b.append_column(
            "bucket", pa.array((pd.util.hash_array(u) % n_buckets)
                               .astype(np.int32), pa.int32()))
    return (coalesce_slim(ds.map_batches(add_bucket, batch_format="pyarrow",
                                         batch_size=BATCH))
            .groupby("bucket"))


def q_events_sessionize(sf_dir: str):
    """Gap-based sessionization (streaming-shaped workload over the
    ordered event log): per user, a new session starts when the gap to
    the previous event exceeds 1800 s. Whole-user buckets; within a
    bucket ALL users sessionize in one vectorized pass (break = user
    change OR gap; per-user ids via a groupby-transform rebase)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([False],
                              np.diff(us) > SESSION_GAP_S * 1_000_000))
        brk = (new_user | gap).astype(np.int64)
        sid = brk.cumsum()                        # global session counter
        g = g.assign(_sid=sid)
        # rebase to a 0-based per-user session_id (first session of a user
        # always starts with a break, so sid at user start is the base + 1)
        base = g.groupby("user_id", sort=False)["_sid"].transform("first")
        g = g.assign(session_id=(g["_sid"] - base).astype("int64"))
        out = (g.groupby(["user_id", "session_id"], sort=False)
               .agg(n_events=("event_id", "size"),
                    t_start=("ts", "min"), t_end=("ts", "max"))
               .reset_index())
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_id", "n_events", "t_start", "t_end"]]

    return _user_bucketed(ev).map_groups(sessions, batch_format="pandas")


SQL_SESSIONIZE = f"""
WITH marked AS (
  SELECT user_id, event_id, ts,
    CASE WHEN date_diff('microsecond',
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
         > {SESSION_GAP_S * 1_000_000} THEN 1 ELSE 0 END AS brk
  FROM events),
sess AS (
  SELECT user_id, ts,
    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS t_start, max(ts) AS t_end
FROM sess GROUP BY user_id, session_id"""


def q_events_tumbling(sf_dir: str):
    """Tumbling 1-hour windows per user: count + value sum (integer cents
    for float determinism)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def bucketize(b: pa.Table) -> pa.Table:
        ts = b.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        w = pc.divide(ts.cast(pa.int64()), 3600 * 1_000_000)
        cents = pc.floor(pc.add(pc.multiply(b.column("value"), 100.0),
                                0.5)).cast(pa.int64())
        return pa.table({"user_id": b.column("user_id"), "window_id": w,
                         "value_cents": cents})

    return (ev.map_batches(bucketize, batch_format="pyarrow", batch_size=BATCH)
            .groupby(["user_id", "window_id"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value_cents", alias_name="sum_value_cents")))


SQL_TUMBLING = """
SELECT user_id,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window_id,
       count(*) AS n_events,
       CAST(sum(floor(value * 100.0 + 0.5)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2"""


# ---------------------------------------------------------------- as-of join
def q_events_asof_join(sf_dir: str):
    """As-of join within the event log: for every 'purchase' event, the
    most recent 'error' event of the same user at or before it. Whole-user
    buckets; within a bucket ONE ``pd.merge_asof(..., by="user_id")``
    handles every user (users are whole groups, so the asof is exact)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        purchases = g[g.event_type == "purchase"]
        errors = g[g.event_type == "error"]
        if len(purchases) == 0:
            return pd.DataFrame({"event_id": pd.array([], dtype="int64"),
                                 "user_id": pd.array([], dtype="int64"),
                                 "ts": pd.array([], dtype="datetime64[us]"),
                                 "last_error_ts": pd.array([], dtype="datetime64[us]")})
        out = pd.merge_asof(
            purchases[["event_id", "user_id", "ts"]],
            errors[["user_id", "ts"]].assign(last_error_ts=errors["ts"]),
            on="ts", by="user_id", direction="backward")
        return out[["event_id", "user_id", "ts", "last_error_ts"]]

    return _user_bucketed(ev).map_groups(asof, batch_format="pandas")


SQL_EVENTS_ASOF = """
SELECT p.event_id, p.user_id, p.ts,
       (SELECT max(e.ts) FROM events e
         WHERE e.user_id = p.user_id AND e.event_type = 'error'
           AND e.ts <= p.ts) AS last_error_ts
FROM events p WHERE p.event_type = 'purchase'"""


# ---------------------------------------------------------------- range join
WINDOW_S = 3600


def q_events_window_count(sf_dir: str, n_buckets: int = 64):
    """Windowed self range-join: for every event, how many events of the
    same user fall strictly within the preceding hour ``[ts−3600 s, ts)``.
    Bucketed range-join shape: users hash into ``n_buckets`` whole-user
    buckets (64 python dispatches, not one per user); within a bucket ALL
    users are counted by one vectorized double searchsorted over keys
    ``user_rank·SPAN + ts`` — the per-user offset keeps each probe inside
    its own user's segment, so no per-user loop exists anywhere. Strict
    ``<`` on both sides makes ties unambiguous."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_bucket(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("user_id"))
        return b.append_column(
            "bucket", pa.array((pd.util.hash_array(u) % n_buckets)
                               .astype(np.int32), pa.int32()))

    def window_count(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        # dense per-user rank within the bucket
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        urank = np.cumsum(new_user) - 1
        w = WINDOW_S * 1_000_000
        span = np.int64(us.max() - us.min() + w + 2) if len(us) else np.int64(1)
        key = urank * span + (us - us.min())
        lo = np.searchsorted(key, key - w, side="left")
        hi = np.searchsorted(key, key, side="left")
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "user_id": uid,
                             "n_recent": (hi - lo).astype(np.int64)})

    return (coalesce_slim(ev.map_batches(add_bucket,
                                         batch_format="pyarrow",
                                         batch_size=BATCH))
            .groupby("bucket").map_groups(window_count,
                                          batch_format="pandas"))


SQL_EVENTS_WINDOW_COUNT = f"""
SELECT e.event_id, e.user_id,
       (SELECT count(*) FROM events e2
         WHERE e2.user_id = e.user_id AND e2.ts < e.ts
           AND e2.ts >= e.ts - INTERVAL {WINDOW_S} SECOND) AS n_recent
FROM events e"""


# ---------------------------------------------------------------- top-k per group
def q_top_docs_per_lang(sf_dir: str, k: int = 3):
    """Top-k documents by n_chars per lang (deterministic tiebreak doc_id):
    per-batch partial top-k → tiny groupby(lang) final top-k — the shuffle
    carries ≤ k rows per (lang, block)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["n_chars", "doc_id"],
                               ascending=[False, True], kind="mergesort")
                .groupby("lang", sort=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.assign(lang_rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g

    return (ds.map_batches(partial, batch_format="pandas", batch_size=BATCH)
            .groupby("lang").map_groups(final, batch_format="pandas"))


SQL_TOP_DOCS = """
SELECT doc_id, lang, n_chars,
       row_number() OVER (PARTITION BY lang
                          ORDER BY n_chars DESC, doc_id) AS lang_rank
FROM documents
QUALIFY lang_rank <= 3"""


# ---------------------------------------------------------------- large joins
def q_lineitem_orders_join(sf_dir: str):
    """Large×large hash join via Ray's native Dataset.join (hash-partitioned
    on the key): revenue cents per order priority for open orders."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def cents(b: pa.Table) -> pa.Table:
        disc_price = pc.multiply(b.column("l_extendedprice"),
                                 pc.subtract(1.0, b.column("l_discount")))
        c = pc.floor(pc.add(pc.multiply(disc_price, 100.0), 0.5)).cast(pa.int64())
        return pa.table({"l_orderkey": b.column("l_orderkey"), "disc_cents": c})

    li = li.map_batches(cents, batch_format="pyarrow", batch_size=BATCH)
    orders = (_read(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                                       "o_orderstatus"])
              .filter(expr="o_orderstatus == 'O'")
              .select_columns(["o_orderkey", "o_orderpriority"]))
    joined = li.join(orders, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    return joined.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_lines"), Sum("disc_cents", alias_name="revenue_cents"))


SQL_LINEITEM_ORDERS_JOIN = """
SELECT o.o_orderpriority, count(*) AS n_lines,
       CAST(sum(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5))
            AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY o.o_orderpriority"""


# ---------------------------------------------------------------- Q3 shape
Q3_CUTOFF = "1998-06-01"


SHIP_PRIO_BROADCAST_MAX = 1_000_000  # ≈16 MB of int64 keys per task


def q_shipping_priority(sf_dir: str,
                        broadcast_max_keys: int = SHIP_PRIO_BROADCAST_MAX):
    """TPC-H Q3 shape: 3-way customer ⋈ orders ⋈ lineitem with date
    filters → revenue per order → top 10. The customer semi-join
    auto-switches on the filtered key-set size: small side → broadcast
    ``pc.is_in`` (no shuffle, one ray.put); above ``broadcast_max_keys``
    → Ray native hash semi-join, so at 100× the segment side never ships
    a GB value-set per task. orders⋈lineitem is the large×large native
    hash join; revenue in integer cents for bit-exact parallel
    aggregation. Both branches asserted equal in tests."""
    cutoff = np.datetime64(Q3_CUTOFF, "us").astype("datetime64[us]")

    cust_ds = (_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
               .filter(expr="c_mktsegment == 'BUILDING'")
               .select_columns(["c_custkey"]).materialize())
    n_keys = cust_ds.count()

    def orders_date_filter(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        return b.filter(pc.less(ts, pa.scalar(cutoff)))

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderpriority"])
              .map_batches(orders_date_filter, batch_format="pyarrow",
                           batch_size=BATCH))

    if n_keys <= broadcast_max_keys:
        keys_ref = ray.put(pa.array(
            cust_ds.to_pandas()["c_custkey"].to_numpy(dtype=np.int64),
            pa.int64()))
        orders = orders.map_batches(
            lambda b: b.filter(pc.is_in(b.column("o_custkey"),
                                        value_set=ray.get(keys_ref)))
            .select(["o_orderkey", "o_orderdate", "o_orderpriority"]),
            batch_format="pyarrow", batch_size=BATCH)
    else:
        # semi-join via native hash join (c_custkey is unique ⇒ inner
        # join is a semi-join); materialized so the downstream
        # lineitem join isn't a second concurrent JoinOperator in one plan
        orders = (orders.join(cust_ds, join_type="inner", num_partitions=8,
                              on=("o_custkey",), right_on=("c_custkey",))
                  .select_columns(["o_orderkey", "o_orderdate",
                                   "o_orderpriority"]).materialize())

    def li_cents(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate")
        if isinstance(ship, pa.ChunkedArray):
            ship = ship.combine_chunks()
        b = b.filter(pc.greater(ship, pa.scalar(cutoff)))
        disc_price = pc.multiply(b.column("l_extendedprice"),
                                 pc.subtract(1.0, b.column("l_discount")))
        cents = pc.floor(pc.add(pc.multiply(disc_price, 100.0),
                                0.5)).cast(pa.int64())
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "disc_cents": cents})

    li = (_read(sf_dir, "lineitem",
                ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
          .map_batches(li_cents, batch_format="pyarrow", batch_size=BATCH))

    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    agg = (joined.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
           .aggregate(Sum("disc_cents", alias_name="revenue_cents")))
    return (agg.sort(["revenue_cents", "o_orderdate", "l_orderkey"],
                     descending=[True, False, False]).limit(10)
            .select_columns(["l_orderkey", "o_orderdate", "o_orderpriority",
                             "revenue_cents"]))


SQL_SHIPPING_PRIORITY = f"""
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(sum(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5))
            AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
LIMIT 10"""


# ---------------------------------------------------------------- bench workhorse
def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-flavoured wide aggregate (integer-cents for determinism)."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        ext = b.column("l_extendedprice")
        disc = b.column("l_discount")
        base_c = pc.floor(pc.add(pc.multiply(ext, 100.0), 0.5)).cast(pa.int64())
        disc_price = pc.multiply(ext, pc.subtract(1.0, disc))
        disc_c = pc.floor(pc.add(pc.multiply(disc_price, 100.0), 0.5)).cast(pa.int64())
        return pa.table({"l_returnflag": b.column("l_returnflag"),
                         "l_linestatus": b.column("l_linestatus"),
                         "qty": b.column("l_quantity"),
                         "base_cents": base_c, "disc_cents": disc_c})

    def partial(b: pa.Table) -> pd.DataFrame:
        df = prep(b).to_pandas()
        return (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
                .agg(sum_qty=("qty", "sum"),
                     sum_base_cents=("base_cents", "sum"),
                     sum_disc_cents=("disc_cents", "sum"),
                     n=("qty", "size")).reset_index())

    # bounded domain (≤6 (returnflag, linestatus) groups): per-batch partial
    # aggregation + driver combine of ≤6 rows per block — no Aggregate
    # operator, no shuffle. Money is integer cents; qty is integer-valued
    # doubles (< 2^53), so parallel summation order cannot change a bit.
    parts = (li.map_batches(partial, batch_format="pyarrow",
                            batch_size=BATCH).to_pandas())
    out = (parts.groupby(["l_returnflag", "l_linestatus"], sort=True)
           .sum().reset_index())
    return out.astype({"sum_base_cents": "int64",
                       "sum_disc_cents": "int64", "n": "int64"})


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(floor(l_extendedprice * 100.0 + 0.5)) AS BIGINT) AS sum_base_cents,
       CAST(sum(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)) AS BIGINT)
         AS sum_disc_cents,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus"""


# ---------------------------------------------------------------- J1 join
def q_revenue_per_nation(sf_dir: str):
    """Multi-way join orders ⋈ customer ⋈ nation (≙ the reference's
    client→job FK prefetch joins, main.py:102-108) as a map-side broadcast
    join: the small dimension tables are ray.put once and merged per batch —
    no shuffle of the fact table. At two-large-sides scale this becomes the
    bucketed hash join documented in ray_guide."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    dim = (cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
           .sort_values("c_custkey"))
    # broadcast a (sorted keys, name-code, name-dictionary) triple once;
    # per batch the lookup is one vectorized searchsorted + two takes
    name_dict, codes = np.unique(dim["n_name"].to_numpy(dtype=object),
                                 return_inverse=True)
    ref = ray.put((dim["c_custkey"].to_numpy(dtype=np.int64),
                   codes.astype(np.int32),
                   pa.array(name_dict, pa.string())))

    def join_batch(b: pa.Table) -> pd.DataFrame:
        keys, code_of, names = ray.get(ref)
        pos = np.searchsorted(keys, np.asarray(b.column("o_custkey"),
                                               dtype=np.int64))
        name_col = np.asarray(names.take(pa.array(code_of[pos], pa.int32())),
                              dtype=object)
        cents = pc.floor(pc.add(pc.multiply(b.column("o_totalprice"), 100.0),
                                0.5)).cast(pa.int64())
        df = pd.DataFrame({"n_name": name_col,
                           "price_cents": np.asarray(cents)})
        # partial aggregate inside the map: ≤25 nations per block
        return (df.groupby("n_name", sort=False)["price_cents"]
                .agg(n_orders="size", revenue_cents="sum").reset_index())

    # bounded domain (25 nations): driver combine of ≤25 rows per block
    parts = (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
             .map_batches(join_batch, batch_format="pyarrow",
                          batch_size=BATCH).to_pandas())
    out = (parts.groupby("n_name", sort=True)[["n_orders", "revenue_cents"]]
           .sum().reset_index())
    return out.astype({"n_orders": "int64", "revenue_cents": "int64"})


SQL_REVENUE_NATION = """
SELECT n.n_name, count(*) AS n_orders,
       CAST(sum(floor(o.o_totalprice * 100.0 + 0.5)) AS BIGINT) AS revenue_cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name"""


# ---------------------------------------------------------------- M1
def q_shard_number(sf_dir: str):
    """The reference's shard-number derivation formula
    ``count = (end_id / 1_000_000) * 2 − (shard_of_chunk == 0)``
    (reference update_db.py:12-16), applied vectorized with o_orderkey as
    end_id and parity as shard_of_chunk."""
    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def derive(b: pa.Table) -> pa.Table:
        end_id = b.column("o_orderkey")
        shard = pc.bit_wise_and(end_id, 1)  # 0/1 ≙ shard_of_chunk
        count = pc.multiply(pc.divide(end_id, 1_000_000), 2)
        count = pc.subtract(count, pc.equal(shard, 0).cast(pa.int64()))
        return pa.table({"o_orderkey": end_id,
                         "shard_number": count.cast(pa.int64())})

    return ds.map_batches(derive, batch_format="pyarrow", batch_size=BATCH)


SQL_SHARD_NUMBER = """
SELECT o_orderkey,
       (o_orderkey // 1000000) * 2
         - (CASE WHEN (o_orderkey & 1) = 0 THEN 1 ELSE 0 END) AS shard_number
FROM orders"""


# ---------------------------------------------------------------- O3
def q_url_sample(sf_dir: str):
    """Deterministic 1/16 sample (≙ the reference's ``ORDER BY RANDOM()
    LIMIT 1`` sampling, models.py:112, made reproducible per north_rule):
    keep rows whose md5(url) starts with '0' — i.e. top nibble of the
    big-endian digest is 0, computed via the vectorized md5 kernel."""
    from ..functions.canonicalize import md5_hash64
    from .frontier_core import pages_ds

    def pick(b: pa.Table) -> pa.Table:
        nibble = md5_hash64(b.column("url")) >> np.uint64(60)
        return b.filter(pa.array(nibble == 0)).select(["url", "warc_ts"])

    return pages_ds(sf_dir, ["url", "warc_ts"]).map_batches(
        pick, batch_format="pyarrow", batch_size=BATCH)


def sql_url_sample(pages_path: str) -> str:
    return f"""
SELECT url, warc_ts FROM read_parquet('{pages_path}/*.parquet')
WHERE substr(md5(url), 1, 1) = '0'"""



def q_price_quantiles_sketch(sf_dir: str):
    """Approximate p50/p90/p99 of l_extendedprice via the mergeable
    KLL-style QuantileSketch (rows-only for the driver — approximate by
    design; rank accuracy vs the exact quantile is pytest-bounded). The
    scale path for quantiles over continuous domains, where the exact
    value-count-histogram trick (q_doc_length_quantiles) would shuffle
    an unbounded number of distinct values."""
    import pandas as pd

    from ..functions.sketches import quantiles_sketched
    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    out = quantiles_sketched(li, "l_extendedprice")
    return pd.DataFrame([out])


ANALYTICS_QUERIES = {
    "revenue_per_nation": q_revenue_per_nation,
    "shard_number": q_shard_number,
    "events_sessionize": q_events_sessionize,
    "events_tumbling": q_events_tumbling,
    "events_asof_join": q_events_asof_join,
    "events_window_count": q_events_window_count,
    "top_docs_per_lang": q_top_docs_per_lang,
    "lineitem_orders_join": q_lineitem_orders_join,
    "shipping_priority": q_shipping_priority,
    "completion_counts": q_completion_counts,
    "clients_per_type": q_clients_per_type,
    "leaderboard_topk": q_leaderboard_topk,
    "worker_listing": q_worker_listing,
    "is_completed": q_is_completed,
    "lookup_chunks": q_lookup_chunks,
    "union_partitions": q_union_partitions,
    "eta_window": q_eta_window,
    "lineitem_agg": q_lineitem_agg,
    "price_quantiles_sketch": q_price_quantiles_sketch,  # rows-only
}

ANALYTICS_SQL = {
    "revenue_per_nation": SQL_REVENUE_NATION,
    "shard_number": SQL_SHARD_NUMBER,
    "events_sessionize": SQL_SESSIONIZE,
    "events_tumbling": SQL_TUMBLING,
    "events_asof_join": SQL_EVENTS_ASOF,
    "events_window_count": SQL_EVENTS_WINDOW_COUNT,
    "top_docs_per_lang": SQL_TOP_DOCS,
    "lineitem_orders_join": SQL_LINEITEM_ORDERS_JOIN,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "completion_counts": SQL_COMPLETION,
    "clients_per_type": SQL_CLIENTS,
    "leaderboard_topk": SQL_LEADERBOARD,
    "worker_listing": SQL_WORKERS,
    "is_completed": SQL_IS_COMPLETED,
    "lookup_chunks": SQL_LOOKUP,
    "union_partitions": SQL_UNION,
    "eta_window": SQL_ETA,
    "lineitem_agg": SQL_LINEITEM_AGG,
}
