#!/usr/bin/env python
"""Simulate the driver's correctness pass: ray.init, import __ray_entry__,
smoke entry(), then run every queries()[name](sf0.01) against
oracle_sql()[name] via DuckDB with an order-insensitive compare.
Usage: python scripts/driver_sim.py [sf_dir] [--skip-entry]
"""
import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")

    results = {}
    if "--skip-entry" not in sys.argv:
        t0 = time.time()
        ds = e.entry()
        n = ds.count() if hasattr(ds, "count") else len(ds)
        results["__entry__"] = {"rows": int(n), "sec": round(time.time() - t0, 1)}

    qs, sqls = e.queries(), e.oracle_sql()
    import ray.data as rd
    import pyarrow as pa
    for name in sorted(qs):
        t0 = time.time()
        try:
            r = qs[name](SF)
            if isinstance(r, rd.Dataset):
                r = r.to_pandas()
            elif isinstance(r, pa.Table):
                r = r.to_pandas()
            if name not in sqls:
                results[name] = {"status": "rows_only", "rows": len(r),
                                 "sec": round(time.time() - t0, 1)}
                continue
            o = con.execute(sqls[name]).df()
            a, b = norm(r), norm(o)
            ok_cols = list(a.columns) == list(b.columns)
            # the real driver's value-hash is representation-sensitive:
            # int64 vs float64 of equal values still mismatches. Flag
            # differing dtype KINDS (int vs float vs object vs datetime).
            if ok_cols and [d.kind for d in a.dtypes] != [d.kind for d in b.dtypes]:
                results[name] = {"status": "MISMATCH", "rows": len(a),
                                 "oracle_rows": len(b), "cols_ok": True,
                                 "dtype_kinds": [f"{c}:{x.kind}!={y.kind}"
                                                 for c, x, y in
                                                 zip(a.columns, a.dtypes, b.dtypes)
                                                 if x.kind != y.kind],
                                 "sec": round(time.time() - t0, 1)}
                continue
            ok_rows = len(a) == len(b)
            ok_vals = False
            if ok_cols and ok_rows:
                try:
                    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                                  rtol=1e-9, atol=1e-12)
                    ok_vals = True
                except AssertionError:
                    ok_vals = False
            results[name] = {"status": "match" if (ok_cols and ok_rows and ok_vals)
                             else "MISMATCH",
                             "rows": len(a), "oracle_rows": len(b),
                             "cols_ok": ok_cols, "sec": round(time.time() - t0, 1)}
        except Exception as ex:
            results[name] = {"status": "ERROR", "error": repr(ex)[:200],
                             "sec": round(time.time() - t0, 1)}
    ray.shutdown()
    print(json.dumps(results, indent=1))
    bad = [k for k, v in results.items()
           if v.get("status") not in ("match", "rows_only", None) and k != "__entry__"]
    print("BAD:", bad)


if __name__ == "__main__":
    main()
