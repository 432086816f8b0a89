"""Standalone oracle harness: runs every registered query against its
DuckDB oracle exactly as the driver does.

Usage: python tools/oracle_harness.py [sf_dir] [q1,q2,...]
"""
import sys, time, traceback
import os
import ray, duckdb, pandas as pd, numpy as np
ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
         include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
import ray.data as rd
rd.DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import __ray_entry__ as e

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# every arg after the sf dir is a query name (comma- or space-separated)
only = (
    [q for a in sys.argv[2:] for q in a.split(",") if q]
    if len(sys.argv) > 2
    else None
)
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # a table may be a DIRECTORY of fragments (tools/make_multifrag.py);
    # Ray reads those natively, DuckDB needs the glob
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

r = e.entry()
n = r.count() if hasattr(r, "count") else len(r)
print(f"entry(): {type(r).__name__} rows={n}")

qs, oq = e.queries(), e.oracle_sql()
if only:
    unknown = [q for q in only if q not in qs]
    if unknown:
        print(f"WARN unknown query name(s), skipped: {unknown}")
fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        res = fn(sf)
        if hasattr(res, "to_pandas"):
            df = res.to_pandas()
        elif hasattr(res, "to_arrow"):
            df = res.to_arrow().to_pandas()
        else:
            df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        dt = time.time() - t0
        if name in oq:
            odf = con.execute(oq[name]).fetchdf()
            cols = sorted(df.columns)
            ocols = sorted(odf.columns)
            if cols != ocols:
                fails.append(name); print(f"FAIL {name}: columns {cols} vs {ocols}"); continue
            a = df[cols].sort_values(cols).reset_index(drop=True)
            b = odf[cols].sort_values(cols).reset_index(drop=True)
            if len(a) != len(b):
                fails.append(name); print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); continue
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
                print(f"OK   {name}: {len(a)} rows exact  [{dt:.1f}s]")
            except AssertionError as ex:
                fails.append(name)
                print(f"FAIL {name}: value mismatch [{dt:.1f}s]")
                print(str(ex)[:500])
        else:
            print(f"ROWS {name}: {len(df)} rows  [{dt:.1f}s]")
    except Exception:
        fails.append(name)
        print(f"ERR  {name}:")
        traceback.print_exc(limit=5)
print("FAILS:", fails if fails else "none")
ray.shutdown()
