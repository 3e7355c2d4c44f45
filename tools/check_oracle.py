#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL, sort columns by name + rows, compare values.
Usage: check_oracle.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        got_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not got_files:
            print(f"FAIL {name}: no spark output"); fails.append(name); continue
        got = pd.concat([pd.read_parquet(f) for f in got_files])
        exp = con.sql(sql).df()
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}")
            fails.append(name); continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails.append(name); continue
        mismatch = None
        for c in g.columns:
            gv, ev = g[c], e[c]
            # The driver hashes string renderings, so dtype KIND must agree:
            # DuckDB HUGEINT->float64 renders 579 as "579.0" and fails the
            # driver hash even when values are numerically equal, while an
            # int32-vs-int64 width difference renders identically ("20") and
            # passes (q_multimodal_meta was driver-green with int32). Mirror
            # that: same kind + exact string equality, no float tolerance.
            if gv.dtype.kind != ev.dtype.kind:
                print(f"FAIL {name}: col {c} dtype {gv.dtype} vs {ev.dtype}")
                mismatch = (c, gv.head(3), ev.head(3)); break
            if not gv.astype(str).equals(ev.astype(str)):
                bad = gv.astype(str) != ev.astype(str)
                mismatch = (c, g[bad].head(3), e[bad].head(3)); break
        if mismatch:
            c, gg, ee = mismatch
            print(f"FAIL {name}: col {c}\n got:\n{gg}\n exp:\n{ee}")
            fails.append(name)
        else:
            print(f"OK   {name} ({len(g)} rows)")
    except Exception as ex:
        print(f"ERR  {name}: {str(ex)[:300]}")
        fails.append(name)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
