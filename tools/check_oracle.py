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
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                bad = ~(pd.isna(gv) & pd.isna(ev) |
                        (gv.astype(float) - ev.astype(float)).abs() <= 1e-12 +
                        1e-12 * ev.astype(float).abs())
                exact = (gv.astype(float).fillna(1.5) == ev.astype(float).fillna(1.5)).all()
                if bad.any():
                    mismatch = (c, g[bad].head(3), e[bad].head(3)); break
                if not exact:
                    print(f"  note {name}.{c}: equal within 1e-12 but not bit-exact")
            else:
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
