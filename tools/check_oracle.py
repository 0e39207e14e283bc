#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
Compares each <out>/<query> parquet against the oracle SQL run in DuckDB
(views named after the tables), with rows+columns sorted. Exact value
compare; floats compared exactly after the query's own rounding.
"""
import json, sys, glob, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}"); fails += 1; continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fails += 1; continue
    gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    ws = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    same_types = [str(a) for a in gs.dtypes] == [str(b) for b in ws.dtypes]
    eq = gs.equals(ws)
    if not eq:
        diff = (gs != ws) & ~(gs.isna() & ws.isna())
        n = int(diff.any(axis=1).sum())
        print(f"FAIL {name}: {n}/{len(gs)} rows differ; types match={same_types}")
        bad = diff.any(axis=1)
        print("  got :", gs[bad].head(3).to_dict("records"))
        print("  want:", ws[bad].head(3).to_dict("records"))
        fails += 1
    else:
        flag = "" if same_types else f"  (dtype diff: {list(zip(gs.dtypes, ws.dtypes))})"
        print(f"OK   {name} rows={len(gs)}{flag}")
print(f"\n{len(oracle)-fails}/{len(oracle)} OK")
sys.exit(1 if fails else 0)
