#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
dumps against DuckDB executing oracle_sql.json on the same tables.
Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, skips = [], [], []
fpath = os.path.join(outdir, "_failures.json")
if os.path.exists(fpath):
    for name, msg in json.load(open(fpath)).items():
        fails.append((name, f"verify-time error: {msg}"))
failed_names = {n for n, _ in fails}
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path) or name in failed_names:
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')").df()
    if name not in oracle:
        skips.append((name, len(got)))
        continue
    want = con.sql(oracle[name]).df()
    ok = True; why = ""
    if sorted(got.columns) != sorted(want.columns):
        ok, why = False, f"cols {sorted(got.columns)} vs {sorted(want.columns)}"
    elif len(got) != len(want):
        ok, why = False, f"rows {len(got)} vs {len(want)}"
    else:
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            gv, wv = g[c], w[c]
            try:
                same = (gv.astype(str) == wv.astype(str)).all()
            except Exception:
                same = False
            if not same:
                diff = (gv.astype(str) != wv.astype(str))
                i = diff[diff].index[0]
                ok, why = False, f"col {c} row {i}: got={gv[i]!r} want={wv[i]!r} ({int(diff.sum())} diffs)"
                if str(g[c].dtype) != str(w[c].dtype):
                    why += f" [dtype {g[c].dtype} vs {w[c].dtype}]"
                break
    (passes if ok else fails).append((name, why) if not ok else (name, len(got)))
for n, r in passes: print(f"PASS {n} ({r} rows)")
for n, r in skips: print(f"SKIP {n} (rows-only, {r} rows)")
for n, w in fails: print(f"FAIL {n}: {w}")
print(f"\n{len(passes)} pass, {len(skips)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)
