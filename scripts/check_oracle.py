#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle SQL in DuckDB
against the sf tables, load the Spark result parquet, sort columns by
name (and rows), and compare values. Usage:
    python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
try:
    verify_errors = json.load(open(f"{outdir}/errors.json"))
except FileNotFoundError:
    verify_errors = {}

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if v is None: return "NULL"
    return str(v)

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]

fails = 0
for name, sql in sorted(oracle.items()):
    if name in verify_errors:
        print(f"FAIL {name}: spark error: {verify_errors[name]}"); fails += 1; continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    s = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
    scols = [d[0] for d in s.description]; srows = s.fetchall()
    try:
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]; orows = o.fetchall()
    except Exception as ex:
        print(f"FAIL {name}: oracle SQL error: {ex}"); fails += 1; continue
    sn, sc = norm(srows, scols); on, oc = norm(orows, ocols)
    if sc != oc:
        print(f"FAIL {name}: columns spark={sc} oracle={oc}"); fails += 1; continue
    if len(sn) != len(on):
        print(f"FAIL {name}: rows spark={len(sn)} oracle={len(on)}"); fails += 1; continue
    if sn != on:
        bad = [(a, b) for a, b in zip(sn, on) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}"); fails += 1; continue
    print(f"OK   {name} ({len(sn)} rows)")
print(f"\n{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
