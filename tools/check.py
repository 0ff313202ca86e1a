#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]
Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran.
Compares each <outdir>/<name> parquet against the DuckDB oracle in
<outdir>/oracle_sql.json: columns sorted by name, rows sorted, exact equality.
"""
import json, math, sys
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out

fails = []
for name, sql in sorted(oracle.items()):
    try:
        mine = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        mcols, mrows = canon(mine.fetchall(), [d[0] for d in mine.description])
        ref = con.sql(sql)
        rcols, rrows = canon(ref.fetchall(), [d[0] for d in ref.description])
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: exception {e}"); continue
    if mcols != rcols:
        fails.append(name); print(f"FAIL {name}: cols {mcols} vs {rcols}"); continue
    if len(mrows) != len(rrows):
        fails.append(name); print(f"FAIL {name}: rowcount {len(mrows)} vs {len(rrows)}"); continue
    bad = [(a, b) for a, b in zip(mrows, rrows) if a != b]
    if bad:
        fails.append(name)
        print(f"FAIL {name}: {len(bad)}/{len(mrows)} rows differ; first: ")
        print(f"  mine:   {bad[0][0]}")
        print(f"  oracle: {bad[0][1]}")
        print(f"  cols:   {mcols}")
    else:
        print(f"PASS {name} ({len(mrows)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
