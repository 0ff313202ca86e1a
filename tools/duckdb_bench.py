#!/usr/bin/env python3
"""Time the DuckDB oracle on the CURRENT query workload — the engine's
bench denominator. Mirrors the driver's setup: parquet views, 32 threads.

Usage: python3 tools/duckdb_bench.py [sfdir] [oracle_sql.json] [runs]
Prints one JSON line: {"metric":"duckdb_total","value":sec,"queries":{...}}
(median of `runs` per query, one discarded warm-up).
"""
import json, sys, time
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v01/oracle_sql.json"
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    times = []
    for i in range(runs + 1):
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        if i > 0:  # discard warm-up
            times.append(dt)
    times.sort()
    results[name] = times[len(times) // 2]
    print(f'{{"query":"{name}","sec":{results[name]:.4f}}}', file=sys.stderr)

total = sum(results.values())
qs = ",".join(f'"{k}":{v:.4f}' for k, v in results.items())
print(f'{{"metric":"duckdb_total","value":{total:.4f},"unit":"sec","sf_dir":"{sfdir}","queries":{{{qs}}}}}')
