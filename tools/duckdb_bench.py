#!/usr/bin/env python3
"""Time the DuckDB oracle on the CURRENT query workload — the engine's
bench denominator. Mirrors the driver's setup: parquet views, 32 threads.

Usage: python3 tools/duckdb_bench.py [sfdir] [oracle_sql.json] [runs] [timeout_sec]
Prints one JSON line: {"metric":"duckdb_total","value":sec,"queries":{...}}
(median of `runs` per query, one discarded warm-up). With timeout_sec > 0, a
query whose FIRST execution exceeds the timeout is interrupted and recorded
at the timeout value with "timeout":true — the total is then a LOWER bound
(used for the sf1 protocol, where the oracle's all-pairs similarity queries
go quadratic; default 0 = no timeout, the driver's behavior).
"""
import json, sys, threading, time
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v01/oracle_sql.json"
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
timeout_sec = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def timed_exec(sql):
    """One execution; with a timeout, interrupt and return None on overrun."""
    fired = [False]
    timer = None
    if timeout_sec > 0:
        def _interrupt():
            fired[0] = True
            con.interrupt()
        timer = threading.Timer(timeout_sec, _interrupt)
        timer.start()
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        return time.time() - t0
    except duckdb.InterruptException:
        return None
    finally:
        if timer:
            timer.cancel()
            if fired[0]:
                # the timer may fire AFTER the query completed but before
                # cancel(): absorb the stale interrupt flag so it cannot
                # falsely cancel the NEXT execution
                try:
                    con.execute("SELECT 1").fetchall()
                except duckdb.InterruptException:
                    pass

oracle = json.load(open(oracle_path))
results = {}
timeouts = set()
for name in sorted(oracle):
    sql = oracle[name]
    first = timed_exec(sql)  # warm-up (discarded), doubles as the timeout probe
    if first is None:
        results[name] = timeout_sec
        timeouts.add(name)
        print(f'{{"query":"{name}","sec":{timeout_sec:.4f},"timeout":true}}', file=sys.stderr)
        continue
    times = []
    for _ in range(runs):
        dt = timed_exec(sql)
        if dt is None:
            timeouts.add(name)  # measured-run overrun: result is a lower bound
        times.append(timeout_sec if dt is None else dt)
    times.sort()
    results[name] = times[len(times) // 2]
    flag = ',"timeout":true' if name in timeouts else ""
    print(f'{{"query":"{name}","sec":{results[name]:.4f}{flag}}}', file=sys.stderr)

total = sum(results.values())
qs = ",".join(f'"{k}":{v:.4f}' for k, v in results.items())
tos = ",".join(f'"{t}"' for t in sorted(timeouts))
print(f'{{"metric":"duckdb_total","value":{total:.4f},"unit":"sec","sf_dir":"{sfdir}","timeouts":[{tos}],"queries":{{{qs}}}}}')
