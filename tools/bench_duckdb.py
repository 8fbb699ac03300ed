#!/usr/bin/env python3
"""DuckDB comparator for BASELINE.md: times the full oracle-SQL suite over the
same sf parquet tables the Spark Bench runs on. One warmup pass, then
min-of-N per query (same methodology as Bench.scala).

Usage: bench_duckdb.py <sfDir> <verifyOutDir> [passes=2]
"""
import json, sys, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
times = {}
for name, sql in sorted(oracle.items()):
    try:
        con.execute(sql).fetchall()  # warmup (also catches SQL errors)
    except Exception as e:
        times[name] = None
        continue
    best = min(
        (lambda t0: (con.execute(sql).fetchall(), time.time() - t0)[1])(time.time())
        for _ in range(passes))
    times[name] = best
ok = {k: v for k, v in times.items() if v is not None}
errors = [k for k, v in times.items() if v is None]
# an erroring oracle must not silently shrink the headline total the Spark
# bench is compared against - report null instead of a misleading number
print(json.dumps({"metric": "duckdb_total",
                  "value": sum(ok.values()) if not errors else None,
                  "partial_total_ok_queries": round(sum(ok.values()), 3),
                  "unit": "sec", "queries": {k: round(v, 4) for k, v in ok.items()},
                  "errors": errors,
                  "sf": sfdir}))
