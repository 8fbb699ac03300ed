#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads Verify.scala's output
parquet + oracle_sql.json, runs each oracle in DuckDB over the same sf dir,
and compares row count / schema / values (exact, with a float-diff report).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    try:
        got = duckdb.connect().execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        fails.append((name, f"spark output missing: {e}")); continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")); continue
    if len(exp) != len(got):
        fails.append((name, f"rows differ: oracle={len(exp)} spark={len(got)}")); continue
    # sort rows on all hashable columns for order-insensitive compare
    key = [c for c in exp.columns if exp[c].dtype != object or
           exp[c].map(lambda v: not isinstance(v, (list, dict, bytes, bytearray))).all()]
    exp = exp.sort_values(key, kind="mergesort").reset_index(drop=True)
    got = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    bad = None
    for c in exp.columns:
        ev, gv = exp[c], got[c]
        if str(ev.dtype).startswith("float") and str(gv.dtype).startswith("float"):
            if not all((math.isnan(a) and math.isnan(b)) or a == b
                       for a, b in zip(ev.fillna(float("nan")), gv.fillna(float("nan")))):
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(ev, gv))
                         if not ((isinstance(a, float) and isinstance(b, float)
                                  and (a == b or (math.isnan(a) and math.isnan(b)))))][:3]
                bad = f"col {c} float mismatch, first diffs {diffs}"
                break
        else:
            ev2 = ev.astype(str); gv2 = gv.astype(str)
            if not (ev2 == gv2).all():
                idx = (ev2 != gv2).idxmax()
                bad = f"col {c} mismatch at row {idx}: oracle={ev[idx]!r} spark={got[c][idx]!r} (dtypes {ev.dtype}/{gv.dtype})"
                break
    if bad: fails.append((name, bad))
    else: passes.append((name, len(exp)))

for n, r in passes: print(f"PASS {n} ({r} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} passed, {len(fails)} failed, "
      f"{len(set(json.load(open(f'{outdir}/oracle_sql.json')).keys()))} oracles")
sys.exit(1 if fails else 0)
