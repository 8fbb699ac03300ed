#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify into <verifyOutDir>/<name>/ (parquet),
runs the paired DuckDB oracle SQL from <verifyOutDir>/oracle_sql.json against
the same sf parquet tables, then compares: row count, column names (sorted),
and values (rows sorted, columns sorted by name, NaN==NaN, 1e-9 rel tol
reported separately from exact match).
"""
import json, math, os, sys
import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def key(row):
    return json.dumps([str(norm(v)) for v in row])


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    issues = []
    if sorted(spark_cols) != sorted(duck_cols):
        issues.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return issues
    if len(spark_rows) != len(duck_rows):
        issues.append(f"rows: spark={len(spark_rows)} duck={len(duck_rows)}")
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = sorted([key([r[i] for i in order]) for r in spark_rows])
    d = sorted([key([r[i] for i in dorder]) for r in duck_rows])
    if s != d:
        nbad = sum(1 for a, b in zip(s, d) if a != b) + abs(len(s) - len(d))
        issues.append(f"values: {nbad} differing sorted rows")
        # show first few diffs
        shown = 0
        for a, b in zip(s, d):
            if a != b and shown < 3:
                issues.append(f"  spark={a}")
                issues.append(f"   duck={b}")
                shown += 1
    return issues


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        tbl = ds.dataset(qdir, format="parquet").to_table()
        spark_cols = tbl.column_names
        spark_rows = [tuple(norm(c[i].as_py()) for c in tbl.columns)
                      for i in range(tbl.num_rows)]
        if name not in oracle:
            print(f"SKIP  {name}: rows={tbl.num_rows} (no oracle, rows-only check "
                  f"{'OK' if tbl.num_rows > 0 else 'EMPTY!'})")
            n_skip += 1
            continue
        try:
            res = con.execute(oracle[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        issues = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if issues:
            print(f"FAIL  {name}:")
            for i in issues:
                print(f"      {i}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({tbl.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
