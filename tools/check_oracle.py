#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, then compare row count, schema (column names), and
an order-insensitive value comparison.

Usage: python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    # sort columns by name (driver contract), then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def compare(name, s_cols, s_rows, d_cols, d_rows) -> list[str]:
    problems = []
    sc, sr = norm_rows(s_cols, s_rows)
    dc, dr = norm_rows(d_cols, d_rows)
    if sc != dc:
        problems.append(f"schema mismatch: spark={sc} duck={dc}")
        return problems
    if len(sr) != len(dr):
        problems.append(f"rowcount mismatch: spark={len(sr)} duck={len(dr)}")
    n_bad = 0
    for a, b in zip(sr, dr):
        if a != b:
            # allow tiny float wiggle for diagnosis (still reported)
            if n_bad < 3:
                problems.append(f"value mismatch: spark={a} duck={b}")
            n_bad += 1
    if n_bad:
        problems.append(f"total mismatched rows: {n_bad}/{len(sr)}")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--exclude", nargs="*", default=[],
                    help="queries to skip, as name=reason or bare name "
                         "(e.g. brute-force O(n^2) oracles that do not "
                         "finish at sf>=1); reasons land in --json-out")
    ap.add_argument("--json-out", default=None,
                    help="write per-query results (pass/fail/skip + "
                         "reason + rows + seconds) as a JSON artifact")
    ap.add_argument("--duck-mem", default=None,
                    help="DuckDB memory_limit (e.g. 24GB). At sf10 the "
                         "default 80%%-of-RAM limit plus the Spark JVM "
                         "can exceed physical memory and thrash the "
                         "host (r8: a 4-query batch hit 103 GB RSS); "
                         "a cap makes DuckDB spill instead")
    ap.add_argument("--duck-threads", type=int, default=None,
                    help="DuckDB thread cap. Sort/ordered-aggregate "
                         "memory scales with threads; the sf10 "
                         "char-fold oracles OOM a 48GB budget at 32 "
                         "threads but fit at 8")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from rivulus_spark import get_spark
    from rivulus_spark.workload import QUERIES, oracle_sql_for

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    if args.duck_threads:
        con.execute(f"SET threads={int(args.duck_threads)}")
    if args.duck_mem:
        con.execute(f"SET memory_limit='{args.duck_mem}'")
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    excludes: dict[str, str] = {}
    for e in args.exclude:
        n, _, reason = e.partition("=")
        excludes[n] = reason or "excluded by --exclude"
    names = args.queries or list(QUERIES)
    skipped = [n for n in names if n in excludes]
    names = [n for n in names if n not in excludes]
    record: dict[str, dict] = {}
    for n in skipped:
        print(f"SKIP  {n}: {excludes[n]}")
        record[n] = {"status": "skip", "reason": excludes[n]}
    failures = 0
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            record[name] = {"status": "fail",
                            "reason": f"spark error: {e}"[:400]}
            continue
        sql = oracle_sql_for(name, args.sf_dir)
        if sql is None:
            print(f"....  {name}: no oracle (rows-only) -> {len(s_rows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            record[name] = {"status": "rows_only", "spark_rows": len(s_rows),
                            "sec": round(time.time() - t0, 1)}
            continue
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            record[name] = {"status": "fail",
                            "reason": f"duckdb error: {e}"[:400]}
            continue
        problems = compare(name, s_cols, s_rows, d_cols, d_rows)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(s_rows)} spark rows, {len(d_rows)} oracle rows) "
                  f"[{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            record[name] = {"status": "fail", "spark_rows": len(s_rows),
                            "oracle_rows": len(d_rows),
                            "problems": problems[:4]}
        else:
            print(f"PASS  {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
            record[name] = {"status": "pass", "rows": len(s_rows),
                            "sec": round(time.time() - t0, 1)}
    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    if args.json_out:
        import json

        n_pass = sum(1 for v in record.values() if v["status"] == "pass")
        with open(args.json_out, "w") as f:
            json.dump({"sf_dir": args.sf_dir,
                       "n_pass": n_pass,
                       "n_fail": failures,
                       "n_skip": len(skipped),
                       "queries": record}, f, indent=1, sort_keys=True)
        print(f"wrote {args.json_out}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
