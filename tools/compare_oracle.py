#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (builder tooling only;
the engine itself is pure Scala/Spark — this script is never shipped).

Runs after `graft.Verify <sfDir> <outDir>`: for each query result parquet in
<outDir>, executes the matching SQL from oracle_sql.json in DuckDB over the
same testdata tables, sorts columns by name, and compares cell-by-cell
(exact; NaN==NaN). Exits nonzero on any mismatch.

Usage: python3 tools/compare_oracle.py [--strict] <sfDir> <outDir> [query ...]

--strict additionally compares type(cell) and str(cell), catching
representation drift (e.g. Decimal('1.50') vs Decimal('1.5'), or a
decimal column where the oracle yields double) that value-equality
hides but a stringify/serialize hasher — like the driver's — does not.
See SURVEY.md §5's frozen-output-type rule (r17 lesson).
"""
import json
import math
import sys

import duckdb

STRICT = False


def norm_cell(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if STRICT:
        return (type(v).__name__, str(v), v)
    return v


def compare(name, spark_rows, duck_rows, cols):
    if len(spark_rows) != len(duck_rows):
        print(f"FAIL {name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")
        return False
    for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
        for c, (x, y) in zip(cols, zip(a, b)):
            if norm_cell(x) != norm_cell(y):
                print(f"FAIL {name}: row {i} col {c}: spark={x!r} duck={y!r}"
                      f" (types {type(x).__name__}/{type(y).__name__})")
                return False
    print(f"OK   {name}: {len(spark_rows)} rows")
    return True


def main():
    global STRICT
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = len(argv) != len(sys.argv) - 1
    if len(argv) < 2:
        print(__doc__)
        sys.exit(2)
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    import os
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver testdata ships single files; ScaleGen (Spark) writes
        # directory tables — glob the parts in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, skipped, failed = 0, 0, 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            duck = con.execute(sql)
            cols_d = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            cols_s = [d[0] for d in spark.description]
            if sorted(cols_s) != sorted(cols_d):
                print(f"FAIL {name}: columns spark={sorted(cols_s)} duck={sorted(cols_d)}")
                failed += 1
                continue
            spark_rows = spark.fetchall()
            # driver sorts columns by name before hashing
            perm_s = [cols_s.index(c) for c in sorted(cols_s)]
            perm_d = [cols_d.index(c) for c in sorted(cols_d)]
            srt = [tuple(r[i] for i in perm_s) for r in spark_rows]
            drt = [tuple(r[i] for i in perm_d) for r in duck_rows]
            if compare(name, srt, drt, sorted(cols_s)):
                ok += 1
            else:
                failed += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            failed += 1
    print(f"== {ok} ok, {failed} failed ==")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
