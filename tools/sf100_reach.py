#!/usr/bin/env python3
"""Third-decade (sf100) cluster-label checks -> CORRECTNESS_SF100_r{N}.json
(builder tooling only; the engine itself is pure Scala/Spark).

Pairs the r19 decade-3 EXECUTION point (BENCH_SF100_r19.json) with
decade-3 CORRECTNESS evidence, using the two methods the sf10 sweep
established (tools/sf10_oracle.py):

- CLUSTERS_REACH: DuckDB recursive reachability over the ENGINE'S OWN
  pair dump == the engine's labels. At 5M docs this answers the
  scale-critical half of the clusters oracle -- did the distributed
  alternating-star labeling compute true connected components on a
  5M-node graph? -- while full pair re-derivation stays cost-excluded
  (pair parity engine==exact is hash-verified at sf0.01/sf1 and
  spec-asserted; the pair predicates are row-pair-local, so parity
  does not degrade with corpus size).
- ENGINE_DUAL: the incremental members' declared oracle SQL is the
  family's clusters oracle VERBATIM (asserted against
  oracle_sql.json), so "incremental == full recompute" is a
  count+multiset-hash compare of the two engine dumps -- here at 5M
  docs, one decade above the sf10 record.

Scope: the minhash and simhash families only. The edit family's pair
stage is documented local-parallelism-bound at sf100 (EDIT_CELLS_r18:
6.08B-cell max; SCALE.md), and the embed family needs the embeddings
table, which the documents-only sf100 directory does not carry.

Usage: sf100_reach.py <sfDir> <outDir> <out_json> [timeout_sec]
  <outDir> must hold `graft.Verify <sfDir> <outDir> <names...>` dumps
  for every query named in CHECKS/DUALS.
"""
import json
import os
import sys
import threading

import duckdb

CHECKS = {
    "q_dedup_clusters":
        ("q_dedup_minhash", "id_a", "id_b", "documents", "doc_id"),
    "q_simhash_clusters":
        ("q_simhash_pairs", "doc_id_a", "doc_id_b", "documents",
         "doc_id"),
}

DUALS = {
    "q_dedup_incremental": "q_dedup_clusters",
    "q_simhash_incremental": "q_simhash_clusters",
}


def run_with_timeout(con, sql, timeout):
    timer = threading.Timer(timeout, con.interrupt)
    timer.start()
    try:
        return con.execute(sql)
    finally:
        timer.cancel()


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 1800.0
    con = duckdb.connect()
    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_fail = 0

    for name, (pairs, pa, pb, ntable, ncol) in sorted(CHECKS.items()):
        if not (os.path.exists(f"{out_dir}/{name}")
                and os.path.exists(f"{out_dir}/{pairs}")):
            results[name] = {"status": "reach_skipped_no_dump",
                             "detail": f"needs dumps of {name} and"
                                       f" {pairs}"}
            n_fail += 1
            print(f"FAIL {name}: missing dump", flush=True)
            continue
        try:
            n_pairs = con.execute(
                f"SELECT count(*) FROM '{out_dir}/{pairs}/*.parquet'"
            ).fetchone()[0]
            reach_sql = f"""WITH RECURSIVE jp AS (
  SELECT "{pa}" AS pa, "{pb}" AS pb
  FROM '{out_dir}/{pairs}/*.parquet'),
e AS (SELECT pa AS a, pb AS b FROM jp UNION ALL SELECT pb, pa FROM jp),
reach AS (
  SELECT {ncol} AS node, {ncol} AS r FROM {ntable}
  UNION
  SELECT e.a, reach.r FROM reach JOIN e ON reach.node = e.b)
SELECT node AS {ncol}, min(r) AS cluster_id, (min(r) = node) AS is_kept
FROM reach GROUP BY node"""
            cols_s = sorted(d[0] for d in con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
                " LIMIT 0").description)
            csv = ", ".join(f'"{c}"' for c in cols_s)
            probe = f"SELECT count(*), sum(hash({csv})::HUGEINT) FROM "
            dn, dh = run_with_timeout(
                con, probe + f"({reach_sql})", timeout).fetchone()
            sn, sh = run_with_timeout(
                con, probe + f"'{out_dir}/{name}/*.parquet'",
                timeout).fetchone()
            if dn == sn and dh == sh:
                results[name] = {
                    "status": "reach_ok_given_engine_pairs",
                    "rows": int(sn), "pair_rows": int(n_pairs),
                    "method": "DuckDB recursive reachability over the"
                              f" engine's {pairs} dump == the engine's"
                              " labels at 5M docs (pair parity is"
                              " hash-verified at sf0.01/sf1)"}
                print(f"OK   {name}: reach over {pairs}"
                      f" ({sn} rows, {n_pairs} pairs)", flush=True)
            else:
                results[name] = {
                    "status": "fail",
                    "detail": f"reachability over {pairs} != labels:"
                              f" n={sn}/{dn} h={sh}/{dh}"}
                n_fail += 1
                print(f"FAIL {name}: reach mismatch", flush=True)
        except Exception as e:
            results[name] = {"status": "error", "detail": str(e)[:400]}
            n_fail += 1
            print(f"ERROR {name}: {str(e)[:200]}", flush=True)

    for name, dual in sorted(DUALS.items()):
        if oracle.get(name) != oracle.get(dual):
            results[name] = {"status": "error",
                             "detail": f"dual SQL drift vs {dual}"}
            n_fail += 1
            print(f"ERROR {name}: dual SQL drift", flush=True)
            continue
        if not (os.path.exists(f"{out_dir}/{name}")
                and os.path.exists(f"{out_dir}/{dual}")):
            results[name] = {"status": "no_dump",
                             "detail": f"needs dumps of {name} and"
                                       f" {dual}"}
            n_fail += 1
            print(f"FAIL {name}: missing dump", flush=True)
            continue
        try:
            def probe_of(d):
                cols = sorted(c[0] for c in con.execute(
                    f"SELECT * FROM '{out_dir}/{d}/*.parquet'"
                    " LIMIT 0").description)
                csv = ", ".join(f'"{c}"' for c in cols)
                return cols, con.execute(
                    f"SELECT count(*), sum(hash({csv})::HUGEINT)"
                    f" FROM '{out_dir}/{d}/*.parquet'").fetchone()
            (ca, (na, ha)) = probe_of(name)
            (cb, (nb, hb)) = probe_of(dual)
            if ca == cb and na == nb and ha == hb:
                results[name] = {
                    "status": "ok_engine_dual", "rows": int(na),
                    "method": f"engine_dual(multiset_hash == {dual}"
                              " at 5M docs)"}
                print(f"OK   {name}: {na} rows == {dual}", flush=True)
            else:
                results[name] = {
                    "status": "fail",
                    "detail": f"!= {dual}: n={na}/{nb} h={ha}/{hb}"}
                n_fail += 1
                print(f"FAIL {name}: dual mismatch", flush=True)
        except Exception as e:
            results[name] = {"status": "error", "detail": str(e)[:400]}
            n_fail += 1
            print(f"ERROR {name}: {str(e)[:200]}", flush=True)

    summary = {"sf": sf_dir, "n_docs": int(n_docs),
               "method": "decade-3 reachability + engine-dual over"
                         " graft.Verify dumps (scope note in script"
                         " docstring)",
               "timeout_sec": timeout,
               "reach_ok": sum(1 for r in results.values()
                               if r["status"]
                               == "reach_ok_given_engine_pairs"),
               "ok_engine_dual": sum(1 for r in results.values()
                                     if r["status"] == "ok_engine_dual"),
               "fail_or_error": n_fail}
    results["_summary"] = summary
    json.dump(results, open(out_json, "w"), indent=1, sort_keys=True)
    print(json.dumps(summary), flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
