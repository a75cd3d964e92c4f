#!/usr/bin/env python3
"""Second-decade (sf10) oracle sweep -> CORRECTNESS_SF10_r{N}.json
(builder tooling only; the engine itself is pure Scala/Spark).

Closes r16 verdict "what's missing" #2: the sf10 record was bench-only.
This sweep hash-verifies every oracle whose DuckDB dual stays feasible
at 60M lineitem / 500k documents, and records every exclusion with its
stated cost class -- skipped by reason, never by silence.

Method (differs from the cell-exact sf0.01/sf1 compares, by design):
results at sf10 reach 60M rows, far past fetchall()'s budget, so both
sides are compared INSIDE DuckDB -- row count + an order-insensitive
multiset hash (sum of per-row hash over the name-sorted columns, cast
HUGEINT so the sum never wraps). A row-ORDER bug cannot hide here
because the same queries are cell-exact-compared at sf0.01 every round
and at sf1 per sweep; what sf10 adds is value/cardinality verification
at the second decade. Timeouts interrupt DuckDB from a timer thread
and are recorded as measured-cost exclusions.

Usage: sf10_oracle.py <sfDir> <outDir> <out_json> [timeout_sec]
  <outDir> must hold `graft.Verify <sfDir> <outDir> <names...>` dumps
  for every query this script attempts (see ATTEMPT list logic).
"""
import json
import sys
import threading

import duckdb

# Oracles that are structurally super-linear in the corpus -- running
# them at 500k documents is hours-to-days of DuckDB, not verification.
# Every entry names its cost class; these are the SAME families whose
# exactness is anchored by oracle-green exact rides at sf0.01/sf1.
HARD_EXCLUDED = {
    # recursive reachability CTE over the O(n^2) candidate pair graph
    "q_dedup_clusters": "recursive CTE over the MinHash pair graph",
    "q_edit_clusters": "recursive CTE over the PassJoin pair graph",
    "q_simhash_clusters": "recursive CTE over the SimHash pair graph",
    "q_dedup_embed_clusters": "recursive CTE over the cosine pair graph",
    "q_pipeline_curation": "recursive dedup CTE inside the pipeline",
    "q_pipeline_multimodal": "recursive dedup CTE inside the pipeline",
    # quadratic pair sweeps / full-corpus signature brute force
    "q_jaccard_pairs": "O(n^2) shingle-set pair sweep at 500k docs",
    "q_edit_pairs": "O(n^2) levenshtein pair sweep at 500k docs",
    "q_simhash_pairs": "O(n^2) Hamming pair sweep at 500k docs",
    "q_simhash_checked":
        "per-token md5 64-bit vote re-derivation over the full corpus",
    "q_fingerprint_checked":
        "per-char rolling-hash re-derivation over the full corpus",
    "q_dedup_minhash_carried":
        "full md5 minhash signature re-derivation at 500k docs",
    "q_dedup_minhash_joinback":
        "full md5 minhash signature re-derivation at 500k docs",
    "q_dedup_embed": "O(n^2) cosine pair sweep at 200k vectors",
    "q_dedup_embed_lsh":
        "full hyperplane signature re-derivation + banded pair sweep",
}

# r19 (r18 verdict item 2): SAMPLED-ANCHOR verification for the
# cost-excluded exact baselines. Every query here is ROW-LOCAL (the
# output row depends only on its own document/vector) or PAIR-LOCAL
# (the pair predicate depends only on the two endpoints -- shingles,
# signatures, lengths, norms are all derived per item, never from
# corpus statistics), so restricting the base table to a deterministic
# id stratum and running the DECLARED oracle SQL VERBATIM yields
# exactly the full output restricted to rows whose every id sits in
# the stratum. That slice of the engine's ACTUAL sf10 dump is then
# count+multiset-hash compared against the brute force -- bounded
# evidence on the real second-decade run, where the full oracle is
# hours-to-days of DuckDB. The stratum is ~2% by md5 of the id
# (deterministic, value-independent: md5 prefix in 5 of 256 buckets
# ~ 10k of 500k docs / 4k of 200k vectors), which keeps even the
# levenshtein and cosine pair sweeps inside the DuckDB budget.
# Tuple: (base table to restrict, base id col, dump id cols).
SAMPLED_ANCHOR = {
    "q_jaccard_pairs": ("documents", "doc_id", ["id_a", "id_b"]),
    "q_dedup_minhash_carried":
        ("documents", "doc_id", ["id_a", "id_b"]),
    "q_dedup_minhash_joinback":
        ("documents", "doc_id", ["id_a", "id_b"]),
    "q_edit_pairs": ("documents", "doc_id", ["doc_id_a", "doc_id_b"]),
    "q_simhash_pairs": ("documents", "doc_id", ["doc_id_a", "doc_id_b"]),
    "q_simhash_checked": ("documents", "doc_id", ["doc_id"]),
    "q_fingerprint_checked": ("documents", "doc_id", ["doc_id"]),
    "q_dedup_embed": ("embeddings", "vec_id", ["id_a", "id_b"]),
    "q_dedup_embed_lsh": ("embeddings", "vec_id", ["id_a", "id_b"]),
}

# r19b (the last two exclusions): the composed pipelines' outputs
# carry GLOBAL connected-component labels (a doc's cluster id / kept
# flag can be decided by a pair chain through docs outside any
# stratum), so the sampled anchor cannot reach them. But their ONLY
# super-linear oracle stage is the pair-graph DERIVATION — the same
# CTEs the CLUSTERS_REACH rows replace with the engine's
# hash-verified pair dump. So the check here SPLICES the declared
# oracle SQL: the pair-derivation CTEs (shingle/cosine sweeps) are
# cut and replaced by `jp AS (SELECT ... FROM '<pair dump>')`, and
# EVERYTHING from the `e AS (` edge-expansion CTE onward — the
# recursion, every row-local stage, the gate composition, the final
# projection — runs VERBATIM from the declared SQL. Evidence chain is
# identical to CLUSTERS_REACH: full-output verification GIVEN engine
# pairs, whose parity against the exact pair predicate is
# hash-verified at sf0.01/sf1 every round. The splice is positional
# on two unique markers; a marker that is missing or ambiguous (i.e.
# the declared oracle drifted) fails LOUDLY as an error, never a
# silent downgrade.
# Tuple: (pair dump, dump col a, dump col b, cut-start marker,
#         resume marker).
PIPELINE_REACH = {
    "q_pipeline_curation":
        ("q_dedup_minhash", "id_a", "id_b",
         "sh AS (", "e AS (SELECT id_a AS a"),
    "q_pipeline_multimodal":
        ("q_dedup_embed_lsh", "id_a", "id_b",
         "base AS (", "e AS (SELECT id_a AS a"),
}

# 5/256 md5-prefix buckets ~ 1.95% of ids, deterministic and
# value-independent (same expression on base ids and dump ids).
STRATUM_PREFIXES = ("00", "01", "02", "03", "04")


def stratum_pred(col):
    inlist = ", ".join(f"'{p}'" for p in STRATUM_PREFIXES)
    return f"substr(md5(CAST({col} AS VARCHAR)), 1, 2) IN ({inlist})"

# r18 (r17 verdict item 6): the incremental/compact family members'
# contract is "probing the base index + extending labels == a FULL
# recompute over the true corpus" -- their declared oracle SQL is the
# family's clusters oracle VERBATIM (asserted below), so at sf10 the
# contract is checkable ENGINE-SIDE in O(corpus): count + multiset-hash
# compare the member's dump against the family's clusters dump in
# DuckDB, no recursive CTE. Anchor chain: this proves member == full
# engine recompute at sf10; the shared reachability oracle itself is
# value-verified against DuckDB recursion at sf0.01 (every round) and
# sf1 (per sweep). The clusters dumps stay excluded_by_cost -- the dual
# verifies the INCREMENTAL machinery (the families' hardest claim),
# not reachability re-derivation.
ENGINE_DUAL = {
    "q_dedup_incremental": "q_dedup_clusters",
    "q_dedup_compact": "q_dedup_clusters",
    "q_pipeline_nightly": "q_dedup_clusters",
    "q_simhash_incremental": "q_simhash_clusters",
    "q_simhash_compact": "q_simhash_clusters",
    "q_edit_incremental": "q_edit_clusters",
    "q_edit_compact": "q_edit_clusters",
    "q_dedup_embed_incremental": "q_dedup_embed_clusters",
    "q_dedup_embed_compact": "q_dedup_embed_clusters",
}

# r18 second half of the exclusion shrink: the clusters rows' FULL
# independent oracle (re-derive pairs + recurse) stays cost-excluded,
# but the half of it that matters most at scale -- did the distributed
# alternating-star labeling compute TRUE connected components on a
# 500k-node graph? -- is checkable in seconds: run DuckDB's recursive
# reachability over the ENGINE'S OWN pair dump (the declared pair-list
# query of the same family, no pair re-derivation) and compare the
# result against the engine's clusters dump. Evidence chain: pair
# parity engine==exact is hash-verified at sf0.01/sf1 (and
# spec-asserted); this check extends the reachability half to the
# second decade. Tuple: (pair dump, pair col a, pair col b, node
# table, node col).
CLUSTERS_REACH = {
    "q_dedup_clusters":
        ("q_dedup_minhash", "id_a", "id_b", "documents", "doc_id"),
    "q_simhash_clusters":
        ("q_simhash_pairs", "doc_id_a", "doc_id_b", "documents",
         "doc_id"),
    "q_edit_clusters":
        ("q_edit_pairs", "doc_id_a", "doc_id_b", "documents", "doc_id"),
    # the embed pair graph is empty on the healthy corpora (planted
    # cosines sit below the 0.8 threshold), so this degenerates to the
    # identity labeling -- still catches dropped or spurious rows
    "q_dedup_embed_clusters":
        ("q_dedup_embed_lsh", "id_a", "id_b", "embeddings", "vec_id"),
}

# The Misra-Gries exact-regime contract (same scoping as the sf1
# artifact): ScaleGen token suffixing grows the vocabulary past the
# sketch capacity, so the sketch UNDERCOUNTS by contract. The exact
# two-pass dual q_heavy_hitters_verified stays attempted and must pass.
CONTRACT_SCOPED = {
    "q_heavy_hitters": (
        "exact-regime contract: MG sketch counters are exact only while"
        " vocabulary <= capacity; the sf10 vocabulary is 100x past it"),
    "q_heavy_hitters_by_lang": (
        "same exact-regime contract as q_heavy_hitters, per lang"),
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
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 300.0
    con = duckdb.connect()
    import os
    table_path = {}
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        table_path[t] = path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in ENGINE_DUAL:
            dual = ENGINE_DUAL[name]
            # the dual is only valid while the two declared oracles are
            # the SAME statement -- any drift must fail loudly, not
            # silently weaken the check
            if oracle.get(dual) != sql:
                results[name] = {
                    "status": "error",
                    "detail": f"engine-dual contract drift: oracle SQL"
                              f" of {name} != {dual}"}
                n_fail += 1
                print(f"ERROR {name}: dual SQL drift vs {dual}",
                      flush=True)
                continue
            if not (os.path.exists(f"{out_dir}/{name}")
                    and os.path.exists(f"{out_dir}/{dual}")):
                results[name] = {"status": "no_dump",
                                 "detail": f"needs dumps of both {name}"
                                           f" and {dual}"}
                n_fail += 1
                continue
            try:
                def probe_of(d):
                    cols = sorted(d[0] for d in con.execute(
                        f"SELECT * FROM '{out_dir}/{d}/*.parquet'"
                        " LIMIT 0").description)
                    csv = ", ".join(f'"{c}"' for c in cols)
                    return cols, con.execute(
                        f"SELECT count(*), sum(hash({csv})::HUGEINT)"
                        f" FROM '{out_dir}/{d}/*.parquet'").fetchone()
                (ca, (na, ha)) = probe_of(name)
                (cb, (nb, hb)) = probe_of(dual)
                if ca == cb and na == nb and ha == hb:
                    # r19 (ADVICE r18): distinct status -- these are
                    # engine-self-consistency checks, not independent
                    # DuckDB verification; consumers filtering on
                    # status=='ok' must not overstate the latter
                    results[name] = {
                        "status": "ok_engine_dual", "rows": int(na),
                        "method": f"engine_dual(multiset_hash == {dual};"
                                  " shared clusters oracle is"
                                  " cell-exact-verified at sf0.01/sf1)"}
                    print(f"OK   {name}: {na} rows == {dual}", flush=True)
                else:
                    results[name] = {
                        "status": "fail",
                        "detail": f"engine dual mismatch vs {dual}:"
                                  f" n={na}/{nb} h={ha}/{hb}"
                                  f" cols={ca}/{cb}"}
                    n_fail += 1
                    print(f"FAIL {name}: != {dual}", flush=True)
            except Exception as e:
                results[name] = {"status": "error", "detail": str(e)[:400]}
                n_fail += 1
                print(f"ERROR {name}: {str(e)[:200]}", flush=True)
            continue
        if name in CLUSTERS_REACH:
            pairs, pa, pb, ntable, ncol = CLUSTERS_REACH[name]
            if not (os.path.exists(f"{out_dir}/{name}")
                    and os.path.exists(f"{out_dir}/{pairs}")):
                # r19 (ADVICE r18): a missing dump must be LOUD, not a
                # silent downgrade to excluded_by_cost -- a run that
                # forgot to dump the pair query would otherwise lose
                # the reachability check with exit 0 (asymmetric with
                # the ENGINE_DUAL branch's no_dump failure)
                results[name] = {"status": "reach_skipped_no_dump",
                                 "detail": f"reach check needs dumps of"
                                           f" both {name} and {pairs}"}
                n_fail += 1
                print(f"FAIL {name}: reach skipped, missing dump of"
                      f" {name} or {pairs}", flush=True)
                continue
            try:
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
                probe = (f"SELECT count(*), sum(hash({csv})::HUGEINT)"
                         " FROM ")
                dn, dh = run_with_timeout(
                    con, probe + f"({reach_sql})", timeout).fetchone()
                sn, sh = run_with_timeout(
                    con, probe + f"'{out_dir}/{name}/*.parquet'",
                    timeout).fetchone()
                if dn == sn and dh == sh:
                    results[name] = {
                        "status": "reach_ok_given_engine_pairs",
                        "rows": int(sn),
                        "method": f"DuckDB recursive reachability over"
                                  f" the engine's {pairs} dump =="
                                  f" the engine's labels (pair parity"
                                  f" is hash-verified at sf0.01/sf1;"
                                  f" full pair re-derivation stays"
                                  f" cost-excluded:"
                                  f" {HARD_EXCLUDED[name]})"}
                    print(f"OK   {name}: reach over {pairs}"
                          f" ({sn} rows)", flush=True)
                else:
                    results[name] = {
                        "status": "fail",
                        "detail": f"reachability over {pairs} !="
                                  f" engine labels: n={sn}/{dn}"
                                  f" h={sh}/{dh}"}
                    n_fail += 1
                    print(f"FAIL {name}: reach mismatch", flush=True)
            except Exception as e:
                msg = str(e)
                if "INTERRUPT" in msg.upper():
                    results[name] = {
                        "status": "excluded_by_cost",
                        "reason": HARD_EXCLUDED[name] +
                        f" (reach check also exceeded the"
                        f" {timeout:.0f}s budget)"}
                    print(f"TIMEOUT {name} (reach)", flush=True)
                else:
                    results[name] = {"status": "error",
                                     "detail": msg[:400]}
                    n_fail += 1
                    print(f"ERROR {name}: {msg[:200]}", flush=True)
            continue
        if name in SAMPLED_ANCHOR:
            table, id_col, dump_ids = SAMPLED_ANCHOR[name]
            if not os.path.exists(f"{out_dir}/{name}"):
                results[name] = {
                    "status": "sampled_skipped_no_dump",
                    "detail": f"sampled-anchor check needs the sf10"
                              f" dump of {name}"}
                n_fail += 1
                print(f"FAIL {name}: sampled anchor skipped, missing"
                      f" dump", flush=True)
                continue
            try:
                cols_s = sorted(d[0] for d in con.execute(
                    f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
                    " LIMIT 0").description)
                csv = ", ".join(f'"{c}"' for c in cols_s)
                probe = (f"SELECT count(*), sum(hash({csv})::HUGEINT)"
                         " FROM ")
                n_stratum = con.execute(
                    f"SELECT count(*) FROM '{table_path[table]}'"
                    f" WHERE {stratum_pred(id_col)}").fetchone()[0]
                # restrict the base table to the stratum and run the
                # DECLARED oracle SQL verbatim (row/pair-local:
                # restrict-then-derive == derive-then-restrict);
                # restore the view before anything else runs
                con.execute(
                    f"CREATE OR REPLACE VIEW {table} AS SELECT * FROM"
                    f" '{table_path[table]}'"
                    f" WHERE {stratum_pred(id_col)}")
                try:
                    dn, dh = run_with_timeout(
                        con, probe + f"({sql})", timeout).fetchone()
                finally:
                    con.execute(
                        f"CREATE OR REPLACE VIEW {table} AS SELECT *"
                        f" FROM '{table_path[table]}'")
                where = " AND ".join(
                    stratum_pred(f'"{c}"') for c in dump_ids)
                sn, sh = run_with_timeout(
                    con, probe + f"(SELECT * FROM"
                    f" '{out_dir}/{name}/*.parquet'"
                    f" WHERE {where})", timeout).fetchone()
                if dn == sn and dh == sh:
                    results[name] = {
                        "status": "ok_sampled_anchor",
                        "stratum_rows": int(n_stratum),
                        "slice_rows": int(sn),
                        "method": f"engine sf10 dump sliced to the"
                                  f" md5[:2] in {list(STRATUM_PREFIXES)}"
                                  f" id stratum of {table}"
                                  f" ({n_stratum} ids) == declared"
                                  f" oracle SQL run verbatim on the"
                                  f" stratum-restricted {table}"
                                  f" (valid because the output is"
                                  f" row/pair-local); the FULL oracle"
                                  f" stays cost-excluded:"
                                  f" {HARD_EXCLUDED[name]}"}
                    print(f"OK   {name}: sampled anchor, {sn} slice"
                          f" rows over {n_stratum} stratum ids",
                          flush=True)
                else:
                    results[name] = {
                        "status": "fail",
                        "detail": f"sampled-anchor mismatch: engine"
                                  f" slice n={sn} h={sh}; stratum"
                                  f" brute force n={dn} h={dh}"
                                  f" (stratum {n_stratum} ids)"}
                    n_fail += 1
                    print(f"FAIL {name}: sampled anchor n {sn} vs"
                          f" {dn}", flush=True)
            except Exception as e:
                msg = str(e)
                if "INTERRUPT" in msg.upper():
                    results[name] = {
                        "status": "excluded_by_cost",
                        "reason": HARD_EXCLUDED[name] +
                        f" (the ~2% sampled anchor also exceeded the"
                        f" {timeout:.0f}s budget)"}
                    print(f"TIMEOUT {name} (sampled anchor)",
                          flush=True)
                else:
                    results[name] = {"status": "error",
                                     "detail": msg[:400]}
                    n_fail += 1
                    print(f"ERROR {name}: {msg[:200]}", flush=True)
            continue
        if name in PIPELINE_REACH:
            dump, pa, pb, cut_marker, resume_marker = PIPELINE_REACH[name]
            if not (os.path.exists(f"{out_dir}/{name}")
                    and os.path.exists(f"{out_dir}/{dump}")):
                results[name] = {"status": "reach_skipped_no_dump",
                                 "detail": f"pipeline reach check needs"
                                           f" dumps of both {name} and"
                                           f" {dump}"}
                n_fail += 1
                print(f"FAIL {name}: pipeline reach skipped, missing"
                      f" dump of {name} or {dump}", flush=True)
                continue
            if (sql.count(cut_marker) != 1
                    or sql.count(resume_marker) != 1
                    or sql.index(cut_marker) >= sql.index(resume_marker)):
                results[name] = {
                    "status": "error",
                    "detail": f"splice markers drifted in the declared"
                              f" oracle SQL of {name}: need exactly one"
                              f" '{cut_marker}' before one"
                              f" '{resume_marker}'"}
                n_fail += 1
                print(f"ERROR {name}: splice marker drift", flush=True)
                continue
            spliced = (
                sql[:sql.index(cut_marker)]
                + f"jp AS (SELECT \"{pa}\" AS id_a, \"{pb}\" AS id_b"
                  f" FROM '{out_dir}/{dump}/*.parquet'),\n"
                + sql[sql.index(resume_marker):])
            try:
                cols_s = sorted(d[0] for d in con.execute(
                    f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
                    " LIMIT 0").description)
                csv = ", ".join(f'"{c}"' for c in cols_s)
                probe = (f"SELECT count(*), sum(hash({csv})::HUGEINT)"
                         " FROM ")
                dn, dh = run_with_timeout(
                    con, probe + f"({spliced})", timeout).fetchone()
                sn, sh = run_with_timeout(
                    con, probe + f"'{out_dir}/{name}/*.parquet'",
                    timeout).fetchone()
                if dn == sn and dh == sh:
                    results[name] = {
                        "status": "reach_ok_given_engine_pairs",
                        "rows": int(sn),
                        "method": f"declared oracle SQL with the"
                                  f" pair-derivation CTEs spliced out"
                                  f" for the engine's {dump} dump"
                                  f" (recursion + every row-local stage"
                                  f" + gate composition run VERBATIM)"
                                  f" == the engine's full output (pair"
                                  f" parity is hash-verified at"
                                  f" sf0.01/sf1; full pair"
                                  f" re-derivation stays cost-excluded:"
                                  f" {HARD_EXCLUDED[name]})"}
                    print(f"OK   {name}: pipeline reach over {dump}"
                          f" ({sn} rows)", flush=True)
                else:
                    results[name] = {
                        "status": "fail",
                        "detail": f"spliced oracle over {dump} !="
                                  f" engine output: n={sn}/{dn}"
                                  f" h={sh}/{dh}"}
                    n_fail += 1
                    print(f"FAIL {name}: pipeline reach mismatch",
                          flush=True)
            except Exception as e:
                msg = str(e)
                if "INTERRUPT" in msg.upper():
                    results[name] = {
                        "status": "excluded_by_cost",
                        "reason": HARD_EXCLUDED[name] +
                        f" (the pair-dump-spliced form also exceeded"
                        f" the {timeout:.0f}s budget)"}
                    print(f"TIMEOUT {name} (pipeline reach)",
                          flush=True)
                else:
                    results[name] = {"status": "error",
                                     "detail": msg[:400]}
                    n_fail += 1
                    print(f"ERROR {name}: {msg[:200]}", flush=True)
            continue
        if name in HARD_EXCLUDED:
            results[name] = {"status": "excluded_by_cost",
                             "reason": HARD_EXCLUDED[name]}
            continue
        if name in CONTRACT_SCOPED:
            results[name] = {"status": "contract_scoped",
                             "reason": CONTRACT_SCOPED[name]}
            continue
        if not os.path.exists(f"{out_dir}/{name}"):
            results[name] = {"status": "no_dump"}
            n_fail += 1
            continue
        try:
            # schema first (cheap LIMIT 0 probes)
            cols_d = [d[0] for d in con.execute(
                f"SELECT * FROM ({sql}) LIMIT 0").description]
            cols_s = [d[0] for d in con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0")
                .description]
            if sorted(cols_s) != sorted(cols_d):
                results[name] = {
                    "status": "fail",
                    "detail": f"columns spark={sorted(cols_s)}"
                              f" duck={sorted(cols_d)}"}
                n_fail += 1
                print(f"FAIL {name}: schema", flush=True)
                continue
            cols = ", ".join(f'"{c}"' for c in sorted(cols_s))
            probe = (
                f"SELECT count(*) AS n,"
                f" sum(hash({cols})::HUGEINT) AS h FROM ")
            dn, dh = run_with_timeout(
                con, probe + f"({sql})", timeout).fetchone()
            sn, sh = run_with_timeout(
                con, probe + f"'{out_dir}/{name}/*.parquet'",
                timeout).fetchone()
            if dn == sn and dh == sh:
                results[name] = {"status": "ok", "rows": int(sn),
                                 "method": "multiset_hash"}
                n_ok += 1
                print(f"OK   {name}: {sn} rows", flush=True)
            else:
                results[name] = {
                    "status": "fail",
                    "detail": f"spark n={sn} h={sh};"
                              f" duck n={dn} h={dh}"}
                n_fail += 1
                print(f"FAIL {name}: n {sn} vs {dn}", flush=True)
        except Exception as e:
            msg = str(e)
            if "INTERRUPT" in msg.upper():
                results[name] = {
                    "status": "excluded_by_cost",
                    "reason": f"oracle exceeded the {timeout:.0f}s"
                              " DuckDB budget at sf10 (measured)"}
                print(f"TIMEOUT {name}", flush=True)
            else:
                results[name] = {"status": "error", "detail": msg[:400]}
                n_fail += 1
                print(f"ERROR {name}: {msg[:200]}", flush=True)
    summary = {
        "sf": sf_dir, "method": "count + order-insensitive multiset "
        "hash in DuckDB (cell-exact compares live in the sf0.01/sf1 "
        "artifacts)", "timeout_sec": timeout,
        # r19 (ADVICE r18): "ok" now counts ONLY independently
        # DuckDB-verified queries; engine-dual passes carry their own
        # status + counter instead of aliasing into ok
        "ok": n_ok, "fail_or_error": n_fail,
        "ok_engine_dual": sum(
            1 for r in results.values()
            if r["status"] == "ok_engine_dual"),
        "ok_sampled_anchor": sum(
            1 for r in results.values()
            if r["status"] == "ok_sampled_anchor"),
        "reach_ok_given_engine_pairs": sum(
            1 for r in results.values()
            if r["status"] == "reach_ok_given_engine_pairs"),
        "excluded_by_cost": sum(1 for r in results.values()
                                if r["status"] == "excluded_by_cost"),
        "contract_scoped": sum(1 for r in results.values()
                               if r["status"] == "contract_scoped"),
    }
    with open(out_json, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1,
                  sort_keys=True)
    print(json.dumps(summary))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
