#!/usr/bin/env python3
"""Turn a compare_oracle.py log over the ScaleGen 10x dataset into the
committed CORRECTNESS_SF1_r{N}.json artifact (builder tooling only).

Usage: python3 tools/sf1_artifact.py <compare_log> <out_json>

Statuses:
  ok              — hash-exact match against the DuckDB oracle at sf1
  contract_scoped — documented-regime divergence (listed explicitly
                    below with its reason; anything not listed that
                    fails is a real failure and exits nonzero)
"""
import json
import re
import sys

# Queries whose oracle contract is explicitly regime-bound and whose
# sf1 corpus leaves that regime (see the SparkEntry oracle comments).
CONTRACT_SCOPED = {
    "q_heavy_hitters": (
        "exact-regime contract: MG sketch counters are exact only while "
        "vocabulary <= capacity; ScaleGen token suffixing grows the "
        "vocabulary 10x past it — expected undercount; the exact "
        "two-pass dual q_heavy_hitters_verified is ok at sf1"),
    "q_heavy_hitters_by_lang": (
        "same exact-regime contract as q_heavy_hitters, per lang"),
}


def expected_divergence(line):
    """Does a FAIL line match the Misra-Gries exact-regime contract's
    predicted shape?  The sketch leaving its exact regime UNDERCOUNTS:
    hitters drop below threshold (row-count mismatch), an `est` cell
    comes in LOW on the spark side, or a different `token`/`lang`
    surfaces at a rank the undercount reordered.  A schema (columns)
    mismatch or an execution ERROR is never that contract — a real
    regression must not hide behind the scoped label."""
    m = re.match(r"FAIL\s+\S+: row count spark=(\d+) duck=(\d+)", line)
    if m:
        # the MG contract only ever DROPS hitters below threshold —
        # a spark-side overcount is a regression, never the contract
        return int(m.group(1)) < int(m.group(2))
    m = re.match(
        r"FAIL\s+\S+: row \d+ col (\w+): spark=(\S+) duck=(\S+)", line)
    if not m:
        return False
    col, s, d = m.group(1), m.group(2), m.group(3)
    if col in ("token", "lang"):
        return True
    if col == "est":
        try:
            return int(s) < int(d)  # undercount direction only
        except ValueError:
            return False
    return False


def main():
    log_path, out_path = sys.argv[1], sys.argv[2]
    results, unexplained = {}, []
    for line in open(log_path):
        m = re.match(r"OK\s+(\S+): (\d+) rows", line)
        if m:
            results[m.group(1)] = {"status": "ok",
                                   "rows": int(m.group(2))}
            continue
        m = re.match(r"(FAIL|ERROR)\s+(\S+):", line)
        if m:
            name = m.group(2)
            if name in CONTRACT_SCOPED and expected_divergence(line):
                # ADVICE r12: grant contract_scoped ONLY to the failure
                # shape the contract predicts (an MG undercount moves
                # row counts or est/token cells — never the schema, and
                # never an execution ERROR), and keep the raw detail so
                # the artifact shows WHAT diverged, not just that
                # something did.
                results[name] = {"status": "contract_scoped",
                                 "reason": CONTRACT_SCOPED[name],
                                 "detail": line.strip()}
            else:
                results[name] = {"status": "fail",
                                 "detail": line.strip()}
                unexplained.append(name)
    ok = sum(1 for v in results.values() if v["status"] == "ok")
    scoped = sum(1 for v in results.values()
                 if v["status"] == "contract_scoped")
    out = {
        "sf": "tmp/sf1 (ScaleGen 10x of driver sf0.1, deterministic)",
        "summary": {"ok": ok, "contract_scoped": scoped,
                    "fail": len(unexplained)},
        "queries": dict(sorted(results.items())),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"{out_path}: {ok} ok, {scoped} contract_scoped, "
          f"{len(unexplained)} fail")
    sys.exit(1 if unexplained else 0)


if __name__ == "__main__":
    main()
