#!/usr/bin/env python3
"""Turn a compare_oracle.py log over the ADVERSARIAL ScaleGen dataset
(planted 1000-doc boilerplate mega-cluster + skewed o_custkey — see
ScaleGen's adversarial mode) into the committed CORRECTNESS_ADV_r{N}
.json artifact (builder tooling only).

Usage: python3 tools/adv_artifact.py <compare_log> <out_json>

Statuses:
  ok              — hash-exact match against the DuckDB oracle
  contract_scoped — a documented guard contract's predicted divergence,
                    listed explicitly below WITH its expected failure
                    signature; a scoped query failing in any OTHER way
                    (schema mismatch, execution error, wrong-direction
                    divergence) is a real failure and exits nonzero
"""
import json
import re
import sys

# Queries whose answer contract is explicitly regime- or guard-bound on
# this dataset. Two families:
#   mg    — Misra-Gries exact-regime contract (vocabulary > capacity at
#           10x, same as the sf1 sweep): undercounts only.
#   star  — banded-LSH hot-bucket star-reduction: above the cap the
#           candidate stream is connectivity-complete, not
#           PAIR-complete, so the pair-listing output DROPS non-min
#           clique pairs (row count strictly below the oracle's full
#           listing; the clusters consumers stay exact and are NOT
#           scoped).
CONTRACT_SCOPED = {
    "q_heavy_hitters": ("mg", (
        "exact-regime contract: MG counters are exact only while "
        "vocabulary <= capacity; the 10x suffixed vocabulary leaves it "
        "— expected undercount; exact dual q_heavy_hitters_verified "
        "must be ok on this dataset")),
    "q_heavy_hitters_by_lang": ("mg",
        "same exact-regime contract as q_heavy_hitters, per lang"),
    "q_dedup_minhash_carried": ("star", (
        "hot-bucket star-reduction contract: the 1000-doc planted "
        "clique exceeds the bucket cap, so the pair listing emits the "
        "min-id star (999 edges), not C(1000,2) pairs; "
        "q_dedup_clusters must be ok on this dataset — connectivity "
        "is preserved exactly")),
    "q_dedup_minhash_joinback": ("star",
        "same star-reduction contract as q_dedup_minhash_carried"),
}

# clusters/duals that MUST be ok for the scoped rows' contracts to hold
REQUIRED_OK = ["q_heavy_hitters_verified", "q_dedup_clusters",
               "q_simhash_clusters", "q_edit_clusters"]


def expected_divergence(kind, line):
    """Match a FAIL line against the contract's predicted shape."""
    if re.match(r"FAIL\s+\S+: columns ", line) or line.startswith("ERROR"):
        return False
    m = re.match(r"FAIL\s+\S+: row count spark=(\d+) duck=(\d+)", line)
    if m:
        # both contracts only ever DROP rows on the spark side (MG: a
        # hitter undercounted below threshold; star: non-min pairs)
        return int(m.group(1)) < int(m.group(2))
    m = re.match(
        r"FAIL\s+\S+: row \d+ col (\w+): spark=(\S+) duck=(\S+)", line)
    if not m:
        return False
    col, s, d = m.group(1), m.group(2), m.group(3)
    if kind == "mg":
        if col in ("token", "lang"):
            return True
        if col == "est":
            try:
                return int(s) < int(d)  # undercount direction only
            except ValueError:
                return False
        return False
    # star: a dropped pair shifts every later row, so any id/jaccard
    # cell can diverge — but only AFTER the row sets differ, which the
    # sorted compare reports as the first differing row
    return col in ("doc_id", "dup_of", "doc_id_a", "doc_id_b",
                   "id_a", "id_b", "jaccard")


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
            if name in CONTRACT_SCOPED and \
                    expected_divergence(CONTRACT_SCOPED[name][0], line):
                results[name] = {"status": "contract_scoped",
                                 "reason": CONTRACT_SCOPED[name][1],
                                 "detail": line.strip()}
            else:
                results[name] = {"status": "fail",
                                 "detail": line.strip()}
                unexplained.append(name)
    for name in REQUIRED_OK:
        if results.get(name, {}).get("status") != "ok":
            print(f"required-ok query {name} is not ok — the scoped "
                  "contracts do not hold")
            unexplained.append(name)
    ok = sum(1 for v in results.values() if v["status"] == "ok")
    scoped = sum(1 for v in results.values()
                 if v["status"] == "contract_scoped")
    out = {
        "sf": ("tmp/sfadv (ScaleGen 10x of driver sf0.1, ADVERSARIAL: "
               "1000-doc identical-text mega-cluster + 25%-of-copies "
               "orders on one o_custkey)"),
        "summary": {"ok": ok, "contract_scoped": scoped,
                    "fail": len(set(unexplained))},
        "queries": dict(sorted(results.items())),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"{out_path}: {ok} ok, {scoped} contract_scoped, "
          f"{len(set(unexplained))} fail")
    sys.exit(1 if unexplained else 0)


if __name__ == "__main__":
    main()
