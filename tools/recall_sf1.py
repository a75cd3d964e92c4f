#!/usr/bin/env python3
"""Measured recall of the approximate ANN queries against their exact
duals at the ScaleGen 10x scale (r12 verdict item 5 — the >= 0.9 recall
specs run at fixture scale; this computes the same number on the 20k
sf1 corpus from the Verify dumps and emits the committed artifact).

Usage: python3 tools/recall_sf1.py <verify_out_dir> <out_json>

Recall per query set = |approx top-k ∩ exact top-k| / |exact top-k|,
averaged over query ids (the standard ANN recall@k), k from the exact
dual's per-query row count.
"""
import json
import sys
from collections import defaultdict

import duckdb

PAIRS = [
    ("q_ann_ivf", "q_ann_ivf_full"),
    ("q_ann_ivf_pq", "q_ann_ivf_pq_exact"),
    ("q_hard_negatives_ivf", "q_hard_negatives_full"),
]


def topk(con, out_dir, name):
    rows = con.execute(
        f"SELECT q_id, neighbor_id FROM '{out_dir}/{name}/*.parquet'"
    ).fetchall()
    sets = defaultdict(set)
    for q, n in rows:
        sets[q].add(n)
    return sets


def main():
    out_dir, out_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    result = {}
    for approx, exact in PAIRS:
        a, e = topk(con, out_dir, approx), topk(con, out_dir, exact)
        assert set(e), f"{exact} dumped no rows"
        per_q = [len(a.get(q, set()) & e[q]) / len(e[q]) for q in e]
        result[approx] = {
            "vs": exact,
            "queries": len(per_q),
            "k": max(len(v) for v in e.values()),
            "recall": round(sum(per_q) / len(per_q), 4),
            "min_recall": round(min(per_q), 4),
        }
        print(f"{approx} vs {exact}: recall={result[approx]['recall']} "
              f"min={result[approx]['min_recall']} over {len(per_q)} queries")
    json.dump({"sf": "tmp/sf1 (ScaleGen 10x, 20k vectors)",
               "recall": result}, open(out_json, "w"), indent=1)


if __name__ == "__main__":
    main()
