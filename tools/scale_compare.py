#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1) and emit the
SCALE.md ratio table: per-query medians, scaling ratio vs the data
ratio, sorted by ratio descending so superlinear queries surface first.

Usage: scale_compare.py small.json big.json [data_ratio]
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                return json.loads(line)
            # sbt prefixes "[info] "
            if '"metric"' in line:
                return json.loads(line[line.index("{"):])
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    sq, bq = small["queries"], big["queries"]
    common = sorted(set(sq) & set(bq))
    rows = []
    for q in common:
        s, b = sq[q], bq[q]
        if s <= 0 or b <= 0:
            rows.append((float("inf"), q, s, b))
        else:
            rows.append((b / s, q, s, b))
    rows.sort(reverse=True)
    print(f"| query | {small.get('sf','small')} s | {big.get('sf','big')} s "
          f"| time ratio | vs {data_ratio:g}x data |")
    print("|---|---|---|---|---|")
    for r, q, s, b in rows:
        verdict = ("ERR" if r == float("inf") else
                   "superlinear" if r > data_ratio * 1.15 else
                   "~linear" if r > 0.5 * data_ratio else
                   "sublinear")
        print(f"| {q} | {s:.2f} | {b:.2f} | {0 if r==float('inf') else r:.1f}x"
              f" | {verdict} |")
    # r17 (VERDICT r16 "what's wrong" #1): totals sum over the COMMON
    # query set only — summing each file's full set printed an
    # apples-to-oranges headline when the two files cover different
    # query subsets (e.g. the 25-query sf10 sweep vs the full sf1 run)
    st = sum(sq[q] for q in common if sq[q] > 0)
    bt = sum(bq[q] for q in common if bq[q] > 0)
    print(f"\ntotals: {st:.1f}s -> {bt:.1f}s ({bt/st:.1f}x at "
          f"{data_ratio:g}x data) over the {len(common)} common queries")
    sa, ba = sum(v for v in sq.values() if v > 0), \
        sum(v for v in bq.values() if v > 0)
    if len(common) != len(sq) or len(common) != len(bq):
        print(f"(all-queries totals, NOT comparable across files: "
              f"small {sa:.1f}s/{len(sq)}q, big {ba:.1f}s/{len(bq)}q)")
    if small.get("errors"):
        print("small errors:", small["errors"])
    if big.get("errors"):
        print("big errors:", big["errors"])


if __name__ == "__main__":
    main()
