#!/usr/bin/env python3
"""Anchor-normalized round-over-round bench comparison (r12 verdict
item 4 — the anchors shipped in r12; this closes the loop by producing
the committed table the reading rule in BASELINE.md describes).

Usage: python3 tools/anchor_compare.py <BENCH_FULL_prev.json> <BENCH_FULL_cur.json>

Prints a markdown fragment: anchor ratios, raw + normalized totals over
the common query set, and the top movers AFTER normalization (the
residual the anchors attribute to code, not machine).
"""
import json
import sys


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    prev = json.load(open(sys.argv[1]))
    cur = json.load(open(sys.argv[2]))
    pa, ca = dict(prev["anchor"]), dict(cur["anchor"])
    # r19 (r18 lesson, BASELINE.md "anchor-based r17->r18"): when BOTH
    # artifacts carry pass_anchors, normalize by the PASS-median cpu
    # probe, not the single start anchor -- r18's start anchors read
    # 0.76x of clean while their own pass series sat flat higher, and
    # start-vs-pass are systematically different measurements that must
    # never be cross-normalized. Start anchors remain the fallback for
    # links whose older side predates the instrument.
    basis = "start anchor"
    if prev.get("pass_anchors", {}).get("cpu_sec") \
            and cur.get("pass_anchors", {}).get("cpu_sec"):
        pa["cpu_sec"] = median(prev["pass_anchors"]["cpu_sec"])
        ca["cpu_sec"] = median(cur["pass_anchors"]["cpu_sec"])
        basis = "pass-anchor median"
    print(f"_cpu normalization basis: {basis}_")
    print()
    cpu_ratio = ca["cpu_sec"] / pa["cpu_sec"]
    ov_ratio = ca["overhead_sec"] / pa["overhead_sec"]
    common = sorted(set(prev["queries"]) & set(cur["queries"]))
    tp = sum(prev["queries"][q] for q in common)
    tc = sum(cur["queries"][q] for q in common)
    print(f"| | {sys.argv[1].split('/')[-1]} | "
          f"{sys.argv[2].split('/')[-1]} | ratio |")
    print("|---|---|---|---|")
    print(f"| `anchor.overhead_sec` | {pa['overhead_sec']:.3f} | "
          f"{ca['overhead_sec']:.3f} | {ov_ratio:.2f}x |")
    print(f"| `anchor.cpu_sec` | {pa['cpu_sec']:.3f} | "
          f"{ca['cpu_sec']:.3f} | {cpu_ratio:.2f}x |")
    print(f"| common-query total (raw, {len(common)} queries) | "
          f"{tp:.1f} s | {tc:.1f} s | {tc / tp:.2f}x |")
    print(f"| common-query total (cpu-anchor-normalized) | {tp:.1f} s | "
          f"{tc / cpu_ratio:.1f} s | {tc / tp / cpu_ratio:.2f}x |")
    print()
    movers = sorted(
        ((cur["queries"][q] / cpu_ratio - prev["queries"][q], q)
         for q in common
         if prev["queries"][q] > 0.15 or cur["queries"][q] > 0.15),
        key=lambda t: t[0])
    rows = [m for m in movers if abs(m[0]) >= 0.3]
    if rows:
        print("| query | prev s | cur s (normalized) | delta |")
        print("|---|---|---|---|")
        for d, q in rows:
            print(f"| `{q}` | {prev['queries'][q]:.2f} | "
                  f"{cur['queries'][q] / cpu_ratio:.2f} | {d:+.2f} |")
    else:
        print("No query moved by >= 0.3 s after normalization.")


if __name__ == "__main__":
    main()
