#!/usr/bin/env python3
"""Compare two bench_result.json files: per-query deltas, sorted by absolute
saving; summary totals. Usage: bench_diff.py before.json after.json [topN]"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb), key=lambda k: qb[k] - qa[k])
    print(f"before total {a['value']:.1f}s ({len(qa)} q)  "
          f"after total {b['value']:.1f}s ({len(qb)} q)  "
          f"delta {b['value'] - a['value']:+.1f}s")
    only_a = set(qa) - set(qb)
    only_b = set(qb) - set(qa)
    if only_a:
        print("missing after:", sorted(only_a))
    if only_b:
        print("new after:", sorted(only_b))
    print(f"{'query':48s} {'before':>8s} {'after':>8s} {'delta':>8s}")
    shown = common[:top // 2] + common[-top // 2:]
    for k in dict.fromkeys(shown):
        print(f"{k:48s} {qa[k]:8.2f} {qb[k]:8.2f} {qb[k] - qa[k]:+8.2f}")


if __name__ == "__main__":
    main()
