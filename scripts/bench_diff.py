#!/usr/bin/env python3
"""Compare two Bench JSON outputs per query.

Usage: python3 scripts/bench_diff.py old_bench.json new_bench.json [pct]

Prints queries whose runtime changed by more than `pct` percent
(default 25), plus queries added/removed, plus totals. Bench reports
min-of-2 timings, so deltas above the threshold are signal, not noise.
"""
import json
import sys


def main(old_path, new_path, pct=25.0):
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    both = sorted(set(old) & set(new))
    regressions, improvements = [], []
    for q in both:
        if old[q] <= 0:
            continue
        delta = (new[q] - old[q]) / old[q] * 100
        if delta > pct:
            regressions.append((delta, q))
        elif delta < -pct:
            improvements.append((delta, q))
    for delta, q in sorted(regressions, reverse=True):
        print(f"SLOWER {delta:+7.1f}%  {q}: {old[q]:.2f}s -> {new[q]:.2f}s")
    for delta, q in sorted(improvements):
        print(f"FASTER {delta:+7.1f}%  {q}: {old[q]:.2f}s -> {new[q]:.2f}s")
    for q in sorted(set(new) - set(old)):
        print(f"NEW             {q}: {new[q]:.2f}s")
    for q in sorted(set(old) - set(new)):
        print(f"REMOVED         {q}")
    t_old, t_new = sum(old.values()), sum(new.values())
    shared_old = sum(old[q] for q in both)
    shared_new = sum(new[q] for q in both)
    print(f"total: {t_old:.2f}s -> {t_new:.2f}s "
          f"(shared queries: {shared_old:.2f}s -> {shared_new:.2f}s)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 25.0)
