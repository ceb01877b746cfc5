#!/usr/bin/env python3
"""Compare two Bench JSON outputs per query; optionally gate on regressions.

Usage: python3 scripts/bench_diff.py old_bench.json new_bench.json [pct] [--gate]

Prints queries whose runtime changed by more than `pct` percent
(default 25), plus queries added/removed, plus totals. Bench reports
min-of-2 timings, so deltas above the threshold are signal, not noise.

With --gate, exits 1 when any shared query regressed by more than
`pct` percent AND more than 0.3 s absolute (small queries bounce by
milliseconds of scheduler noise; a 40% swing on a 50 ms query is not a
regression signal). Round workflow (see BENCHLOG.md): run the full
Bench, then `bench_diff.py bench_baseline.json target/bench.json 30
--gate`; investigate failures, then refresh bench_baseline.json with
the accepted run.
"""
import json
import sys


def main(old_path, new_path, pct=25.0, gate=False):
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
    if gate:
        gated = [(d, q) for d, q in regressions if new[q] - old[q] > 0.3]
        if gated:
            print(f"GATE FAILED: {len(gated)} regression(s) over "
                  f"{pct:.0f}% and 0.3s: {[q for _, q in gated]}")
            return 1
        print("GATE OK")
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--gate"]
    sys.exit(main(args[0], args[1],
                  float(args[2]) if len(args) > 2 else 25.0,
                  gate="--gate" in sys.argv))
