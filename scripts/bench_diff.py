#!/usr/bin/env python3
"""Compare Bench JSON outputs per query; optionally gate on regressions.

Usage: python3 scripts/bench_diff.py old_bench.json new_bench.json... [pct] [--gate]

Prints queries whose runtime changed by more than `pct` percent
(default 25), plus queries added/removed, plus totals. Bench reports
min-of-2 timings, so deltas above the threshold are signal, not noise.

With --gate, exits 1 when any shared query regressed by more than
`pct` percent AND more than 0.3 s absolute (small queries bounce by
milliseconds of scheduler noise; a 40% swing on a 50 ms query is not a
regression signal). Round workflow (see BENCHLOG.md): run the full
Bench, then `bench_diff.py bench_baseline.json target/bench.json 30
--gate`; investigate failures, then fold the accepted run via
scripts/fold_baseline.py.

PERSISTENT flags: pass EVERY accepted run of the round as additional
new-run files (`bench_diff.py baseline.json run1.json run2.json ...`).
The per-query report is against the LAST run; a query that exceeds the
flag threshold in ALL provided runs is marked PERSISTENT. Protocol
(r11 lesson — q_source_overlap carried a ~4x flag in all four accepted
runs and was mis-filed as load noise): external-load noise flags are
alphabet-scattered and differ run to run; a flag that recurs in every
run is a plan defect until a scoped re-run with 1-2 in-band control
queries proves otherwise. PERSISTENT flags therefore REQUIRE one
scoped `SPARK_GRAFT_ONLY` re-run before the round's fold is accepted,
and they fail the --gate regardless of the last run's delta.
"""
import json
import sys


def load_queries(path):
    return json.load(open(path))["queries"]


def check_config(old_path, new_paths):
    """Refuse cross-config comparison (r15): Bench stamps `cpus` (and
    shuffle_partitions) into the artifact because a judge run at the
    wrong CPU count once produced four convincing 3-4x phantom
    regressions — CPU-bound scans lose 3-4x at local[4] while the
    overhead-dominated majority runs faster there, so the total looks
    plausible and the flags look real. Comparing timings measured at
    different CPU counts is meaningless; error out instead."""
    docs = [(p, json.load(open(p))) for p in [old_path] + list(new_paths)]
    stamped = [(p, d["cpus"]) for p, d in docs if "cpus" in d]
    missing = [p for p, d in docs if "cpus" not in d]
    for p in missing:
        print(f"WARNING: {p} lacks the `cpus` field (pre-r15 artifact) — "
              f"cannot verify it was measured at the canonical CPU count")
    if len({c for _, c in stamped}) > 1:
        detail = ", ".join(f"{p}: cpus={c}" for p, c in stamped)
        raise SystemExit(
            f"ERROR: refusing cross-config comparison — artifacts disagree "
            f"on CPU count ({detail}). Per-query times at different CPU "
            f"counts are not comparable (local[4] vs local[32] swings "
            f"CPU-bound queries 3-4x both ways); re-measure at one config.")


def load_evidence(path):
    """Machine-load samples Bench records since r13: run-level
    load_start/load_end plus a per-query /proc/loadavg sample taken at
    each query's start. Absent in pre-r13 artifacts -> empty."""
    d = json.load(open(path))
    return (d.get("load_start"), d.get("load_end"), d.get("load", {}))


def flagged(old, run, pct):
    """Queries exceeding the double threshold (>pct% AND >0.3s) in run."""
    return {q for q in set(old) & set(run)
            if old[q] > 0 and (run[q] - old[q]) / old[q] * 100 > pct
            and run[q] - old[q] > 0.3}


def main(old_path, new_paths, pct=25.0, gate=False):
    check_config(old_path, new_paths)
    old = load_queries(old_path)
    runs = [load_queries(p) for p in new_paths]
    new = runs[-1]
    load_start, load_end, qload = load_evidence(new_paths[-1])
    persistent = set.intersection(*(flagged(old, r, pct) for r in runs)) \
        if len(runs) > 1 else set()
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
        mark = "  PERSISTENT" if q in persistent else ""
        la = f"  load={qload[q]:.1f}" if q in qload else ""
        print(f"SLOWER {delta:+7.1f}%  {q}: {old[q]:.2f}s -> {new[q]:.2f}s{la}{mark}")
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
    if load_start is not None:
        peak = max(qload.values()) if qload else load_start
        end = f"{load_end:.1f}" if load_end is not None else "n/a"
        print(f"machine load (1-min avg): start {load_start:.1f}, "
              f"end {end}, per-query peak {peak:.1f} "
              f"[calm < 2; this machine's external spikes hit 7-15]")
    if persistent:
        print(f"PERSISTENT flags (exceed threshold in ALL {len(runs)} runs — "
              f"NOT the load signature): {sorted(persistent)}")
        print("protocol: each requires one scoped SPARK_GRAFT_ONLY re-run "
              "with in-band controls before the fold is accepted")
    if gate:
        gated = [(d, q) for d, q in regressions if new[q] - old[q] > 0.3]
        gated_qs = {q for _, q in gated} | persistent
        if gated_qs:
            print(f"GATE FAILED: {len(gated_qs)} regression(s) over "
                  f"{pct:.0f}% and 0.3s (or persistent): {sorted(gated_qs)}")
            return 1
        print("GATE OK")
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--gate"]
    # pct is accepted ONLY as the final positional argument: anywhere
    # else, a bench file named like a number ('30') would be silently
    # consumed as the threshold and dropped from the run list.
    pct = 25.0
    if args and not args[-1].endswith(".json"):
        try:
            pct = float(args[-1])
            args = args[:-1]
        except ValueError:
            pass
    stray = [a for a in args if not a.endswith(".json")]
    numeric_stray = []
    for a in stray:
        try:
            float(a)
            numeric_stray.append(a)
        except ValueError:
            pass
    if numeric_stray:
        raise SystemExit(f"ERROR: numeric argument(s) {numeric_stray} not in "
                         f"final position — pct must be the last argument\n{__doc__}")
    paths = args
    if len(paths) < 2:
        raise SystemExit(f"ERROR: need a baseline and at least one run\n{__doc__}")
    sys.exit(main(paths[0], paths[1:], pct, gate="--gate" in sys.argv))
