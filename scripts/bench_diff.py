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

Control-band adjudication (`--controls=q_a,q_b,...`, r16 — mechanizes
the r15 house method): name 3+ presumed-healthy queries measured in
the SAME run; their run/floor ratios form the band [min, max] of what
plain external load did to healthy code in that window. Each flagged
query's own ratio is then classified INSIDE the band (consistent with
load — the flag does not distinguish the query from healthy controls)
or OUTSIDE it (escapes the load explanation — genuine plan/code
suspect). Controls must be queries with stable floors and untouched
code; pick from different families than the flags so a family-wide
regression cannot hide inside its own band.
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
    # Normalize numerically: Bench writes cpus as a JSON number, but a
    # hand-written or external artifact may carry "32" or 32.0 — {"32",
    # 32, 32.0} must not trigger a spurious cross-config refusal
    # (ADVICE r16: str() alone still split 32 vs 32.0). Non-numeric
    # stamps fall back to their string form.
    def canon_cpus(v):
        # Only collapse INTEGRAL floats ({"32", 32, 32.0} -> "32"):
        # truncating a fractional stamp (cpus=32.9) would silently
        # bypass the cross-config refusal this guard exists to enforce
        # (ADVICE r17) -- non-integral values keep their string form
        # and refuse against 32.
        try:
            f = float(v)
            return str(int(f)) if f.is_integer() else str(v)
        except (TypeError, ValueError):
            return str(v)
    stamped = [(p, canon_cpus(d["cpus"])) for p, d in docs if "cpus" in d]
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


def adjudicate_controls(old, new, controls, flags, persistent):
    """Classify each flagged query's run/floor ratio against the band
    of ratios the named control queries show in the SAME run. Controls
    are EXPECTED to exceed the report threshold on a loaded run (that
    is what the band measures), so plain-regression overlap is fine —
    they simply define the band instead of being classified. A control
    that is PERSISTENT is a contradiction (persistent = suspect until
    proven) and errors out. Returns the set of flags that escape the
    band (genuine suspects)."""
    missing = [c for c in controls if c not in old or c not in new]
    if missing:
        raise SystemExit(f"ERROR: control query(ies) {missing} absent from "
                         f"baseline or run — controls must be measured in "
                         f"the same run they adjudicate")
    bad_floor = [c for c in controls if old[c] <= 0]
    if bad_floor:
        raise SystemExit(f"ERROR: control query(ies) {bad_floor} have a "
                         f"non-positive floor")
    suspect_controls = sorted(set(controls) & set(persistent))
    if suspect_controls:
        raise SystemExit(f"ERROR: {suspect_controls} are PERSISTENT flags — "
                         f"a standing suspect cannot serve as a control")
    flags = set(flags) - set(controls)
    ratios = {c: new[c] / old[c] for c in controls}
    band_lo, band_hi = min(ratios.values()), max(ratios.values())
    print(f"control band: {band_lo:.2f}-{band_hi:.2f}x "
          f"({len(controls)} controls: "
          + ", ".join(f"{c}={ratios[c]:.2f}x" for c in sorted(controls)) + ")")
    outside = set()
    for q in sorted(flags):
        if q not in old or q not in new or old[q] <= 0:
            continue
        r = new[q] / old[q]
        if r <= band_hi:
            print(f"  {q}: {r:.2f}x INSIDE band -> consistent with load")
        else:
            outside.add(q)
            print(f"  {q}: {r:.2f}x OUTSIDE band (> {band_hi:.2f}x) -> "
                  f"escapes the load explanation; genuine suspect")
    if flags and not outside:
        print("control verdict: all flags inside band -> load")
    elif outside:
        print(f"control verdict: {len(outside)} flag(s) escape the band: "
              f"{sorted(outside)}")
    return outside


def main(old_path, new_paths, pct=25.0, gate=False, controls=None):
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
    if controls:
        # classify only gate-relevant flags (>pct AND >0.3s absolute):
        # a 60% swing on a 0.1s query is scheduler noise, and classifying
        # it buries the real suspects in milliseconds-deep "escapes"
        flags = {q for _, q in regressions if new[q] - old[q] > 0.3} | persistent
        adjudicate_controls(old, new, controls, flags, persistent)
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
    controls = None
    args = []
    for a in sys.argv[1:]:
        if a == "--gate":
            continue
        if a.startswith("--controls="):
            controls = [c for c in a[len("--controls="):].split(",") if c]
            if not controls:
                raise SystemExit("ERROR: --controls= needs a comma-separated "
                                 "list of query names")
            continue
        args.append(a)
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
    sys.exit(main(paths[0], paths[1:], pct, gate="--gate" in sys.argv,
                  controls=controls))
