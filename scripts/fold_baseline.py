#!/usr/bin/env python3
"""Fold an accepted bench run into bench_baseline.json with guards.

Usage: python3 scripts/fold_baseline.py <run.json> [--reset=q1,q2]

The baseline is the per-query MIN across accepted runs; this script is
the ONLY sanctioned way to fold, because ad-hoc folds have burned us:
a scoped-run bench.json (SPARK_GRAFT_ONLY overwrites the full run's
file) was once folded as a full run and poisoned two floors to 9 ms —
a flag the gate then raised forever. Guards:

  1. the run must cover every baseline query (a scoped run cannot
     masquerade as a full run);
  2. the run must have been measured at the canonical sf dir (a run
     JSON that lacks the `sf` key entirely is refused — old-format or
     truncated artifacts must not default to canonical);
  3. the run must report zero per-query errors (n_errors / `errors`);
  4. no floor may DROP by more than 2.5x — honest speedups land well
     inside that; a bigger drop is a wrong-scale or truncated artifact
     and must be --reset explicitly (plan changes that re-attribute
     build cost, e.g. a query moving to a staged index, list the query
     under --reset so the floor is REPLACED, not min'd).

Prints the fold summary; exits nonzero (changing nothing) on any guard
violation.
"""
import json
import sys

CANON_SF = "/root/testdata/sf0.1"
CANON_CPUS = "32"
MAX_DROP = 2.5


def parse_args(argv):
    """Returns (run_path, reset_set) or raises SystemExit with a
    message. Accepts both --reset=q1,q2 and --reset q1,q2; rejects
    unknown flags and extra positionals so a typo'd invocation cannot
    silently fold with an empty reset set."""
    reset = set()
    positional = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--reset":
            if i + 1 >= len(argv):
                raise SystemExit("ERROR: --reset requires a value")
            reset = set(argv[i + 1].split(","))
            i += 2
        elif a.startswith("--reset="):
            reset = set(a.split("=", 1)[1].split(","))
            i += 1
        elif a.startswith("--"):
            raise SystemExit(f"ERROR: unrecognized flag {a}")
        else:
            positional.append(a)
            i += 1
    if len(positional) != 1:
        raise SystemExit(
            f"ERROR: expected exactly one run.json argument, got "
            f"{positional or 'none'}\n{__doc__}")
    reset.discard("")
    return positional[0], reset


def main() -> int:
    if not sys.argv[1:]:
        print(__doc__)
        return 2
    run_path, reset = parse_args(sys.argv[1:])
    run_doc = json.load(open(run_path))
    base_doc = json.load(open("bench_baseline.json"))
    run = run_doc["queries"] if "queries" in run_doc else run_doc
    base = base_doc["queries"]

    errs = run_doc.get("errors", {})
    if errs:
        print(f"REFUSED: run reports {len(errs)} failing queries: "
              f"{sorted(errs)}")
        return 1
    if "sf" not in run_doc:
        print("REFUSED: run JSON lacks the `sf` key (old-format or "
              "truncated artifact) — cannot verify the measurement scale")
        return 1
    sf = run_doc["sf"]
    if sf != CANON_SF:
        print(f"REFUSED: run measured at {sf}, baseline is {CANON_SF}")
        return 1
    # Canonical CPU count (r15): a run measured at the wrong local[N]
    # swings CPU-bound floors 3-4x both ways — folding one would poison
    # floors exactly like a wrong-scale artifact. Bench stamps `cpus`
    # since r15; absence means an old-format artifact that cannot prove
    # its config, refused for the same reason as a missing `sf`.
    if "cpus" not in run_doc:
        print("REFUSED: run JSON lacks the `cpus` key (pre-r15 artifact) — "
              "cannot verify the measurement CPU count")
        return 1
    if str(run_doc["cpus"]) != CANON_CPUS:
        print(f"REFUSED: run measured at cpus={run_doc['cpus']}, "
              f"canonical is {CANON_CPUS}")
        return 1
    missing = sorted(set(base) - set(run))
    if missing:
        print(f"REFUSED: run lacks {len(missing)} baseline queries "
              f"(scoped run?): {missing[:5]}...")
        return 1
    unknown_reset = sorted(reset - set(run))
    if unknown_reset:
        print(f"REFUSED: --reset names queries absent from the run: "
              f"{unknown_reset}")
        return 1

    drops = sorted((base[q] / run[q], q) for q in run
                   if q in base and q not in reset
                   and run[q] > 0 and base[q] / run[q] > MAX_DROP)
    big = [(r, q) for r, q in drops if base[q] - run[q] > 0.05]
    if big:
        for r, q in big:
            print(f"SUSPECT: {q} floor {base[q]:.3f}s -> {run[q]:.3f}s "
                  f"({r:.1f}x drop)")
        print("REFUSED: floors dropping >2.5x are artifacts unless the "
              "plan changed; re-measure, or fold with --reset=<q,...>")
        return 1

    for q in reset:
        print(f"reset {q}: {base.get(q, float('nan')):.3f} -> "
              f"{run[q]:.3f} (plan change, floor replaced)")
        base[q] = run[q]
    for q, v in run.items():
        base[q] = min(base.get(q, v), v)
    base_doc["n_queries"] = len(base)
    # Keep the summary metric in lockstep with the floor map: consumers
    # of the top-level `value` (speedup ratios, reports) must read the
    # true per-query floor sum, not whatever total the last full run
    # happened to carry (r11 shipped value=96.517 vs a 103.364 sum).
    base_doc["value"] = round(sum(base.values()), 3)
    json.dump(base_doc, open("bench_baseline.json", "w"),
              indent=1, sort_keys=True)
    assert abs(base_doc["value"] - sum(base.values())) < 0.002, \
        "value field diverged from folded floor sum"
    print(f"folded {run_path}: baseline {base_doc['value']:.1f}s "
          f"/ {len(base)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
