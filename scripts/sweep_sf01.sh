#!/usr/bin/env bash
# Full-registry oracle sweep at sf0.1 — the once-per-round scale gate.
#
# The driver only gates correctness at sf0.01; this sweep runs the SAME
# Verify + DuckDB hash-compare against /root/testdata/sf0.1, where
# scale-dependent defects live (round 10's sweep caught an ANSI 0/0 on
# a saturated graph and a StreamRowCap slice the oracle didn't mirror —
# both invisible at sf0.01). One command so it can't be skipped:
#
#   scripts/sweep_sf01.sh
#
# Exits nonzero if any query fails to run or any oracle mismatches.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=/root/testdata/sf0.1
OUT=target/verify_sf01

echo "== Verify at $SF =="
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 \
  | grep -E "\[verify\]|^\[error\] [A-Z]" || true

echo "== DuckDB oracle compare =="
python3 scripts/check.py "$SF" "$OUT"
