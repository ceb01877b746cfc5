#!/usr/bin/env python3
"""Leak scanner: greps the repo's own sources for categories of
non-public residue (internal imports/URLs/buckets, chat links, API keys,
suspicious env vars) and writes LEAKCHECK.json with run provenance
(commit + UTC timestamp) so each round's artifact proves a fresh scan.

Usage: python3 scripts/leakcheck.py [round_number]
"""
import datetime
import json
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

# Category -> regex. Patterns are deliberately generic shapes, not
# specific names: the scanner must not itself introduce what it hunts.
PATTERNS = {
    "internal-import": re.compile(
        r"^\s*import\s+[\w.]*\binternal\b[\w.]*", re.M),
    "internal-url": re.compile(
        r"https?://[\w.-]*\.(?:corp|internal|intranet)\b[\w./-]*"),
    "internal-pkg2": re.compile(
        r"[\w-]+-internal\b"),
    "internal-bucket": re.compile(
        r"(?:s3|gs|abfss?)://[\w.-]*(?:internal|private|corp)[\w.-]*"),
    "slack-link": re.compile(
        r"slack\.com/archives|app\.slack\.com"),
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{36})\b"),
    "axon-env": re.compile(
        r"\bAXON_[A-Z_]+\b"),
}

SCAN_GLOBS = ["src/**/*.scala", "scripts/*.py", "build.sbt",
              "README.md", "ARCHITECTURE.md", "COVERAGE.md", "BENCHLOG.md"]


def main(round_no):
    hits = {k: [] for k in PATTERNS}
    for g in SCAN_GLOBS:
        for p in sorted(ROOT.glob(g)):
            text = p.read_text(errors="replace")
            for cat, rx in PATTERNS.items():
                for m in rx.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits[cat].append(
                        f"{p.relative_to(ROOT)}:{line}:{m.group(0)[:80]}")
    commit = subprocess.run(
        ["git", "-C", str(ROOT), "rev-parse", "HEAD"],
        capture_output=True, text=True).stdout.strip()
    out = {
        "round": round_no,
        "commit": commit,
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2))
    print(json.dumps({k: len(v) for k, v in hits.items()}))
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    # The round number is REQUIRED: a silent 0 default once shipped a
    # round-11 artifact stamped round 0, confusing round-keyed tooling.
    if len(sys.argv) < 2:
        raise SystemExit("usage: leakcheck.py <round_number>")
    sys.exit(main(int(sys.argv[1])))
