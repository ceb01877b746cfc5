#!/bin/bash
# Dump .explain("formatted") for the named queries into plans/<tag>/<query>_<suffix>.txt
# Usage: scripts/dump_plans.sh <tag> <suffix> q_a q_b ...
set -e
tag=$1; suffix=$2; shift 2
mkdir -p "plans/$tag"
out=$(mktemp)
sbt -batch "runMain graft.tools.Explain /root/testdata/sf0.1 $*" > "$out" 2>&1
python3 - "$out" "plans/$tag" "$suffix" <<'EOF'
import re, sys
text = open(sys.argv[1]).read()
parts = re.split(r"=+ (q[a-z0-9_]+) =+\n", text)
# parts: [prefix, name, body, name, body, ...]
for i in range(1, len(parts) - 1, 2):
    name, body = parts[i], parts[i + 1]
    # strip log noise lines
    lines = [l for l in body.splitlines()
             if not re.match(r"^\d\d/\d\d/\d\d|^\[(info|warn|success)\]", l)]
    open(f"{sys.argv[2]}/{name}_{sys.argv[3]}.txt", "w").write("\n".join(lines).strip() + "\n")
    print(f"wrote {sys.argv[2]}/{name}_{sys.argv[3]}.txt")
EOF
rm -f "$out"
