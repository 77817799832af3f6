#!/usr/bin/env bash
# Per-change oracle check (r13 optimization round): verify a comma-listed
# subset of queries against the DuckDB oracle at one SF.
#
# Usage: scripts/subset_verify.sh <sf> <q1,q2,...>
#   e.g. scripts/subset_verify.sh sf0.01 q212_poisson_bootstrap,q282_mahalanobis
#
# Runs graft.Verify with SPARK_GRAFT_ONLY (subset dump), prunes
# oracle_sql.json to the requested names (Verify always writes the full
# map), then runs local_verify.py. The full three-SF sweep remains the
# round-closing gate; this is the inner-loop tool.
set -euo pipefail
cd "$(dirname "$0")/.."
sf="$1"
qs="$2"
out="/tmp/subset_verify_$sf"
rm -rf "$out"
SPARK_GRAFT_ONLY="$qs" sbt -batch "runMain graft.Verify /root/testdata/$sf $out" >/dev/null
python3 - "$out" "$qs" <<'EOF'
import json, sys
from pathlib import Path
out, qs = sys.argv[1], set(sys.argv[2].split(","))
p = Path(out, "oracle_sql.json")
oracle = json.loads(p.read_text())
p.write_text(json.dumps({k: v for k, v in oracle.items() if k in qs}))
EOF
python3 scripts/local_verify.py "/root/testdata/$sf" "$out" | tail -3
