#!/usr/bin/env bash
# Multi-SF oracle sweep — the driver's t2 gate runs only sf0.01, but both
# off-gate scale factors have surfaced real boundary bugs (float prefix
# shaving at sf0.1, half-cent sum rounding at sf0.001). Run this before
# calling a round done.
#
# Usage: scripts/sweep_verify.sh [--with-sf01]
#   sf0.001 + sf0.01 always; --with-sf01 adds the FULL catalogue at sf0.1.
#
# The sf0.1 quadratic skip list is GONE (r12): the pair-oracle family
# (q26/q28/q45/q58/q69/q127/q206/q217/q239/q362/q395/q475/q521) shared one
# all-pairs θ-join CTE that was DuckDB-intractable at sf0.1 (>100 CPU-min,
# q217 burned the budget in r7); LlmQueries.ngramJaccardOracleAt now
# derives the identical exact pair set through an inverted-index posting
# join (~8 s at sf0.1), so every registered oracle sweeps at every SF.
# q325's all-pairs Hamming join over precomputed 64-bit hashes was never
# actually intractable (1.7 s at sf0.1) and is likewise back in.
set -euo pipefail
cd "$(dirname "$0")/.."

for sf in sf0.001 sf0.01; do
  out="/tmp/sweep_$sf"
  rm -rf "$out"
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out" >/dev/null
  echo "== $sf =="
  python3 scripts/local_verify.py "/root/testdata/$sf" "$out" | tail -1
done

if [[ "${1:-}" == "--with-sf01" ]]; then
  out=/tmp/sweep_sf0.1
  rm -rf "$out"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $out" >/dev/null
  echo "== sf0.1 =="
  python3 scripts/local_verify.py /root/testdata/sf0.1 "$out" | tail -1
fi
