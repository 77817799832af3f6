#!/usr/bin/env bash
# The end-of-round ritual, scripted (VERDICT r11 ask #5): one entry point
# that runs every gate rounds 8–11 executed by hand, so the next
# regression is a diff in one log instead of a forensic reconstruction.
#
#   1. sbt test                      — unit goldens + property specs
#   2. three-SF oracle sweeps        — sf0.001 + sf0.01 + sf0.1 (minus the
#                                      justified skip list, scripts/sweep_verify.sh)
#   3. SimEqualityScaleSpec at sf0.1 — the §8.0 waiver replacements at
#                                      bench scale (env-gated, cancels
#                                      without GRAFT_SIM_EQ_SFDIR)
#   4. producer-stamped bench        — full-catalogue archive to
#                                      BENCH_LOCAL_r{N}.json (clobber-guarded)
#
# Usage: scripts/round_ritual.sh [round_number]
#   round_number feeds SPARK_GRAFT_BENCH_ROUND; omitted → Bench's own
#   BENCH_r*.json scan picks the number. All output tees to
#   /tmp/round_ritual.log; the script exits nonzero on the FIRST failing
#   gate so a red sweep can't scroll past.
set -euo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/round_ritual.log
: > "$LOG"
round="${1:-}"

echo "=== [1/4] sbt test ===" | tee -a "$LOG"
sbt -batch test 2>&1 | tail -6 | tee -a "$LOG"

echo "=== [2/4] three-SF oracle sweeps ===" | tee -a "$LOG"
bash scripts/sweep_verify.sh --with-sf01 2>&1 | tee -a "$LOG" | grep -E "^==|passed|FAIL"
if grep -q "FAIL" "$LOG"; then echo "SWEEP FAILURES — see $LOG"; exit 1; fi

echo "=== [3/4] SimEqualityScaleSpec at sf0.1 ===" | tee -a "$LOG"
GRAFT_SIM_EQ_SFDIR=/root/testdata/sf0.1 \
  sbt -batch "testOnly graft.SimEqualityScaleSpec" 2>&1 | tail -5 | tee -a "$LOG"

echo "=== [4/4] producer-stamped full bench ===" | tee -a "$LOG"
# grep must not abort the script under pipefail when a crashed sbt run
# produces no matching lines — capture, then filter.
BOUT=/tmp/round_ritual_bench.out
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_CONTEXT=builder-local \
  ${round:+SPARK_GRAFT_BENCH_ROUND=$round} \
  sbt -batch 'runMain graft.Bench' > "$BOUT" 2>&1 \
  || { echo "BENCH FAILED — see $BOUT"; tail -20 "$BOUT" | tee -a "$LOG"; exit 1; }
{ grep -E '"metric":"total"|archiv' "$BOUT" || true; } | tee -a "$LOG"

# Drift-normalized round-over-round comparison (VERDICT r12 ask #4):
# compare the freshly archived builder-local file against the newest
# OLDER builder-local archive using the q1/q2/q14 calibration triple.
new_archive=$(grep -oE 'BENCH_LOCAL_r[0-9]+[^ ]*\.json' "$BOUT" | tail -1 || true)
if [[ -n "$new_archive" && -f "$new_archive" ]]; then
  prev_archive=$(ls -1 BENCH_LOCAL_r*.json 2>/dev/null \
    | grep -v -F "$new_archive" | grep -v unknown | sort -V | tail -1 || true)
  if [[ -n "$prev_archive" ]]; then
    echo "=== drift-normalized delta vs $prev_archive ===" | tee -a "$LOG"
    python3 scripts/bench_compare.py "$prev_archive" "$new_archive" | tee -a "$LOG"
  fi
fi

echo "=== ritual complete — full log at $LOG ==="
