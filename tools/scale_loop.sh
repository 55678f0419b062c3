#!/bin/bash
# Accumulate scaling-bench windows: repeatedly run one interleaved
# 2-core/8-core pair (SCALE_ROUNDS=1). Each invocation appends to
# BENCH/scaling_runs.jsonl and regenerates BENCH/BASELINE.md from the
# best recorded window per level for the current engine code digest.
# The host's available CPU fluctuates over tens of minutes; looping all
# session is how the least-stolen window gets caught.
#
# Usage: bash tools/scale_loop.sh [max_iterations]
set -u
MAX=${1:-100}
cd "$(dirname "$0")/.."
for i in $(seq 1 "$MAX"); do
  if [ -f /tmp/scale_loop.stop ]; then
    echo "[scale_loop] stop flag seen, exiting after $((i-1)) iterations"
    break
  fi
  echo "[scale_loop] iteration $i/$MAX $(date -u +%H:%M:%S)"
  # each invocation leaves ~2.7 GB of corpus+index tempdirs behind; a
  # night of accumulation fills the disk and fails the workers — drop
  # finished invocations' dirs (anything older than 30 min is not the
  # live one)
  find /tmp -maxdepth 1 -name 'kbse_scale_*' -mmin +30 -exec rm -rf {} + 2>/dev/null
  SCALE_ROUNDS=1 python tools/bench_scaling.py 450000 2 8 \
    >> /tmp/scale_loop.log 2>&1
  echo "[scale_loop] iteration $i done rc=$? $(date -u +%H:%M:%S)"
done
