#!/bin/bash
# Round-5 chip campaign, STRICTLY SERIAL (1-core VM: overlapped runs poison
# host-side timing — the r5 lesson; see docs/PERFORMANCE.md r5 sections).
# Run on the real chip (no env overrides).  Each stage appends to its log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_chip
mkdir -p $LOG

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/queue.log
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/queue.log
}

# 1. Post-bandHist steady-tick cost map (VERDICT item 2)
run step_split python tools/exp_step_split.py --streams 256

# 2. Detect-tick cost map at default knobs (VERDICT item 1)
run detect_split python tools/exp_detect_split.py --streams 256

# 3. CHUNK_A_END A/B on the full detect tick (crowd robustness says 4;
#    cost decides the default)
run detect_a3 python tools/exp_detect_split.py --streams 256 --pieces full --chunk-a 3
run detect_a4 python tools/exp_detect_split.py --streams 256 --pieces full --chunk-a 4

# 4. Steady-tick unroll A/B in the bandHist regime (r4 verdict item 2 lever)
run step_unroll python tools/exp_step_split.py --streams 256 --pieces full --unroll
