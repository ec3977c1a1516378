#!/bin/bash
# Round-5 chip campaign phase 2: min-of-4-reps comparable baselines
# (phase-1 single-rep readings are not comparable to the reps=4 arms).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_chip
mkdir -p $LOG

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/queue2.log
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/queue2.log
}

# 1. Steady-tick: no-unroll baseline + unroll arm, interleaved twice
run step_base1   python tools/exp_step_split.py --streams 256 --pieces full
run step_unroll1 python tools/exp_step_split.py --streams 256 --pieces full --unroll
run step_base2   python tools/exp_step_split.py --streams 256 --pieces full
run step_unroll2 python tools/exp_step_split.py --streams 256 --pieces full --unroll

# 2. Detect tick: comparable A_END=2 baseline (a3/a4 already min-of-4),
#    interleaved with a repeat of a3
run detect_a2r   python tools/exp_detect_split.py --streams 256 --pieces full
run detect_a3r   python tools/exp_detect_split.py --streams 256 --pieces full --chunk-a 3
run detect_a2r2  python tools/exp_detect_split.py --streams 256 --pieces full
run detect_a3r2  python tools/exp_detect_split.py --streams 256 --pieces full --chunk-a 3

# 3. Steady-tick piece table with reps (the publishable cost map)
run step_table   python tools/exp_step_split.py --streams 256

# 4. 640x480 arms: steady tick + detect tick at a2 vs a3
run step_640     python tools/exp_step_split.py --streams 128 --size 640x480 --pieces full
run detect_640a2 python tools/exp_detect_split.py --streams 128 --size 640x480 --pieces full
run detect_640a3 python tools/exp_detect_split.py --streams 128 --size 640x480 --pieces full --chunk-a 3
