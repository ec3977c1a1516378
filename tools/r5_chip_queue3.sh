#!/bin/bash
# Round-5 chip campaign phase 3: pyramid-gather A/B (take baselines for the
# onehot arms measured in phase 2 after imageproc.PYRAMID_GATHER flipped).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_chip
mkdir -p $LOG

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/queue3.log
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/queue3.log
}

run detect_a2_take python tools/exp_detect_split.py --streams 256 --pieces full --pyr-gather take
run detect_a2_oh   python tools/exp_detect_split.py --streams 256 --pieces full --pyr-gather onehot
run detect_a3_take python tools/exp_detect_split.py --streams 256 --pieces full --chunk-a 3 --pyr-gather take
run detect_a3_oh   python tools/exp_detect_split.py --streams 256 --pieces full --chunk-a 3 --pyr-gather onehot
# 640x480 detect with both gathers at the winning chunk depth comes in phase 4
