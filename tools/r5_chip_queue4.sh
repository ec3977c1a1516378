#!/bin/bash
# Round-5 chip campaign phase 4 (onehot pyramid + maxconf tile rank tree):
#   1. conformance gates in the benched configuration (all clip suites)
#   2. the publishable detect-tick piece table (min-of-4)
#   3. k1/k2 capacity cost curve on the full detect tick
#   4. fresh 320x240 + 640x480 bench headlines
# STRICTLY SERIAL (1-core VM).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_chip
mkdir -p $LOG

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/queue4.log
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/queue4.log
}

run gate_all     python tools/verify_chip.py --clips all --band 96x128 --band-hist
run gate_640     python tools/verify_chip.py --size 640x480 --band-hist
run detect_table python tools/exp_detect_split.py --streams 256
run detect_k1lo  python tools/exp_detect_split.py --streams 256 --pieces full --k1 2048
run detect_k1hi  python tools/exp_detect_split.py --streams 256 --pieces full --k1 8192
run detect_k2lo  python tools/exp_detect_split.py --streams 256 --pieces full --k2 256
run bench_320    python bench.py
run bench_640    python bench.py --size 640x480 --streams 128 --loss-streams 2
