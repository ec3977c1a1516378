#!/bin/bash
# Round-5 chip campaign phase 8: qualify the bench default flip
# (survivorsStage2=2048 + int8 deep stages) per the decision rules:
# flip only on gate PASS + a clean end-to-end bench win.
#
#  - gate_comb   full conformance gate at the flip configuration
#  - bench_flip  bench.py --k1 2048 --deep-dtype int8 — CLEAN cold start
#                (queue7's bench_k1 lock phase was contaminated by the
#                concurrently running CPU suite: 373 fps vs 4,196 solo)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_chip
mkdir -p $LOG

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/queue8.log
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/queue8.log
}

run gate_comb    python tools/verify_chip.py --clips all --band 96x128 --band-hist --k1 2048 --deep-dtype int8
run bench_flip   python bench.py --k1 2048 --deep-dtype int8
