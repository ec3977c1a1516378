#!/bin/bash
# Round-5 chip campaign phase 6: k1 (survivorsStage2) end-to-end A/B +
# r5 bench dress rehearsals.
#
#  - exp k2=256 re-run (phase-4 run was interrupted) and k1=2048+k2=256
#    combined detect-tick reading
#  - bench default (r5 headline numbers: onehot pyramid + audit in the tree)
#  - bench --k1 2048 (reduced-capacity arm: cold start + headline)
#  - bench --face-noise 20 (realistic-palette arm)
#  - bench 640x480 (fresh second-size headline, r4 was 15.5k pre-onehot)
#  - full conformance gate at --k1 2048 (incl. the new clutter reduced-caps
#    arm) — the qualification a default flip would need
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_chip
mkdir -p $LOG

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/queue6.log
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/queue6.log
}

run detect_k2lo2   python tools/exp_detect_split.py --streams 256 --pieces full --k2 256
run detect_k1k2    python tools/exp_detect_split.py --streams 256 --pieces full --k1 2048 --k2 256
run bench_r5       python bench.py
run bench_k1       python bench.py --k1 2048
run bench_noise    python bench.py --face-noise 20
run bench_640      python bench.py --size 640x480 --streams 128 --loss-streams 2
run gate_k1        python tools/verify_chip.py --clips all --band 96x128 --band-hist --k1 2048
