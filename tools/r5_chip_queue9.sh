#!/bin/bash
# Round-5 chip campaign phase 9: dress rehearsals on the SETTLED tree
# (int8 deep stages package default + bench k1=2048 default).
#
#  - bench_final   plain `python bench.py` — exactly what the driver runs
#  - bench_640f    640x480 re-take with the flipped defaults: the r5 640
#                  bench is detect/bucket-tick dominated (50 relocks pay
#                  the detect program), so the 1.39x detect win should
#                  move the headline (pre-flip: 17,107 fps)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_chip
mkdir -p $LOG

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/queue9.log
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/queue9.log
}

run bench_final  python bench.py
run bench_640f   python bench.py --size 640x480 --streams 128 --loss-streams 2
