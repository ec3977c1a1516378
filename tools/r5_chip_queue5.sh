#!/bin/bash
# Round-5 chip campaign phase 5: re-run the conformance gates after the
# wants_band_audit schema fix (phase-4 gates crashed in the serving arm:
# verify_chip built audit-less states for audit-carrying step programs).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_chip
mkdir -p $LOG

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/queue5.log
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/queue5.log
}

run gate_all2 python tools/verify_chip.py --clips all --band 96x128 --band-hist
run gate_6402 python tools/verify_chip.py --size 640x480 --band-hist
