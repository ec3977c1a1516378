#!/bin/bash
# Round-5 chip campaign phase 7 (post audit-action fix): the queue6 rerun
# plus the int8 deep-dtype A/B.
#
# Context: queue6's bench_r5 exposed the audit-as-escape regression — the
# conservative handoff audit flagged 85/256 bench streams dirty, every
# tick paid the full-batch full-frame recompute (9.60 ms/tick vs 3.49),
# and cold start collapsed (369 fps).  bandHistAuditAction="flag" is now
# the default (telemetry-only; PARITY deviation 13), so this queue
# re-takes every headline number on the fixed tree:
#
#  - bench_r5     default dress rehearsal (flag action, one-hot pyramid)
#  - bench_k1     reduced detect capacity arm (survivorsStage2=2048)
#  - bench_noise  realistic-palette arm (chroma face noise 20)
#  - bench_640    640x480 second-size headline (slice-first bandHist)
#  - gate_k1      full conformance gate at k1=2048 (default-flip gate)
#  - detect int8 A/B: fresh bf16 baseline + int8 + combined k1/k2/int8
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_chip
mkdir -p $LOG

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/queue7.log
  timeout 5400 "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/queue7.log
}

run bench_r5b      python bench.py
run gate_k1        python tools/verify_chip.py --clips all --band 96x128 --band-hist --k1 2048
run bench_k1       python bench.py --k1 2048
run bench_noise    python bench.py --face-noise 20
run bench_640      python bench.py --size 640x480 --streams 128 --loss-streams 2
run detect_bf16b   python tools/exp_detect_split.py --streams 256 --pieces full
run detect_int8    python tools/exp_detect_split.py --streams 256 --pieces full --deep-dtype int8
run detect_comb    python tools/exp_detect_split.py --streams 256 --pieces full --k1 2048 --k2 256 --deep-dtype int8
