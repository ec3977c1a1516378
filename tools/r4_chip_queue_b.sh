#!/bin/bash
# Round-4 on-chip queue, stage B — revised after stage A's sparse result
# (realistic ~94-bin models: K=128 fits but runs 1.3x SLOWER than dense;
# K=64 overflows everywhere and pays sparse+dense. Dense stays production).
#   0. sparse best-case A/B (face-noise 0, ~2-bin models, K=64 fits):
#      the one configuration sparse could still win -> plan_serving rule
#   1. conformance gate at the bench band (dense, the headline config)
#   2. headline bench 256 streams (dense; cache-warm from stage A)
#   3. headline bench 512 streams (r3 u8-fix scaling: 25.2 vs 30.5
#      us/stream in-process -> candidate new headline)
#   4. realistic-palette arm (--face-noise 20, dense): palette invariance
#   5. 640x480 qualification bench (128 streams, same loss rate/stream-tick)
#   6. 640x480 conformance gate
#   7. cold-start full-vs-rotate A/B
# Logs to /tmp/r4qb_*.log.
set -u
LOGDIR=${LOGDIR:-/tmp}
cd "$(dirname "$0")/.."

probe() {
  timeout 150 python -c "
import jax, numpy as np, jax.numpy as jnp
np.asarray(jax.jit(lambda a: a*2)(jnp.ones((8,128))))
print('CHIP_OK')" 2>/dev/null | grep -q CHIP_OK
}

echo "# waiting for chip..."
for i in $(seq 1 200); do
  if probe; then echo "# chip up after $i probes ($(date))"; break; fi
  [ "$i" = 200 ] && { echo "# chip never came back"; exit 1; }
  sleep 90
done

echo "# [0/7] sparse best-case A/B (face-noise 0, K=64 fits)"
timeout 5400 python tools/exp_sparse_ab.py --arms none,64 --face-noise 0 \
  >"$LOGDIR/r4qb_sparse0.log" 2>&1
echo "rc=$?"; grep -E "^sparseHist|^# windows" "$LOGDIR/r4qb_sparse0.log" || tail -5 "$LOGDIR/r4qb_sparse0.log"

echo "# [1/7] conformance gate (band 96x128, dense headline config)"
timeout 7200 python tools/verify_chip.py --band 96x128 \
  >"$LOGDIR/r4qb_verify.log" 2>&1
echo "rc=$?"; grep -E "gate|serving|exact" "$LOGDIR/r4qb_verify.log" | tail -8

echo "# [2/7] headline bench 256 streams (dense)"
timeout 7200 python bench.py >"$LOGDIR/r4qb_bench256.log" 2>&1
echo "rc=$?"; tail -3 "$LOGDIR/r4qb_bench256.log"

echo "# [3/7] headline bench 512 streams"
timeout 7200 python bench.py --streams 512 --loss-streams 8 --bucket 16 \
  >"$LOGDIR/r4qb_bench512.log" 2>&1
echo "rc=$?"; tail -3 "$LOGDIR/r4qb_bench512.log"

echo "# [4/7] realistic-palette arm (face-noise 20, dense)"
timeout 7200 python bench.py --face-noise 20 --latency-ticks 10 \
  >"$LOGDIR/r4qb_benchnoise.log" 2>&1
echo "rc=$?"; tail -3 "$LOGDIR/r4qb_benchnoise.log"

echo "# [5/7] 640x480 qualification bench"
timeout 9000 python bench.py --size 640x480 --streams 128 --loss-streams 2 \
  --ticks 200 --latency-ticks 10 >"$LOGDIR/r4qb_bench640.log" 2>&1
echo "rc=$?"; tail -3 "$LOGDIR/r4qb_bench640.log"

echo "# [6/7] 640x480 conformance gate"
timeout 9000 python tools/verify_chip.py --size 640x480 \
  >"$LOGDIR/r4qb_verify640.log" 2>&1
echo "rc=$?"; grep -E "gate|serving|exact" "$LOGDIR/r4qb_verify640.log" | tail -8

echo "# [7/7] cold-start full-vs-rotate A/B"
timeout 7200 python tools/exp_coldstart_ab.py >"$LOGDIR/r4qb_cold.log" 2>&1
echo "rc=$?"; grep -E "^overload" "$LOGDIR/r4qb_cold.log" || tail -5 "$LOGDIR/r4qb_cold.log"

echo "# stage B done ($(date))"
