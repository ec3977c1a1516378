#!/bin/bash
# Round-3 on-chip measurement queue. Waits for the axon TPU tunnel to come
# back (fresh-process probes — a hung probe is killed, not reused), then
# runs, in order:
#   1. band-size timing sweep at 256 streams (arms pre-qualified escape-free
#      on the bench workload by tools/exp_band_escape.py)
#   2. mean-shift unroll A/B
#   3. conformance gate at the bench band (verify_chip --band 96x128)
#   4. bench.py with the (new) default band
# Logs to /tmp/r3q_*.log; prints a one-line summary per step.
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

echo "# [1/4] band sweep (256 streams)"
timeout 7200 python tools/exp_streams_ab.py --streams 256 \
  --band auto,96x128,64x128,48x128 >"$LOGDIR/r3q_band.log" 2>&1
echo "rc=$?"; grep -E "^N=" "$LOGDIR/r3q_band.log" || tail -3 "$LOGDIR/r3q_band.log"

echo "# [2/4] mean-shift unroll A/B"
timeout 3600 python tools/exp_unroll_ab.py >"$LOGDIR/r3q_unroll.log" 2>&1
echo "rc=$?"; grep -vE "^#|Warning" "$LOGDIR/r3q_unroll.log" | tail -6

echo "# [3/4] conformance gate at bench band"
timeout 5400 python tools/verify_chip.py --band 96x128 >"$LOGDIR/r3q_verify.log" 2>&1
echo "rc=$?"; grep -E "gate|serving|exact" "$LOGDIR/r3q_verify.log" | tail -8

echo "# [4/4] bench (default band)"
timeout 5400 python bench.py >"$LOGDIR/r3q_bench.log" 2>&1
echo "rc=$?"; tail -2 "$LOGDIR/r3q_bench.log"

echo "# queue done ($(date))"
