#!/bin/bash
# Round-4 on-chip queue, stage B: conformance + headlines with the sparse K
# chosen from stage A (env K, default 64), then 640x480 qualification and
# the cold-start policy A/B.
#   1. conformance gate at the bench band WITH the sparse arm
#   2. headline bench: standard workload + sparse K (scan program cache-warm
#      from stage A's identical config)
#   3. realistic-palette headline arm (--face-noise 12) — overflow telemetry
#   4. 640x480 qualification bench (128 streams, same per-stream-tick loss
#      rate: 2 losses per 16-tick pool pass)
#   5. 640x480 conformance gate
#   6. cold-start full-vs-rotate A/B
# Logs to /tmp/r4qb_*.log.
set -u
K=${K:-64}
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

echo "# [1/6] conformance gate (band 96x128, sparseHist=$K)"
timeout 7200 python tools/verify_chip.py --band 96x128 --sparse-hist "$K" \
  >"$LOGDIR/r4qb_verify.log" 2>&1
echo "rc=$?"; grep -E "gate|serving|exact" "$LOGDIR/r4qb_verify.log" | tail -8

echo "# [2/6] headline bench (sparseHist=$K, standard workload)"
timeout 7200 python bench.py --sparse-hist "$K" >"$LOGDIR/r4qb_bench.log" 2>&1
echo "rc=$?"; tail -3 "$LOGDIR/r4qb_bench.log"

echo "# [3/6] realistic-palette arm (face-noise 12, sparseHist=$K)"
timeout 7200 python bench.py --sparse-hist "$K" --face-noise 12 \
  --latency-ticks 10 >"$LOGDIR/r4qb_bench_noise.log" 2>&1
echo "rc=$?"; tail -3 "$LOGDIR/r4qb_bench_noise.log"

echo "# [4/6] 640x480 qualification bench"
timeout 9000 python bench.py --size 640x480 --streams 128 --loss-streams 2 \
  --ticks 200 --latency-ticks 10 >"$LOGDIR/r4qb_bench640.log" 2>&1
echo "rc=$?"; tail -3 "$LOGDIR/r4qb_bench640.log"

echo "# [5/6] 640x480 conformance gate"
timeout 9000 python tools/verify_chip.py --size 640x480 \
  >"$LOGDIR/r4qb_verify640.log" 2>&1
echo "rc=$?"; grep -E "gate|serving|exact" "$LOGDIR/r4qb_verify640.log" | tail -8

echo "# [6/6] cold-start full-vs-rotate A/B"
timeout 7200 python tools/exp_coldstart_ab.py >"$LOGDIR/r4qb_cold.log" 2>&1
echo "rc=$?"; grep -E "^overload" "$LOGDIR/r4qb_cold.log" || tail -5 "$LOGDIR/r4qb_cold.log"

echo "# stage B done ($(date))"
