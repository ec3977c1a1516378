#!/bin/bash
# Round-4 on-chip measurement queue, stage A: the decision-driving A/Bs.
#   1. sparse-model camshift A/B (dense vs K=64 vs K=128) on the
#      webcam-realistic palette workload (--face-noise 20, luma-preserving
#      chroma texture: ~90-100 model bins -> K=64 overflows, K=128 fits)
#   2. histKernel end-to-end A/B (XLA vs Pallas inside the real scan program)
# Stage B (run after reviewing stage A): conformance gate + headline bench
# with the chosen flags; 640x480 qualification; cold-start A/B.
# Logs to /tmp/r4q_*.log; prints a one-line summary per step.
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

echo "# [1/2] sparse A/B (256 streams, face-noise 20)"
timeout 7200 python tools/exp_sparse_ab.py --arms none,64,128 \
  --face-noise 20 >"$LOGDIR/r4q_sparse.log" 2>&1
echo "rc=$?"; grep -E "^sparseHist|^# windows|^# sparse" "$LOGDIR/r4q_sparse.log" || tail -5 "$LOGDIR/r4q_sparse.log"

echo "# [2/2] histKernel end-to-end A/B"
timeout 7200 python tools/exp_histkernel_ab.py >"$LOGDIR/r4q_histk.log" 2>&1
echo "rc=$?"; grep -E "^histKernel|^# windows" "$LOGDIR/r4q_histk.log" || tail -5 "$LOGDIR/r4q_histk.log"

echo "# stage A done ($(date))"
