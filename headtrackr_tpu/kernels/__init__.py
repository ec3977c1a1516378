# Pallas TPU kernels for hot paths land here.  The detector's deep stages and
# camshift currently compile to pure XLA (slices + MXU matmuls) — see
# models/detector.py ("tile compaction") and ops/histogram.py.
