"""Pallas TPU kernels for the hot paths.

histpdf: the camshift histogram + backprojection pixel scans with one-hot
factors kept in VMEM (the XLA formulation round-trips them through HBM).
The detector's deep stages remain pure XLA (static slices + MXU matmuls) by
design: Mosaic requires 8-aligned sublane starts for vector loads, so the
arbitrary-offset window work there uses the tile-compaction trick instead
(models/detector.py).
"""

from .histpdf import hist_pallas, pdf_pallas, split_bf16_3

__all__ = ["hist_pallas", "pdf_pallas", "split_bf16_3"]
