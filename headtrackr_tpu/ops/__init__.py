from .imageproc import grayscale, whitebalance, resize_bilinear, build_pyramid, PyramidSpec
from .histogram import rgb_bins, histogram_4096, histogram_rect, backprojection_weights

__all__ = [
    "grayscale", "whitebalance", "resize_bilinear", "build_pyramid", "PyramidSpec",
    "rgb_bins", "histogram_4096", "histogram_rect", "backprojection_weights",
]
