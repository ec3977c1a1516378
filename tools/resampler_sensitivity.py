"""Resampler sensitivity proxy (SURVEY §7 "hard parts": resampler parity).

The browser's drawImage interpolation is UNSPECIFIED (src/ccv.js:121-146);
this framework pins a defined bilinear resampler (docs/PARITY.md deviation
2).  Since no real-browser trace is available in this environment, this tool
bounds the sensitivity empirically: it rebuilds the detection pyramid with
plausible browser-resampler stand-ins at the fractional levels 1..interval —
the only levels where interpolation choice is ambiguous (the half-scale
chain is an exact 2x box filter for every sane resampler) — and reports the
best-detection IoU deltas through the f64 oracle detector.

    variants: bilinear (the spec), area (box/area averaging — what most
    browsers approximate for downscale), nearest (worst-case browser)

Run (pure NumPy, no JAX): python tools/resampler_sensitivity.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def _axis_weights(n_src, n_dst):
    """(n_dst, n_src) fractional-overlap row weights for exact area
    averaging (separable)."""
    r = n_src / n_dst
    W = np.zeros((n_dst, n_src))
    for j in range(n_dst):
        a, b = j * r, (j + 1) * r
        for k in range(int(np.floor(a)), min(int(np.ceil(b)), n_src)):
            W[j, k] = min(b, k + 1) - max(a, k)
    return W / r


def area_resize(src, dw, dh):
    H, W = src.shape
    Wy = _axis_weights(H, dh)
    Wx = _axis_weights(W, dw)
    out = Wy @ src.astype(np.float64) @ Wx.T
    return np.rint(np.clip(out, 0, 255)).astype(np.uint8)


def nearest_resize(src, dw, dh):
    H, W = src.shape
    ys = np.minimum((np.arange(dh) + 0.5) * H / dh, H - 1).astype(np.int32)
    xs = np.minimum((np.arange(dw) + 0.5) * W / dw, W - 1).astype(np.int32)
    return src[np.ix_(ys, xs)]


def variant_pyramid(gray, interval, resize):
    """build_pyramid (oracle/imageproc.py) with ``resize`` at the fractional
    levels 1..interval; the half-scale chain and shifted variants keep the
    defined resampler (factor-2 bilinear == box averaging)."""
    from headtrackr_tpu.oracle.imageproc import draw_image, pyramid_dims

    gray = np.asarray(gray)
    h0, w0 = gray.shape
    dims, scale, scale_upto, next_ = pyramid_dims(w0, h0, interval)
    pyr = {0: gray}
    for i in range(1, interval + 1):
        w, h = dims[i]
        pyr[i * 4] = resize(gray, w, h)
    for i in range(next_, scale_upto + next_ * 2):
        src = pyr[(i - next_) * 4]
        sh_, sw_ = src.shape
        w, h = dims[i]
        pyr[i * 4] = draw_image(src, 0, 0, sw_, sh_, w, h, w, h)
    for i in range(next_ * 2, scale_upto + next_ * 2):
        src = pyr[(i - next_) * 4]
        sh_, sw_ = src.shape
        w, h = dims[i]
        pyr[i * 4 + 1] = draw_image(src, 1, 0, sw_ - 1, sh_, w - 2, h, w, h)
        pyr[i * 4 + 2] = draw_image(src, 0, 1, sw_, sh_ - 1, w, h - 2, w, h)
        pyr[i * 4 + 3] = draw_image(src, 1, 1, sw_ - 1, sh_ - 1, w - 2, h - 2,
                                    w, h)
    return pyr, scale, scale_upto, next_


def iou(a, b):
    ax0, ay0, ax1, ay1 = a["x"], a["y"], a["x"] + a["width"], a["y"] + a["height"]
    bx0, by0, bx1, by1 = b["x"], b["y"], b["x"] + b["width"], b["y"] + b["height"]
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    ua = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / ua if ua > 0 else 0.0


def best_detection(gray, cascade, pyramid):
    from headtrackr_tpu.oracle.detector import detect_objects
    comps = detect_objects(gray, cascade, 5, 1, pyramid=pyramid)
    return max(comps, key=lambda c: c["confidence"]) if comps else None


def synthface_frame(H=240, W=320, bg=(120, 100, 90), scale=1):
    """scale > 1 upsamples the face so the best detection lands on a
    RESAMPLED pyramid level (at scale 1 it fires at level 0, which no
    resampler touches)."""
    data = np.load(_os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "headtrackr_tpu", "data",
        "synthface.npz"))
    rgb = data["rgb"]
    if scale > 1:
        rgb = np.repeat(np.repeat(rgb, scale, axis=0), scale, axis=1)
    fh, fw = rgb.shape[:2]
    f = np.full((H, W, 3), bg, np.uint8)
    y0, x0 = (H - fh) // 2, (W - fw) // 2
    f[y0:y0 + fh, x0:x0 + fw] = rgb
    return f


def run(frame=None, cascade=None, verbose=True):
    """Returns {variant: (best_detection, IoU vs bilinear)}."""
    from headtrackr_tpu.cascade import frontalface
    from headtrackr_tpu.oracle.imageproc import grayscale

    if frame is None:
        frame = synthface_frame()
    if cascade is None:
        cascade = frontalface()
    gray = grayscale(frame)
    variants = {
        "bilinear": None,  # the spec: oracle build_pyramid
        "area": lambda g, w, h: area_resize(g, w, h),
        "nearest": lambda g, w, h: nearest_resize(g, w, h),
    }
    results = {}
    base = None
    for name, rs in variants.items():
        if rs is None:
            from headtrackr_tpu.oracle.imageproc import build_pyramid
            pyr = build_pyramid(gray, 5)
        else:
            pyr = variant_pyramid(gray, 5, rs)
        det = best_detection(gray, cascade, pyr)
        if name == "bilinear":
            base = det
        v = iou(base, det) if (base and det) else 0.0
        results[name] = (det, v)
        if verbose:
            box = (f"({det['x']:.1f},{det['y']:.1f},{det['width']:.1f},"
                   f"{det['height']:.1f}) conf {det['confidence']:.2f} "
                   f"n {det['neighbors']}" if det else "NO DETECTION")
            print(f"{name:9s} IoU-vs-spec {v:.4f}  best {box}")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.parse_args()
    for s in (1, 2, 3):
        print(f"--- synthface x{s} "
              f"({'level-0 hit, resampler-independent' if s == 1 else 'resampled-level hit'})")
        run(frame=synthface_frame(scale=s))
