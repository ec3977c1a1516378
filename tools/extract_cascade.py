"""Extract the frontal-face BBF cascade model data from the reference into a compact .npz.

The cascade is *model data* (BSD-licensed, from Liu Liu's ccv), not code: a JS object
literal with 16 stages / 2,015 weak classifiers (reference: src/cascade.js:19).  We parse
the literal, validate its invariants, and pack it into padded int16/float32 arrays:

  - count:           int, number of stages (16)
  - width, height:   detection window size (24x24)
  - stage_counts:    (S,)  weak classifiers per stage
  - stage_thresh:    (S,)  stage rejection thresholds
  - alpha:           (K, 2) per-weak vote pair [fail, pass] (K = total weak, 2015)
  - size:            (K,)  number of valid feature pixels per side
  - px, py, pz:      (K, 5) positive-pixel coords + pyramid level, padded with -1
  - nx, ny, nz:      (K, 5) negative-pixel coords + pyramid level, padded with -1
  - stage_of:        (K,)  stage index of each weak classifier

Run:  python tools/extract_cascade.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import re
import sys

import numpy as np

REF = "/root/reference/src/cascade.js"
OUT = "headtrackr_tpu/data/frontalface.npz"

MAX_SIZE = 5  # max feature pixels per side (reference data: size <= 5)


def parse_cascade(path):
    with open(path) as f:
        text = f.read()
    # The data line is `headtrackr.cascade = {...};`
    m = re.search(r"headtrackr\.cascade\s*=\s*(\{.*\});?", text, re.S)
    assert m, "cascade literal not found"
    literal = m.group(1).rstrip().rstrip(";")
    # JS object literal -> JSON: quote bare keys.
    literal = re.sub(r'([{,]\s*)([A-Za-z_]\w*)\s*:', r'\1"\2":', literal)
    return json.loads(literal)


def main():
    c = parse_cascade(REF)
    stages = c["stage_classifier"]
    assert c["count"] == len(stages)
    K = sum(s["count"] for s in stages)

    stage_counts = np.array([s["count"] for s in stages], np.int32)
    stage_thresh = np.array([s["threshold"] for s in stages], np.float32)
    alpha = np.zeros((K, 2), np.float32)
    size = np.zeros((K,), np.int32)
    px = np.full((K, MAX_SIZE), -1, np.int16)
    py = np.full((K, MAX_SIZE), -1, np.int16)
    pz = np.full((K, MAX_SIZE), -1, np.int16)
    nx = np.full((K, MAX_SIZE), -1, np.int16)
    ny = np.full((K, MAX_SIZE), -1, np.int16)
    nz = np.full((K, MAX_SIZE), -1, np.int16)
    stage_of = np.zeros((K,), np.int32)

    k = 0
    for si, s in enumerate(stages):
        assert len(s["feature"]) == s["count"]
        assert len(s["alpha"]) == 2 * s["count"]
        for fi, f in enumerate(s["feature"]):
            sz = f["size"]
            assert 1 <= sz <= MAX_SIZE, sz
            size[k] = sz
            alpha[k, 0] = s["alpha"][2 * fi]      # vote when pmin <= nmax ("fail")
            alpha[k, 1] = s["alpha"][2 * fi + 1]  # vote when pmin >  nmax ("pass")
            for q in range(sz):
                # A slot is valid iff its z >= 0 (reference guard src/ccv.js:198,208);
                # x/y in z<0 slots can be arbitrary garbage in the shipped data.
                if f["pz"][q] >= 0:
                    px[k, q], py[k, q], pz[k, q] = f["px"][q], f["py"][q], f["pz"][q]
                if f["nz"][q] >= 0:
                    nx[k, q], ny[k, q], nz[k, q] = f["nx"][q], f["ny"][q], f["nz"][q]
            stage_of[k] = si
            k += 1
    assert k == K

    # Invariants the kernels rely on.
    assert (pz[:, 0] >= 0).all() and (nz[:, 0] >= 0).all(), "first feature pixel always valid"
    valid_p = pz >= 0
    valid_n = nz >= 0
    assert set(np.unique(pz[valid_p])) <= {0, 1, 2}
    assert set(np.unique(nz[valid_n])) <= {0, 1, 2}
    # Coordinate ranges per level (level z: window is (24 >> z) wide).
    for z in range(3):
        wmax = (24 >> z)
        for arr_x, arr_y, arr_z, v in ((px, py, pz, valid_p), (nx, ny, nz, valid_n)):
            sel = v & (arr_z == z)
            if sel.any():
                assert arr_x[sel].min() >= 0 and arr_x[sel].max() < wmax, (z, arr_x[sel].max())
                assert arr_y[sel].min() >= 0 and arr_y[sel].max() < wmax

    np.savez_compressed(
        OUT,
        count=np.int32(c["count"]),
        width=np.int32(c["width"]),
        height=np.int32(c["height"]),
        stage_counts=stage_counts,
        stage_thresh=stage_thresh,
        alpha=alpha,
        size=size,
        px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
        stage_of=stage_of,
    )
    npix = int(valid_p.sum() + valid_n.sum())
    print(f"stages={len(stages)} weak={K} feature_pixels={npix} "
          f"stage_counts={stage_counts.tolist()}")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
