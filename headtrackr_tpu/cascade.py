"""Cascade model container + the bundled frontal-face model.

The reference ships its model as a JS object literal (src/cascade.js:19: 16 stages,
2,015 weak classifiers, 24x24 window).  We ship the same model data repacked into
padded arrays (see tools/extract_cascade.py) in a form both the NumPy oracle and
the JAX/Pallas kernels consume directly.

A weak classifier k votes ``alpha[k, 1]`` iff min(valid positive pixels) >
max(valid negative pixels), else ``alpha[k, 0]``; a stage rejects a window when its
vote sum is below ``stage_thresh``.  Feature-pixel slot f of weak k is valid iff
``pz[k, f] >= 0`` (resp. nz); the shipped data contains garbage coordinates in
invalid slots, which the extractor normalizes to -1.
"""

import dataclasses
import functools
import os

import numpy as np

__all__ = ["Cascade", "frontalface", "toy_cascade"]

_DATA = os.path.join(os.path.dirname(__file__), "data", "frontalface.npz")
MAX_SIZE = 5


@dataclasses.dataclass(frozen=True)
class Cascade:
    """Padded cascade model data (NumPy arrays; kernels convert to jnp on use)."""
    count: int               # number of stages
    width: int               # detection window width  (full-plane px)
    height: int              # detection window height
    stage_counts: np.ndarray  # (S,) i32
    stage_thresh: np.ndarray  # (S,) f32
    alpha: np.ndarray         # (K, 2) f32 — [fail, pass] votes
    size: np.ndarray          # (K,) i32
    px: np.ndarray            # (K, 5) i16, -1 pad
    py: np.ndarray
    pz: np.ndarray
    nx: np.ndarray
    ny: np.ndarray
    nz: np.ndarray
    stage_of: np.ndarray      # (K,) i32

    @property
    def n_weak(self):
        return self.alpha.shape[0]

    def __getitem__(self, key):  # dict-style access for the oracle
        return getattr(self, key)

    def stage_slice(self, s):
        k0 = int(self.stage_counts[:s].sum())
        return k0, k0 + int(self.stage_counts[s])


@functools.lru_cache(maxsize=1)
def frontalface():
    """The bundled frontal-face model (reference parity target)."""
    d = np.load(_DATA)
    return Cascade(
        count=int(d["count"]), width=int(d["width"]), height=int(d["height"]),
        stage_counts=d["stage_counts"], stage_thresh=d["stage_thresh"],
        alpha=d["alpha"], size=d["size"],
        px=d["px"], py=d["py"], pz=d["pz"],
        nx=d["nx"], ny=d["ny"], nz=d["nz"],
        stage_of=d["stage_of"],
    )


def toy_cascade(threshold=0.5):
    """A tiny 1-stage cascade that fires on windows whose center (quarter-plane
    pixel (2,2)..(3,3)) is strictly brighter than the window corners.

    Used by integration tests to drive the full WB->VJ->CS machine on synthetic
    clips with a bright moving square, without needing real face imagery.
    """
    K = 1
    px = np.full((K, MAX_SIZE), -1, np.int16)
    py = np.full((K, MAX_SIZE), -1, np.int16)
    pz = np.full((K, MAX_SIZE), -1, np.int16)
    nx = np.full((K, MAX_SIZE), -1, np.int16)
    ny = np.full((K, MAX_SIZE), -1, np.int16)
    nz = np.full((K, MAX_SIZE), -1, np.int16)
    # positive: 4 center pixels on the quarter plane
    for i, (x, y) in enumerate([(2, 2), (3, 2), (2, 3), (3, 3)]):
        px[0, i], py[0, i], pz[0, i] = x, y, 2
    # negative: 4 corners on the quarter plane
    for i, (x, y) in enumerate([(0, 0), (5, 0), (0, 5), (5, 5)]):
        nx[0, i], ny[0, i], nz[0, i] = x, y, 2
    return Cascade(
        count=1, width=24, height=24,
        stage_counts=np.array([1], np.int32),
        stage_thresh=np.array([threshold], np.float32),
        alpha=np.array([[-1.0, 1.0]], np.float32),
        size=np.array([4], np.int32),
        px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
        stage_of=np.zeros((1,), np.int32),
    )
