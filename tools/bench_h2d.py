"""Probe host->device transfer behavior through the axon tunnel.

Questions: is the 0.03 GB/s per-byte bandwidth or per-call overhead?  Do
parallel chunked transfers (threads) scale?  Does dtype/layout matter?
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import concurrent.futures as cf
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])

    # size scaling
    for mb in (0.25, 1, 4, 16, 59):
        nbytes = int(mb * 1e6)
        a = rng.integers(0, 256, (nbytes,), dtype=np.uint8)
        x = jax.device_put(a, dev); sync(x)
        reps = max(2, int(24e6 / nbytes))
        bufs = [rng.integers(0, 256, (nbytes,), dtype=np.uint8)
                for _ in range(min(reps, 4))]
        t0 = time.time()
        for i in range(reps):
            x = jax.device_put(bufs[i % len(bufs)], dev)
        sync(x)
        dt = (time.time() - t0) / reps
        print(f"h2d {mb:6.2f} MB: {1000 * dt:8.2f} ms  "
              f"{nbytes / dt / 1e9:.3f} GB/s")

    # threaded parallel chunks: split 59 MB into T chunks, transfer in parallel
    total = 59 * 10**6
    for T in (2, 4, 8, 16):
        chunk = total // T
        bufs = [rng.integers(0, 256, (chunk,), dtype=np.uint8)
                for _ in range(T)]
        with cf.ThreadPoolExecutor(T) as ex:
            # warm
            xs = list(ex.map(lambda b: jax.device_put(b, dev), bufs))
            [sync(x) for x in xs]
            t0 = time.time()
            xs = list(ex.map(lambda b: jax.device_put(b, dev), bufs))
            [sync(x) for x in xs]
            dt = time.time() - t0
        print(f"h2d parallel T={T:2d}: {1000 * dt:8.2f} ms  "
              f"{total / dt / 1e9:.3f} GB/s")

    # does a device-side expand help? send u8 seed and synthesize on device
    # (sanity: device-to-device is fast, so only the wire matters)
    a = rng.integers(0, 256, (4 * 10**6,), dtype=np.uint8)
    x = jax.device_put(a, dev); sync(x)
    t0 = time.time()
    for _ in range(6):
        x = jax.device_put(a, dev)   # same buffer: any caching in the relay?
    sync(x)
    print(f"h2d same-buffer 4MB x6: {1000 * (time.time() - t0) / 6:.2f} ms")


if __name__ == "__main__":
    main()
