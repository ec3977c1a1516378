"""Compare the XLA and Pallas hist+pdf paths on the real chip: exactness + speed.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_histpdf.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from headtrackr_tpu.ops import histogram as hg
    from headtrackr_tpu.kernels.histpdf import hist_pallas, pdf_pallas

    N, H, W = args.streams, 240, 320
    n = args.iters
    rng = np.random.default_rng(0)
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    rgb = rng.integers(0, 256, (N, H, W, 3), np.uint8)
    bins = jax.jit(hg.rgb_bins)(jnp.asarray(rgb))
    model_np = rng.integers(0, 500, (N, 4096)).astype(np.float32)
    model = jnp.asarray(model_np)

    # --- exactness of the compiled Mosaic kernels vs the f64->f32 oracle
    @jax.jit
    def kern_once(bins, model):
        cur = jax.vmap(hist_pallas)(bins)
        w = hg.backprojection_weights(model, cur)
        pdf = jax.vmap(pdf_pallas)(bins, w)
        return cur, w, pdf

    cur_d, w_d, pdf_d = jax.tree_util.tree_map(np.asarray,
                                               kern_once(bins, model))
    bins_np = np.asarray(bins)
    ok_h = ok_p = True
    for i in range(0, N, 64):
        ref_h = np.bincount(bins_np[i].ravel(), minlength=4096).astype(np.float32)
        ok_h &= (cur_d[i] == ref_h).all()
        ref_pdf = w_d[i][bins_np[i].ravel()].reshape(H, W)
        ok_p &= (pdf_d[i] == ref_pdf).all()
    print(f"exact_hist {bool(ok_h)}  exact_pdf_lookup {bool(ok_p)}")

    # --- timing: scan-chained, one dispatch + one pull
    def timed(name, fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = time.time() - t0
        print(f"{name}_ms_per_tick {1000 * dt / n:.3f}")

    def chain_xla(mh, bins):
        def body(m, _):
            cur, pdf = jax.vmap(hg.histogram_and_pdf)(bins, m)
            return cur + pdf[:, :1, 0] * 1e-30, None
        m, _ = jax.lax.scan(body, mh, None, length=n)
        return m

    def chain_pallas(mh, bins):
        def body(m, _):
            cur = jax.vmap(hist_pallas)(bins)
            w = hg.backprojection_weights(m, cur)
            pdf = jax.vmap(pdf_pallas)(bins, w)
            return cur + pdf[:, :1, 0] * 1e-30, None
        m, _ = jax.lax.scan(body, mh, None, length=n)
        return m

    timed("xla_histpdf", jax.jit(chain_xla), model, bins)
    timed("pallas_histpdf", jax.jit(chain_pallas), model, bins)

    # hist-only variants (pdf DCEd)
    def chain_xla_h(mh, bins):
        def body(m, _):
            cur, _ = jax.vmap(hg.histogram_and_pdf)(bins, m)
            return cur, None
        return jax.lax.scan(body, mh, None, length=n)[0]

    def chain_pal_h(mh, bins):
        def body(m, _):
            return jax.vmap(hist_pallas)(bins) + m * 1e-30, None
        return jax.lax.scan(body, mh, None, length=n)[0]

    timed("xla_hist_only", jax.jit(chain_xla_h), model, bins)
    timed("pallas_hist_only", jax.jit(chain_pal_h), model, bins)


if __name__ == "__main__":
    main()
