"""Tracing / profiling utilities.

The reference's only instrumentation is a wall-clock ``time`` stamp per
tracking call (src/facetrackr.js:135,152,188,199) — preserved on
facetrackingEvent.  Here, additionally:

  - StageTimer: host-side stage timing with TRUE device synchronization.
    On the axon-tunneled backend, ``jax.block_until_ready`` returns at enqueue
    time, so StageTimer forces a small host pull of given arrays.
  - trace(path): context manager around jax.profiler for device-op timelines
    (open the written .trace.json.gz in Perfetto / chrome://tracing).
"""

import contextlib
import time

import numpy as np

__all__ = ["StageTimer", "trace", "enable_compilation_cache"]


class StageTimer:
    """Usage:
        t = StageTimer()
        with t.stage("detect"):
            out = detect(...)
            t.sync(out)          # forces completion before the stage closes
        print(t.report())
    """

    def __init__(self):
        self.times = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    @staticmethod
    def sync(tree):
        """Force device completion by pulling (small) leaves to host."""
        import jax
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf)

    def report(self):
        lines = []
        for name, total in sorted(self.times.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {1000 * total:9.1f} ms total "
                         f"({1000 * total / n:7.2f} ms x {n})")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(path="/tmp/headtrackr_trace"):
    """jax.profiler device trace around a block."""
    import jax
    with jax.profiler.trace(path):
        yield


def enable_compilation_cache(directory="/root/.cache/headtrackr_jax",
                             min_compile_secs=5.0):
    """Turn on JAX's persistent compilation cache for the serving programs.

    The batched serving programs (BatchedTracker.warmup / run_scan) take
    minutes to compile; with the cache, any process re-running unchanged code
    reuses the compiled executables from disk (keys are HLO fingerprints, so
    code changes miss safely).  Verified working with the axon TPU backend
    (bench compile 535 s cold -> 327 s warm; the remainder is executable
    load).  Call BEFORE the first jit compilation.  Set ``directory=None``
    to leave the cache off.
    """
    if not directory:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
