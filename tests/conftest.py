"""Force JAX onto CPU with 8 virtual devices BEFORE jax is imported.

This container defaults to the 'axon' platform (a real TPU v5e behind a
localhost tunnel registered by /root/.axon_site/sitecustomize.py whenever
PALLAS_AXON_POOL_IPS is set).  Tests must run on CPU: op-by-op dispatch over
the tunnel is pathologically slow, and the 8 virtual CPU devices exercise the
multi-chip sharding paths without hardware.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# sitecustomize may have imported jax already (freezing the env read); update
# the config directly too.  Works as long as no backend has been initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by recompiling
# the same detector/serving programs every run (cache keys are HLO
# fingerprints, so code changes miss safely).  Shared with
# __graft_entry__.dryrun_multichip.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("HEADTRACKR_JAX_CACHE",
                                 "/root/.cache/headtrackr_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; axon sitecustomize override failed")


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
