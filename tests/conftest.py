"""Test config: force CPU with 8 virtual devices for sharding tests.

Must set env vars before jax is imported anywhere.
"""

import os

# The machine env pre-sets JAX_PLATFORMS=axon (the remote TPU tunnel); tests
# must run on the virtual 8-device CPU mesh, so FORCE the override.
os.environ["JAX_PLATFORMS"] = "cpu"
# Even CPU-only processes register an axon session at jax-plugin discovery
# unless the pool is emptied; that churn wedges any concurrent TPU worker
# for ~15 min (round-3 lesson). Tests must never touch the tunnel.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# Async CPU dispatch deadlocks intermittently on single-core hosts (result
# futures never resolve); force synchronous dispatch for tests.
os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

# Persistent compilation cache: XLA-CPU compilation on this 1-vCPU VM is
# intermittently very slow (thread-handoff latency); cache compiles on disk
# so repeated test runs skip them.
import jax

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) imports jax and can
# force jax_platforms=axon via config before this file runs; env vars alone
# don't undo that — force the config back to cpu explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# NaN-sanitizer CI mode (SURVEY §5.2): UT_DEBUG_NANS=1 makes every jitted
# computation in the suite fail loudly at the op that produced a NaN
# (jax.debug_nans re-runs the offending computation un-jitted); slower, so
# opt-in:  UT_DEBUG_NANS=1 python -m pytest tests/ -q
if os.environ.get("UT_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)
