"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests must be hermetic and exercise the
multi-chip sharding paths without hardware, via XLA's host-platform device
count (SURVEY.md section 4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # 16 virtual devices but 8-wide meshes (NIC_TPU_MAX_MESH_DEVICES):
    # XLA:CPU sizes its shared Eigen pool to the forced device count, and on
    # a low-core host an 8-wide in-process all-reduce over an 8-thread pool
    # can deadlock (all workers block in the collective rendezvous while the
    # straggler partitions' compute sits queued behind them). The 8 spare
    # workers keep the rendezvous drainable. See parallel/mesh.py.
    flags = flags + " --xla_force_host_platform_device_count=16"
    # Opt level 0 for the quick gate only: its wall time is XLA:CPU
    # compile-bound and its programs' runtime is negligible (measured -32%
    # cold wall; all exactness tests pass either way). The slow tier runs
    # real multi-step compute where runtime dominates, so it keeps full
    # optimization (opt0 made it ~2.5x slower end to end).
    if not any("slow" in a for a in sys.argv):
        flags += " --xla_backend_optimization_level=0"
    os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("NIC_TPU_MAX_MESH_DEVICES", "8")

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; force via the config API.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the quick gate's wall time on this 1-core host
# is dominated by XLA:CPU compiles, which are identical run to run. Cache
# everything (the default 1s min-compile-time threshold would skip most
# small test programs). Separate dir per optimization level in case the
# cache key doesn't cover every XLA flag.
_suffix = "-opt0" if "--xla_backend_optimization_level=0" in os.environ.get(
    "XLA_FLAGS", ""
) else ""
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/nic_tpu_test_jaxcache{_suffix}"
)
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
