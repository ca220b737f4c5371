"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests must be hermetic and exercise the
multi-chip sharding paths without hardware, via XLA's host-platform device
count (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # 16 virtual devices but 8-wide meshes (NIC_TPU_MAX_MESH_DEVICES):
    # XLA:CPU sizes its shared Eigen pool to the forced device count, and on
    # a low-core host an 8-wide in-process all-reduce over an 8-thread pool
    # can deadlock (all workers block in the collective rendezvous while the
    # straggler partitions' compute sits queued behind them). The 8 spare
    # workers keep the rendezvous drainable. See parallel/mesh.py.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=16"
    ).strip()
os.environ.setdefault("NIC_TPU_MAX_MESH_DEVICES", "8")

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; force via the config API.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
