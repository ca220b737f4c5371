"""Device mesh and sharding helpers.

The reference is single-device (SURVEY.md section 2.3); the TPU-native design
scales by data parallelism over ICI: batches are sharded along a 1-D 'data'
mesh axis, parameters are replicated, and XLA inserts the gradient
all-reduce. Works identically on a real TPU pod slice and on the fake
8-device CPU mesh used in tests.
"""

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def max_mesh_devices() -> Optional[int]:
    """Optional cap on default mesh width (env NIC_TPU_MAX_MESH_DEVICES).

    Needed on low-core hosts running virtual multi-device CPU meshes: XLA:CPU
    sizes its shared Eigen pool to the forced device count, and an N-wide
    in-process all-reduce can deadlock when all N pool threads block in the
    collective rendezvous while the straggler partitions' compute sits queued
    behind them. Forcing 2N virtual devices but meshing over N leaves N spare
    workers, which removes the deadlock (tests/conftest.py does exactly this).
    """
    v = os.environ.get("NIC_TPU_MAX_MESH_DEVICES", "").strip()
    return int(v) if v else None


def default_device_count() -> int:
    """Device count for meshes when the caller doesn't pin one."""
    n = jax.device_count()
    cap = max_mesh_devices()
    return min(n, cap) if cap else n


def data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over the first ``num_devices`` devices (default: all,
    subject to the NIC_TPU_MAX_MESH_DEVICES cap)."""
    n = num_devices if num_devices is not None else default_device_count()
    return Mesh(np.asarray(jax.devices()[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch sharded along the data axis."""
    return jax.device_put(batch, batch_sharding(mesh))


def make_global_batch(local_batch, mesh: Mesh, sharding: Optional[NamedSharding] = None):
    """Assemble a globally-sharded batch from this process's local shard.

    Single-process: a plain device_put with the batch sharding (the round-1
    behavior, unchanged). Multi-process (DCN training sweeps): every host
    passes its *local* slice of the global batch and JAX stitches them into
    one global array laid out by ``sharding`` — the data-parallel analog of
    each host's input pipeline feeding its own chips. The global batch axis
    is ``local_batch.shape[axis] * process_count``.
    """
    sh = sharding if sharding is not None else batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sh)
    return jax.make_array_from_process_local_data(sh, local_batch)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) initialization for training sweeps.

    The reference is single-process (SURVEY.md section 2.3); for multi-host
    pods this defers to standard JAX distributed init — afterwards
    jax.devices() spans all hosts and the same data_mesh()/pjit code path
    scales across DCN with no further changes. No-op when already
    initialized or when running single-process.
    """
    # NOTE: must not touch the XLA backend before jax.distributed.initialize
    # (even jax.process_count() would initialize it), hence is_initialized().
    if jax.distributed.is_initialized():
        return  # already initialized
    if coordinator_address is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
