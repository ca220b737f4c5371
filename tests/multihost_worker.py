"""Worker process for the multi-host (DCN) test.

Each worker is one "host" of a 2-process JAX cluster (CPU devices standing in
for a pod slice reached over DCN). It initializes the cluster through the
package's own entry point (parallel/mesh.py initialize_multihost), then runs
real Trainer steps over the *global* mesh, feeding only its local share of
the batch — exactly the multi-host training-sweep path documented in
SURVEY.md section 2.3.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
Prints "MH_LOSS <loss>" on success; both workers must print the same value
(the train state is replicated, so divergence = broken collective).
"""

import os
import sys


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("NIC_TPU_MAX_MESH_DEVICES", None)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from nic_tpu.parallel.mesh import initialize_multihost, make_global_batch

    initialize_multihost(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    import numpy as np

    from nic_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        model="mbt2018",
        num_filters=4,
        batchsize=2 * nproc,
        patchsize=64,
        last_step=2,
        checkpoint_dir=f"/tmp/nic_tpu_mh_{pid}",
    )
    t = Trainer(cfg)
    assert t.mesh.devices.size == 2 * nproc
    state = t.init_state()
    # Different per-host data (per-host pipelines see different images).
    rng = np.random.default_rng(123 + pid)
    metrics = None
    for _ in range(2):
        local = rng.random((2, cfg.patchsize, cfg.patchsize, 3), dtype=np.float32)
        batch = make_global_batch(local, t.mesh)
        state, metrics = t.step_fn(state, batch)
    print(f"MH_LOSS {float(metrics['loss']):.10f}", flush=True)


if __name__ == "__main__":
    main()
