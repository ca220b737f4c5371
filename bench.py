"""Headline benchmark: SGA iterative-inference throughput per chip.

The reference's flagship workload (sga.py: 2000 host-round-trip Adam steps
per image batch) rebuilt as a single jitted lax.scan. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the TF1 reference runs 2000 sess.run round trips per batch; the
paper reports SGA inference on the order of a minute per Kodak image on a
contemporary GPU. We use 1/60 images/sec as the reference throughput
anchor (BASELINE.md publishes no speed numbers; BASELINE.json's north star
is >= 10x this).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMAGES_PER_SEC = 1.0 / 60.0  # TF1 SGA anchor (see module docstring)


def main():
    from nic_tpu.infer.engine import LatentOptimizer
    from nic_tpu.infer.methods import SGA
    from nic_tpu.models.mbt2018 import MeanScaleHyperprior

    batch = 4
    h, w = 768, 512  # Kodak-sized
    iterations = 2000  # the reference's fixed setting (sga.py:192)

    model = MeanScaleHyperprior(num_filters=192)
    x0 = jnp.zeros((batch, h, w, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), x0, training=True, rng=jax.random.PRNGKey(1)
    )
    opt = LatentOptimizer(model, variables["params"])
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, h, w, 3), dtype=np.float32)
    )

    spec = SGA  # full 2000-iteration config
    # Warmup: compile.
    res = opt.optimize(x, lmbda=0.01, method=spec, seed=0)
    assert np.all(np.isfinite(res["est_bpp"]))

    t0 = time.perf_counter()
    runs = 2
    for s in range(runs):
        res = opt.optimize(x, lmbda=0.01, method=spec, seed=s + 1)
    dt = time.perf_counter() - t0
    images_per_sec = (batch * runs) / dt

    print(
        json.dumps(
            {
                "metric": f"SGA inference throughput ({iterations} its, {h}x{w}, nf=192)",
                "value": round(images_per_sec, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / REFERENCE_IMAGES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
