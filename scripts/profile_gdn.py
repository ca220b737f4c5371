"""A/B the fused Pallas GDN kernel against the 1x1-conv GDN formulation on
real TPU hardware, end-to-end through a short SGA run at bench shapes.

Run:  python scripts/profile_gdn.py [iters] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nic_tpu.infer.engine import LatentOptimizer
from nic_tpu.infer.methods import SGA
from nic_tpu.models.mbt2018 import MeanScaleHyperprior


def run(use_pallas: bool, iters: int, batch: int) -> float:
    h, w = 768, 512
    model = MeanScaleHyperprior(
        num_filters=192, compute_dtype=jnp.bfloat16, use_pallas_gdn=use_pallas
    )
    x0 = jnp.zeros((batch, h, w, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), x0, training=True, rng=jax.random.PRNGKey(1)
    )
    opt = LatentOptimizer(model, variables["params"])
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, h, w, 3), dtype=np.float32)
    )
    method = SGA.replace(iterations=iters)
    opt.optimize(x, lmbda=0.01, method=method, seed=0)  # warmup/compile
    t0 = time.perf_counter()
    opt.optimize(x, lmbda=0.01, method=method, seed=1)
    dt = time.perf_counter() - t0
    ips = batch / dt
    print(
        f"use_pallas_gdn={use_pallas}: {dt:.2f} s for {iters} its, "
        f"batch {batch} -> {ips:.4f} img/s (extrapolated 2000-it: "
        f"{batch / (dt * 2000 / iters):.4f} img/s)"
    )
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    t_conv = run(False, iters, batch)
    t_pallas = run(True, iters, batch)
    print(f"pallas/conv time ratio: {t_pallas / t_conv:.3f} (<1 means pallas wins)")


if __name__ == "__main__":
    main()
