"""A/B SGA engine perf knobs on real TPU: scan unroll and carry donation.

Run: python scripts/profile_sga_variants.py [iters] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nic_tpu.infer.engine import LatentOptimizer
from nic_tpu.infer.methods import SGA
from nic_tpu.models.mbt2018 import MeanScaleHyperprior


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    h, w = 768, 512
    model = MeanScaleHyperprior(num_filters=192, compute_dtype=jnp.bfloat16)
    x0 = jnp.zeros((batch, h, w, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), x0, training=True, rng=jax.random.PRNGKey(1)
    )
    opt = LatentOptimizer(model, variables["params"])
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, h, w, 3), dtype=np.float32)
    )
    method = SGA.replace(iterations=iters)

    variants = [
        ("baseline", dict()),
        ("unroll2", dict(unroll=2)),
        ("donate", dict(donate=True)),
        ("unroll2+donate", dict(unroll=2, donate=True)),
        # TPU-native RBG generator for the per-step Gumbel noise (threefry
        # is a long VPU op chain; rbg is a hardware generator).
        ("rbg", dict(rng=jax.random.key(1, impl="rbg"))),
        ("rbg+donate", dict(rng=jax.random.key(1, impl="rbg"), donate=True)),
    ]
    base = None
    for name, kw in variants:
        warm_kw = dict(kw)
        if "rng" in warm_kw:
            warm_kw["rng"] = jax.random.key(0, impl="rbg")
        opt.optimize(x, lmbda=0.01, method=method, seed=0, **warm_kw)  # compile
        t0 = time.perf_counter()
        r = opt.optimize(x, lmbda=0.01, method=method, seed=1, **kw)
        dt = time.perf_counter() - t0
        if base is None:
            base = dt
        print(
            f"{name:16s} {dt:7.2f} s  ({batch / dt:.4f} img/s, "
            f"x{base / dt:.3f} vs baseline)  est_bpp={np.mean(r['est_bpp']):.4f}"
        )


if __name__ == "__main__":
    main()
