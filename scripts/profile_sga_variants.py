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

    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    variants = [
        ("baseline", dict()),
        ("donate", dict(donate=True)),
        ("unroll2+donate", dict(unroll=2, donate=True)),
        # TPU-native RBG generator for the per-step Gumbel noise (threefry
        # is a long VPU op chain; rbg is a hardware generator).
        ("rbg+unroll2+donate",
         dict(rng="rbg", unroll=2, donate=True)),
    ]
    base = None
    for name, kw in variants:
        def run(seed, kw=kw):
            k = dict(kw)
            if k.get("rng") == "rbg":
                k["rng"] = jax.random.key(seed, impl="rbg")
            return opt.optimize(x, lmbda=0.01, method=method, seed=seed, **k)

        run(0)  # compile
        best = float("inf")
        r = None
        for rep in range(reps):
            t0 = time.perf_counter()
            r = run(1 + rep)
            best = min(best, time.perf_counter() - t0)
        if base is None:
            base = best
        print(
            f"{name:20s} {best:7.2f} s best-of-{reps}  ({batch / best:.4f} img/s, "
            f"x{base / best:.3f} vs baseline)  est_bpp={np.mean(r['est_bpp']):.4f}"
        )


if __name__ == "__main__":
    main()
