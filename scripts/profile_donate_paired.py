"""Interleaved paired A/B of carry donation (tunnel perf drifts over time,
so sequential A/B runs are unreliable — alternate B,A,B,A and compare pairs).

Run: python scripts/profile_donate_paired.py [iters] [batch] [pairs]
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
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
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

    def run(donate, seed):
        t0 = time.perf_counter()
        opt.optimize(x, lmbda=0.01, method=method, seed=seed, donate=donate)
        return time.perf_counter() - t0

    run(False, 0)
    run(True, 0)  # compile both
    t_base, t_don = [], []
    for p in range(pairs):
        t_base.append(run(False, 1 + p))
        t_don.append(run(True, 1 + p))
        print(
            f"pair {p}: baseline {t_base[-1]:.2f}s, donate {t_don[-1]:.2f}s "
            f"(x{t_base[-1] / t_don[-1]:.3f})"
        )
    print(
        f"median ratio: x{np.median(np.array(t_base) / np.array(t_don)):.3f} "
        f"(>1 means donate wins)"
    )


if __name__ == "__main__":
    main()
