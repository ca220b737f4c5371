"""Interleaved A/B: upsample_impl 'transpose' (default) vs 'phases' on the
full SGA engine (tunnel perf drifts, so alternate runs and compare pairs).

Run: python scripts/profile_phases.py [iters] [batch] [pairs]
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
    m_ref = MeanScaleHyperprior(num_filters=192, compute_dtype=jnp.bfloat16)
    m_ph = MeanScaleHyperprior(
        num_filters=192, compute_dtype=jnp.bfloat16, upsample_impl="phases"
    )
    x0 = jnp.zeros((batch, h, w, 3), jnp.float32)
    variables = m_ref.init(
        jax.random.PRNGKey(0), x0, training=True, rng=jax.random.PRNGKey(1)
    )
    params = variables["params"]
    o_ref = LatentOptimizer(m_ref, params)
    o_ph = LatentOptimizer(m_ph, params)
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, h, w, 3), dtype=np.float32)
    )
    method = SGA.replace(iterations=iters)

    def run(opt, seed):
        t0 = time.perf_counter()
        r = opt.optimize(x, lmbda=0.01, method=method, seed=seed)
        return time.perf_counter() - t0, float(np.mean(r["est_bpp"]))

    run(o_ref, 0)
    run(o_ph, 0)  # compile both
    t_ref, t_ph = [], []
    for p in range(pairs):
        tr, br = run(o_ref, 1 + p)
        tp, bp = run(o_ph, 1 + p)
        t_ref.append(tr)
        t_ph.append(tp)
        print(
            f"pair {p}: transpose {tr:.2f}s  phases {tp:.2f}s "
            f"(x{tr / tp:.3f})  bpp {br:.4f}/{bp:.4f}"
        )
    print(
        f"median ratio: x{np.median(np.array(t_ref) / np.array(t_ph)):.3f} "
        "(>1 means phases wins)"
    )


if __name__ == "__main__":
    main()
