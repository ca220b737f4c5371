"""A/B the fused Pallas conv_transpose+IGDN kernel vs the XLA composite.

Measurement rules per NEXT.md: the tunnel acks dispatches before compute
finishes and memoizes identical calls, so only data-dependence-chained,
seconds-long single programs measure truly. Each iteration feeds its
(downsampled) output back as the next input.

Usage:
  python scripts/exp_fused_convt.py check            # real-TPU exactness
  python scripts/exp_fused_convt.py bench [N H W C]  # chained timing
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nic_tpu.ops.pallas_convt import (
    conv_transpose_igdn_up2,
    conv_transpose_igdn_up2_reference,
)


def make_params(c, co, dtype):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((5, 5, c, co)) * 0.05, dtype)
    bias = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.uniform(0.5, 1.5, co), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.0, 0.05, (co, co)), jnp.float32)
    return w, bias, beta, gamma


def check():
    c = co = 32
    w, bias, beta, gamma = make_params(c, co, jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 24, 16, c)),
                    jnp.float32)
    ref = conv_transpose_igdn_up2_reference(x, w, bias, beta, gamma)
    got = conv_transpose_igdn_up2(x, w, bias, beta, gamma, row_tile=8)
    scale0 = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"fp32 max abs err: {err:.2e} (rel {err / scale0:.2e})")
    # MXU fp32 passes round differently from XLA's conv emitter; ~1e-3
    # relative is the expected cross-implementation fp32 agreement on TPU.
    assert err / scale0 < 2e-3
    # bf16 path
    xb = x.astype(jnp.bfloat16)
    refb = conv_transpose_igdn_up2_reference(xb, w, bias, beta, gamma)
    gotb = conv_transpose_igdn_up2(xb, w, bias, beta, gamma, row_tile=8)
    errb = float(jnp.max(jnp.abs(refb.astype(jnp.float32) - gotb.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(refb.astype(jnp.float32)))) + 1e-9
    print(f"bf16 max abs err: {errb:.3e} (rel {errb / scale:.3e})")
    assert errb / scale < 0.05
    print("CHECK OK")


def bench(n=4, h=96, w_=64, c=192, tiles=(4, 8, 16)):
    iters, reps = 100, 2
    co = c
    dtype = jnp.bfloat16
    w, bias, beta, gamma = make_params(c, co, dtype)
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, h, w_, c)), dtype
    )
    gflop_conv = 2 * n * h * w_ * 25 * c * co / 1e9
    gflop_gdn = 2 * n * 4 * h * w_ * co * co / 1e9
    gflop = gflop_conv + gflop_gdn

    def chain(fn):
        def body(_, xx):
            y = fn(xx)
            nx = y[:, ::2, ::2, :].astype(dtype)
            return 0.1 * nx + 0.9 * xx

        return jax.jit(lambda x: lax.fori_loop(0, iters, body, x))

    def timeit(f):
        jax.block_until_ready(f(x0))
        best = float("inf")
        for i in range(reps):
            xv = x0 + jnp.asarray(1e-3 * (i + 1), dtype)
            jax.block_until_ready(xv)
            t0 = time.perf_counter()
            jax.block_until_ready(f(xv))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1000

    print(f"shape ({n},{h},{w_},{c}) -> ({n},{2*h},{2*w_},{co}), "
          f"{gflop:.2f} GFLOP/it (conv {gflop_conv:.2f} + gdn {gflop_gdn:.2f})")
    ms = timeit(chain(
        lambda xx: conv_transpose_igdn_up2_reference(xx, w, bias, beta, gamma)
    ))
    print(f"xla composite        {ms:8.3f} ms/it  {gflop / (ms * 1e-3):7.0f} GFLOP/s")
    for rt in tiles:
        try:
            ms = timeit(chain(
                lambda xx: conv_transpose_igdn_up2(
                    xx, w, bias, beta, gamma, row_tile=rt
                )
            ))
            print(f"pallas row_tile={rt:<3d} {ms:8.3f} ms/it  "
                  f"{gflop / (ms * 1e-3):7.0f} GFLOP/s")
        except Exception as e:
            print(f"pallas row_tile={rt}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check()
    else:
        args = [int(a) for a in sys.argv[2:6]] if len(sys.argv) > 2 else []
        bench(*args)
