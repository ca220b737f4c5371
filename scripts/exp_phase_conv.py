"""Phase-decomposed transposed convolution experiment.

conv_transpose(stride 2, 5x5, SAME) splits exactly into FOUR dense convs,
one per output parity phase (r, t), with per-phase tap counts 2x2 / 2x3 /
3x2 / 3x3 — 25 taps total, the same FLOPs as the direct transposed conv and
none of the dilated-input zeros. (The earlier "subpixel" rewrite padded
every phase to 3x3 = 36 tap slots, 44% extra FLOPs, and lost end-to-end;
this variant has no padding overhead.)

Derivation: conv_transpose SAME places the FLIPPED kernel at 2q - (k//2-1),
so out[2i+r, 2j+t] = sum_{a,b} x[i+a, j+b] * wf[2a+r+1, 2b+t+1] over taps
with 0 <= 2a+r+1 < 5  =>  r=0: a in {0,1}; r=1: a in {-1,0,1}.

Usage: python scripts/exp_phase_conv.py [check|bench]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


from nic_tpu.models.layers import (  # the shipped implementation
    _conv_transpose_phases_up2 as conv_transpose_phases,
)


def check():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 10, 7)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 5, 7, 11)), jnp.float32)
    ref = lax.conv_transpose(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = conv_transpose_phases(x, w)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"max abs err vs conv_transpose: {err:.2e}")
    assert err < 1e-4, "phase decomposition mismatch"
    print("CHECK OK")


def bench():
    # Op-level microbenchmarks are meaningless over the TPU tunnel (it acks
    # dispatches before compute completes and memoizes identical calls —
    # NEXT.md). The only trustworthy measure: a single device program whose
    # iterations form a DATA-DEPENDENCE CHAIN, long enough to take seconds.
    n, h, w_, c = 4, 96, 64, 192  # y-resolution of the g_s first layer
    iters, reps = 200, 2
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((5, 5, c, c)) * 0.05, jnp.bfloat16)
    gflop_per_it = 2 * n * h * w_ * 25 * c * c / 1e9

    def make(fn, grad):
        def step(x):
            if grad:
                return jax.grad(
                    lambda xx: jnp.sum(jnp.square(fn(xx, w)).astype(jnp.float32))
                )(x).astype(jnp.bfloat16)
            out = fn(x, w)
            return out[:, ::2, ::2, :]  # back to (h, w) to chain

        def run(x):
            def body(_, xx):
                nx = step(xx)
                # keep magnitudes bounded so bf16 doesn't overflow
                return 0.1 * nx + 0.9 * xx

            return lax.fori_loop(0, iters, body, x)

        return jax.jit(run)

    def f_ref(x, w):
        return lax.conv_transpose(
            x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def timeit(f):
        jax.block_until_ready(f(x0))
        best = float("inf")
        for i in range(reps):
            xv = x0 + jnp.bfloat16(1e-3 * (i + 1))
            jax.block_until_ready(xv)
            t0 = time.perf_counter()
            jax.block_until_ready(f(xv))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1000  # ms per conv application

    for grad in (False, True):
        tag = "fwd+bwd-x" if grad else "fwd"
        mult = 3 if grad else 1  # bwd-x ~ 2x fwd FLOPs
        for name, fn in (
            ("conv_transpose", f_ref),
            ("phases", conv_transpose_phases),
        ):
            ms = timeit(make(fn, grad))
            print(
                f"{name:16s} {tag:10s} {ms:8.3f} ms/it  "
                f"{mult * gflop_per_it / (ms * 1e-3):7.1f} GFLOP/s"
            )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check()
    else:
        bench()
