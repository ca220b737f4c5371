"""Fused conv_transpose(5x5, stride-2 up) + IGDN Pallas kernel.

The SGA engine's named bottleneck is g_s's transposed convolutions at ~56%
MXU utilization (NEXT.md item 3). That 56% is largely *shape-imposed*: with
C=Co=192 channels, each per-phase GEMM runs K and N at 192/256 = 75% MXU
tile efficiency (0.75^2 = 0.56) — XLA is already near the speed of light
for its decomposition. The only way past it is restructuring the GEMMs:

This kernel computes the transposed conv as 4 exact output-parity phases
(the derivation in models/layers.py _phase_kernels_up2: out[2i+r, 2j+t] =
sum_{a,b} x[i-a, j-b] wf[2a+r+1, 2b+t+1]) but *im2col-merges each phase's
taps into K*: per-phase GEMM shapes [M, taps*C] @ [taps*C, Co] with
K in {768, 1152, 1152, 1728} — K-efficiency 96-100% instead of 75%,
raising the per-phase ceiling from 56% to ~72-75%. The IGDN normalizer
(z * sqrt(beta + z^2 @ gamma)) fuses in-register before the interleaved
store, so the phase outputs never round-trip HBM un-normalized.

Grid/tiling: one program per (batch element, row strip); each strip spans
the full padded width, so the 5x5 halo needs no overlapping blocks — the
wrapper materializes three vertically-shifted views of the padded input
(Mosaic DMA slices require 128-aligned lane dims, which rules out manual
halo DMA at C=192), and horizontal taps are static in-VMEM column slices.

Forward-only; the engine's backward (d/dx only — params are constants in
latent optimization) goes through the XLA composite via custom_vjp.

Reference workload: sga.py:190-215 (the 2000-step loop this feeds).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase_taps(r: int, t: int):
    """Static tap lists for output parity (r, t): (a, b) offsets with
    weight index wf[2a+r+1, 2b+t+1] (models/layers.py:53-78)."""
    a_taps = [a for a in (1, 0, -1) if 0 <= 2 * a + r + 1 < 5]
    b_taps = [b for b in (1, 0, -1) if 0 <= 2 * b + t + 1 < 5]
    return a_taps, b_taps


def phase_weight_mats(w: jnp.ndarray):
    """Per-phase im2col weight matrices [taps*C, Co] from a (5,5,C,Co)
    conv_transpose kernel, tap order matching the kernel's X concatenation
    (a-major then b)."""
    assert w.shape[0] == 5 and w.shape[1] == 5
    wf = w[::-1, ::-1]
    mats = []
    for r in range(2):
        for t in range(2):
            a_taps, b_taps = _phase_taps(r, t)
            rows = [
                wf[2 * a + r + 1, 2 * b + t + 1]
                for a in a_taps
                for b in b_taps
            ]
            mats.append(jnp.concatenate(rows, axis=0))  # [taps*C, Co]
    return mats


def _kernel(xv0, xv1, xv2, w0, w1, w2, w3, bias, beta, gamma, out_ref,
            *, th: int, wp: int, c: int, co: int, inverse: bool):
    xv = (xv0, xv1, xv2)  # vertical shift dy = 1 - a
    wmats = (w0, w1, w2, w3)
    m = th * wp
    phase_out = []
    for r in range(2):
        for t in range(2):
            a_taps, b_taps = _phase_taps(r, t)
            cols = [
                xv[1 - a][0, :, 1 - b : 1 - b + wp, :].reshape(m, c)
                for a in a_taps
                for b in b_taps
            ]
            xcat = jnp.concatenate(cols, axis=-1)  # [m, taps*c]
            z = jnp.dot(
                xcat, wmats[2 * r + t][:], preferred_element_type=jnp.float32
            )
            z = z + bias[:].astype(jnp.float32)
            # Fused IGDN (ops/gdn.py semantics): nrm = sqrt(beta + z^2 @ g).
            nrm = jnp.sqrt(
                beta[:].astype(jnp.float32)
                + jnp.dot(
                    z * z,
                    gamma[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
            )
            z = z * nrm if inverse else z / nrm
            phase_out.append(z.reshape(th, wp, co))

    # Interleave phases: out[2i+r, 2j+t] = phase[(r,t)][i, j].
    y = jnp.stack(phase_out, axis=2)  # [th, wp, 4, co]
    y = y.reshape(th, wp, 2, 2, co).transpose(0, 2, 1, 3, 4)
    out_ref[0] = y.reshape(2 * th, 2 * wp, co).astype(out_ref.dtype)


def conv_transpose_igdn_up2(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    beta: jnp.ndarray,
    gamma: jnp.ndarray,
    inverse: bool = True,
    row_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused conv_transpose(5x5, stride 2, SAME) + bias + (I)GDN.

    x [N,H,W,C] -> [N,2H,2W,Co]. Element-exact vs the composite
    lax.conv_transpose + gdn (tests/test_pallas_convt.py).
    """
    n, h, wd, c = x.shape
    co = w.shape[3]
    if wd > 66:
        # Column-split wide inputs (VMEM budget: full-width strips at
        # W=256, C=192 blow even the raised scoped limit). Uniform 66-wide
        # chunks = 64 output columns + 1-column halo each side; even chunk
        # width keeps the kernel's (th, wp, C) -> (th*wp, C) reshape
        # lane-aligned (wp*192 must be a multiple of 128). Outputs are
        # disjoint; halo columns are discarded.
        cw = 64
        wpad = -(-wd // cw) * cw
        xw = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + wpad - wd), (0, 0)))
        chunks = [
            conv_transpose_igdn_up2(
                lax.slice_in_dim(xw, k * cw, k * cw + cw + 2, axis=2),
                w, bias, beta, gamma,
                inverse=inverse, row_tile=row_tile, interpret=interpret,
            )[:, :, 2 : 2 + 2 * cw]
            for k in range(wpad // cw)
        ]
        return jnp.concatenate(chunks, axis=2)[:, :, : 2 * wd]
    th = row_tile
    hp = -(-h // th) * th
    wp = wd  # full-width strips; only edge padding horizontally
    dtype = x.dtype
    xp = jnp.pad(x, ((0, 0), (1, 1 + hp - h), (1, 1), (0, 0)))
    # Three vertically-shifted views: tap a reads rows i + (1 - a).
    xvs = [xp[:, dy : dy + hp] for dy in range(3)]
    mats = phase_weight_mats(w.astype(dtype))
    bias2 = bias.reshape(1, co)
    beta2 = beta.reshape(1, co)

    grid = (n, hp // th)
    out = pl.pallas_call(
        partial(_kernel, th=th, wp=wp, c=c, co=co, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((n, 2 * hp, 2 * wp, co), dtype),
        grid=grid,
        in_specs=[
            *[
                pl.BlockSpec(
                    (1, th, wp + 2, c),
                    lambda ni, ii: (ni, ii, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                for _ in range(3)
            ],
            *[
                pl.BlockSpec(
                    m.shape, lambda ni, ii: (0, 0), memory_space=pltpu.VMEM
                )
                for m in mats
            ],
            pl.BlockSpec((1, co), lambda ni, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda ni, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, co), lambda ni, ii: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * th, 2 * wp, co),
            lambda ni, ii: (ni, ii, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        # The unrolled 4-phase body keeps several im2col temporaries live;
        # raise Mosaic's scoped-VMEM cap beyond the 16MB default (v5e has
        # 128MB physical VMEM).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*xvs, *mats, bias2, beta2, gamma)
    return out[:, : 2 * h, :, :]


def conv_transpose_igdn_up2_reference(x, w, bias, beta, gamma, inverse=True):
    """XLA composite for equivalence tests and the custom-VJP backward
    (SignalConv(strides_up=2) + GDN, models/layers.py semantics)."""
    from nic_tpu.ops.gdn import gdn

    y = lax.conv_transpose(
        x, w.astype(x.dtype), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + bias.astype(y.dtype)
    return gdn(y, beta, gamma.astype(y.dtype), inverse=inverse)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_synthesis_layer(x, w, bias, beta, gamma, inverse=True):
    """Pallas forward, XLA backward (d/dx of the exact composite). Latent
    optimization differentiates only w.r.t. x — params are constants — so
    the backward recomputes the composite's dx with XLA's emitters."""
    return conv_transpose_igdn_up2(x, w, bias, beta, gamma, inverse=inverse)


def _fsl_fwd(x, w, bias, beta, gamma, inverse):
    y = conv_transpose_igdn_up2(x, w, bias, beta, gamma, inverse=inverse)
    return y, (x, w, bias, beta, gamma)


def _fsl_bwd(inverse, res, gy):
    x, w, bias, beta, gamma = res
    _, vjp = jax.vjp(
        lambda xx, ww, bb, be, ga: conv_transpose_igdn_up2_reference(
            xx, ww, bb, be, ga, inverse=inverse
        ),
        x, w, bias, beta, gamma,
    )
    return vjp(gy)


fused_synthesis_layer.defvjp(_fsl_fwd, _fsl_bwd)
