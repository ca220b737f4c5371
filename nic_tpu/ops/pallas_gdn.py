"""Pallas TPU kernel for fused GDN.

Fuses square -> channel-mix matmul (MXU) -> bias -> rsqrt -> scale into one
VMEM-resident kernel, guaranteeing the fusion XLA usually (but not always)
finds for the GDN pattern. Rows of the flattened (pixels, channels) view are
tiled over the grid; gamma/beta are small and live fully in VMEM.

Used via ``nic_tpu.ops.gdn.gdn(..., use_pallas=True)`` or the GDN layer's
``use_pallas`` flag; the backward pass composes XLA matmuls (custom VJP) so
training works either way. Falls back to interpret mode off-TPU, which keeps
the unit tests hermetic on CPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    norm = jnp.dot(
        jnp.square(x), gamma_ref[:], preferred_element_type=jnp.float32
    ) + beta_ref[:]
    if inverse:
        scale = jnp.sqrt(norm)
    else:
        scale = lax.rsqrt(norm)
    out_ref[:] = (x.astype(jnp.float32) * scale).astype(x.dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _gdn_pallas_fwd_impl(x2d, gamma, beta, inverse: bool, interpret: bool):
    m, c = x2d.shape
    tile = 512 if m >= 512 else _round_up(max(m, 8), 8)
    padded = _round_up(m, tile)
    if padded != m:
        x2d = jnp.pad(x2d, ((0, padded - m), (0, 0)))
    grid = (padded // tile,)
    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((padded, c), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        interpret=interpret,
    )(x2d, gamma, beta)
    return out[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gdn_pallas(x2d, gamma, beta, inverse: bool, interpret: bool):
    return _gdn_pallas_fwd_impl(x2d, gamma, beta, inverse, interpret)


def _gdn_fwd(x2d, gamma, beta, inverse, interpret):
    out = _gdn_pallas_fwd_impl(x2d, gamma, beta, inverse, interpret)
    return out, (x2d, gamma, beta)


def _gdn_bwd(inverse, interpret, res, g):
    """Analytic GDN gradient, composed of two XLA matmuls.

    n = x^2 @ Gamma + beta;  y = x * n^(+-1/2)
    dL/dn_j = +-1/2 * g_j * x_j * n_j^(+-1/2 - 1)
    dL/dx_i = g_i * n_i^(+-1/2) + 2 x_i * (dL/dn @ Gamma^T)_i
    dL/dGamma_ij = sum_m x_mi^2 * dL/dn_mj ; dL/dbeta_j = sum_m dL/dn_mj
    """
    x, gamma, beta = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    n = jnp.matmul(jnp.square(xf), gamma.astype(jnp.float32)) + beta
    if inverse:
        half_pow = jnp.sqrt(n)          # n^(1/2)
        dn = 0.5 * gf * xf / half_pow   # g*x * (1/2) n^(-1/2)
    else:
        half_pow = lax.rsqrt(n)         # n^(-1/2)
        dn = -0.5 * gf * xf * half_pow / n  # g*x * (-1/2) n^(-3/2)
    dx = gf * half_pow + 2.0 * xf * jnp.matmul(dn, gamma.astype(jnp.float32).T)
    dgamma = jnp.matmul(jnp.square(xf).T, dn)
    dbeta = jnp.sum(dn, axis=0)
    return dx.astype(x.dtype), dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype)


_gdn_pallas.defvjp(_gdn_fwd, _gdn_bwd)


def gdn_pallas(x, beta, gamma, inverse: bool = False, interpret: bool = None):
    """Fused GDN over channel-last x of any rank (see nic_tpu.ops.gdn)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    out = _gdn_pallas(
        x2d, gamma.astype(x.dtype), beta.astype(jnp.float32), inverse, interpret
    )
    return out.reshape(shape)
