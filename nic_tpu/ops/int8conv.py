"""Dynamically-quantized int8 convolutions for the iterative-inference loop.

The v5e MXU has 2x int8 peak over bf16, and during latent optimization the
transform weights are FROZEN — only the per-image latents move (the reference
hot loop, sga.py:190-215, differentiates w.r.t. latents alone). That makes
weight quantization loop-invariant (XLA hoists it out of the `lax.scan`) and
leaves just a per-step dynamic activation scale on the VPU.

Scheme (standard W8A8 dynamic quantization):
  - weights: symmetric int8 per *output channel* (the per-channel scale
    factors out of the conv sum, so it folds into the output rescale),
  - activations: symmetric int8 per tensor, scale = max|x| / 127 computed
    fresh each step,
  - accumulation in int32 on the MXU, output rescaled to bf16.

Backward is a straight-through estimator: gradients flow as if the conv had
run in bf16 with the *original* weights (exactly the gradient the engines
use today). The forward quantization error acts as extra bounded noise on
the objective — SGA already injects Gumbel noise by design, so the method
tolerates it; the RD delta is measured, not assumed (tests +
scripts/exp_int8.py A/B).

Opt-in via SignalConv(quant='int8') / MeanScaleHyperprior(quant='int8');
default path is untouched bf16.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _quantize_per_tensor(x):
    s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def _quantize_weight_per_cout(w):
    """Symmetric int8 with one scale per output channel (w: [kh,kw,ci,co])."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s  # s: [co]


def _qfwd(x, w, strides, transpose):
    xq, sx = _quantize_per_tensor(x)
    wq, sw = _quantize_weight_per_cout(w)
    if transpose:
        y = lax.conv_transpose(
            xq,
            wq,
            strides=(strides, strides),
            padding="SAME",
            dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
    else:
        y = lax.conv_general_dilated(
            xq,
            wq,
            window_strides=(strides, strides),
            padding="SAME",
            dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
    scale = (sx * sw).astype(jnp.bfloat16)  # [co], broadcasts over NHWC
    return y.astype(jnp.bfloat16) * scale


def _bf16_conv(x, w, strides, transpose):
    if transpose:
        return lax.conv_transpose(
            x, w, strides=(strides, strides), padding="SAME", dimension_numbers=_DN
        )
    return lax.conv_general_dilated(
        x, w, window_strides=(strides, strides), padding="SAME", dimension_numbers=_DN
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_conv(x, w, strides: int = 1, transpose: bool = False):
    """int8-forward conv (or conv_transpose) with bf16 STE backward.

    x: [N,H,W,Ci] (any float dtype), w: [kh,kw,Ci,Co] — returns bf16.
    """
    return _qfwd(x, w, strides, transpose)


def _int8_conv_fwd(x, w, strides, transpose):
    return _qfwd(x, w, strides, transpose), (x, w)


def _int8_conv_bwd(strides, transpose, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x_, w_: _bf16_conv(x_, w_, strides, transpose), x, w)
    return vjp(g.astype(x.dtype))


int8_conv.defvjp(_int8_conv_fwd, _int8_conv_bwd)


def _adjoint_weight_up2(w):
    """Kernel of the input-cotangent conv for conv_transpose(s=2, 5x5, SAME):
    dx = conv(g, rot180(w) with I/O swapped, window_strides=2, pad (1,2)).
    Verified element-exact against jax.vjp (tests/test_int8.py); the SAME
    conv_transpose always outputs exactly s*H, so the (1,2) padding is
    input-parity-independent."""
    return w.transpose(0, 1, 3, 2)[::-1, ::-1]


def _qbwd_x_up2(g, w, strides):
    wT = _adjoint_weight_up2(w)
    gq, sg = _quantize_per_tensor(g)
    wq, sw = _quantize_weight_per_cout(wT)
    dx = lax.conv_general_dilated(
        gq,
        wq,
        (strides, strides),
        ((1, 2), (1, 2)),
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    return dx.astype(jnp.bfloat16) * (sg * sw).astype(jnp.bfloat16)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def int8_conv_transpose_qbwd(x, w, strides: int = 2):
    """int8 conv_transpose with the input-cotangent conv ALSO in int8.

    The upstream gradient gets the same dynamic per-tensor quantization as
    activations (bounded ~0.4%-of-max noise per layer). Only the latents'
    cotangent runs quantized; the (DCE-eliminated when unused) weight
    cotangent stays float. Kernel 5x5, stride 2, SAME — the g_s/h_s
    upsampling shape used everywhere in the hyperprior.
    """
    return _qfwd(x, w, strides, True)


def _int8qb_fwd(x, w, strides):
    return _qfwd(x, w, strides, True), (x, w)


def _int8qb_bwd(strides, res, g):
    x, w = res
    if w.shape[0] != 5 or w.shape[1] != 5 or strides != 2:
        _, vjp = jax.vjp(lambda x_, w_: _bf16_conv(x_, w_, strides, True), x, w)
        return vjp(g.astype(x.dtype))
    dx = _qbwd_x_up2(g, w, strides).astype(x.dtype)
    # Weight cotangent: float (frozen weights in the inference loops — XLA
    # dead-code-eliminates this when the caller never uses it).
    _, vjp = jax.vjp(lambda w_: _bf16_conv(x, w_, strides, True), w)
    (dw,) = vjp(g.astype(x.dtype))
    return dx, dw


int8_conv_transpose_qbwd.defvjp(_int8qb_fwd, _int8qb_bwd)
