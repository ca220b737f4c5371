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
