"""Generalized divisive normalization, TPU-first.

Functional core of tfc.GDN as used by the transforms (nn_models.py:17-63).
The channel mixing ``sum_i gamma[i, j] * x_i^2`` is expressed as a matmul so
XLA places it on the MXU and fuses the surrounding elementwise ops; x^2,
rsqrt and the final multiply are VPU work fused into the same kernel.
"""

import jax.numpy as jnp
from jax import lax


def gdn(x, beta, gamma, inverse: bool = False, use_pallas: bool = False):
    """Apply (inverse) GDN over the channel-last axis.

    y_j = x_j / sqrt(beta_j + sum_i gamma[i, j] * x_i^2)   (inverse: multiply)

    Args:
      x: [..., C] activations.
      beta: [C] nonnegative offsets.
      gamma: [C, C] nonnegative mixing weights.
      inverse: if True computes IGDN (synthesis direction).
      use_pallas: route through the fused Pallas TPU kernel
        (nic_tpu.ops.pallas_gdn) instead of relying on XLA fusion.
    """
    if use_pallas:
        from nic_tpu.ops.pallas_gdn import gdn_pallas

        return gdn_pallas(x, beta, gamma, inverse=inverse)
    # fp32 accumulation regardless of the activation dtype; the normalizer
    # itself (add beta, rsqrt) stays fp32 for stability. On NHWC tensors the
    # channel mix runs as a 1x1 conv rather than a dot_general: it keeps the
    # conv-friendly layout and saves XLA a layout copy of the full
    # activation on either side of the surrounding 5x5 convs.
    if x.ndim == 4:
        # Same-dtype conv (the conv VJP cannot mix cotangent dtypes); the
        # MXU still accumulates fp32 internally, and the add/rsqrt run fp32.
        # Precision: HIGHEST only for fp32 activations — for bf16 compute
        # it would force 6-pass fp32 passes in the conv *gradient* (the
        # cotangent is fp32), which measured ~18% of an SGA step.
        precision = (
            lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
        )
        # The normalizer (add beta, rsqrt) runs fp32: a bf16 normalizer was
        # benchmarked 45% SLOWER end-to-end (bf16 rsqrt/divide chains lower
        # poorly), so only the conv inputs follow the activation dtype.
        norm = lax.conv_general_dilated(
            jnp.square(x),
            gamma[None, None].astype(x.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        ).astype(jnp.float32) + beta
    else:
        norm = lax.dot_general(
            jnp.square(x),
            gamma,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) + beta
    if inverse:
        return (x * jnp.sqrt(norm).astype(x.dtype)).astype(x.dtype)
    return (x * lax.rsqrt(norm).astype(x.dtype)).astype(x.dtype)
