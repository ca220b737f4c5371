"""Flax building blocks: strided signal convolutions and GDN.

TPU-native counterparts of tfc.SignalConv2D / tfc.GDN as configured by the
reference transforms (nn_models.py:14-163). Downsampling uses
``lax.conv_general_dilated`` with SAME zero padding (matching tfc's
``same_zeros`` + ``corr=True`` output shape ceil(H/s)); upsampling uses
``lax.conv_transpose`` with SAME padding (output H*s). NHWC layout
throughout — the layout XLA:TPU prefers for image convs.
"""

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from nic_tpu.ops.bounds import lower_bound
from nic_tpu.ops.gdn import gdn as gdn_op


def _subpixel_kernel_up2(w):
    """Rearrange a stride-2 conv_transpose kernel (kh, kw, ci, co) into an
    equivalent dense 3x3 kernel with 4*co outputs (one block per output
    phase). Derivation: conv_transpose SAME places the flipped kernel at
    2q - (k//2 - 1); per output phase (r, t) only every other tap is live,
    giving 3x3 sub-kernels. Verified element-exact against
    lax.conv_transpose in tests."""
    k = w.shape[0]
    if k > 5:
        raise NotImplementedError("subpixel rewrite supports kernels up to 5x5")
    ci, co = w.shape[2], w.shape[3]
    wf = w[::-1, ::-1]
    off = k // 2 - 1  # conv_transpose places the flipped kernel at 2q - off
    blocks = []
    for r in range(2):
        for t in range(2):
            kk = jnp.zeros((3, 3, ci, co), w.dtype)
            for a in (-1, 0, 1):
                for b in (-1, 0, 1):
                    m, n = 2 * a + r + off, 2 * b + t + off
                    if 0 <= m < k and 0 <= n < k:
                        kk = kk.at[1 - a, 1 - b].set(wf[m, n])
            blocks.append(kk)
    return jnp.concatenate(blocks, axis=-1)


def _depth_to_space2(x4, co):
    n, h, w, _ = x4.shape
    x4 = x4.reshape(n, h, w, 2, 2, co)
    return x4.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, co)


def _phase_kernels_up2(w):
    """Split a stride-2 conv_transpose kernel (5,5,ci,co) into FOUR exact
    phase kernels with per-phase tap counts 2x2/2x3/3x2/3x3 — 25 live taps
    total, the same FLOPs as the transposed conv and none of the
    dilated-input zeros (unlike the 36-tap subpixel rewrite).

    Derivation: conv_transpose SAME places the flipped kernel at
    2q - (k//2 - 1), so out[2i+r] = sum_a x[i-a] * wf[2a+r+1] over taps with
    0 <= 2a+r+1 < 5. Returns [(r, t, kernel, (pad_top, pad_left))]."""
    if w.shape[0] != 5 or w.shape[1] != 5:
        raise NotImplementedError("phase rewrite is specialized to 5x5 kernels")
    wf = w[::-1, ::-1]
    out = []
    for r in range(2):
        for t in range(2):
            # Row offset is -a: order taps by descending a.
            a_taps = [a for a in (1, 0, -1) if 0 <= 2 * a + r + 1 < 5]
            b_taps = [b for b in (1, 0, -1) if 0 <= 2 * b + t + 1 < 5]
            k = jnp.stack(
                [
                    jnp.stack([wf[2 * a + r + 1, 2 * b + t + 1] for b in b_taps])
                    for a in a_taps
                ]
            )
            out.append((r, t, k, (max(a_taps), max(b_taps))))
    return out


def _conv_transpose_phases_up2(x, w):
    """Element-exact conv_transpose(stride 2, 5x5, SAME) as 4 dense VALID
    convs (one per output parity phase) + interleave. 25 live taps like the
    direct form; ~10% faster than XLA's transposed-conv emitter in an
    ISOLATED differentiated chain on v5e (scripts/exp_phase_conv.py) but
    30% SLOWER end-to-end in the SGA engine (median x0.70 over 4 interleaved
    pairs — the 4-conv+interleave form breaks XLA's fusion with IGDN and
    adds layout ops). Kept opt-in; 'transpose' stays the default."""
    n, h, wd, _ = x.shape
    co = w.shape[3]
    outs = {}
    for r, t, k, (pt, pl) in _phase_kernels_up2(w):
        ka, kb = k.shape[0], k.shape[1]
        xp = jnp.pad(x, ((0, 0), (pt, ka - 1 - pt), (pl, kb - 1 - pl), (0, 0)))
        outs[(r, t)] = lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    y = jnp.stack(
        [outs[(0, 0)], outs[(0, 1)], outs[(1, 0)], outs[(1, 1)]], axis=-2
    )
    y = y.reshape(n, h, wd, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * wd, co)


class SignalConv(nn.Module):
    """2-D convolution with integer down- or up-sampling.

    Equivalent capability to tfc.SignalConv2D with ``padding='same_zeros'``:
    ``strides_down=s`` -> strided conv (corr), output ceil(H/s);
    ``strides_up=s``   -> transposed conv, output H*s.

    ``dtype`` is the computation dtype: parameters are always stored fp32;
    with dtype=bfloat16 the input and kernel are cast down before the conv
    (halving HBM traffic on the hot inference path) while the MXU still
    accumulates partial products in fp32 internally.
    """

    features: int
    kernel: Tuple[int, int] = (5, 5)
    strides_down: int = 1
    strides_up: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    # 'transpose' (default) or 'subpixel'. The subpixel rewrite (dense conv
    # + depth-to-space, element-exact) avoids dilated-input zeros but costs
    # 36 vs 25 live taps; measured SLOWER end-to-end on v5e at the
    # hyperprior shapes (0.110 vs 0.132 img/s SGA bench), so transpose
    # stays the default. Kept for other shapes/hardware.
    upsample_impl: str = "transpose"
    # None (default), 'int8' (dynamically-quantized W8A8 forward on the
    # MXU's 2x int8 path, bf16 STE backward), or 'int8_all' ('int8' plus an
    # int8 input-cotangent conv for the 5x5/up2 shape). Only for
    # frozen-weight inference loops; ignored for block_space / subpixel /
    # phases variants (ops/int8conv.py).
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, block_space_output: bool = False):
        if self.strides_down > 1 and self.strides_up > 1:
            raise ValueError("Cannot both down- and up-sample.")
        in_ch = x.shape[-1]
        kernel_init = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
        w = self.param(
            "kernel", kernel_init, (*self.kernel, in_ch, self.features), jnp.float32
        )
        x = x.astype(self.dtype)
        w = w.astype(self.dtype)
        if block_space_output:
            # Return the upsampled output in 2x2-block space: channels
            # [(r*2+t)*features + c] hold pixel phase (r, t). Equivalent to
            # the full output modulo the depth-to-space reordering — used by
            # the optimization losses, whose MSE is reorder-invariant, to
            # keep the MXU's output dim at 4*features instead of features.
            if self.strides_up != 2:
                raise ValueError("block_space_output requires strides_up=2")
            y4 = lax.conv_general_dilated(
                x,
                _subpixel_kernel_up2(w),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.use_bias:
                b = self.param(
                    "bias", nn.initializers.zeros, (self.features,), jnp.float32
                )
                y4 = y4 + jnp.tile(b.astype(self.dtype), 4)
            return y4
        if self.quant in ("int8", "int8_all") and self.upsample_impl == "transpose":
            from nic_tpu.ops.int8conv import int8_conv, int8_conv_transpose_qbwd

            if (
                self.quant == "int8_all"
                and self.strides_up == 2
                and self.kernel == (5, 5)
            ):
                y = int8_conv_transpose_qbwd(x, w, 2)
            elif self.strides_up > 1:
                y = int8_conv(x, w, self.strides_up, True)
            else:
                y = int8_conv(x, w, self.strides_down, False)
            y = y.astype(self.dtype)
        elif self.strides_up == 2 and self.upsample_impl == "phases":
            y = _conv_transpose_phases_up2(x, w)
        elif self.strides_up == 2 and self.upsample_impl == "subpixel":
            y4 = lax.conv_general_dilated(
                x,
                _subpixel_kernel_up2(w),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = _depth_to_space2(y4, self.features)
        elif self.strides_up > 1:
            y = lax.conv_transpose(
                x,
                w,
                strides=(self.strides_up, self.strides_up),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = lax.conv_general_dilated(
                x,
                w,
                window_strides=(self.strides_down, self.strides_down),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class GDN(nn.Module):
    """Generalized divisive normalization layer (tfc.GDN capability).

    Parameters use the square-root "nonnegative" reparameterization with a
    small pedestal so that gradient descent keeps the effective beta/gamma
    nonnegative: the stored variable v maps to ``lower_bound(v, b)^2 - p``
    with pedestal p = offset^2 and bound b = sqrt(minimum + p).
    Initial effective values: beta = 1, gamma = 0.1 * I.
    """

    inverse: bool = False
    beta_min: float = 1e-6
    reparam_offset: float = 2 ** -18
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        pedestal = self.reparam_offset ** 2
        beta_bound = (self.beta_min + pedestal) ** 0.5
        gamma_bound = self.reparam_offset

        def beta_init(key, shape, dtype=jnp.float32):
            del key
            return jnp.full(shape, (1.0 + pedestal) ** 0.5, dtype)

        def gamma_init(key, shape, dtype=jnp.float32):
            del key
            return jnp.sqrt(0.1 * jnp.eye(shape[0], dtype=dtype) + pedestal)

        beta_v = self.param("beta", beta_init, (c,))
        gamma_v = self.param("gamma", gamma_init, (c, c))
        beta = jnp.square(lower_bound(beta_v, beta_bound)) - pedestal
        gamma = jnp.square(lower_bound(gamma_v, gamma_bound)) - pedestal
        return gdn_op(
            x.astype(self.dtype),
            beta,
            gamma.astype(self.dtype),
            inverse=self.inverse,
            use_pallas=self.use_pallas,
        )
