"""Image quality metrics: PSNR and multi-scale SSIM.

JAX counterparts of tf.image.psnr / tf.image.ssim_multiscale with the TF
defaults the reference relies on (sga.py:174-176): 11x11 Gaussian window
(sigma 1.5), k1=.01, k2=.03, 5 scales with the Wang et al. power factors,
VALID filtering, symmetric-pad + 2x2 average-pool downsampling. Computed in
fp32 on device; all convs are depthwise and fuse well under XLA.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a, b, max_val: float = 255.0):
    """Per-image PSNR over [N,H,W,C] batches (tf.image.psnr)."""
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val ** 2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    kernel2d = np.outer(g, g)
    return (kernel2d / kernel2d.sum()).astype(np.float32)


def _depthwise_filter(x, kernel2d):
    """VALID depthwise 2-D filtering over NHWC."""
    c = x.shape[-1]
    k = jnp.asarray(kernel2d)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))  # HWIO with I=1 per group
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _ssim_per_channel(a, b, max_val: float, filter_size: int = 11, filter_sigma: float = 1.5,
                      k1: float = 0.01, k2: float = 0.03) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ssim, cs) averaged over space, per [N, C]."""
    kernel = _gaussian_kernel(filter_size, filter_sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_a = _depthwise_filter(a, kernel)
    mu_b = _depthwise_filter(b, kernel)
    mu_aa = _depthwise_filter(a * a, kernel)
    mu_bb = _depthwise_filter(b * b, kernel)
    mu_ab = _depthwise_filter(a * b, kernel)

    var_a = mu_aa - mu_a * mu_a
    var_b = mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b

    luminance = (2.0 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
    cs = (2.0 * cov + c2) / (var_a + var_b + c2)
    ssim = jnp.mean(luminance * cs, axis=(1, 2))
    cs = jnp.mean(cs, axis=(1, 2))
    return ssim, cs


def _pad_to_even_and_downsample(x):
    """Symmetric-pad H,W to even then 2x2 average pool (TF's msssim step)."""
    n, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="symmetric")
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


@partial(jax.jit, static_argnums=(2,))
def msssim(a, b, max_val: float = 255.0):
    """Multi-scale SSIM per image over [N,H,W,C] (tf.image.ssim_multiscale).

    Requires H, W >= 11 * 2^4 = 176 after the standard 5 scales.
    """
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    mcs = []
    ssim = None
    for i in range(len(_MSSSIM_WEIGHTS)):
        if i > 0:
            a = _pad_to_even_and_downsample(a)
            b = _pad_to_even_and_downsample(b)
        ssim, cs = _ssim_per_channel(a, b, max_val)
        mcs.append(jax.nn.relu(cs))
    mcs_stack = jnp.stack(mcs[:-1], axis=-1)  # [N, C, scales-1]
    msssim_val = jnp.prod(mcs_stack ** weights[:-1], axis=-1) * (
        jax.nn.relu(ssim) ** weights[-1]
    )
    return jnp.mean(msssim_val, axis=-1)  # mean over channels -> [N]


def msssim_db(msssim_val):
    """-10 log10(1 - msssim) (sga.py:176)."""
    return -10.0 * jnp.log(1.0 - msssim_val) / jnp.log(10.0)
