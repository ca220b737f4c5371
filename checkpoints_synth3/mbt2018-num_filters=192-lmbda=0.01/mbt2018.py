"""Mean-scale hyperprior model ("MBT2018", base model M3).

Generative model (mbt2018.py:10-23):
    p(z_tilde) = deep factorized prior
    p(y_tilde | z_tilde) = N(mu, sigma^2) * U(-.5, .5),  (mu, sigma) = h_s(z_tilde)
    p(x | y_tilde) = N(g_s(y_tilde), .)
Inference: y = g_a(x), z = h_a(y), with box-shaped posteriors (noise during
training, rounding during compression).

Design notes (TPU-first):
- One flax module owns all four transforms + the factorized prior, so a
  single param pytree flows through pjit/optax/orbax.
- Arbitrary image sizes work under jit with static shapes per (H, W): the
  convs give ceil-division shapes exactly like tfc's same_zeros padding, and
  mu/sigma/x_tilde are cropped with *static* slices (mbt2018.py:72-75,87) —
  one compile per distinct image shape, same as a TF1 placeholder graph.
- The training forward returns everything the losses need; rate/distortion
  reductions happen in `rd_loss` below (mbt2018.py:92-113).
"""

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nic_tpu.models.conditional import GaussianConditional
from nic_tpu.models.factorized_prior import FactorizedEntropyModel
from nic_tpu.models.transforms import (
    AnalysisTransform,
    HyperAnalysisTransform,
    MBT2018HyperSynthesisTransform,
    SynthesisTransform,
)

LN2 = 0.6931471805599453


class MeanScaleHyperprior(nn.Module):
    """The base hyperprior model (mbt2018.py:50-89).

    ``compute_dtype``: dtype of the transform convolutions (parameters stay
    fp32; likelihood/rate math always runs fp32). bfloat16 roughly halves
    the per-iteration cost of the iterative-inference engines on TPU.
    """

    num_filters: int = 192
    compute_dtype: Any = jnp.float32
    use_pallas_gdn: bool = False
    # 'transpose' (default) or 'phases'/'subpixel' (element-exact
    # alternatives; both measured SLOWER end-to-end on v5e — see layers.py).
    upsample_impl: str = "transpose"
    # None or 'int8': dynamic W8A8 forward for the decode-side transforms
    # (frozen-weight inference loops only; see ops/int8conv.py).
    quant: Optional[str] = None

    def setup(self):
        n = self.num_filters
        dt = self.compute_dtype
        self.analysis = AnalysisTransform(n, dtype=dt, use_pallas_gdn=self.use_pallas_gdn)
        self.synthesis = SynthesisTransform(
            n, dtype=dt, use_pallas_gdn=self.use_pallas_gdn,
            upsample_impl=self.upsample_impl, quant=self.quant,
        )
        self.hyper_analysis = HyperAnalysisTransform(n, dtype=dt)
        self.hyper_synthesis = MBT2018HyperSynthesisTransform(
            n, num_output_filters=2 * n, dtype=dt,
            upsample_impl=self.upsample_impl, quant=self.quant,
        )
        self.entropy_bottleneck = FactorizedEntropyModel(channels=n)
        self.conditional = GaussianConditional()

    # ----------------------------------------------------------- sub-passes
    # Exposed individually because the iterative-inference engines build
    # their own computations over latents (sga.py:77-136 pattern).

    def analyze(self, x):
        return self.analysis(x)

    def hyper_analyze(self, y):
        return self.hyper_analysis(y)

    def hyper_synthesize(self, z_tilde, y_hw=None):
        """(mu, sigma) from z_tilde; optionally crop to y spatial dims
        (mbt2018.py:70-75)."""
        mu, log_sigma = jnp.split(self.hyper_synthesis(z_tilde), 2, axis=-1)
        sigma = jnp.exp(log_sigma)
        if y_hw is not None:
            h, w = y_hw
            mu = mu[:, :h, :w, :]
            sigma = sigma[:, :h, :w, :]
        return mu, sigma

    def synthesize(self, y_tilde, x_hw=None):
        x_tilde = self.synthesis(y_tilde)
        if x_hw is not None:
            h, w = x_hw
            x_tilde = x_tilde[:, :h, :w, :]
        return x_tilde

    def synthesize_blocks(self, y_tilde, block_hw=None):
        """Reconstruction in 2x2-block space (B, H/2, W/2, 12): identical
        pixels as `synthesize` modulo depth-to-space ordering. The iterative
        engines compare it against space_to_depth(x) so the final 192->3
        conv keeps 12 MXU output lanes and skips the reordering transpose."""
        xb = self.synthesis(y_tilde, block_space=True)
        if block_hw is not None:
            h, w = block_hw
            xb = xb[:, :h, :w, :]
        return xb

    def z_likelihood(self, z_tilde):
        """Lower-bounded factorized likelihood of a (possibly relaxed) z
        (sga.py:100-104)."""
        from nic_tpu.ops.bounds import lower_bound

        lik = self.entropy_bottleneck.likelihood(z_tilde)
        return lower_bound(lik, self.entropy_bottleneck.likelihood_bound)

    def y_likelihood(self, y_tilde, mu, sigma):
        return self.conditional.likelihood(y_tilde, mu, sigma)

    def quantize_z(self, z):
        return self.entropy_bottleneck.quantize(z, "dequantize")

    def medians(self):
        return self.entropy_bottleneck.medians

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    def pmf_for_coding(self, max_length: int = 256, grid: str = "median"):
        return self.entropy_bottleneck.pmf_for_coding(max_length, grid=grid)

    # -------------------------------------------------------------- forward

    def __call__(self, x, training: bool, rng=None) -> Dict[str, Any]:
        """Full forward pass (mbt2018.py:50-89). Returns a dict of tensors."""
        if training and rng is None:
            raise ValueError("training=True requires rng")
        rng_z, rng_y = (jax.random.split(rng) if rng is not None else (None, None))

        y = self.analysis(x)
        z = self.hyper_analysis(y)
        z_tilde, z_lik = self.entropy_bottleneck(z, training=training, rng=rng_z)
        y_hw = None if training else (y.shape[1], y.shape[2])
        mu, sigma = self.hyper_synthesize(z_tilde, y_hw=y_hw)
        y_tilde, y_lik = self.conditional(y, mu, sigma, training=training, rng=rng_y)
        x_hw = None if training else (x.shape[1], x.shape[2])
        x_tilde = self.synthesize(y_tilde, x_hw=x_hw)
        return dict(
            y=y,
            z=z,
            z_tilde=z_tilde,
            z_likelihoods=z_lik,
            mu=mu,
            sigma=sigma,
            y_tilde=y_tilde,
            y_likelihoods=y_lik,
            x_tilde=x_tilde,
        )


def distortion_loss(x, x_tilde, distortion: str = "mse"):
    """Distortion term + metrics shared by the training losses.

    "mse":    255^2 * MSE (the reference's only objective, mbt2018.py:99-103).
    "msssim": 1 - MS-SSIM, the standard perceptual objective for the
              MS-SSIM-optimized model variants of Minnen et al. 2018
              (an extension — the reference trains MSE-only).
    Returns (distortion, metrics-dict).
    """
    float_mse = jnp.mean(jnp.square(x - x_tilde))
    psnr = -10.0 * jnp.log(float_mse) / jnp.log(10.0)
    train_mse = float_mse * (255.0 ** 2)
    metrics = dict(mse=train_mse, psnr=psnr)
    if distortion == "mse":
        return train_mse, metrics
    if distortion == "msssim":
        from nic_tpu.evaluation.metrics import msssim

        ms = jnp.mean(msssim(x_tilde, x, max_val=1.0))
        metrics["msssim"] = ms
        return 1.0 - ms, metrics
    raise ValueError(f"Unknown distortion {distortion!r}")


def rd_loss(outputs: Dict[str, Any], x, lmbda: float, distortion: str = "mse"):
    """Rate-distortion training loss (mbt2018.py:96-113).

    bpp normalizes by the full batch pixel count; the distortion term is
    255^2-scaled MSE or (1 - MS-SSIM), see `distortion_loss`.
    Returns (loss, metrics-dict).
    """
    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    y_bpp = -jnp.sum(jnp.log(outputs["y_likelihoods"])) / (LN2 * num_pixels)
    z_bpp = -jnp.sum(jnp.log(outputs["z_likelihoods"])) / (LN2 * num_pixels)
    train_bpp = y_bpp + z_bpp
    dist, dist_metrics = distortion_loss(x, outputs["x_tilde"], distortion)
    loss = lmbda * dist + train_bpp
    return loss, dict(
        loss=loss,
        bpp=train_bpp,
        y_bpp=y_bpp,
        z_bpp=z_bpp,
        **dist_metrics,
    )


def eval_bpp(outputs: Dict[str, Any], num_pixels_per_image: int):
    """Per-image estimated bpp split (mbt2018.py:167-170)."""
    axes = (1, 2, 3)
    y_bpp = -jnp.sum(jnp.log(outputs["y_likelihoods"]), axis=axes) / (
        LN2 * num_pixels_per_image
    )
    z_bpp = -jnp.sum(jnp.log(outputs["z_likelihoods"]), axis=axes) / (
        LN2 * num_pixels_per_image
    )
    return y_bpp + z_bpp, y_bpp, z_bpp
