"""Bits-back variant of the mean-scale hyperprior ("mbt2018_bb").

Same generative model as MBT2018 but with a *Gaussian* inference posterior
over the hyper-latent: q(z_tilde | x) = N(h_a(y)), sampled by
reparameterization, and the learned flexible prior evaluated as a continuous
pdf (mbt2018_bb.py:49-102). The net rate subtracts the bits-back term
E[-log q(z_tilde)] (mbt2018_bb.py:110-118). Train-only in the reference;
inference happens via the bb_* engines.
"""

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from nic_tpu.config import (
    LIKELIHOOD_LOWER_BOUND,
    VARIANCE_UPPER_BOUND_BB_TRAIN,
)
from nic_tpu.models.conditional import GaussianConditional
from nic_tpu.models.factorized_prior import FactorizedEntropyModel
from nic_tpu.models.transforms import (
    AnalysisTransform,
    HyperAnalysisTransform,
    MBT2018HyperSynthesisTransform,
    SynthesisTransform,
)
from nic_tpu.ops.bounds import lower_bound, upper_bound
from nic_tpu.ops.stats import log_normal_pdf

LN2 = 0.6931471805599453


class BitsBackHyperprior(nn.Module):
    """Hyperprior with Gaussian hyper-posterior for bits-back coding."""

    num_filters: int = 192
    compute_dtype: Any = jnp.float32

    def setup(self):
        n = self.num_filters
        dt = self.compute_dtype
        self.analysis = AnalysisTransform(n, dtype=dt)
        self.synthesis = SynthesisTransform(n, dtype=dt)
        # h_a emits (mean, logvar): 2N output channels (mbt2018_bb.py:58).
        self.hyper_analysis = HyperAnalysisTransform(n, num_output_filters=2 * n, dtype=dt)
        self.hyper_synthesis = MBT2018HyperSynthesisTransform(
            n, num_output_filters=2 * n, dtype=dt
        )
        # Flexible prior on z (mbt2018_bb.py:73-74); quantiles unused here
        # but harmless — this model never quantizes z.
        self.hyper_prior = FactorizedEntropyModel(channels=n, dims=(3, 3, 3))
        self.conditional = GaussianConditional()

    # ----------------------------------------------------------- sub-passes

    def analyze(self, x):
        return self.analysis(x)

    def hyper_posterior(self, y):
        """(z_mean, z_logvar) = split(h_a(y)) (mbt2018_bb.py:66)."""
        return tuple(jnp.split(self.hyper_analysis(y), 2, axis=-1))

    def hyper_prior_pdf(self, z_tilde):
        lik = self.hyper_prior.pdf(z_tilde, stop_gradient=False)
        return lower_bound(lik, LIKELIHOOD_LOWER_BOUND)

    def hyper_synthesize(self, z_tilde, y_hw=None, training: bool = False):
        mu, log_sigma = jnp.split(self.hyper_synthesis(z_tilde), 2, axis=-1)
        sigma = jnp.exp(log_sigma)
        if training:
            # sigma <= sqrt(1e1) during training (mbt2018_bb.py:81-82).
            sigma = upper_bound(sigma, VARIANCE_UPPER_BOUND_BB_TRAIN ** 0.5)
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

    def y_likelihood(self, y_tilde, mu, sigma):
        return self.conditional.likelihood(y_tilde, mu, sigma)

    # -------------------------------------------------------------- forward

    def __call__(self, x, training: bool, rng=None) -> Dict[str, Any]:
        if training and rng is None:
            raise ValueError("training=True requires rng")
        rng_eps, rng_y = (jax.random.split(rng) if rng is not None else (None, None))

        y = self.analysis(x)
        z_mean, z_logvar = self.hyper_posterior(y)
        eps = jax.random.normal(rng_eps, z_mean.shape, z_mean.dtype)
        z_tilde = eps * jnp.exp(z_logvar * 0.5) + z_mean
        log_q_z = log_normal_pdf(z_tilde, z_mean, z_logvar)
        z_lik = self.hyper_prior_pdf(z_tilde)

        y_hw = None if training else (y.shape[1], y.shape[2])
        mu, sigma = self.hyper_synthesize(z_tilde, y_hw=y_hw, training=training)
        y_tilde, y_lik = self.conditional(y, mu, sigma, training=training, rng=rng_y)
        x_hw = None if training else (x.shape[1], x.shape[2])
        x_tilde = self.synthesize(y_tilde, x_hw=x_hw)
        return dict(
            y=y,
            z_mean=z_mean,
            z_logvar=z_logvar,
            z_tilde=z_tilde,
            log_q_z_tilde=log_q_z,
            z_likelihoods=z_lik,
            mu=mu,
            sigma=sigma,
            y_tilde=y_tilde,
            y_likelihoods=y_lik,
            x_tilde=x_tilde,
        )


def bb_rd_loss(outputs: Dict[str, Any], x, lmbda: float, distortion: str = "mse"):
    """Bits-back training loss (mbt2018_bb.py:105-128)."""
    from nic_tpu.models.mbt2018 import distortion_loss

    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    bpp_back = -jnp.sum(outputs["log_q_z_tilde"]) / (LN2 * num_pixels)
    y_bpp = -jnp.sum(jnp.log(outputs["y_likelihoods"])) / (LN2 * num_pixels)
    z_bpp = -jnp.sum(jnp.log(outputs["z_likelihoods"])) / (LN2 * num_pixels)
    train_bpp = y_bpp + z_bpp - bpp_back
    dist, dist_metrics = distortion_loss(x, outputs["x_tilde"], distortion)
    loss = lmbda * dist + train_bpp
    return loss, dict(
        loss=loss,
        bpp=train_bpp,
        y_bpp=y_bpp,
        z_bpp=z_bpp,
        bpp_back=bpp_back,
        **dist_metrics,
    )
