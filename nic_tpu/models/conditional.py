"""Conditional Gaussian entropy model (tfc.GaussianConditional capability).

Models p(y|z) = N(mu, sigma^2) convolved with U(-0.5, 0.5), with a fixed
log-spaced scale table used to discretize sigma for entropy coding
(mbt2018.py:76-80 and every inference script). Stateless: plain functions of
(y, mu, sigma), so it composes freely with jit/vmap/scan and the sharded
training step.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nic_tpu import config
from nic_tpu.ops.bounds import lower_bound
from nic_tpu.ops.stats import (
    box_convolved_gaussian_likelihood,
    gaussian_standardized_cumulative,
    standardized_quantile,
)


@dataclass(frozen=True)
class GaussianConditional:
    """Mean/scale conditional entropy model with a scale table.

    Attributes:
      scale_table: ascending positive scales (64 log-spaced values between
        0.11 and 256 in all reference scripts, mbt2018.py:45-47,76).
      likelihood_bound: lower bound applied to likelihoods (tfc default 1e-9).
      tail_mass: mass allowed outside the coded support per scale level.
    """

    scale_table: np.ndarray = field(default_factory=config.scale_table)
    likelihood_bound: float = config.LIKELIHOOD_LOWER_BOUND
    tail_mass: float = config.CONDITIONAL_TAIL_MASS

    @property
    def scale_min(self) -> float:
        return float(self.scale_table[0])

    def bound_scale(self, sigma):
        """Lower-bound sigma at the smallest table scale (tfc behavior)."""
        return lower_bound(sigma, self.scale_min)

    def likelihood(self, y, mu, sigma, bound: bool = True):
        """p(y | mu, sigma) under the box-convolved Gaussian.

        Matches conditional_bottleneck._likelihood + the explicit
        lower_bound the scripts apply (sga.py:133-136).
        """
        lik = box_convolved_gaussian_likelihood(y, mu, self.bound_scale(sigma))
        if bound and self.likelihood_bound > 0:
            lik = lower_bound(lik, self.likelihood_bound)
        return lik

    def __call__(self, y, mu, sigma, training: bool, rng=None):
        """(y_tilde, likelihoods): noise during training, mean-centered
        rounding during eval (mbt2018.py:80)."""
        if training:
            if rng is None:
                raise ValueError("training=True requires an rng key")
            y_tilde = y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
        else:
            y_tilde = self.quantize(y, mu)
        return y_tilde, self.likelihood(y_tilde, mu, sigma)

    def quantize(self, y, mu):
        """Mean-centered rounding: round(y - mu) + mu, so a quantization bin
        lands exactly on the prior mean (tfc _quantize('dequantize');
        map.py:100, mbt2018_bb.py:91-94)."""
        return jnp.round(y - mu) + mu

    def symbols(self, y, mu):
        """Integer symbols round(y - mu) for entropy coding."""
        return jnp.round(y - mu).astype(jnp.int32)

    def dequantize_symbols(self, symbols, mu):
        return symbols.astype(jnp.float32) + mu

    def scale_indexes(self, sigma):
        """Index of the smallest table scale >= sigma, clamped to the table.

        Same bucketization as tfc GaussianConditional's index computation:
        start at the top index and subtract one for each table entry (except
        the last) that is >= sigma.
        """
        table = jnp.asarray(self.scale_table[:-1], jnp.float32)
        return jnp.sum(sigma[..., None] > table, axis=-1).astype(jnp.int32)

    # ------------------------------------------------------------ pmf export

    def support_halfwidths(self) -> np.ndarray:
        """Per-level integer half-width of the coded support (host)."""
        multiplier = -standardized_quantile(self.tail_mass / 2.0)
        return np.ceil(np.asarray(self.scale_table) * multiplier).astype(np.int64)

    def pmfs_for_coding(self):
        """PMF rows for each scale level over [-w_i, w_i] (host, numpy).

        Returns (pmf, offsets, lengths, tail) shaped like
        FactorizedEntropyModel.pmf_for_coding so both feed the same
        quantized-CDF builder.
        """
        widths = self.support_halfwidths()
        max_len = int(2 * widths.max() + 1)
        n = len(self.scale_table)
        pmf = np.zeros((n, max_len), np.float64)
        offsets = -widths
        lengths = 2 * widths + 1
        for i, (s, w) in enumerate(zip(self.scale_table, widths)):
            grid = np.arange(-w, w + 1, dtype=np.float64)
            upper = _std_cdf((grid + 0.5) / s)
            lower_ = _std_cdf((grid - 0.5) / s)
            pmf[i, : 2 * w + 1] = upper - lower_
        tail = np.maximum(1.0 - pmf.sum(axis=1), 0.0)
        return pmf, offsets.astype(np.int32), lengths.astype(np.int32), tail


def _std_cdf(x):
    from scipy.special import erfc

    return 0.5 * erfc(-(2 ** -0.5) * x)
