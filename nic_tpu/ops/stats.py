"""Density helpers for the entropy models.

Counterparts of /root/reference/utils.py:72-102 (log-normal pdf, erfc-based
Gaussian CDF, box-convolved Gaussian likelihood), written for XLA: pure
functions of arrays, fp32 math, no data-dependent branching.
"""

import math

import jax.numpy as jnp
from jax import lax

LOG2 = math.log(2.0)
LOG2PI = math.log(2.0 * math.pi)


def log_normal_pdf(sample, mean, logvar):
    """Elementwise Normal log-density (utils.py:75-77)."""
    return -0.5 * ((sample - mean) ** 2 * jnp.exp(-logvar) + logvar + LOG2PI)


def gaussian_standardized_cumulative(x):
    """Standard normal CDF via erfc for left-tail precision (utils.py:80-83)."""
    return 0.5 * lax.erfc(-(2 ** -0.5) * x)


def standardized_quantile(p: float) -> float:
    """Inverse standard-normal CDF of a Python float (host-side helper).

    Used when sizing the per-scale CDF table supports for entropy coding
    (the tfc GaussianConditional computes the same from its tail mass).
    """
    from statistics import NormalDist

    return NormalDist().inv_cdf(p)


def box_convolved_gaussian_likelihood(inputs, mu, sigma):
    """Likelihood of ``inputs`` under N(mu, sigma^2) * U(-0.5, 0.5).

    Equals CDF(inputs - mu + .5) - CDF(inputs - mu - .5) but evaluated in the
    left tail of the standardized cumulative where differences of small
    numbers retain precision (utils.py:86-102).
    """
    values = jnp.abs(inputs - mu)
    upper = gaussian_standardized_cumulative((0.5 - values) / sigma)
    lower = gaussian_standardized_cumulative((-0.5 - values) / sigma)
    return upper - lower
