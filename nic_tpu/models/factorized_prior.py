"""Deep factorized (learned) prior / entropy bottleneck.

One module covers both roles the reference splits across dependencies:

- the flexible per-channel density of Ballé et al. 2018 appendix 6.1, which
  the reference reimplements as ``BMSHJ2018Prior`` (learned_prior.py:10-361)
  for the bits-back models, and
- ``tfc.EntropyBottleneck`` (used by mbt2018/sga/map/ste/unoise for the
  hyper-latent z): the same density plus uniform-noise/rounding forward
  passes, a learned-quantile auxiliary loss whose median provides the
  quantization offset, and CDF-table export for range coding.

The density: a monotone map built from K+1 stages
  u <- softplus(H_k) @ u + b_k ;  u <- u + tanh(a_k) * tanh(u)  (k < K)
whose sigmoid is the CDF. Each channel has independent parameters; the batch
axis rides along the last dimension of a (C, d, N) tensor so every stage is a
batched matmul — MXU-friendly and trivially vmap/pjit-compatible.
"""

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from nic_tpu.config import FACTORIZED_TAIL_MASS, LIKELIHOOD_LOWER_BOUND
from nic_tpu.ops.bounds import lower_bound


def _channels_to_front(x):
    """(..., C) -> (C, 1, N) plus info to restore the original shape."""
    shape = x.shape
    c = shape[-1]
    perm = (x.ndim - 1,) + tuple(range(x.ndim - 1))
    flat = jnp.transpose(x, perm).reshape(c, 1, -1)
    return flat, shape


def _channels_to_back(flat, shape):
    c = shape[-1]
    inv_perm = tuple(range(1, len(shape))) + (0,)
    return jnp.transpose(flat.reshape((c,) + shape[:-1]), inv_perm)


class FactorizedEntropyModel(nn.Module):
    """Learned factorized prior with quantile tracking and coding support.

    Attributes:
      channels: number of independent per-channel densities.
      dims: hidden sizes of the CDF network (learned_prior.py:15-35).
      init_scale: initial density width; 10 matches tfc.EntropyBottleneck.
      tail_mass: probability mass assumed out-of-range when coding.
    """

    channels: int
    dims: Tuple[int, ...] = (3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = FACTORIZED_TAIL_MASS
    likelihood_bound: float = LIKELIHOOD_LOWER_BOUND

    def setup(self):
        dims = (1,) + tuple(self.dims) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.dims) + 1))
        matrices, biases, factors = [], [], []
        for i in range(len(self.dims) + 1):
            init = math.log(math.expm1(1.0 / scale / dims[i + 1]))

            def matrix_init(key, shape, dtype=jnp.float32, _v=init):
                del key
                return jnp.full(shape, _v, dtype)

            matrices.append(
                self.param(f"matrix_{i}", matrix_init, (self.channels, dims[i + 1], dims[i]))
            )
            def bias_init(key, shape, dtype=jnp.float32):
                # U[-0.5, 0.5) as in learned_prior.py:53-57.
                return jax.random.uniform(key, shape, dtype, -0.5, 0.5)

            biases.append(
                self.param(f"bias_{i}", bias_init, (self.channels, dims[i + 1], 1))
            )
            if i < len(self.dims):
                factors.append(
                    self.param(
                        f"factor_{i}", nn.initializers.zeros, (self.channels, dims[i + 1], 1)
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors
        # Learned quantiles (tail, median, tail): the median is the
        # quantization offset; trained only by aux_loss.
        def quantile_init(key, shape, dtype=jnp.float32):
            del key
            q = jnp.array([-self.init_scale, 0.0, self.init_scale], dtype)
            return jnp.broadcast_to(q, shape)

        self.quantiles = self.param("quantiles", quantile_init, (self.channels, 1, 3))

    # ------------------------------------------------------------------ core

    def _logits_cdf(self, u, stop_gradient: bool):
        """CDF logits for u of shape (C, d, N) (learned_prior.py:78-121)."""
        logits = u
        k = len(self.dims)
        for i in range(k + 1):
            m = jax.nn.softplus(self._matrices[i])
            b = self._biases[i]
            if stop_gradient:
                m = lax.stop_gradient(m)
                b = lax.stop_gradient(b)
            # Full fp32 matmul: the CDF network is tiny (d <= 4) but its
            # output feeds log-likelihoods, where bf16 MXU passes visibly
            # corrupt rate estimates.
            logits = (
                jnp.matmul(m, logits, precision=lax.Precision.HIGHEST) + b
            )
            if i < k:
                f = jnp.tanh(self._factors[i])
                if stop_gradient:
                    f = lax.stop_gradient(f)
                logits = logits + f * jnp.tanh(logits)
        return logits

    def cdf(self, x, stop_gradient: bool = False):
        """Model CDF, channels-last input (learned_prior.py:123-162)."""
        flat, shape = _channels_to_front(x)
        logits = self._logits_cdf(flat, stop_gradient)
        return _channels_to_back(jax.nn.sigmoid(logits), shape)

    def pdf(self, x, stop_gradient: bool = False):
        """Model PDF = d/dx CDF via forward-mode autodiff (learned_prior.py:164-185)."""
        _, tangent = jax.jvp(
            lambda v: self.cdf(v, stop_gradient=stop_gradient), (x,), (jnp.ones_like(x),)
        )
        return tangent

    def cdf_pdf(self, x, stop_gradient: bool = False):
        """(CDF, PDF) in one pass (learned_prior.py:263-360, via jvp instead
        of a hand-derived Jacobian chain — same values)."""
        cdf, pdf = jax.jvp(
            lambda v: self.cdf(v, stop_gradient=stop_gradient), (x,), (jnp.ones_like(x),)
        )
        return cdf, pdf

    def logpdf(self, x, pdf_lower_bound: float = 1e-10, stop_gradient: bool = False):
        """log PDF with a lower bound before the log (learned_prior.py:249-261)."""
        pdf = self.pdf(x, stop_gradient=stop_gradient)
        if pdf_lower_bound:
            pdf = lower_bound(pdf, pdf_lower_bound)
        return jnp.log(pdf)

    def likelihood(self, x, stop_gradient_density: bool = False):
        """P(x - .5 < X <= x + .5): the discrete likelihood used for rate.

        Sign-stabilized difference of sigmoids, evaluating both endpoints in
        whichever tail keeps the subtraction well-conditioned (the same
        scheme tfc.EntropyBottleneck._likelihood uses).
        """
        flat, shape = _channels_to_front(x)
        lo = self._logits_cdf(flat - 0.5, stop_gradient_density)
        up = self._logits_cdf(flat + 0.5, stop_gradient_density)
        sign = lax.stop_gradient(-jnp.sign(lo + up))
        lik = jnp.abs(jax.nn.sigmoid(sign * up) - jax.nn.sigmoid(sign * lo))
        return _channels_to_back(lik, shape)

    # ------------------------------------------------------- noise / rounding

    @property
    def medians(self):
        """Per-channel medians, the quantization offsets; shape (C,)."""
        return lax.stop_gradient(self.quantiles[:, 0, 1])

    def quantize(self, x, mode: str = "dequantize"):
        """Median-centered rounding (tfc EntropyBottleneck._quantize;
        map.py:85 relies on 'dequantize' semantics)."""
        medians = self.medians
        if mode == "dequantize":
            return jnp.round(x - medians) + medians
        if mode == "symbols":
            return jnp.round(x - medians).astype(jnp.int32)
        raise ValueError(f"Unknown quantize mode {mode!r}")

    def __call__(self, x, training: bool, rng=None):
        """Forward pass: (x_tilde, likelihoods).

        training=True adds U(-.5, .5) noise (requires rng); training=False
        median-centers and rounds — matching tfc's EntropyBottleneck call in
        mbt2018.py:69.
        """
        if training:
            if rng is None:
                raise ValueError("training=True requires an rng key")
            x_tilde = x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
        else:
            x_tilde = self.quantize(x, "dequantize")
        lik = self.likelihood(x_tilde)
        if self.likelihood_bound > 0:
            lik = lower_bound(lik, self.likelihood_bound)
        return x_tilde, lik

    # --------------------------------------------------------------- aux loss

    def aux_loss(self):
        """Quantile loss (tfc EntropyBottleneck.losses[0]; mbt2018.py:120-121).

        Pins the learned quantiles to (tail/2, 1/2, 1 - tail/2) of the
        density; gradients flow only into the quantile variables.
        """
        target = math.log(2.0 / self.tail_mass - 1.0)
        targets = jnp.array([-target, 0.0, target], jnp.float32)
        logits = self._logits_cdf(self.quantiles, stop_gradient=True)
        return jnp.sum(jnp.abs(logits - targets))

    # ---------------------------------------------------------- inverse CDF

    def inverse_cdf(self, xi, doublings: int = 16, iterations: int = 60):
        """Bisection inverse of the CDF (learned_prior.py:187-232), jittable.

        Instead of data-dependent while loops, runs a fixed number of
        bracket-doubling steps followed by fixed bisection iterations —
        identical results to the reference's early-exit loop at tolerance
        2^(4+doublings-iterations).
        """

        def f(v):
            return self.cdf(v, stop_gradient=True) - xi

        left = jnp.full_like(xi, -1.0)
        right = jnp.full_like(xi, 1.0)
        for _ in range(doublings):
            left = jnp.where(f(left) >= 0, left * 2.0, left)
            right = jnp.where(f(right) <= 0, right * 2.0, right)

        def body(_, lr):
            l, r = lr
            mid = 0.5 * (l + r)
            fm = f(mid)
            l = jnp.where(fm < 0, mid, l)
            r = jnp.where(fm > 0, mid, r)
            return l, r

        left, right = lax.fori_loop(0, iterations, body, (left, right))
        return 0.5 * (left + right)

    # ------------------------------------------------------------ pmf export

    def pmf_for_coding(self, max_length: int = 256, grid: str = "median"):
        """Per-channel PMFs over grids covering the learned support.

        grid='median' (default): grid points are median + k for integer k —
        the quantization grid of `quantize`/the EntropyBottleneck coding path
        (symbols are round(x - median)). grid='integer': plain integers —
        the grid of plainly-rounded latents (what SGA/STE/danneal transmit,
        sga.py:240-241), enabling real bitstreams for those methods.

        Returns (pmf, offsets, lengths, tail_mass_per_channel):
          pmf:     (C, max_length) likelihood at grid point offsets + i
                   (plus median for grid='median')
          offsets: (C,) integer offset of the first grid point
          lengths: (C,) valid symbols per channel
        The support derives from the learned tail quantiles, mirroring the
        EntropyBottleneck update op the reference triggers each train step
        (mbt2018.py:123). Runs under jit; quantized-CDF conversion happens
        on host in nic_tpu.coding.tables.
        """
        q = self.quantiles[:, 0, :]
        medians = q[:, 1]
        if grid == "median":
            minima = jnp.maximum(jnp.ceil(medians - q[:, 0]).astype(jnp.int32), 0)
            maxima = jnp.maximum(jnp.ceil(q[:, 2] - medians).astype(jnp.int32), 0)
            lengths = jnp.minimum(minima + maxima + 1, max_length)
            offsets = -minima
            base = medians[:, None]
        elif grid == "integer":
            lo = jnp.floor(q[:, 0]).astype(jnp.int32)
            hi = jnp.ceil(q[:, 2]).astype(jnp.int32)
            lengths = jnp.minimum(hi - lo + 1, max_length)
            offsets = lo
            base = jnp.zeros_like(medians)[:, None]
        else:
            raise ValueError(f"Unknown grid {grid!r}")
        idx = jnp.arange(max_length)[None, :]
        points = base + offsets[:, None].astype(jnp.float32) + idx.astype(jnp.float32)
        # likelihood expects channels-last; points is (C, L) so feed (L, C).
        pmf = self.likelihood(points.T, stop_gradient_density=True).T
        valid = idx < lengths[:, None]
        pmf = jnp.where(valid, pmf, 0.0)
        tail = jnp.maximum(1.0 - jnp.sum(pmf, axis=1), 0.0)
        return pmf, offsets, lengths, tail

    def pmf_on_grid(self, lo: float, hi: float, delta: float):
        """Per-channel bin probabilities over a uniform grid (for bits-back
        coding of the *continuous* hyper-latent): bin k covers
        [lo + k*delta, lo + (k+1)*delta); tail mass outside [lo, hi] folds
        into the edge bins so the rows sum to 1 with no escape needed.

        Returns (C, B) probabilities with B = round((hi - lo) / delta).
        """
        num_bins = int(round((hi - lo) / delta))
        edges = lo + delta * jnp.arange(1, num_bins)  # interior edges
        grid = jnp.tile(edges[:, None], (1, self.channels))
        cdf = self.cdf(grid, stop_gradient=True)  # (B-1, C)
        cdf = jnp.concatenate(
            [jnp.zeros((1, self.channels)), cdf, jnp.ones((1, self.channels))], axis=0
        )
        return jnp.diff(cdf, axis=0).T  # (C, B)
