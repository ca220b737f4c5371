"""Bits-back iterative inference engines (bb_sga / bb_no_sga / bb_plain).

TPU-native counterpart of the two-phase bits-back inference of the reference
(bb_sga.py:31-298): phase 1 jointly optimizes (y, z_mean, z_logvar) on the
RD objective with SGA relaxation on y only; after freezing y* = round(y) and
re-initializing the posterior from h_a(y*), phase 2 optimizes the posterior
on the rate alone. bb_no_sga (bb_no_sga.py:60-163) skips phase 1 entirely;
bb_plain (bb_plain.py:30-97) is the fully amortized single forward pass.
Both phases run as jitted lax.scans with on-device Adam; fresh
reparameterization noise is drawn inside the scan each step (the reference's
per-sess.run noise, bb_sga.py:103-104).
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nic_tpu.infer.adam import adam_init, adam_update
from nic_tpu.models.conditional import GaussianConditional
from nic_tpu.models.mbt2018 import LN2
from nic_tpu.models.mbt2018_bb import BitsBackHyperprior
from nic_tpu.ops.quantize import sga_relax
from nic_tpu.ops.schedules import annealed_temperature
from nic_tpu.ops.stats import log_normal_pdf

_GC = GaussianConditional()


@dataclass(frozen=True)
class BBMethodSpec:
    name: str
    rd_iterations: int = 2000       # phase 1 (bb_sga.py:186)
    rd_lr: float = 0.005
    rate_iterations: int = 2000     # phase 2 (bb_sga.py:193)
    rate_lr: float = 0.003
    annealing_scheme: str = "exp0"
    annealing_rate: float = 1e-3
    t0: int = 700
    temperature_ub: float = 0.5


BB_SGA = BBMethodSpec(name="bb_sga")
BB_NO_SGA = BBMethodSpec(
    name="bb_no_sga", rd_iterations=0, rate_iterations=1000, rate_lr=0.005
)  # bb_no_sga.py:152-154
BB_PLAIN = BBMethodSpec(name="bb_plain", rd_iterations=0, rate_iterations=0)


class BBState(NamedTuple):
    y: jnp.ndarray
    z_mean: jnp.ndarray
    z_logvar: jnp.ndarray


def _bb_rate_terms(model, params, y_tilde, z_mean, z_logvar, rng, num_pixels):
    """Sample z_tilde and compute per-image (y_bpp, z_bpp, bpp_back, mu, sigma)."""
    eps = jax.random.normal(rng, z_mean.shape, z_mean.dtype)
    z_tilde = eps * jnp.exp(z_logvar * 0.5) + z_mean
    log_q = log_normal_pdf(z_tilde, z_mean, z_logvar)
    z_lik = model.apply({"params": params}, z_tilde, method=model.hyper_prior_pdf)
    y_hw = (y_tilde.shape[1], y_tilde.shape[2])
    mu, sigma = model.apply(
        {"params": params}, z_tilde, y_hw, method=model.hyper_synthesize
    )
    y_lik = _GC.likelihood(y_tilde, mu, sigma)
    axes = (1, 2, 3)
    bpp_back = -jnp.sum(log_q, axis=axes) / (LN2 * num_pixels)
    y_bpp = -jnp.sum(jnp.log(y_lik), axis=axes) / (LN2 * num_pixels)
    z_bpp = -jnp.sum(jnp.log(z_lik), axis=axes) / (LN2 * num_pixels)
    return y_bpp, z_bpp, bpp_back, mu, sigma


@partial(jax.jit, static_argnums=(0, 5, 6))
def _bb_phase1_chunk(
    model, params, x, lmbda, it0, spec: BBMethodSpec, chunk_len: int, carry
):
    """A chunk of the RD optimization of (y, z_mean, z_logvar) with SGA on y
    (bb_sga.py:196-237). Chunked so each device program stays short; the
    carry (state, Adam moments, RNG) never leaves HBM."""
    num_pixels = x.shape[1] * x.shape[2]
    x_hw = (x.shape[1], x.shape[2])

    def loss_fn(state: BBState, T, key):
        k_sga, k_eps = jax.random.split(key)
        y_tilde = sga_relax(state.y, T, k_sga)
        x_tilde = model.apply(
            {"params": params}, y_tilde, x_hw, method=model.synthesize
        )
        y_bpp, z_bpp, bpp_back, _, _ = _bb_rate_terms(
            model, params, y_tilde, state.z_mean, state.z_logvar, k_eps, num_pixels
        )
        train_bpp = jnp.mean(y_bpp + z_bpp - bpp_back)
        mse = jnp.mean(jnp.square(x - x_tilde)) * (255.0 ** 2)
        return jnp.where(lmbda > 0, lmbda * mse + train_bpp, train_bpp)

    grad_fn = jax.value_and_grad(loss_fn)

    def body(carry, it):
        state, adam, key = carry
        T = annealed_temperature(
            it,
            r=spec.annealing_rate,
            ub=spec.temperature_ub,
            scheme=spec.annealing_scheme,
            t0=spec.t0,
        )
        key, sub = jax.random.split(key)
        loss, grads = grad_fn(state, T, sub)
        new_state, adam = adam_update(state, grads, adam, spec.rd_lr)
        return (BBState(*new_state), adam, key), loss

    return lax.scan(body, carry, it0 + jnp.arange(chunk_len))


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _bb_phase2_chunk(
    model, params, y_tilde, rng_unused, spec: BBMethodSpec, num_pixels: int,
    chunk_len: int, carry
):
    """A chunk of the rate-only posterior optimization given frozen y_tilde
    (bb_sga.py:252-261; the whole of bb_no_sga)."""

    def rate_fn(post, key):
        z_mean, z_logvar = post
        y_bpp, z_bpp, bpp_back, _, _ = _bb_rate_terms(
            model, params, y_tilde, z_mean, z_logvar, key, num_pixels
        )
        return jnp.mean(y_bpp + z_bpp - bpp_back)

    grad_fn = jax.value_and_grad(rate_fn)

    def body(carry, _):
        post, adam, key = carry
        key, sub = jax.random.split(key)
        loss, grads = grad_fn(post, sub)
        new_post, adam = adam_update(post, grads, adam, spec.rate_lr)
        return (new_post, adam, key), loss

    return lax.scan(body, carry, None, length=chunk_len)


def _chunked(total: int, chunk_size: int):
    done = 0
    while done < total:
        this = min(chunk_size, total - done)
        yield done, this
        done += this


@partial(jax.jit, static_argnums=(0, 5))
def _bb_eval(model, params, x, y_tilde, posterior, compute_msssim: bool, rng=None):
    """Final evaluation with a fresh posterior sample (bb_sga.py:272-276)."""
    from nic_tpu.evaluation.metrics import msssim as msssim_fn
    from nic_tpu.evaluation.metrics import msssim_db as msssim_db_fn
    from nic_tpu.evaluation.metrics import psnr as psnr_fn

    if rng is None:
        rng = jax.random.PRNGKey(0)
    z_mean, z_logvar = posterior
    num_pixels = x.shape[1] * x.shape[2]
    y_bpp, z_bpp, bpp_back, _, _ = _bb_rate_terms(
        model, params, y_tilde, z_mean, z_logvar, rng, num_pixels
    )
    x_hw = (x.shape[1], x.shape[2])
    x_tilde = model.apply({"params": params}, y_tilde, x_hw, method=model.synthesize)
    x255 = x * 255.0
    xt255 = jnp.round(jnp.clip(x_tilde, 0.0, 1.0) * 255.0)
    mse = jnp.mean(jnp.square(x255 - xt255), axis=(1, 2, 3))
    psnr = psnr_fn(xt255, x255, 255.0)
    if compute_msssim:
        ms = msssim_fn(xt255, x255, 255.0)
        ms_db = msssim_db_fn(ms)
    else:
        ms = jnp.full(x.shape[:1], jnp.nan)
        ms_db = jnp.full(x.shape[:1], jnp.nan)
    return dict(
        mse=mse,
        psnr=psnr,
        msssim=ms,
        msssim_db=ms_db,
        est_bpp=y_bpp + z_bpp - bpp_back,
        est_y_bpp=y_bpp,
        est_z_bpp=z_bpp,
        est_bpp_back=bpp_back,
        x_tilde=x_tilde,
    )


class BBLatentOptimizer:
    """Binds (BitsBackHyperprior, params); runs bb_sga / bb_no_sga / bb_plain."""

    def __init__(self, model: BitsBackHyperprior, params: Any):
        self.model = model
        self.params = params

    def _posterior_from(self, y_tilde):
        return self.model.apply(
            {"params": self.params}, y_tilde, method=self.model.hyper_posterior
        )

    def optimize(
        self,
        x,
        lmbda: float,
        spec: BBMethodSpec = BB_SGA,
        seed: int = 0,
        chunk_size: int = 200,
    ) -> Dict[str, Any]:
        x = jnp.asarray(x, jnp.float32)
        model, params = self.model, self.params
        y = model.apply({"params": params}, x, method=model.analyze)

        rd_losses = np.zeros((0,), np.float32)
        if spec.rd_iterations > 0:
            # Phase 1: joint RD optimization; posterior init from h_a of the
            # *relaxed* y at init == h_a(y) in practice (bb_sga.py:203-204
            # initializes from y_init via the y_tilde feed).
            z_mean0, z_logvar0 = self._posterior_from(y)
            state0 = BBState(y=y, z_mean=z_mean0, z_logvar=z_logvar0)
            carry = (state0, adam_init(state0), jax.random.PRNGKey(seed))
            chunks = []
            for it0, this in _chunked(spec.rd_iterations, chunk_size):
                carry, losses = _bb_phase1_chunk(
                    model, params, x, jnp.float32(lmbda),
                    jnp.int32(it0), spec, this, carry,
                )
                chunks.append(losses)
            y = carry[0].y
            rd_losses = np.concatenate([np.asarray(c) for c in chunks])

        y_tilde = jnp.round(y)  # transmitted latents (bb_sga.py:240)

        # Posterior re-initialized from the frozen y_tilde (bb_sga.py:247;
        # bb_no_sga.py:148; bb_plain uses it directly).
        posterior = self._posterior_from(y_tilde)
        rate_losses = np.zeros((0,), np.float32)
        if spec.rate_iterations > 0:
            # The reference re-seeds before phase 2 (bb_sga.py:243-244).
            carry = (
                tuple(posterior),
                adam_init(tuple(posterior)),
                jax.random.PRNGKey(seed),
            )
            chunks = []
            num_pixels = x.shape[1] * x.shape[2]
            for _, this in _chunked(spec.rate_iterations, chunk_size):
                carry, losses = _bb_phase2_chunk(
                    model, params, y_tilde, None, spec, num_pixels, this, carry
                )
                chunks.append(losses)
            posterior = carry[0]
            rate_losses = np.concatenate([np.asarray(c) for c in chunks])

        compute_msssim = min(x.shape[1], x.shape[2]) >= 176
        metrics = _bb_eval(
            model, params, x, y_tilde, tuple(posterior), compute_msssim,
            jax.random.PRNGKey(seed + 1),
        )
        return dict(
            y=np.asarray(y_tilde),
            z_mean=np.asarray(posterior[0]),
            z_logvar=np.asarray(posterior[1]),
            rd_losses=rd_losses,
            rate_losses=rate_losses,
            **{k: np.asarray(v) for k, v in metrics.items()},
        )
