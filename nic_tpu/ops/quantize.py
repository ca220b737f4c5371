"""Quantization surrogates: STE rounding, SGA and deterministic relaxations.

TPU-native counterparts of /root/reference/utils.py:105-148 (STE rounds) and
the Gumbel-softmax stochastic rounding built inline in sga.py:80-121 /
danneal.py:76-101. All functions are jit/scan-friendly: explicit PRNG keys,
no Python-level branching on traced values.
"""

import jax
import jax.numpy as jnp

from nic_tpu.config import ATANH_EPSILON


@jax.custom_vjp
def round_ste(x):
    """round(x) with identity straight-through gradient (utils.py:130-134)."""
    return jnp.round(x)


def _round_ste_fwd(x):
    return jnp.round(x), None


def _round_ste_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_ste_fwd, _round_ste_bwd)


@jax.custom_vjp
def round_relu_ste(x):
    """round(x) with relu(grad) backward pass (utils.py:137-141)."""
    return jnp.round(x)


def _round_relu_fwd(x):
    return jnp.round(x), None


def _round_relu_bwd(_, g):
    return (jax.nn.relu(g),)


round_relu_ste.defvjp(_round_relu_fwd, _round_relu_bwd)


@jax.custom_vjp
def round_crelu_ste(x):
    """round(x) with clip(relu(grad), 0, 1) backward pass (utils.py:144-148)."""
    return jnp.round(x)


def _round_crelu_fwd(x):
    return jnp.round(x), None


def _round_crelu_bwd(_, g):
    return (jnp.clip(jax.nn.relu(g), 0.0, 1.0),)


round_crelu_ste.defvjp(_round_crelu_fwd, _round_crelu_bwd)


def sga_logits(v, temperature):
    """Boltzmann logits for rounding DOWN vs UP (sga.py:89-94).

    For each latent element v with fractional position f = v - floor(v), the
    logits are (-atanh(f)/T, -atanh(1-f)/T); clipping prevents NaN as T -> 0.
    Returns ``(v_floor, v_ceil, logits)`` with logits stacked on a new last
    axis.
    """
    v_floor = jnp.floor(v)
    v_ceil = jnp.ceil(v)
    down = -jnp.arctanh(
        jnp.clip(v - v_floor, -1 + ATANH_EPSILON, 1 - ATANH_EPSILON)
    ) / temperature
    up = -jnp.arctanh(
        jnp.clip(v_ceil - v, -1 + ATANH_EPSILON, 1 - ATANH_EPSILON)
    ) / temperature
    return v_floor, v_ceil, jnp.stack([down, up], axis=-1)


def sga_relax(v, temperature, rng):
    """Stochastic Gumbel annealing relaxation of rounding (sga.py:80-121).

    Samples a relaxed one-hot (Gumbel-softmax / Concrete) vector over
    {floor, ceil} at the given temperature and returns the convex combination
    ``p_down * floor(v) + p_up * ceil(v)``; as T -> 0 this converges to
    round(v). Matches tfp.distributions.RelaxedOneHotCategorical(T, logits)
    sampling: softmax((logits + Gumbel noise) / T).
    """
    v_floor, v_ceil, logits = sga_logits(v, temperature)
    # Gumbel(0,1) noise; jax.random.gumbel is -log(-log U).
    g = jax.random.gumbel(rng, logits.shape, dtype=logits.dtype)
    sample = jax.nn.softmax((logits + g) / temperature, axis=-1)
    return v_floor * sample[..., 0] + v_ceil * sample[..., 1]


def danneal_relax(v, temperature):
    """Deterministic annealing: expectation instead of a sample (danneal.py:76-101).

    Uses softmax over the same Boltzmann logits (no Gumbel noise, and no
    extra division by T inside the softmax, matching tf.nn.softmax(ry_logits)).
    """
    v_floor, v_ceil, logits = sga_logits(v, temperature)
    p = jax.nn.softmax(logits, axis=-1)
    return v_floor * p[..., 0] + v_ceil * p[..., 1]


def uniform_noise(v, rng):
    """Additive U(-0.5, 0.5) noise, the training-time quantization proxy
    (unoise.py:76; also used by the entropy bottleneck during training)."""
    return v + jax.random.uniform(rng, v.shape, v.dtype, -0.5, 0.5)
