"""On-device Adam over latent pytrees.

Functional JAX counterpart of the reference's host-side numpy Adam
(adam.py:8-59). The reference pulls gradients to the host and updates per-
image latents in numpy every step; here the state lives in HBM and the
update fuses into the jitted scan body. Semantics match exactly: Keras-style
bias correction folded into the step size, eps added outside the sqrt.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: Any        # first-moment pytree
    v: Any        # second-moment pytree
    t: jnp.ndarray  # int32 step counter (number of updates applied)


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params), t=jnp.zeros((), jnp.int32))


def adam_update(
    params: Any,
    grads: Any,
    state: AdamState,
    lr: float,
    beta_1: float = 0.9,
    beta_2: float = 0.999,
    epsilon: float = 1e-8,
):
    """One Adam step (adam.py:36-57). Returns (new_params, new_state)."""
    t = state.t + 1
    tf_ = t.astype(jnp.float32)
    lr_t = lr * jnp.sqrt(1.0 - beta_2 ** tf_) / (1.0 - beta_1 ** tf_)
    new_m = jax.tree.map(lambda m, g: beta_1 * m + (1.0 - beta_1) * g, state.m, grads)
    new_v = jax.tree.map(
        lambda v, g: beta_2 * v + (1.0 - beta_2) * jnp.square(g), state.v, grads
    )
    new_params = jax.tree.map(
        lambda p, m, v: p - lr_t * m / (jnp.sqrt(v) + epsilon), params, new_m, new_v
    )
    return new_params, AdamState(m=new_m, v=new_v, t=t)
