"""Bounded min/max with gradient control, as `jax.custom_vjp` ops.

Re-designs the gradient-override machinery of the reference
(/root/reference/math_ops.py:32-186, itself borrowed from
tensorflow_compression) as first-class JAX custom-VJP functions. The
``identity_if_towards`` mode passes gradients only when a descent step would
move the input back toward the feasible region; this keeps latents from
getting stuck once a likelihood or variance bound clips them.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _lower_bound_iit(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_iit_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_iit_bwd(res, g):
    x, bound = res
    # Pass gradient iff input is feasible, or the gradient pushes the input
    # up toward the bound (math_ops.py:63-76).
    pass_through = jnp.logical_or(x >= bound, g < 0)
    return (jnp.where(pass_through, g, jnp.zeros_like(g)), jnp.zeros_like(bound))


_lower_bound_iit.defvjp(_lower_bound_iit_fwd, _lower_bound_iit_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _upper_bound_iit(x, bound):
    return jnp.minimum(x, bound)


def _upper_bound_iit_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _upper_bound_iit_bwd(res, g):
    x, bound = res
    # math_ops.py:47-60.
    pass_through = jnp.logical_or(x <= bound, g > 0)
    return (jnp.where(pass_through, g, jnp.zeros_like(g)), jnp.zeros_like(bound))


_upper_bound_iit.defvjp(_upper_bound_iit_fwd, _upper_bound_iit_bwd)


@jax.custom_vjp
def _lower_bound_identity(x, bound):
    return jnp.maximum(x, bound)


def _lb_id_fwd(x, bound):
    return jnp.maximum(x, bound), bound


def _lb_id_bwd(bound, g):
    return (g, jnp.zeros_like(bound))


_lower_bound_identity.defvjp(_lb_id_fwd, _lb_id_bwd)


@jax.custom_vjp
def _upper_bound_identity(x, bound):
    return jnp.minimum(x, bound)


def _ub_id_fwd(x, bound):
    return jnp.minimum(x, bound), bound


def _ub_id_bwd(bound, g):
    return (g, jnp.zeros_like(bound))


_upper_bound_identity.defvjp(_ub_id_fwd, _ub_id_bwd)


def lower_bound(x, bound, gradient: str = "identity_if_towards"):
    """``maximum(x, bound)`` with configurable gradient (math_ops.py:134-186)."""
    bound = jnp.asarray(bound, dtype=jnp.result_type(x))
    if gradient == "identity_if_towards":
        return _lower_bound_iit(x, bound)
    if gradient == "identity":
        return _lower_bound_identity(x, bound)
    if gradient == "disconnected":
        return jnp.maximum(x, bound)
    raise ValueError(f"Invalid gradient mode: {gradient!r}")


def upper_bound(x, bound, gradient: str = "identity_if_towards"):
    """``minimum(x, bound)`` with configurable gradient (math_ops.py:79-131)."""
    bound = jnp.asarray(bound, dtype=jnp.result_type(x))
    if gradient == "identity_if_towards":
        return _upper_bound_iit(x, bound)
    if gradient == "identity":
        return _upper_bound_identity(x, bound)
    if gradient == "disconnected":
        return jnp.minimum(x, bound)
    raise ValueError(f"Invalid gradient mode: {gradient!r}")
