"""Temperature annealing schedules (counterpart of utils.py:151-181).

Works on Python scalars and on traced JAX values (so it can live inside a
``lax.scan`` over optimization steps).
"""

import jax.numpy as jnp


def annealed_temperature(t, r, ub, lb=1e-8, scheme="exp", t0=700):
    """Temperature at step ``t``; clipped to [lb, ub].

    schemes (utils.py:163-175):
      - 'exp':    exp(-r * t)
      - 'exp0':   ub * exp(-r * (t - t0))   (held at ub for t < t0)
      - 'linear': ub - r * (t - t0)
    """
    t = jnp.asarray(t, dtype=jnp.float32)
    if scheme == "exp":
        tau = jnp.exp(-r * t)
    elif scheme == "exp0":
        tau = ub * jnp.exp(-r * (t - t0))
    elif scheme == "linear":
        tau = -r * (t - t0) + ub
    else:
        raise NotImplementedError(f"Unknown annealing scheme {scheme!r}")
    return jnp.minimum(jnp.maximum(tau, lb), ub)
