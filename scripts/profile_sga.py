"""Breakdown profiling of the SGA iteration on real TPU hardware."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from nic_tpu.infer.engine import Latents, _rd_loss
from nic_tpu.models.mbt2018 import MeanScaleHyperprior


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    batch, h, w = 4, 768, 512
    model = MeanScaleHyperprior(num_filters=192)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, training=True, rng=jax.random.PRNGKey(1))
    params = variables["params"]
    x = jnp.asarray(np.random.default_rng(0).random((batch, h, w, 3), np.float32))
    key = jax.random.PRNGKey(0)

    y = model.apply({"params": params}, x, method=model.analyze)
    z = model.apply({"params": params}, y, method=model.hyper_analyze)
    latents = Latents(y=y, z=z)

    # Individual transforms fwd.
    f_ga = jax.jit(lambda p, v: model.apply({"params": p}, v, method=model.analyze))
    f_gs = jax.jit(
        lambda p, v: model.apply({"params": p}, v, (h, w), method=model.synthesize)
    )
    f_hs = jax.jit(
        lambda p, v: model.apply(
            {"params": p}, v, (y.shape[1], y.shape[2]), method=model.hyper_synthesize
        )
    )
    f_zlik = jax.jit(lambda p, v: model.apply({"params": p}, v, method=model.z_likelihood))
    print(f"g_a fwd: {timeit(f_ga, params, x):.2f} ms")
    print(f"g_s fwd: {timeit(f_gs, params, y):.2f} ms")
    print(f"h_s fwd: {timeit(f_hs, params, z):.2f} ms")
    print(f"z_lik fwd: {timeit(f_zlik, params, z):.2f} ms")

    # Full loss fwd and fwd+bwd for each method.
    for method in ("sga", "map"):
        loss_fn = jax.jit(
            lambda lat, k, m=method: _rd_loss(model, params, lat, x, 0.01, 0.4, k, m)[0]
        )
        grad_fn = jax.jit(
            jax.grad(
                lambda lat, k, m=method: _rd_loss(model, params, lat, x, 0.01, 0.4, k, m)[0]
            )
        )
        print(f"[{method}] loss fwd: {timeit(loss_fn, latents, key):.2f} ms")
        print(f"[{method}] grad fwd+bwd: {timeit(grad_fn, latents, key):.2f} ms")

    # Gumbel noise alone.
    f_noise = jax.jit(
        lambda k: jax.random.gumbel(k, (*y.shape, 2)) + jax.random.gumbel(k, (*z.shape, 2))
    )
    print(f"gumbel noise: {timeit(f_noise, key):.2f} ms")


if __name__ == "__main__":
    main()
