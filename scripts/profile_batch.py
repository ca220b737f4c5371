"""Grad-step time vs batch size and dtype for the SGA loss."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nic_tpu.infer.engine import Latents, _rd_loss
from nic_tpu.models.mbt2018 import MeanScaleHyperprior


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    h, w = 768, 512
    model = MeanScaleHyperprior(num_filters=192)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, training=True, rng=jax.random.PRNGKey(1))
    params = variables["params"]
    key = jax.random.PRNGKey(0)

    for batch in (1, 4, 8, 16):
        x = jnp.asarray(np.random.default_rng(0).random((batch, h, w, 3), np.float32))
        y = model.apply({"params": params}, x, method=model.analyze)
        z = model.apply({"params": params}, y, method=model.hyper_analyze)
        latents = Latents(y=y, z=z)
        grad_fn = jax.jit(
            jax.grad(lambda lat, k: _rd_loss(model, params, lat, x, 0.01, 0.4, k, "sga")[0])
        )
        ms = timeit(grad_fn, latents, key)
        print(f"batch={batch}: grad {ms:.1f} ms total, {ms/batch:.2f} ms/image", flush=True)


if __name__ == "__main__":
    main()
