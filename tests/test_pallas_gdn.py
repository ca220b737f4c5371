"""Pallas GDN kernel vs the XLA reference implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nic_tpu.ops.gdn import gdn
from nic_tpu.ops.pallas_gdn import gdn_pallas


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    c = 64
    x = jnp.asarray(rng.normal(0, 2, (2, 8, 8, c)).astype(np.float32))
    gamma = jnp.asarray((0.1 * np.eye(c) + 0.01 * rng.random((c, c))).astype(np.float32))
    beta = jnp.asarray((1.0 + 0.1 * rng.random(c)).astype(np.float32))
    return x, beta, gamma


class TestPallasGDN:
    @pytest.mark.parametrize("inverse", [False, True])
    def test_matches_xla(self, inputs, inverse):
        x, beta, gamma = inputs
        ref = gdn(x, beta, gamma, inverse=inverse)
        out = gdn_pallas(x, beta, gamma, inverse=inverse, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("inverse", [False, True])
    def test_gradients_match(self, inputs, inverse):
        x, beta, gamma = inputs

        def f_ref(x, beta, gamma):
            return jnp.sum(gdn(x, beta, gamma, inverse=inverse) ** 2)

        def f_pl(x, beta, gamma):
            return jnp.sum(gdn_pallas(x, beta, gamma, inverse=inverse, interpret=True) ** 2)

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, beta, gamma)
        g_pl = jax.grad(f_pl, argnums=(0, 1, 2))(x, beta, gamma)
        for a, b in zip(g_ref, g_pl):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-3)

    def test_nonaligned_rows(self, inputs):
        _, beta, gamma = inputs
        rng = np.random.default_rng(1)
        # 37 pixels: exercises the row-padding path.
        x = jnp.asarray(rng.normal(0, 1, (37, 64)).astype(np.float32))
        ref = gdn(x, beta, gamma)
        out = gdn_pallas(x, beta, gamma, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
