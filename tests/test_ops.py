"""Unit tests for core ops: bounds, densities, relaxations, schedules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from nic_tpu.ops import (
    annealed_temperature,
    box_convolved_gaussian_likelihood,
    danneal_relax,
    gaussian_standardized_cumulative,
    log_normal_pdf,
    lower_bound,
    round_crelu_ste,
    round_relu_ste,
    round_ste,
    sga_relax,
    upper_bound,
)


class TestBounds:
    def test_forward(self):
        x = jnp.array([-2.0, 0.5, 3.0])
        np.testing.assert_allclose(lower_bound(x, 0.0), [0.0, 0.5, 3.0])
        np.testing.assert_allclose(upper_bound(x, 1.0), [-2.0, 0.5, 1.0])

    @pytest.mark.parametrize("mode", ["identity_if_towards", "identity", "disconnected"])
    def test_lower_bound_gradients(self, mode):
        # x below the bound: identity passes grad; disconnected kills it;
        # identity_if_towards passes only gradients pushing x up (g < 0).
        g_pos = jax.grad(lambda v: jnp.sum(lower_bound(v, 0.0, mode) * 1.0))(
            jnp.array([-1.0])
        )
        g_neg = jax.grad(lambda v: jnp.sum(lower_bound(v, 0.0, mode) * -1.0))(
            jnp.array([-1.0])
        )
        if mode == "identity":
            assert g_pos[0] == 1.0 and g_neg[0] == -1.0
        elif mode == "disconnected":
            assert g_pos[0] == 0.0 and g_neg[0] == 0.0
        else:
            assert g_pos[0] == 0.0  # pushes away from bound: blocked
            assert g_neg[0] == -1.0  # pushes toward feasible region: passes

    def test_upper_bound_identity_if_towards(self):
        g_pos = jax.grad(lambda v: jnp.sum(upper_bound(v, 0.0) * 1.0))(jnp.array([1.0]))
        g_neg = jax.grad(lambda v: jnp.sum(upper_bound(v, 0.0) * -1.0))(jnp.array([1.0]))
        assert g_pos[0] == 1.0  # descent decreases x toward bound: passes
        assert g_neg[0] == 0.0

    def test_feasible_region_passthrough(self):
        g = jax.grad(lambda v: jnp.sum(lower_bound(v, 0.0)))(jnp.array([2.0]))
        assert g[0] == 1.0


class TestDensities:
    def test_gaussian_cdf_vs_scipy(self, rng):
        x = rng.normal(size=100).astype(np.float32) * 3
        ours = gaussian_standardized_cumulative(jnp.array(x))
        ref = scipy.stats.norm.cdf(x)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_box_convolved_vs_scipy(self, rng):
        x = rng.normal(size=50).astype(np.float32) * 4
        mu = rng.normal(size=50).astype(np.float32)
        sigma = rng.uniform(0.2, 5.0, size=50).astype(np.float32)
        ours = box_convolved_gaussian_likelihood(jnp.array(x), jnp.array(mu), jnp.array(sigma))
        ref = scipy.stats.norm.cdf(x + 0.5, mu, sigma) - scipy.stats.norm.cdf(
            x - 0.5, mu, sigma
        )
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_log_normal_pdf(self, rng):
        s = rng.normal(size=20)
        mean = rng.normal(size=20)
        logvar = rng.normal(size=20)
        ours = log_normal_pdf(jnp.array(s), jnp.array(mean), jnp.array(logvar))
        ref = scipy.stats.norm.logpdf(s, mean, np.exp(logvar / 2))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestRounding:
    def test_ste_forward_and_grad(self):
        x = jnp.array([0.4, 1.6, -0.5])
        np.testing.assert_allclose(round_ste(x), jnp.round(x))
        g = jax.grad(lambda v: jnp.sum(round_ste(v) * jnp.array([1.0, -2.0, 3.0])))(x)
        np.testing.assert_allclose(g, [1.0, -2.0, 3.0])

    def test_relu_ste_grad(self):
        x = jnp.array([0.4, 1.6])
        g = jax.grad(lambda v: jnp.sum(round_relu_ste(v) * jnp.array([1.0, -2.0])))(x)
        np.testing.assert_allclose(g, [1.0, 0.0])
        g = jax.grad(lambda v: jnp.sum(round_crelu_ste(v) * jnp.array([3.0, -2.0])))(x)
        np.testing.assert_allclose(g, [1.0, 0.0])


class TestRelaxations:
    def test_sga_bounds_and_limit(self):
        key = jax.random.PRNGKey(0)
        v = jnp.array([0.3, 1.7, -2.4, 5.0])
        out = sga_relax(v, 0.5, key)
        # Output is always a convex combination of floor and ceil.
        assert jnp.all(out >= jnp.floor(v) - 1e-5)
        assert jnp.all(out <= jnp.ceil(v) + 1e-5)
        # As T -> 0, converges to round().
        out_cold = sga_relax(v, 1e-6, key)
        np.testing.assert_allclose(out_cold, jnp.round(v), atol=1e-3)

    def test_danneal_deterministic_and_limit(self):
        v = jnp.array([0.3, 1.7, -2.4])
        a = danneal_relax(v, 0.2)
        b = danneal_relax(v, 0.2)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_allclose(danneal_relax(v, 1e-6), jnp.round(v), atol=1e-3)

    def test_sga_gradients_finite_at_low_temperature(self):
        key = jax.random.PRNGKey(1)
        v = jnp.array([0.5, 0.0001, 0.9999])
        g = jax.grad(lambda u: jnp.sum(sga_relax(u, 1e-8, key)))(v)
        assert jnp.all(jnp.isfinite(g))


class TestSchedules:
    def test_exp0_matches_reference_formula(self):
        # utils.py:164-180: exp0 holds ub until t0 then decays.
        for t in [0, 100, 700, 1000, 1999]:
            tau = float(annealed_temperature(t, r=1e-3, ub=0.5, scheme="exp0", t0=700))
            expected = min(max(0.5 * np.exp(-1e-3 * (t - 700)), 1e-8), 0.5)
            assert abs(tau - expected) < 1e-6

    def test_exp_and_linear(self):
        assert abs(float(annealed_temperature(100, r=4e-3, ub=0.2, scheme="exp"))
                   - min(np.exp(-0.4), 0.2)) < 1e-6
        assert abs(float(annealed_temperature(800, r=1e-4, ub=0.5, scheme="linear", t0=700))
                   - min(max(-1e-4 * 100 + 0.5, 1e-8), 0.5)) < 1e-6
