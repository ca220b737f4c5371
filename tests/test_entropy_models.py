"""Tests for the factorized prior and the conditional Gaussian model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.integrate
import scipy.stats

from nic_tpu.models.conditional import GaussianConditional
from nic_tpu.models.factorized_prior import FactorizedEntropyModel


@pytest.fixture(scope="module")
def prior():
    model = FactorizedEntropyModel(channels=4, dims=(3, 3, 3), init_scale=10.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)), training=False,
                           rng=jax.random.PRNGKey(1))
    return model, variables


class TestFactorizedPrior:
    def test_cdf_monotone_and_normalized(self, prior):
        model, variables = prior
        xs = jnp.linspace(-400, 400, 801)
        grid = jnp.tile(xs[:, None], (1, 4))
        cdf = model.apply(variables, grid, method=model.cdf)
        assert cdf.shape == grid.shape
        assert jnp.all(jnp.diff(cdf, axis=0) >= -1e-6), "CDF must be monotone"
        np.testing.assert_allclose(cdf[0], 0.0, atol=1e-4)
        np.testing.assert_allclose(cdf[-1], 1.0, atol=1e-4)

    def test_pdf_is_cdf_derivative(self, prior):
        model, variables = prior
        x = jnp.tile(jnp.linspace(-5, 5, 41)[:, None], (1, 4))
        pdf = model.apply(variables, x, method=model.pdf)
        eps = 1e-3
        cdf_hi = model.apply(variables, x + eps, method=model.cdf)
        cdf_lo = model.apply(variables, x - eps, method=model.cdf)
        fd = (cdf_hi - cdf_lo) / (2 * eps)
        np.testing.assert_allclose(pdf, fd, atol=1e-4)

    def test_pdf_integrates_to_one(self, prior):
        model, variables = prior
        xs = np.linspace(-300, 300, 12001)
        grid = jnp.tile(jnp.array(xs, jnp.float32)[:, None], (1, 4))
        pdf = np.asarray(model.apply(variables, grid, method=model.pdf))
        for c in range(4):
            integral = scipy.integrate.trapezoid(pdf[:, c], xs)
            assert abs(integral - 1.0) < 1e-3

    def test_likelihood_is_box_integral(self, prior):
        model, variables = prior
        x = jnp.tile(jnp.linspace(-8, 8, 17)[:, None], (1, 4))
        lik = model.apply(variables, x, method=model.likelihood)
        cdf_hi = model.apply(variables, x + 0.5, method=model.cdf)
        cdf_lo = model.apply(variables, x - 0.5, method=model.cdf)
        np.testing.assert_allclose(lik, cdf_hi - cdf_lo, atol=1e-5)

    def test_cdf_pdf_consistency(self, prior):
        model, variables = prior
        x = jnp.tile(jnp.linspace(-3, 3, 7)[:, None], (1, 4))
        cdf2, pdf2 = model.apply(variables, x, method=model.cdf_pdf)
        np.testing.assert_allclose(cdf2, model.apply(variables, x, method=model.cdf), atol=1e-6)
        np.testing.assert_allclose(pdf2, model.apply(variables, x, method=model.pdf), atol=1e-6)

    def test_inverse_cdf_roundtrip(self, prior):
        model, variables = prior
        xi = jnp.tile(jnp.array([[0.1, 0.35, 0.5, 0.9]], jnp.float32), (3, 1))
        x = model.apply(variables, xi, method=model.inverse_cdf)
        back = model.apply(variables, x, method=model.cdf)
        np.testing.assert_allclose(back, xi, atol=1e-4)

    def test_noise_and_round_modes(self, prior):
        model, variables = prior
        x = jnp.ones((5, 4)) * 0.3
        xt, lik = model.apply(variables, x, training=True, rng=jax.random.PRNGKey(2))
        assert jnp.all(jnp.abs(xt - x) <= 0.5)
        assert jnp.all(lik > 0)
        xq, likq = model.apply(variables, x, training=False)
        medians = model.apply(variables, method=lambda m: m.medians)
        np.testing.assert_allclose(xq, jnp.round(x - medians) + medians, atol=1e-6)

    def test_aux_loss_trains_quantiles(self, prior):
        model, variables = prior

        def loss_fn(v):
            return model.apply(v, method=model.aux_loss)

        grads = jax.grad(loss_fn)(variables)
        flat = jax.tree_util.tree_leaves_with_path(grads)
        for path, g in flat:
            name = jax.tree_util.keystr(path)
            if "quantiles" in name:
                assert jnp.any(g != 0), "quantiles must receive aux gradient"
            else:
                np.testing.assert_allclose(g, 0.0, err_msg=f"{name} should be frozen in aux loss")

    def test_pmf_for_coding_sums_to_one(self, prior):
        model, variables = prior
        pmf, offsets, lengths, tail = model.apply(variables, method=model.pmf_for_coding)
        total = jnp.sum(pmf, axis=1) + tail
        np.testing.assert_allclose(total, 1.0, atol=1e-4)
        assert jnp.all(lengths >= 1)


class TestGaussianConditional:
    def test_likelihood_matches_scipy(self, rng):
        gc = GaussianConditional()
        y = rng.normal(size=(2, 4, 4, 3)).astype(np.float32) * 5
        mu = rng.normal(size=y.shape).astype(np.float32)
        sigma = rng.uniform(0.2, 10, size=y.shape).astype(np.float32)
        lik = gc.likelihood(jnp.array(y), jnp.array(mu), jnp.array(sigma))
        ref = scipy.stats.norm.cdf(y + 0.5, mu, sigma) - scipy.stats.norm.cdf(y - 0.5, mu, sigma)
        np.testing.assert_allclose(lik, np.maximum(ref, 1e-9), atol=1e-6)

    def test_scale_lower_bound(self):
        gc = GaussianConditional()
        lik_small = gc.likelihood(jnp.array([0.0]), jnp.array([0.0]), jnp.array([1e-6]))
        lik_min = gc.likelihood(jnp.array([0.0]), jnp.array([0.0]), jnp.array([gc.scale_min]))
        np.testing.assert_allclose(lik_small, lik_min)

    def test_quantize_mean_centered(self):
        gc = GaussianConditional()
        y = jnp.array([1.2, -0.4, 3.9])
        mu = jnp.array([0.9, -0.1, 3.2])
        got = gc.quantize(y, mu)
        np.testing.assert_allclose(got, jnp.round(y - mu) + mu)

    def test_scale_indexes_bucketize(self):
        gc = GaussianConditional()
        table = gc.scale_table
        # Exactly at a table value -> that index; slightly above -> next.
        idx = gc.scale_indexes(jnp.array([table[0], table[10], table[10] + 1e-4, 1e9]))
        assert int(idx[0]) == 0
        assert int(idx[1]) == 10
        assert int(idx[2]) == 11
        assert int(idx[3]) == len(table) - 1

    def test_pmfs_for_coding(self):
        gc = GaussianConditional()
        pmf, offsets, lengths, tail = gc.pmfs_for_coding()
        assert pmf.shape[0] == len(gc.scale_table)
        np.testing.assert_allclose(pmf.sum(axis=1) + tail, 1.0, atol=1e-9)
        assert (lengths == -2 * offsets + 1).all()

    def test_roundtrip_symbols(self, rng):
        gc = GaussianConditional()
        y = rng.normal(size=(16,)).astype(np.float32) * 3
        mu = rng.normal(size=(16,)).astype(np.float32)
        s = gc.symbols(jnp.array(y), jnp.array(mu))
        back = gc.dequantize_symbols(s, jnp.array(mu))
        np.testing.assert_allclose(back, gc.quantize(jnp.array(y), jnp.array(mu)), atol=1e-6)


class TestQuantizerConsistency:
    def test_median_quantize_idempotent(self, prior):
        """map.py:201-203's runtime assert: quantizing an already-quantized
        value is a no-op."""
        model, variables = prior
        z = jnp.linspace(-6, 6, 24).reshape(6, 4)
        q1 = model.apply(variables, z, "dequantize", method=model.quantize)
        q2 = model.apply(variables, q1, "dequantize", method=model.quantize)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)

    def test_conditional_quantize_idempotent(self):
        from nic_tpu.models.conditional import GaussianConditional

        gc = GaussianConditional()
        y = jnp.linspace(-4, 4, 10)
        mu = jnp.linspace(-0.4, 0.4, 10)
        q1 = gc.quantize(y, mu)
        q2 = gc.quantize(q1, mu)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)
