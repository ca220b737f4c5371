"""Tests for the iterative-inference engines (SGA/MAP/STE/unoise/danneal + BB)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nic_tpu.infer import (
    BB_NO_SGA,
    BB_PLAIN,
    BB_SGA,
    DANNEAL,
    MAP,
    SGA,
    STE,
    UNOISE,
    BBLatentOptimizer,
    LatentOptimizer,
    adam_init,
    adam_update,
)
from nic_tpu.models.mbt2018 import MeanScaleHyperprior
from nic_tpu.models.mbt2018_bb import BitsBackHyperprior

N = 4


@pytest.fixture(scope="module")
def opt():
    model = MeanScaleHyperprior(num_filters=N)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        jax.random.PRNGKey(0), x, training=True, rng=jax.random.PRNGKey(1)
    )
    return LatentOptimizer(model, variables["params"])


@pytest.fixture(scope="module")
def image():
    return np.random.default_rng(7).random((2, 64, 64, 3)).astype(np.float32)


class TestAdam:
    def test_matches_reference_numpy_adam(self, rng):
        """Bit-for-bit match with the reference's numpy Adam (adam.py:36-57)."""
        params = {"a": jnp.array(rng.normal(size=(5,)), jnp.float32)}
        grads_seq = [
            {"a": jnp.array(rng.normal(size=(5,)), jnp.float32)} for _ in range(5)
        ]
        # Reference implementation, inline:
        p_ref = np.array(params["a"], np.float64)
        m = np.zeros(5)
        v = np.zeros(5)
        lr, b1, b2, eps = 0.005, 0.9, 0.999, 1e-8
        state = adam_init(params)
        p = params
        for t, g in enumerate(grads_seq, start=1):
            lr_t = lr * (np.sqrt(1 - b2 ** t) / (1 - b1 ** t))
            gn = np.array(g["a"], np.float64)
            m = b1 * m + (1 - b1) * gn
            v = b2 * v + (1 - b2) * gn ** 2
            p_ref = p_ref - lr_t * m / (np.sqrt(v) + eps)
            p, state = adam_update(p, g, state, lr)
        np.testing.assert_allclose(p["a"], p_ref, rtol=1e-5)


class TestLatentOptimizer:
    def test_amortized_init_shapes(self, opt, image):
        y, z = opt.amortized_init(image)
        assert y.shape == (2, 4, 4, N)
        assert z.shape == (2, 1, 1, N)

    def test_sga_improves_loss(self, opt, image):
        res = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=60))
        assert res["losses"].shape == (60,)
        assert res["losses"][-1] < res["losses"][0]
        # Transmitted latents are integers (plain rounding, sga.py:240-241).
        np.testing.assert_array_equal(res["y"], np.round(res["y"]))
        np.testing.assert_array_equal(res["z"], np.round(res["z"]))
        assert np.all(np.isfinite(res["est_bpp"]))
        assert res["est_bpp"].shape == (2,)

    @pytest.mark.slow
    def test_sga_beats_amortized(self, opt, image):
        base = opt.eval_amortized(image)
        res = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=300))
        rd_base = 0.01 * base["mse"].mean() + base["est_bpp"].mean()
        rd_opt = 0.01 * res["mse"].mean() + res["est_bpp"].mean()
        assert rd_opt < rd_base, f"SGA ({rd_opt}) should beat amortized ({rd_base})"

    def test_danneal_runs(self, opt, image):
        res = opt.optimize(image, lmbda=0.01, method=DANNEAL.replace(iterations=30))
        assert res["losses"].shape == (30,)
        np.testing.assert_array_equal(res["y"], np.round(res["y"]))

    def test_unoise_runs(self, opt, image):
        res = opt.optimize(image, lmbda=0.01, method=UNOISE.replace(iterations=30))
        assert np.all(np.isfinite(res["est_bpp"]))
        # unoise transmits median/mean-centered quantized latents — not
        # integers in general.
        assert np.all(np.isfinite(res["y"]))

    @pytest.mark.slow
    def test_unoise_noisy_z_parity_mode(self, opt, image):
        """unoise_mu_source='noisy_z' reproduces the reference's A3
        transmitted-mean semantics (unoise.py:82,97): a fresh noisy-z mean,
        different from the decodable quantized-z default but with identical
        optimization trajectory (the switch only affects the transmit step)."""
        dec = opt.optimize(
            image, lmbda=0.01, method=UNOISE.replace(iterations=20), seed=0
        )
        ref = opt.optimize(
            image, lmbda=0.01,
            method=UNOISE.replace(iterations=20, unoise_mu_source="noisy_z"),
            seed=0,
        )
        # Same optimization path (losses identical), different transmit mean.
        np.testing.assert_allclose(ref["losses"], dec["losses"], rtol=1e-6)
        np.testing.assert_array_equal(ref["z"], dec["z"])
        assert not np.array_equal(ref["y"], dec["y"])
        assert np.all(np.isfinite(ref["est_bpp"]))

    def test_map_early_stop(self, opt, image):
        res = opt.optimize(image, lmbda=0.01, method=MAP.replace(iterations=200))
        assert np.all(np.isfinite(res["est_bpp"]))
        assert np.all(np.isfinite(res["psnr"]))

    def test_ste_early_stop(self, opt, image):
        res = opt.optimize(image, lmbda=0.01, method=STE.replace(iterations=100))
        assert np.all(np.isfinite(res["est_bpp"]))
        np.testing.assert_array_equal(res["y"], np.round(res["y"]))

    def test_sga_deterministic_given_seed(self, opt, image):
        r1 = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=20), seed=3)
        r2 = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=20), seed=3)
        np.testing.assert_array_equal(r1["y"], r2["y"])
        r3 = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=20), seed=4)
        # A different seed draws different Gumbel noise -> different losses.
        assert not np.array_equal(r1["losses"], r3["losses"])


@pytest.fixture(scope="module")
def bb_opt():
    model = BitsBackHyperprior(num_filters=N)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        jax.random.PRNGKey(0), x, training=True, rng=jax.random.PRNGKey(1)
    )
    return BBLatentOptimizer(model, variables["params"])


@pytest.mark.slow
class TestBBEngines:
    def test_bb_plain(self, bb_opt, image):
        res = bb_opt.optimize(image, lmbda=0.01, spec=BB_PLAIN)
        assert res["rd_losses"].size == 0 and res["rate_losses"].size == 0
        assert np.all(np.isfinite(res["est_bpp"]))
        assert "est_bpp_back" in res
        np.testing.assert_array_equal(res["y"], np.round(res["y"]))

    def test_bb_no_sga_improves_rate(self, bb_opt, image):
        spec = BB_NO_SGA
        from dataclasses import replace

        spec = replace(spec, rate_iterations=60)
        res = bb_opt.optimize(image, lmbda=0.01, spec=spec)
        assert res["rate_losses"].shape == (60,)
        # Rate-only optimization should reduce the (noisy) rate objective.
        assert np.mean(res["rate_losses"][-10:]) < np.mean(res["rate_losses"][:10])

    def test_bb_sga_two_phase(self, bb_opt, image):
        from dataclasses import replace

        spec = replace(BB_SGA, rd_iterations=30, rate_iterations=30)
        res = bb_opt.optimize(image, lmbda=0.01, spec=spec)
        assert res["rd_losses"].shape == (30,)
        assert res["rate_losses"].shape == (30,)
        assert np.all(np.isfinite(res["est_bpp"]))
        # est_bpp = y+z-back (bb_sga.py:139).
        np.testing.assert_allclose(
            res["est_bpp"],
            res["est_y_bpp"] + res["est_z_bpp"] - res["est_bpp_back"],
            rtol=1e-5,
        )


@pytest.mark.slow
class TestMsssimObjective:
    def test_sga_msssim_objective_runs_and_differs(self):
        """distortion='msssim' optimizes lmbda*(1-MS-SSIM)+bpp; its loss
        trajectory must be finite and distinct from the MSE objective."""
        model = MeanScaleHyperprior(num_filters=N)
        x0 = jnp.zeros((1, 192, 192, 3))
        variables = model.init(
            jax.random.PRNGKey(0), x0, training=True, rng=jax.random.PRNGKey(1)
        )
        o = LatentOptimizer(model, variables["params"])
        img = np.random.default_rng(3).random((1, 192, 192, 3)).astype(np.float32)
        ms = o.optimize(
            img, 10.0, method=SGA.replace(iterations=6, distortion="msssim")
        )
        mse = o.optimize(img, 10.0, method=SGA.replace(iterations=6))
        assert np.isfinite(ms["losses"]).all()
        # lmbda*(1-msssim) is O(10); lmbda*255^2*MSE is O(10^5) here.
        assert ms["losses"][0] < mse["losses"][0]


@pytest.mark.slow
class TestBlockSpaceLoss:
    def test_block_space_mse_identical(self, opt, image):
        """The block-space distortion path must produce the same loss as the
        pixel-space path (MSE is reorder-invariant)."""
        import jax.numpy as jnp
        from nic_tpu.infer.engine import Latents, _forward, _space_to_depth2

        x = jnp.asarray(image)
        y, z = opt.amortized_init(x)
        latents = Latents(y=y, z=z)
        key = jax.random.PRNGKey(0)
        *_, xt_pix = _forward(opt.model, opt.params, latents, x, 1.0, key, "map", False)
        *_, xt_blk = _forward(opt.model, opt.params, latents, x, 1.0, key, "map", True)
        mse_pix = float(jnp.mean(jnp.square(x - xt_pix)))
        mse_blk = float(jnp.mean(jnp.square(_space_to_depth2(x) - xt_blk)))
        assert abs(mse_pix - mse_blk) < 1e-6
        # And the block output is exactly the reordered pixel output.
        np.testing.assert_allclose(
            np.asarray(_space_to_depth2(xt_pix)), np.asarray(xt_blk), atol=1e-5
        )


class TestEvalRounded:
    def test_matches_transmitted_eval_for_sga(self, opt, image):
        res = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=20), seed=0)
        ev = opt.eval_rounded(image, res["y"], res["z"])
        np.testing.assert_allclose(ev["est_bpp"], res["est_bpp"], rtol=1e-5)
        np.testing.assert_allclose(ev["psnr"], res["psnr"], rtol=1e-5)


class TestVerboseProbes:
    def test_rounded_probes(self, opt, image):
        res = opt.optimize(
            image, lmbda=0.01, method=SGA.replace(iterations=25), probe_every=10
        )
        probes = res["rounded_losses"]
        assert probes.shape == (25,)
        # Probes at its 0, 10, 20; NaN elsewhere.
        assert np.isfinite(probes[[0, 10, 20]]).all()
        assert np.isnan(probes[1]) and np.isnan(probes[11])
        # The rounded objective is evaluated with the true discrete latents,
        # so the final probe should be near the final eval objective.
        rd_final = 0.01 * res["mse"].mean() + res["est_bpp"].mean()
        assert abs(probes[20] - rd_final) / rd_final < 0.5


class TestEngineKnobs:
    """Perf knobs must not change results: carry donation is bitwise
    identical; scan unroll may only reassociate fusions (float-noise loss
    deltas, same optimization trajectory)."""

    @pytest.mark.slow
    def test_donate_bitwise_identical(self, opt, image):
        m = SGA.replace(iterations=30)
        r0 = opt.optimize(image, lmbda=0.01, method=m, seed=0, chunk_size=10)
        r1 = opt.optimize(image, lmbda=0.01, method=m, seed=0, chunk_size=10,
                          donate=True)
        np.testing.assert_array_equal(r0["y"], r1["y"])
        np.testing.assert_array_equal(r0["z"], r1["z"])
        np.testing.assert_array_equal(r0["losses"], r1["losses"])

    @pytest.mark.slow
    def test_unroll_equivalent(self, opt, image):
        m = SGA.replace(iterations=30)
        r0 = opt.optimize(image, lmbda=0.01, method=m, seed=0, chunk_size=10)
        r1 = opt.optimize(image, lmbda=0.01, method=m, seed=0, chunk_size=10,
                          unroll=2)
        np.testing.assert_array_equal(r0["y"], r1["y"])
        np.testing.assert_array_equal(r0["z"], r1["z"])
        np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-4)

    @pytest.mark.slow
    def test_donate_with_early_stop_method(self, opt, image):
        from nic_tpu.infer.methods import MAP

        m = MAP.replace(iterations=20, probe_interval=5)
        r0 = opt.optimize(image, lmbda=0.01, method=m, seed=0, chunk_size=10)
        r1 = opt.optimize(image, lmbda=0.01, method=m, seed=0, chunk_size=10,
                          donate=True)
        np.testing.assert_array_equal(r0["y"], r1["y"])
        np.testing.assert_array_equal(r0["z"], r1["z"])
