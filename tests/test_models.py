"""Shape-parity and forward-pass tests for the hyperprior models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nic_tpu.models.mbt2018 import MeanScaleHyperprior, rd_loss, eval_bpp
from nic_tpu.models.mbt2018_bb import BitsBackHyperprior, bb_rd_loss
from nic_tpu.models.transforms import (
    AnalysisTransform,
    HyperAnalysisTransform,
    MBT2018HyperSynthesisTransform,
    SynthesisTransform,
)

N = 8  # tiny filter count for fast tests


class TestTransformShapes:
    """Stride/channel parity with nn_models.py: g_a 16x down, h_a 4x down,
    h_s 4x up, g_s 16x up; the 1.5N middle layer in h_s."""

    def test_analysis(self):
        m = AnalysisTransform(N)
        x = jnp.zeros((2, 64, 96, 3))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (2, 4, 6, N)

    def test_analysis_ceil_division(self):
        # tfc same_zeros gives ceil(H/s) per stride-2 layer; 75 -> 5 after /16.
        m = AnalysisTransform(N)
        x = jnp.zeros((1, 75, 75, 3))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (1, 5, 5, N)

    def test_synthesis(self):
        m = SynthesisTransform(N)
        y = jnp.zeros((2, 4, 6, N))
        x, _ = m.init_with_output(jax.random.PRNGKey(0), y)
        assert x.shape == (2, 64, 96, 3)

    def test_hyper_analysis(self):
        m = HyperAnalysisTransform(N)
        y = jnp.zeros((2, 16, 16, N))
        z, _ = m.init_with_output(jax.random.PRNGKey(0), y)
        assert z.shape == (2, 4, 4, N)

    def test_hyper_analysis_double_output(self):
        m = HyperAnalysisTransform(N, num_output_filters=2 * N)
        y = jnp.zeros((2, 16, 16, N))
        z, _ = m.init_with_output(jax.random.PRNGKey(0), y)
        assert z.shape == (2, 4, 4, 2 * N)

    def test_hyper_analysis_last_layer_biasfree(self):
        m = HyperAnalysisTransform(N)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, N)))["params"]
        assert "bias" not in params["layer_2"]
        assert "bias" in params["layer_0"]

    def test_mbt_hyper_synthesis_widths(self):
        m = MBT2018HyperSynthesisTransform(N, num_output_filters=2 * N)
        z = jnp.zeros((2, 4, 4, N))
        out, vs = m.init_with_output(jax.random.PRNGKey(0), z)
        assert out.shape == (2, 16, 16, 2 * N)
        # Middle layer widens to 1.5N channels (nn_models.py:156-157).
        assert vs["params"]["layer_1"]["kernel"].shape[-1] == int(N * 1.5)


@pytest.fixture(scope="module")
def mbt():
    model = MeanScaleHyperprior(num_filters=N)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, training=True, rng=jax.random.PRNGKey(1))
    return model, variables


class TestMeanScaleHyperprior:
    def test_train_forward_shapes(self, mbt):
        model, variables = mbt
        x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
        out = model.apply(variables, x, training=True, rng=jax.random.PRNGKey(3))
        assert out["y"].shape == (2, 4, 4, N)
        assert out["z"].shape == (2, 1, 1, N)
        assert out["x_tilde"].shape == x.shape
        assert out["mu"].shape == out["y"].shape
        assert jnp.all(out["sigma"] > 0)
        assert jnp.all(out["y_likelihoods"] > 0)
        assert jnp.all(out["z_likelihoods"] > 0)

    def test_eval_forward_nonstandard_size(self, mbt):
        """Reproduces the mu/sigma/x crop for sizes not divisible by 64
        (mbt2018.py:72-75,87)."""
        model, variables = mbt
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 75, 120, 3))
        out = model.apply(variables, x, training=False)
        assert out["y"].shape == (1, 5, 8, N)
        assert out["mu"].shape == out["y"].shape
        assert out["x_tilde"].shape == x.shape
        # y_tilde is mean-centered rounding in eval mode.
        np.testing.assert_allclose(
            out["y_tilde"], jnp.round(out["y"] - out["mu"]) + out["mu"], atol=1e-6
        )

    @pytest.mark.slow
    def test_rd_loss_and_grads(self, mbt):
        model, variables = mbt
        x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))

        def loss_fn(params):
            out = model.apply({"params": params}, x, training=True, rng=jax.random.PRNGKey(5))
            loss, metrics = rd_loss(out, x, lmbda=0.01)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        assert np.isfinite(float(loss))
        assert float(metrics["bpp"]) > 0
        # RD loss must not touch the quantiles (trained only by aux loss).
        q_grad = grads["entropy_bottleneck"]["quantiles"]
        np.testing.assert_allclose(q_grad, 0.0)
        # But must reach the transforms.
        some = grads["analysis"]["layer_0"]["kernel"]
        assert float(jnp.abs(some).sum()) > 0

    def test_eval_bpp_per_image(self, mbt):
        model, variables = mbt
        x = jax.random.uniform(jax.random.PRNGKey(6), (3, 64, 64, 3))
        out = model.apply(variables, x, training=False)
        bpp, y_bpp, z_bpp = eval_bpp(out, 64 * 64)
        assert bpp.shape == (3,)
        np.testing.assert_allclose(bpp, y_bpp + z_bpp, rtol=1e-6)


class TestBitsBackHyperprior:
    def test_forward_and_loss(self):
        model = BitsBackHyperprior(num_filters=N)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(1), x, training=True, rng=jax.random.PRNGKey(2))
        out = model.apply(variables, x, training=True, rng=jax.random.PRNGKey(3))
        assert out["z_mean"].shape == (2, 1, 1, N)
        assert out["z_logvar"].shape == (2, 1, 1, N)
        loss, metrics = bb_rd_loss(out, x, lmbda=0.01)
        assert np.isfinite(float(loss))
        # Net rate subtracts the bits-back term (mbt2018_bb.py:113-118).
        np.testing.assert_allclose(
            float(metrics["bpp"]),
            float(metrics["y_bpp"] + metrics["z_bpp"] - metrics["bpp_back"]),
            rtol=1e-5,
        )

    def test_sigma_upper_bound_in_training(self):
        model = BitsBackHyperprior(num_filters=N)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, training=True, rng=jax.random.PRNGKey(1))
        out = model.apply(variables, x, training=True, rng=jax.random.PRNGKey(2))
        assert float(out["sigma"].max()) <= 10.0 ** 0.5 + 1e-5


class TestBF16ComputeDtype:
    def test_bf16_close_to_fp32(self):
        """bfloat16 transform compute must track fp32 closely; likelihood
        math stays fp32 either way."""
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
        m32 = MeanScaleHyperprior(num_filters=N)
        v = m32.init(jax.random.PRNGKey(1), x, training=True, rng=jax.random.PRNGKey(2))
        m16 = MeanScaleHyperprior(num_filters=N, compute_dtype=jnp.bfloat16)
        out32 = m32.apply(v, x, training=False)
        out16 = m16.apply(v, x, training=False)
        # Latents and reconstruction agree to bf16 tolerance.
        assert out16["x_tilde"].dtype == jnp.float32
        np.testing.assert_allclose(out32["x_tilde"], out16["x_tilde"], atol=0.03)
        l32, _ = rd_loss(out32, x, 0.01)
        l16, _ = rd_loss(out16, x, 0.01)
        assert abs(float(l32) - float(l16)) / abs(float(l32)) < 0.05


@pytest.mark.slow
class TestSubpixelEquivalence:
    def test_subpixel_matches_conv_transpose(self):
        """The subpixel upsampling path must be element-exact with
        lax.conv_transpose (stride 2, SAME)."""
        from nic_tpu.models.layers import _depth_to_space2, _subpixel_kernel_up2

        rng = np.random.default_rng(0)
        for k, ci, co, h, w in ((5, 4, 6, 9, 7), (3, 3, 5, 6, 6)):
            x = jnp.asarray(rng.normal(size=(2, h, w, ci)).astype(np.float32))
            kern = jnp.asarray(rng.normal(size=(k, k, ci, co)).astype(np.float32))
            ref = jax.lax.conv_transpose(
                x, kern, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            got = _depth_to_space2(
                jax.lax.conv_general_dilated(
                    x, _subpixel_kernel_up2(kern), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ),
                co,
            )
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_phases_matches_conv_transpose(self):
        """The 4-phase upsampling rewrite (25 live taps) must be
        element-exact with lax.conv_transpose (stride 2, 5x5, SAME)."""
        from nic_tpu.models.layers import _conv_transpose_phases_up2

        rng = np.random.default_rng(1)
        for ci, co, h, w in ((4, 6, 9, 7), (3, 5, 6, 6)):
            x = jnp.asarray(rng.normal(size=(2, h, w, ci)).astype(np.float32))
            kern = jnp.asarray(rng.normal(size=(5, 5, ci, co)).astype(np.float32))
            ref = jax.lax.conv_transpose(
                x, kern, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            got = _conv_transpose_phases_up2(x, kern)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_model_phases_impl_matches_default(self):
        """Whole-model forward with upsample_impl='phases' equals the
        transpose default."""
        from nic_tpu.models.mbt2018 import MeanScaleHyperprior

        x = jnp.asarray(
            np.random.default_rng(2).random((1, 64, 64, 3), np.float32)
        )
        m0 = MeanScaleHyperprior(num_filters=8)
        m1 = MeanScaleHyperprior(num_filters=8, upsample_impl="phases")
        v = m0.init(jax.random.PRNGKey(0), x, training=True,
                    rng=jax.random.PRNGKey(1))
        o0 = m0.apply(v, x, training=False)
        o1 = m1.apply(v, x, training=False)
        np.testing.assert_allclose(
            np.asarray(o0["x_tilde"]), np.asarray(o1["x_tilde"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(o0["mu"]), np.asarray(o1["mu"]), atol=1e-5
        )
