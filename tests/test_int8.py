"""int8 dynamic-quantized conv path (ops/int8conv.py).

Forward must track the bf16 conv within quantization noise; backward must be
the exact bf16 STE gradient (bit-identical to differentiating the unquantized
conv), because the engines rely on unchanged gradient semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from nic_tpu.ops.int8conv import int8_conv


def _mk(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


class TestInt8Conv:
    @pytest.mark.parametrize("transpose,strides", [(False, 1), (False, 2), (True, 2)])
    def test_forward_close_to_fp32(self, transpose, strides):
        x = _mk((2, 8, 8, 16))
        w = _mk((5, 5, 16, 24), 1) * 0.1
        got = np.asarray(int8_conv(x, w, strides, transpose), np.float32)
        if transpose:
            want = lax.conv_transpose(
                x, w, (strides, strides), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            want = lax.conv_general_dilated(
                x, w, (strides, strides), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        want = np.asarray(want, np.float32)
        # W8A8 with per-tensor activations: relative error ~1% of the
        # output dynamic range.
        scale = np.abs(want).max() + 1e-9
        assert np.abs(got - want).max() / scale < 0.03

    def test_backward_is_exact_bf16_ste(self):
        x = _mk((1, 4, 4, 8)).astype(jnp.bfloat16)
        w = (_mk((5, 5, 8, 8), 1) * 0.1).astype(jnp.bfloat16)
        g_q = jax.grad(lambda x_: jnp.sum(int8_conv(x_, w, 2, True) ** 2) * 0.0
                       + jnp.sum(int8_conv(x_, w, 2, True)))(x)
        # STE: gradient of sum(conv) w.r.t. x equals gradient of the plain
        # bf16 conv (quantization treated as identity).
        g_ref = jax.grad(
            lambda x_: jnp.sum(
                lax.conv_transpose(
                    x_, w, (2, 2), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
        )(x)
        np.testing.assert_array_equal(np.asarray(g_q, np.float32),
                                      np.asarray(g_ref, np.float32))

    @pytest.mark.slow
    def test_adjoint_conv_matches_vjp(self):
        # The hand-built input-cotangent conv (flip+swap kernel, strides 2,
        # pad (1,2)) must be element-exact vs jax.vjp of the float primal.
        from nic_tpu.ops.int8conv import _adjoint_weight_up2

        for h, w_ in [(6, 5), (7, 7), (4, 9)]:
            x = _mk((2, h, w_, 6), h)
            w = _mk((5, 5, 6, 10), w_) * 0.1
            y = lax.conv_transpose(
                x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            g = _mk(y.shape, 3)
            _, vjp = jax.vjp(
                lambda x_: lax.conv_transpose(
                    x_, w, (2, 2), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ),
                x,
            )
            (dx_ref,) = vjp(g)
            dx = lax.conv_general_dilated(
                g, _adjoint_weight_up2(w), (2, 2), ((1, 2), (1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            np.testing.assert_allclose(
                np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-4
            )

    @pytest.mark.slow
    def test_qbwd_gradient_close_to_float(self):
        from nic_tpu.ops.int8conv import int8_conv_transpose_qbwd

        x = _mk((1, 6, 6, 8))
        w = _mk((5, 5, 8, 8), 1) * 0.1
        g_q = jax.grad(lambda x_: jnp.sum(int8_conv_transpose_qbwd(x_, w, 2)))(x)
        g_ref = jax.grad(
            lambda x_: jnp.sum(
                lax.conv_transpose(
                    x_, w, (2, 2), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
        )(x)
        scale = np.abs(np.asarray(g_ref)).max() + 1e-9
        assert np.abs(np.asarray(g_q, np.float32) - np.asarray(g_ref)).max() / scale < 0.03

    def test_model_quant_option_runs_and_tracks(self):
        from nic_tpu.models.mbt2018 import MeanScaleHyperprior

        x = np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
        m0 = MeanScaleHyperprior(num_filters=8, compute_dtype=jnp.bfloat16)
        v = m0.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)
        mq = MeanScaleHyperprior(
            num_filters=8, compute_dtype=jnp.bfloat16, quant="int8"
        )
        out0 = m0.apply(v, jnp.asarray(x), training=False)
        outq = mq.apply(v, jnp.asarray(x), training=False)
        # Same pipeline, bounded quantization noise on the reconstruction.
        d = np.abs(np.asarray(out0["x_tilde"]) - np.asarray(outq["x_tilde"]))
        assert d.max() < 0.15
        assert np.isfinite(float(np.asarray(outq["y_likelihoods"]).sum()))
