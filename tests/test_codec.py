"""End-to-end bitstream tests: compress -> decompress round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nic_tpu.coding.codec import HyperpriorCodec
from nic_tpu.models.mbt2018 import MeanScaleHyperprior, eval_bpp

N = 8


@pytest.fixture(scope="module")
def codec():
    model = MeanScaleHyperprior(num_filters=N)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        jax.random.PRNGKey(0), x, training=True, rng=jax.random.PRNGKey(1)
    )
    return HyperpriorCodec(model, variables["params"])


@pytest.fixture(scope="module")
def image():
    return np.random.default_rng(3).random((2, 64, 64, 3)).astype(np.float32)


@pytest.fixture(autouse=True)
def _pin_wide_decode(monkeypatch):
    """Float-exactness tests in this module target the wide fused path
    explicitly (forced-off tri-state env flags); the shipped default
    (codec.DECODE_DEFAULT — measurement-driven, currently the slim
    PNG-quantized path) has its own contract test below. Tests that probe a
    specific variant override these inside their bodies."""
    monkeypatch.setenv("NIC_TPU_DECODE_SLIM", "0")
    monkeypatch.setenv("NIC_TPU_DECODE_UNFUSED", "0")


class TestDefaultDecodeContract:
    def test_default_matches_decode_rule_contract(self, codec, image, monkeypatch):
        """Whatever DECODE_DEFAULT is, decompress() must return either the
        exact eval-forward reconstruction (wide paths) or its PNG
        quantization round(x*255)/255 (slim path) — the latter is exactly
        what the reference's decompress writes (mbt2018.py:288-295)."""
        monkeypatch.delenv("NIC_TPU_DECODE_SLIM", raising=False)
        monkeypatch.delenv("NIC_TPU_DECODE_UNFUSED", raising=False)
        from nic_tpu.coding import codec as codec_mod

        blob, out = codec.compress(image)
        x_hat = codec.decompress(blob)
        expected = np.clip(np.asarray(out["x_tilde"]), 0.0, 1.0)
        if codec_mod.DECODE_DEFAULT == "single_stream_slim":
            np.testing.assert_allclose(
                x_hat, np.round(expected * 255.0) / 255.0, atol=1e-6
            )
        else:
            np.testing.assert_allclose(x_hat, expected, atol=1e-5)


class TestCodecRoundtrip:
    def test_reconstruction_matches_eval_forward(self, codec, image):
        blob, out = codec.compress(image)
        x_hat = codec.decompress(blob)
        expected = np.clip(np.asarray(out["x_tilde"]), 0.0, 1.0)
        np.testing.assert_allclose(x_hat, expected, atol=1e-5)

    def test_actual_bpp_close_to_estimate(self, codec, image):
        """actual_bpp ~ est_bpp + container overhead (mbt2018.py:219-221)."""
        blob, out = codec.compress(image)
        num_pixels = image.shape[0] * image.shape[1] * image.shape[2]
        actual_bpp = len(blob) * 8 / num_pixels
        est, _, _ = eval_bpp(out, image.shape[1] * image.shape[2])
        est_total = float(np.mean(np.asarray(est)))
        # Estimated bpp should bound actual from below minus small epsilon;
        # container + coder overhead should stay modest.
        overhead_bpp = (8 * 150) / num_pixels  # header budget
        assert actual_bpp <= est_total * 1.08 + overhead_bpp + 0.02
        assert actual_bpp >= est_total * 0.9 - 0.01

    def test_nonstandard_size(self, codec):
        """Non-multiple-of-64 sizes: crop logic through the whole codec."""
        x = np.random.default_rng(5).random((1, 75, 90, 3)).astype(np.float32)
        blob, out = codec.compress(x)
        x_hat = codec.decompress(blob)
        assert x_hat.shape == x.shape
        expected = np.clip(np.asarray(out["x_tilde"]), 0.0, 1.0)
        np.testing.assert_allclose(x_hat, expected, atol=1e-5)

    def test_bitstream_is_bytes_and_stable(self, codec, image):
        b1, _ = codec.compress(image)
        b2, _ = codec.compress(image)
        assert isinstance(b1, bytes) and b1 == b2


class TestOptimizedLatentCoding:
    """Real bitstreams for SGA-style plainly-rounded latents (beyond the
    reference, which never serializes them)."""

    def test_roundtrip(self, codec, image):
        from nic_tpu.infer import SGA, LatentOptimizer

        opt = LatentOptimizer(codec.model, codec.params)
        res = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=20))
        blob = codec.compress_optimized(res["y"], res["z"], image.shape[1:3])
        x_hat = codec.decompress_optimized(blob)
        assert x_hat.shape == image.shape
        # Reconstruction must match synthesizing the optimized latents.
        expected = np.clip(np.asarray(res["x_tilde"]), 0.0, 1.0)
        np.testing.assert_allclose(x_hat, expected, atol=1e-5)

    def test_actual_bits_near_estimate(self, codec, image):
        from nic_tpu.infer import SGA, LatentOptimizer

        opt = LatentOptimizer(codec.model, codec.params)
        res = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=20))
        blob = codec.compress_optimized(res["y"], res["z"], image.shape[1:3])
        num_pixels = image.shape[0] * image.shape[1] * image.shape[2]
        actual_bits = len(blob) * 8
        est_bits = float(np.mean(res["est_bpp"])) * num_pixels
        # round(mu)-shifted coding costs a bit over the exact-mu estimate,
        # plus fixed container/flush overhead (~200 bytes) which dominates
        # at toy image sizes.
        assert actual_bits < est_bits * 1.4 + 8 * 250


class TestModeDispatch:
    """mode-marker handling: optimized streams must never be silently
    mis-decoded against the amortized (median-grid) tables."""

    def test_decompress_dispatches_on_mode(self, codec, image):
        from nic_tpu.infer import SGA, LatentOptimizer

        opt = LatentOptimizer(codec.model, codec.params)
        res = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=10))
        blob = codec.compress_optimized(res["y"], res["z"], image.shape[1:3])
        np.testing.assert_array_equal(
            codec.decompress(blob), codec.decompress_optimized(blob)
        )

    def test_decompress_optimized_rejects_amortized_stream(self, codec, image):
        blob, _ = codec.compress(image)
        with pytest.raises(ValueError, match="mode"):
            codec.decompress_optimized(blob)


class TestUnoiseLatentCoding:
    def test_compress_latents_roundtrip(self, codec, image):
        """unoise transmitted latents (median/mean-centered quantization,
        quantized_z mean) code exactly into the amortized scheme and decode
        with plain decompress()."""
        from nic_tpu.infer import UNOISE, LatentOptimizer

        opt = LatentOptimizer(codec.model, codec.params)
        res = opt.optimize(image, lmbda=0.01, method=UNOISE.replace(iterations=10))
        blob = codec.compress_latents(res["y"], res["z"], image.shape[1:3])
        x_hat = codec.decompress(blob)
        expected = np.clip(np.asarray(res["x_tilde"]), 0.0, 1.0)
        np.testing.assert_allclose(x_hat, expected, atol=1e-5)


class TestParallelStreams:
    def test_parallel_compress_decompress(self, codec, image):
        blob_p, out = codec.compress(image, parallel=True)
        x_hat = codec.decompress(blob_p)
        expected = np.clip(np.asarray(out["x_tilde"]), 0.0, 1.0)
        np.testing.assert_allclose(x_hat, expected, atol=1e-5)
        # Sequential mode still decodes too, and rates are comparable.
        blob_s, _ = codec.compress(image, parallel=False)
        assert abs(len(blob_p) - len(blob_s)) < 64 * image.shape[0]


class TestFusedDecodePipeline:
    """decompress() runs two fused device programs (z-dequant+h_s, then
    y-dequant+g_s+clip); the pre-fusion per-stage path stays selectable via
    NIC_TPU_DECODE_UNFUSED for bench A/Bs. Both must be bit-identical."""

    def _ab(self, codec, blob, monkeypatch):
        fused = codec.decompress(blob)
        monkeypatch.setenv("NIC_TPU_DECODE_UNFUSED", "1")
        unfused = codec.decompress(blob)
        np.testing.assert_array_equal(fused, unfused)

    def test_amortized_stream_fused_equals_unfused(self, codec, image, monkeypatch):
        blob, _ = codec.compress(image)
        self._ab(codec, blob, monkeypatch)

    def test_optimized_stream_fused_equals_unfused(self, codec, image, monkeypatch):
        from nic_tpu.infer import SGA, LatentOptimizer

        opt = LatentOptimizer(codec.model, codec.params)
        res = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=10))
        blob = codec.compress_optimized(res["y"], res["z"], image.shape[1:3])
        self._ab(codec, blob, monkeypatch)


class TestSlimDecodePipeline:
    """NIC_TPU_DECODE_SLIM shrinks host<->device transfers (uint8 scale
    indexes, int16 y symbols, uint8 pixels). The decoded image must equal
    the wide path's after PNG quantization — exactly what the reference
    decompress emits (mbt2018.py:288-295)."""

    def _ab(self, codec, blob, monkeypatch):
        wide = codec.decompress(blob)
        monkeypatch.setenv("NIC_TPU_DECODE_SLIM", "1")
        slim = codec.decompress(blob)
        monkeypatch.delenv("NIC_TPU_DECODE_SLIM")
        np.testing.assert_array_equal(
            np.round(slim * 255.0).astype(np.uint8),
            np.round(wide * 255.0).astype(np.uint8),
        )
        assert slim.dtype == np.float32
        assert np.all(slim >= 0.0) and np.all(slim <= 1.0)

    def test_amortized_stream_slim_equals_wide(self, codec, image, monkeypatch):
        blob, _ = codec.compress(image)
        self._ab(codec, blob, monkeypatch)

    def test_parallel_stream_slim_equals_wide(self, codec, image, monkeypatch):
        blob, _ = codec.compress(image, parallel=True)
        self._ab(codec, blob, monkeypatch)

    def test_optimized_stream_slim_equals_wide(self, codec, image, monkeypatch):
        from nic_tpu.infer import SGA, LatentOptimizer

        opt = LatentOptimizer(codec.model, codec.params)
        res = opt.optimize(image, lmbda=0.01, method=SGA.replace(iterations=10))
        blob = codec.compress_optimized(res["y"], res["z"], image.shape[1:3])
        self._ab(codec, blob, monkeypatch)
