"""End-to-end integration: train a small model for real, then exercise every
inference method and the bitstream codec against it.

The closest feasible analog of the reference's golden-RD regression without
2M-step pretrained checkpoints: train a tiny hyperprior on structured
synthetic images until it compresses them meaningfully, then assert the
relationships the paper establishes (iterative inference improves the RD
objective over amortized inference; bitstreams round-trip at the estimated
rate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# 1500 training steps + five 300-it optimizations on CPU: minutes, not
# seconds. Deselected by default (pyproject addopts); run with -m slow.
pytestmark = pytest.mark.slow

from nic_tpu.infer import (
    BB_PLAIN,
    DANNEAL,
    MAP,
    SGA,
    STE,
    UNOISE,
    LatentOptimizer,
)
from nic_tpu.models.mbt2018 import MeanScaleHyperprior
from nic_tpu.train.trainer import TrainConfig, Trainer

LMBDA = 0.03


def synthetic_images(rng, n, size=64):
    """Smooth, compressible images: random low-frequency gradients + edges."""
    imgs = []
    for _ in range(n):
        xx, yy = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size))
        img = np.zeros((size, size, 3), np.float32)
        for c in range(3):
            a, b, ph = rng.uniform(0.5, 3, 3)
            img[..., c] = 0.5 + 0.4 * np.sin(a * xx * 3 + ph) * np.cos(b * yy * 3)
        # an edge
        cut = rng.integers(size // 4, 3 * size // 4)
        img[:, cut:, :] *= rng.uniform(0.5, 0.9)
        imgs.append(np.clip(img, 0, 1))
    return np.stack(imgs)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    rng = np.random.default_rng(0)
    train_imgs = synthetic_images(rng, 64)
    cfg = TrainConfig(
        model="mbt2018",
        num_filters=16,
        lmbda=LMBDA,
        batchsize=8,
        patchsize=64,
        last_step=1500,
        main_lr=4e-4,  # test-only: faster convergence than the paper's 1e-4
        checkpoint_dir=str(tmp_path_factory.mktemp("e2e")),
        log_every=100,
        save_checkpoint_secs=10_000,
    )
    trainer = Trainer(cfg)

    def batches():
        while True:
            idx = rng.integers(0, len(train_imgs), cfg.batchsize)
            yield train_imgs[idx]

    state = trainer.fit(batches(), verbose=False)
    test_imgs = synthetic_images(np.random.default_rng(99), 2)
    return trainer.model, jax.device_get(state.params), test_imgs


class TestEndToEnd:
    def test_training_learned_to_compress(self, trained):
        model, params, x = trained
        opt = LatentOptimizer(model, params)
        base = opt.eval_amortized(x)
        # A trained 16-filter model on smooth synthetic images should do much
        # better than 8bpp raw and reconstruct decently.
        assert float(np.mean(base["est_bpp"])) < 4.0
        assert float(np.mean(base["psnr"])) > 20.0

    @pytest.mark.parametrize(
        "method", [SGA, MAP, STE, UNOISE, DANNEAL], ids=lambda m: m.name
    )
    def test_iterative_methods_improve_rd(self, trained, method):
        """Table-1 relationship: every iterative method should improve (or at
        least not worsen) the true rounded RD objective vs amortized."""
        model, params, x = trained
        opt = LatentOptimizer(model, params)
        base = opt.eval_amortized(x)
        res = opt.optimize(
            x, LMBDA, method=method.replace(iterations=300), seed=0
        )
        rd_base = LMBDA * base["mse"].mean() + base["est_bpp"].mean()
        rd_opt = LMBDA * res["mse"].mean() + res["est_bpp"].mean()
        assert rd_opt <= rd_base * 1.02, (
            f"{method.name}: rd {rd_opt:.4f} vs amortized {rd_base:.4f}"
        )

    def test_sga_strictly_improves(self, trained):
        model, params, x = trained
        opt = LatentOptimizer(model, params)
        base = opt.eval_amortized(x)
        res = opt.optimize(x, LMBDA, method=SGA.replace(iterations=500), seed=0)
        rd_base = LMBDA * base["mse"].mean() + base["est_bpp"].mean()
        rd_opt = LMBDA * res["mse"].mean() + res["est_bpp"].mean()
        assert rd_opt < rd_base, "SGA must strictly improve a trained model's RD"

    def test_codec_on_trained_model(self, trained, monkeypatch):
        from nic_tpu.coding.codec import HyperpriorCodec
        from nic_tpu.models.mbt2018 import eval_bpp

        # Float-exactness vs the eval forward targets the wide decode path
        # (the shipped slim default is PNG-quantized by contract; see
        # tests/test_codec.py::TestDefaultDecodeContract).
        monkeypatch.setenv("NIC_TPU_DECODE_SLIM", "0")
        model, params, x = trained
        codec = HyperpriorCodec(model, params)
        blob, out = codec.compress(x)
        x_hat = codec.decompress(blob)
        np.testing.assert_allclose(
            x_hat, np.clip(np.asarray(out["x_tilde"]), 0, 1), atol=1e-5
        )
        est, _, _ = eval_bpp(out, x.shape[1] * x.shape[2])
        est_bits = float(np.mean(np.asarray(est))) * x.shape[0] * x.shape[1] * x.shape[2]
        actual_bits = len(blob) * 8
        # On a *trained* model the actual rate should track the estimate.
        assert actual_bits < est_bits * 1.15 + 8 * 250

    def test_optimized_bitstream_on_trained_model(self, trained, monkeypatch):
        from nic_tpu.coding.codec import HyperpriorCodec

        monkeypatch.setenv("NIC_TPU_DECODE_SLIM", "0")
        model, params, x = trained
        codec = HyperpriorCodec(model, params)
        opt = LatentOptimizer(model, params)
        res = opt.optimize(x, LMBDA, method=SGA.replace(iterations=200), seed=0)
        blob = codec.compress_optimized(res["y"], res["z"], x.shape[1:3])
        x_hat = codec.decompress_optimized(blob)
        np.testing.assert_allclose(
            x_hat, np.clip(np.asarray(res["x_tilde"]), 0, 1), atol=1e-5
        )
