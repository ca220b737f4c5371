"""Validate PSNR / MS-SSIM against TensorFlow's implementations (the exact
functions the reference calls at sga.py:174-176)."""

import numpy as np
import pytest

from nic_tpu.evaluation.metrics import msssim, msssim_db, psnr

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    a = rng.random((2, 192, 256, 3)).astype(np.float32) * 255
    # correlated distortion so SSIM is nontrivial
    b = np.clip(a + rng.normal(0, 12, a.shape).astype(np.float32), 0, 255)
    return np.round(a), np.round(b)


class TestAgainstTF:
    def test_psnr(self, images):
        a, b = images
        ours = np.asarray(psnr(a, b, 255.0))
        theirs = tf.image.psnr(a, b, 255).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_msssim(self, images):
        a, b = images
        ours = np.asarray(msssim(a, b, 255.0))
        theirs = tf.image.ssim_multiscale(a, b, 255).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)

    def test_msssim_identical_images(self, images):
        a, _ = images
        np.testing.assert_allclose(np.asarray(msssim(a, a, 255.0)), 1.0, atol=1e-5)

    def test_msssim_db(self):
        v = np.array([0.9, 0.99])
        np.testing.assert_allclose(
            np.asarray(msssim_db(v)), -10 * np.log10(1 - v), rtol=1e-5
        )

    def test_msssim_odd_sizes(self):
        """Odd H/W exercises the symmetric-pad + avgpool path."""
        rng = np.random.default_rng(1)
        a = (rng.random((1, 199, 217, 3)) * 255).astype(np.float32)
        b = np.clip(a + rng.normal(0, 20, a.shape).astype(np.float32), 0, 255)
        ours = np.asarray(msssim(a, b, 255.0))
        theirs = tf.image.ssim_multiscale(a, b, 255).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)
