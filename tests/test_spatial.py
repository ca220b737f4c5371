"""Spatial (halo-exchange) model parallelism: exactness and engine behavior.

The sharded transforms must match the unsharded ones bit-for-bit up to fp32
reduction order — including at the mesh edges, where the per-layer ppermute
zero fill must reproduce SAME zero padding (see parallel/spatial.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nic_tpu.infer.engine import LatentOptimizer
from nic_tpu.infer.methods import DANNEAL, MAP, SGA, UNOISE
from nic_tpu.models.mbt2018 import MeanScaleHyperprior
from nic_tpu.parallel.spatial import SpatialLatentOptimizer

# Heavy compile load on the 1-core CI host (each test jits sharded programs
# over an 8-device mesh); the whole module runs in the `-m slow` pass. The
# default suite keeps spatial smoke coverage via the driver dryrun.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    model = MeanScaleHyperprior(num_filters=16)
    x = np.random.default_rng(0).random((1, 256, 384, 3), np.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x),
        training=True,
        rng=jax.random.PRNGKey(1),
    )
    params = variables["params"]
    return model, params, x


class TestExactness:
    def test_amortized_init_matches_unsharded(self, setup):
        model, params, x = setup
        sp = SpatialLatentOptimizer(model, params)
        assert sp.n == 8
        ys, zs = sp.amortized_init(jnp.asarray(x))
        y, z = LatentOptimizer(model, params).amortized_init(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ys), np.asarray(y), atol=2e-5)
        np.testing.assert_allclose(np.asarray(zs), np.asarray(z), atol=2e-5)

    def test_danneal_matches_batch_engine(self, setup):
        """Deterministic method, same schedule and Adam: the sharded loop
        must land on the same rounded latents and metrics."""
        model, params, x = setup
        spec = DANNEAL.replace(iterations=25)
        rs = SpatialLatentOptimizer(model, params).optimize(x, 0.01, method=spec)
        rb = LatentOptimizer(model, params).optimize(x, 0.01, method=spec)
        assert np.mean(rs["y"] == rb["y"]) > 0.999
        np.testing.assert_allclose(rs["est_bpp"], rb["est_bpp"], rtol=1e-3)
        np.testing.assert_allclose(rs["psnr"], rb["psnr"], rtol=1e-3)

    def test_map_quantize_path(self, setup):
        """MAP transmits mean/median-centered latents; path must run and
        match the batch engine's quantization on the same latents."""
        model, params, x = setup
        spec = MAP.replace(iterations=10, early_stop=False)
        rs = SpatialLatentOptimizer(model, params).optimize(x, 0.01, method=spec)
        assert np.isfinite(rs["est_bpp"]).all()
        assert rs["x_tilde"].shape == x.shape

    def test_map_early_stop_matches_batch_engine(self, setup):
        """Deterministic method with early stopping: the psum'd probes must
        take the same exit and land on the same transmitted latents as the
        batch engine's while_loop."""
        model, params, x = setup
        spec = MAP.replace(iterations=40, probe_interval=10)
        rs = SpatialLatentOptimizer(model, params).optimize(x, 0.01, method=spec)
        rb = LatentOptimizer(model, params).optimize(x, 0.01, method=spec)
        # MAP transmits CONTINUOUS mean-centered values (round(y-mu)+mu) and
        # Adam's elementwise m/sqrt(v) amplifies cross-path fp reduction
        # differences over tens of steps, so only behavioral equality holds:
        # same latents to optimizer-drift tolerance, same metrics.
        np.testing.assert_allclose(rs["y"], rb["y"], atol=0.05)
        np.testing.assert_allclose(rs["est_bpp"], rb["est_bpp"], rtol=1e-3)
        np.testing.assert_allclose(rs["psnr"], rb["psnr"], rtol=1e-3)


class TestEngine:
    def test_sga_improves_rd_over_amortized(self, setup):
        model, params, x = setup
        sp = SpatialLatentOptimizer(model, params)
        r = sp.optimize(x, 0.01, method=SGA.replace(iterations=150), seed=0)
        base = LatentOptimizer(model, params).eval_amortized(x)

        def rd(res):
            return 0.01 * res["mse"][0] + res["est_bpp"][0]

        assert rd(r) < rd(base)

    def test_verbose_probes_match_batch_engine(self, setup):
        """probe_every > 0 records the psum'd rounded objective on the same
        schedule (NaN elsewhere) as the batch engine's --verbose probes."""
        model, params, x = setup
        spec = DANNEAL.replace(iterations=12)
        rs = SpatialLatentOptimizer(model, params).optimize(
            x, 0.01, method=spec, probe_every=5, chunk_size=6
        )
        rb = LatentOptimizer(model, params).optimize(
            x, 0.01, method=spec, probe_every=5
        )
        assert rs["rounded_losses"].shape == (12,)
        probe_mask = np.isfinite(rs["rounded_losses"])
        np.testing.assert_array_equal(probe_mask, np.arange(12) % 5 == 0)
        np.testing.assert_array_equal(probe_mask, np.isfinite(rb["rounded_losses"]))
        # Deterministic method: the probed discrete objectives must agree
        # with the batch engine up to fp32 reduction order.
        np.testing.assert_allclose(
            rs["rounded_losses"][probe_mask],
            rb["rounded_losses"][probe_mask],
            rtol=1e-3,
        )

    def test_losses_recorded_and_msssim(self, setup):
        model, params, x = setup
        r = SpatialLatentOptimizer(model, params).optimize(
            x, 0.01, method=UNOISE.replace(iterations=12), chunk_size=5
        )
        assert r["losses"].shape == (12,)
        assert "msssim" in r and np.isfinite(r["msssim"]).all()

    def test_arbitrary_size_pads_and_reports_original_pixels(self, setup):
        """Non-aligned sizes edge-pad to the mesh grid; metrics cover only
        the original pixels and track the batch engine's numbers."""
        model, params, _ = setup
        sp = SpatialLatentOptimizer(model, params)
        img = np.random.default_rng(5).random((1, 200, 300, 3)).astype(np.float32)
        spec = DANNEAL.replace(iterations=8)
        r = sp.optimize(img, 0.01, method=spec)
        assert r["x_tilde"].shape == img.shape
        assert np.isfinite(r["est_bpp"]).all() and np.isfinite(r["psnr"]).all()
        rb = LatentOptimizer(model, params).optimize(img, 0.01, method=spec)
        # Padded latents cost slightly more than the batch path's exact-crop
        # graph; distortion is computed on the same pixels.
        np.testing.assert_allclose(r["psnr"], rb["psnr"], rtol=0.05)
        assert r["est_bpp"][0] < rb["est_bpp"][0] * 1.5

    def test_small_image_msssim_is_nan_not_missing(self, setup):
        model, params, _ = setup
        sp = SpatialLatentOptimizer(model, params)
        img = np.random.default_rng(6).random((1, 256, 128, 3)).astype(np.float32)
        r = sp.optimize(img, 0.01, method=DANNEAL.replace(iterations=2))
        assert "msssim" in r and np.isnan(r["msssim"]).all()

    def test_msssim_objective_rejected(self, setup):
        model, params, x = setup
        sp = SpatialLatentOptimizer(model, params)
        with pytest.raises(ValueError):
            sp.optimize(
                x, 10.0, method=SGA.replace(iterations=1, distortion="msssim")
            )
