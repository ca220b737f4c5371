"""Sharded inference across the fake 8-device mesh matches single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nic_tpu.infer import SGA, LatentOptimizer
from nic_tpu.models.mbt2018 import MeanScaleHyperprior
from nic_tpu.parallel.mesh import data_mesh

N = 4


@pytest.fixture(scope="module")
def setup():
    model = MeanScaleHyperprior(num_filters=N)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        jax.random.PRNGKey(0), x, training=True, rng=jax.random.PRNGKey(1)
    )
    return model, variables["params"]


class TestShardedInference:
    @pytest.mark.slow
    def test_matches_single_device(self, setup):
        model, params = setup
        assert jax.device_count() >= 8
        x = np.random.default_rng(0).random((8, 64, 64, 3)).astype(np.float32)
        spec = SGA.replace(iterations=15)

        single = LatentOptimizer(model, params).optimize(x, 0.01, method=spec, seed=0)
        sharded = LatentOptimizer(model, params, mesh=data_mesh()).optimize(
            x, 0.01, method=spec, seed=0
        )
        # Same computation, so rounded latents and rates agree.
        np.testing.assert_array_equal(single["y"], sharded["y"])
        np.testing.assert_allclose(single["est_bpp"], sharded["est_bpp"], rtol=1e-4)

    def test_sharded_batch_lives_on_all_devices(self, setup):
        model, params = setup
        mesh = data_mesh()
        opt = LatentOptimizer(model, params, mesh=mesh)
        x = opt._place(jnp.zeros((8, 64, 64, 3)))
        assert len(x.sharding.device_set) == 8

    def test_remainder_batch_warns_and_runs_replicated(self, setup):
        # A batch that does not divide the mesh falls back to replicated
        # execution — correct but 1/N throughput, so it must be loud
        # (VERDICT r2 item 8).
        model, params = setup
        opt = LatentOptimizer(model, params, mesh=data_mesh())
        with pytest.warns(UserWarning, match="runs replicated"):
            x = opt._place(jnp.zeros((3, 64, 64, 3)))
        assert x.sharding.is_fully_replicated

    def test_divisible_batch_does_not_warn(self, setup):
        import warnings

        model, params = setup
        opt = LatentOptimizer(model, params, mesh=data_mesh())
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            opt._place(jnp.zeros((8, 64, 64, 3)))
