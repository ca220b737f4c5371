"""Tests for actual bits-back coding (BB-ANS) — beyond the reference, which
only estimates bits-back rates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nic_tpu.coding.coder import RansStack
from nic_tpu.coding.tables import pmf_to_quantized_cdf_fast
from nic_tpu.coding.bb_codec import BitsBackCodec
from nic_tpu.models.mbt2018_bb import BitsBackHyperprior

N = 8


class TestRansStack:
    def test_push_pop_roundtrip(self, rng):
        pmf = rng.dirichlet(np.ones(16), size=4)
        cdfs, sizes = pmf_to_quantized_cdf_fast(pmf)
        symbols = rng.integers(0, 16, 200).astype(np.int32)
        indexes = rng.integers(0, 4, 200).astype(np.int32)
        stack = RansStack()
        stack.push(symbols, indexes, cdfs, sizes)
        out = stack.pop(indexes, cdfs, sizes)
        np.testing.assert_array_equal(out, symbols)

    def test_pop_push_restores_initial_bits(self, rng):
        """The bits-back core property: decode-then-encode is the identity
        on the stack."""
        pmf = rng.dirichlet(np.ones(32), size=3)
        cdfs, sizes = pmf_to_quantized_cdf_fast(pmf)
        init = rng.bytes(500)
        stack = RansStack(init)
        before = stack.serialize()
        indexes = rng.integers(0, 3, 100).astype(np.int32)
        symbols = stack.pop(indexes, cdfs, sizes)
        stack.push(symbols, indexes, cdfs, sizes)
        assert stack.serialize() == before

    def test_serialize_roundtrip(self, rng):
        pmf = rng.dirichlet(np.ones(8), size=2)
        cdfs, sizes = pmf_to_quantized_cdf_fast(pmf)
        stack = RansStack(rng.bytes(64))
        symbols = rng.integers(0, 8, 50).astype(np.int32)
        indexes = rng.integers(0, 2, 50).astype(np.int32)
        stack.push(symbols, indexes, cdfs, sizes)
        blob = stack.serialize()
        stack2 = RansStack.deserialize(blob)
        out = stack2.pop(indexes, cdfs, sizes)
        np.testing.assert_array_equal(out, symbols)

    def test_rate_near_entropy(self, rng):
        p = np.array([[0.7, 0.2, 0.05, 0.05]])
        cdfs, sizes = pmf_to_quantized_cdf_fast(p)
        n = 20000
        symbols = rng.choice(4, size=n, p=p[0]).astype(np.int32)
        indexes = np.zeros(n, np.int32)
        stack = RansStack()
        stack.push(symbols, indexes, cdfs, sizes)
        entropy_bits = -np.sum(p[0] * np.log2(p[0])) * n
        actual_bits = (len(stack) - 4) * 8
        assert actual_bits < entropy_bits * 1.03 + 64


class TestQuantizedCdfFast:
    def test_matches_constraints(self, rng):
        pmf = rng.dirichlet(np.ones(64), size=100)
        cdfs, sizes = pmf_to_quantized_cdf_fast(pmf)
        assert (sizes == 64).all()
        assert (cdfs[:, 0] == 0).all()
        assert (cdfs[:, -1] == 1 << 16).all()
        assert (np.diff(cdfs.astype(np.int64), axis=1) >= 1).all()

    def test_tiny_rows(self):
        pmf = np.array([[1.0 - 2e-9, 1e-9, 1e-9]])
        cdfs, sizes = pmf_to_quantized_cdf_fast(pmf)
        assert (np.diff(cdfs[0].astype(np.int64)) >= 1).all()


@pytest.fixture(scope="module")
def bb_codec():
    model = BitsBackHyperprior(num_filters=N)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        jax.random.PRNGKey(0), x, training=True, rng=jax.random.PRNGKey(1)
    )
    return BitsBackCodec(model, variables["params"])


class TestBitsBackCodec:
    def test_roundtrip_and_bit_recovery(self, bb_codec):
        x = np.random.default_rng(3).random((2, 64, 64, 3)).astype(np.float32)
        blob, info = bb_codec.compress(x, seed=5)
        x_hat, init_ok = bb_codec.decompress(blob)
        assert x_hat.shape == x.shape
        assert init_ok, "decoder must recover the encoder's initial bits exactly"
        assert info["net_bpp"] < info["actual_bpp"]
        assert info["net_bpp"] > 0

    def test_reconstruction_matches_direct_synthesis(self, bb_codec):
        """x_hat must equal g_s(round(y)) with the coded z_tilde path."""
        x = np.random.default_rng(4).random((1, 64, 64, 3)).astype(np.float32)
        blob, _ = bb_codec.compress(x, seed=1)
        x_hat, _ = bb_codec.decompress(blob)
        model, params = bb_codec.model, bb_codec.params
        y = model.apply({"params": params}, jnp.asarray(x), method=model.analyze)
        y_star = jnp.round(y)
        x_direct = model.apply(
            {"params": params}, y_star, (64, 64), method=model.synthesize
        )
        np.testing.assert_allclose(
            x_hat, np.clip(np.asarray(x_direct), 0, 1), atol=1e-5
        )

    def test_deterministic(self, bb_codec):
        x = np.random.default_rng(5).random((1, 64, 64, 3)).astype(np.float32)
        b1, _ = bb_codec.compress(x, seed=2)
        b2, _ = bb_codec.compress(x, seed=2)
        assert b1 == b2
