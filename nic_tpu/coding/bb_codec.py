"""Actual bits-back entropy coding for the bits-back hyperprior (BB-ANS).

The reference never serializes its bits-back models — all bb_* rates are
ELBO *estimates* (SURVEY.md section 3.4: "no bits-back range coder is
implemented; nothing ever serializes z_tilde samples"). This module turns
the bits-back construction into real, decodable bitstreams using the
stack rANS coder:

Encode (per image):
  1. y* = round(g_a(x)); the y payload is coded as a normal (escape-capable)
     stream against the scale-indexed Gaussian tables.
  2. q(z | y*) = N(h_a(y*)) — the *amortized* posterior, which the decoder
     can recompute from y* (per-image-optimized posteriors are not
     decodable without sending them; their rates remain estimates, exactly
     as in the reference).
  3. On a stack seeded with deterministic initial bits: POP quantized z-bins
     under q (this is the bits-back "sample" — it consumes ~H(q) bits),
     then PUSH the bins under the prior p(z). The stack is the z stream.

Decode:
  1. POP z-bins under p(z) -> z_tilde; decode y* with p(y | z_tilde);
     x_hat = g_s(y*).
  2. PUSH the z-bins back under q(z | h_a(y*)) — this *returns* the borrowed
     bits: the stack must end exactly equal to the encoder's initial bits,
     which doubles as an integrity check.

z is discretized on a uniform grid of width `delta`; tail mass folds into
the edge bins so no escape coding is needed on the stack.
"""

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nic_tpu.coding.coder import RansCoder, RansStack
from nic_tpu.coding.container import PackedBitstream
from nic_tpu.coding.tables import CdfTable, pmf_to_quantized_cdf_fast
from nic_tpu.models.conditional import GaussianConditional
from nic_tpu.models.mbt2018_bb import BitsBackHyperprior
from nic_tpu.ops.stats import standardized_quantile

_GC = GaussianConditional()


@partial(jax.jit, static_argnums=0)
def _encode_pass(model, params, x):
    y = model.apply({"params": params}, x, method=model.analyze)
    y_star = jnp.round(y)
    z_mean, z_logvar = model.apply(
        {"params": params}, y_star, method=model.hyper_posterior
    )
    return y_star, z_mean, z_logvar


@partial(jax.jit, static_argnums=(0, 3))
def _mu_sigma(model, params, z_tilde, y_hw):
    mu, sigma = model.apply(
        {"params": params}, z_tilde, y_hw, method=model.hyper_synthesize
    )
    return mu, sigma, _GC.scale_indexes(_GC.bound_scale(sigma))


@partial(jax.jit, static_argnums=(0, 3))
def _synthesize(model, params, y_star, x_hw):
    return model.apply({"params": params}, y_star, x_hw, method=model.synthesize)


class BitsBackCodec:
    """Real bits-back bitstreams for a trained BitsBackHyperprior."""

    def __init__(
        self,
        model: BitsBackHyperprior,
        params: Any,
        grid_lo: float = -20.0,
        grid_hi: float = 20.0,
        delta: float = 0.125,
        initial_bits: int = 0,  # 0 = auto: enough that the q-pop never underflows
    ):
        self.model = model
        self.params = params
        self.grid_lo = grid_lo
        self.grid_hi = grid_hi
        self.delta = delta
        self.initial_bits = initial_bits
        self.num_bins = int(round((grid_hi - grid_lo) / delta))
        self.coder = RansCoder()
        self._p_table = None
        self._y_table = None

    # -------------------------------------------------------------- tables

    def p_table(self):
        """Prior bin CDFs per channel over the shared grid."""
        if self._p_table is None:
            pmf = jax.device_get(
                self.model.apply(
                    {"params": self.params},
                    self.grid_lo,
                    self.grid_hi,
                    self.delta,
                    method=lambda m, lo, hi, d: m.hyper_prior.pmf_on_grid(lo, hi, d),
                )
            )
            self._p_table = pmf_to_quantized_cdf_fast(np.asarray(pmf, np.float64))
        return self._p_table

    def y_table(self) -> CdfTable:
        if self._y_table is None:
            pmf, offsets, lengths, tail = _GC.pmfs_for_coding()
            self._y_table = CdfTable.from_pmf(pmf, offsets, lengths, tail)
        return self._y_table

    def q_tables(self, z_mean: np.ndarray, z_logvar: np.ndarray):
        """Per-element posterior bin CDFs over the shared grid (host fp64)."""
        from scipy.special import erfc

        mu = np.asarray(z_mean, np.float64).reshape(-1, 1)
        sigma = np.exp(np.asarray(z_logvar, np.float64).reshape(-1, 1) * 0.5)
        edges = self.grid_lo + self.delta * np.arange(1, self.num_bins)[None, :]
        cdf = 0.5 * erfc(-(edges - mu) / (sigma * np.sqrt(2.0)))
        cdf = np.concatenate(
            [np.zeros((mu.shape[0], 1)), cdf, np.ones((mu.shape[0], 1))], axis=1
        )
        pmf = np.diff(cdf, axis=1)
        return pmf_to_quantized_cdf_fast(pmf)

    def _grid_centers(self, bins: np.ndarray) -> np.ndarray:
        return (self.grid_lo + (bins.astype(np.float32) + 0.5) * self.delta)

    # -------------------------------------------------------------- encode

    def compress(self, x: np.ndarray, seed: int = 0) -> Tuple[bytes, Dict[str, Any]]:
        """One bitstream per call (whole batch). Returns (bytes, info)."""
        x = jnp.asarray(x, jnp.float32)
        y_star, z_mean, z_logvar = _encode_pass(self.model, self.params, x)
        y_star_np = np.asarray(jax.device_get(y_star))
        z_shape = jax.device_get(z_mean).shape

        q_cdfs, q_sizes = self.q_tables(jax.device_get(z_mean), jax.device_get(z_logvar))
        p_cdfs, p_sizes = self.p_table()
        n_elem = int(np.prod(z_shape))

        # Enough initial bits that popping ~H(q) never underflows the stack
        # (worst-case renorm draws a few bytes per symbol).
        init_len = self.initial_bits or (4 * n_elem + 64)
        init = np.random.default_rng(seed).bytes(init_len)
        stack = RansStack(init)
        # Bits-back: pop the posterior "sample" from the stack.
        q_rows = np.arange(n_elem, dtype=np.int32)
        z_bins = stack.pop(q_rows, q_cdfs, q_sizes)
        z_tilde = jnp.asarray(self._grid_centers(z_bins).reshape(z_shape))

        # y payload under p(y | z_tilde).
        y_hw = (y_star_np.shape[1], y_star_np.shape[2])
        mu, _, y_rows = _mu_sigma(self.model, self.params, z_tilde, y_hw)
        y_sym = (y_star_np - np.round(np.asarray(jax.device_get(mu)))).astype(np.int32)
        y_rows = np.asarray(jax.device_get(y_rows))
        yt = self.y_table()
        y_stream = self.coder.encode(
            y_sym - yt.offsets[y_rows], y_rows, yt.cdfs, yt.cdf_sizes
        )

        # Push the bins under the prior: the stack becomes the z stream.
        channels = z_shape[-1]
        p_rows = np.broadcast_to(
            np.arange(channels, dtype=np.int32), z_shape
        ).reshape(-1)
        stack.push(z_bins, p_rows, p_cdfs, p_sizes)
        z_stream = stack.serialize()

        packed = PackedBitstream()
        packed.add_stream("string", y_stream)
        packed.add_stream("z_stack", z_stream)
        packed.add_ints("x_shape", x.shape[1:3])
        packed.add_ints("y_shape", y_star_np.shape[1:3])
        packed.add_ints("z_shape", z_shape[1:3])
        packed.add_ints("batch", [x.shape[0]])
        packed.add_ints("seed", [seed])
        packed.add_ints("init_bits", [init_len])
        blob = packed.pack()

        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        info = dict(
            actual_bpp=len(blob) * 8 / num_pixels,
            # The initial bits are recovered verbatim by the decoder, so the
            # net bits-back rate excludes them (they could carry other data).
            net_bpp=(len(blob) - init_len) * 8 / num_pixels,
            y_stream_bytes=len(y_stream),
            z_stack_bytes=len(z_stream),
            init_bytes=init_len,
        )
        return blob, info

    # -------------------------------------------------------------- decode

    def decompress(self, blob: bytes) -> Tuple[np.ndarray, bool]:
        """Returns (x_hat, initial_bits_recovered)."""
        packed = PackedBitstream.unpack(blob)
        n = packed.get_ints("batch")[0]
        xh, xw = packed.get_ints("x_shape")
        yh, yw = packed.get_ints("y_shape")
        zh, zw = packed.get_ints("z_shape")
        seed = packed.get_ints("seed")[0]
        init_len = packed.get_ints("init_bits")[0]
        c = self.model.num_filters
        z_shape = (n, zh, zw, c)
        n_elem = int(np.prod(z_shape))

        p_cdfs, p_sizes = self.p_table()
        stack = RansStack.deserialize(packed.get_stream("z_stack"))
        p_rows = np.broadcast_to(np.arange(c, dtype=np.int32), z_shape).reshape(-1)
        z_bins = stack.pop(p_rows, p_cdfs, p_sizes)
        z_tilde = jnp.asarray(self._grid_centers(z_bins).reshape(z_shape))

        mu, _, y_rows = _mu_sigma(self.model, self.params, z_tilde, (yh, yw))
        y_rows = np.asarray(jax.device_get(y_rows))
        yt = self.y_table()
        y_rel = self.coder.decode(
            packed.get_stream("string"), y_rows, yt.cdfs, yt.cdf_sizes
        )
        y_sym = yt.values_from_symbols(y_rel, y_rows)
        y_star = jnp.asarray(y_sym, jnp.float32) + jnp.round(mu)
        x_hat = _synthesize(self.model, self.params, y_star, (xh, xw))

        # Return the borrowed bits: push the bins back under q(z | y*).
        z_mean, z_logvar = self.model.apply(
            {"params": self.params}, y_star, method=self.model.hyper_posterior
        )
        q_cdfs, q_sizes = self.q_tables(
            jax.device_get(z_mean), jax.device_get(z_logvar)
        )
        q_rows = np.arange(n_elem, dtype=np.int32)
        stack.push(z_bins, q_rows, q_cdfs, q_sizes)
        recovered = stack.serialize()
        # rANS decode/encode are exact inverses, so the stack must be
        # restored to the encoder's initial state: [LE32 of the rANS lower
        # bound][initial bits].
        import struct

        expected = struct.pack("<I", 1 << 23) + np.random.default_rng(seed).bytes(init_len)
        init_ok = recovered == expected

        return (
            np.asarray(jax.device_get(jnp.clip(x_hat, 0.0, 1.0))),
            bool(init_ok),
        )
