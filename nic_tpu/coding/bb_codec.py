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

    _INIT_MARGIN = 64  # bytes of slack kept above the measured consumption

    def _seeded_stack(self, seed, n_elem, q_rows, q_cdfs, q_sizes):
        """Stack whose initial bits are trimmed to what the posterior pop
        actually consumes (+margin), instead of the 4-bytes-per-element
        worst-case bound: pass 1 pops against a generous seed to measure
        consumption; pass 2 re-seeds with just the consumed suffix (the pop
        reads bytes strictly from the top of the initial buffer, so the
        suffix reproduces identical bins). This bounds the initial-bits
        overhead of actual_bpp to ~H(q) + margin even for tiny inputs.

        Returns (stack-after-pop, z_bins, kept_bytes, total_bytes)."""
        init_total = self.initial_bits or (4 * n_elem + 64)
        init = np.random.default_rng(seed).bytes(init_total)
        if self.initial_bits:
            stack = RansStack(init)
            return stack, stack.pop(q_rows, q_cdfs, q_sizes), init_total, init_total
        probe = RansStack(init)
        s0 = len(probe)
        z_bins = probe.pop(q_rows, q_cdfs, q_sizes)
        consumed = max(0, s0 - len(probe))
        kept = min(init_total, consumed + self._INIT_MARGIN)
        stack = RansStack(init[init_total - kept:])
        z_bins2 = stack.pop(q_rows, q_cdfs, q_sizes)
        if not np.array_equal(z_bins, z_bins2):  # pragma: no cover
            # Margin too small (pop dug deeper than measured): fall back to
            # the untrimmed seed.
            stack = RansStack(init)
            return stack, stack.pop(q_rows, q_cdfs, q_sizes), init_total, init_total
        return stack, z_bins2, kept, init_total

    def _expected_initial(self, seed, init_total, kept):
        import struct

        init = np.random.default_rng(seed).bytes(init_total)
        return struct.pack("<I", 1 << 23) + init[init_total - kept:]

    # -------------------------------------------------------------- encode

    def compress(self, x: np.ndarray, seed: int = 0) -> Tuple[bytes, Dict[str, Any]]:
        """One bitstream per call (whole batch), images CHAINED on one rANS
        stack (standard BB-ANS dataset chaining): image i's posterior pop
        consumes the prior-pushed bits of image i-1, so only the FIRST
        image draws real initial bits (~H(q) of one image instead of the
        whole batch) — actual_bpp converges to the ELBO estimate as the
        batch grows. The decoder unwinds in reverse image order (LIFO) and
        must recover the initial bits exactly (integrity check).
        Returns (bytes, info)."""
        x = jnp.asarray(x, jnp.float32)
        y_star, z_mean, z_logvar = _encode_pass(self.model, self.params, x)
        y_star_np = np.asarray(jax.device_get(y_star))
        z_mean = np.asarray(jax.device_get(z_mean))
        z_logvar = np.asarray(jax.device_get(z_logvar))
        z_shape = z_mean.shape
        batch = z_shape[0]
        img_elems = int(np.prod(z_shape[1:]))

        p_cdfs, p_sizes = self.p_table()
        q_rows = np.arange(img_elems, dtype=np.int32)
        p_rows = np.broadcast_to(
            np.arange(z_shape[-1], dtype=np.int32), z_shape[1:]
        ).reshape(-1)

        yt = self.y_table()
        y_streams = []
        stack = None
        init_len = init_total = 0
        for i in range(batch):
            q_cdfs, q_sizes = self.q_tables(z_mean[i], z_logvar[i])
            if stack is None:
                # Only the first image draws initial bits (trimmed).
                stack, z_bins, init_len, init_total = self._seeded_stack(
                    seed, img_elems, q_rows, q_cdfs, q_sizes
                )
            else:
                z_bins = stack.pop(q_rows, q_cdfs, q_sizes)
            z_tilde = jnp.asarray(
                self._grid_centers(z_bins).reshape((1,) + z_shape[1:])
            )
            y_hw = (y_star_np.shape[1], y_star_np.shape[2])
            mu, _, y_rows = _mu_sigma(self.model, self.params, z_tilde, y_hw)
            y_sym = (
                y_star_np[i : i + 1]
                - np.round(np.asarray(jax.device_get(mu)))
            ).astype(np.int32)
            y_rows = np.asarray(jax.device_get(y_rows))
            y_streams.append(
                self.coder.encode(
                    y_sym - yt.offsets[y_rows], y_rows, yt.cdfs, yt.cdf_sizes
                )
            )
            stack.push(z_bins, p_rows, p_cdfs, p_sizes)
        z_stream = stack.serialize()

        packed = PackedBitstream()
        packed.add_stream("string", b"".join(y_streams))
        packed.add_ints("string_sizes", [len(s) for s in y_streams])
        packed.add_stream("z_stack", z_stream)
        packed.add_ints("x_shape", x.shape[1:3])
        packed.add_ints("y_shape", y_star_np.shape[1:3])
        packed.add_ints("z_shape", z_shape[1:3])
        packed.add_ints("batch", [batch])
        packed.add_ints("seed", [seed])
        packed.add_ints("init_bits", [init_len])
        packed.add_ints("init_total", [init_total])
        packed.add_ints("chained", [1])
        blob = packed.pack()

        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        info = dict(
            actual_bpp=len(blob) * 8 / num_pixels,
            # The initial bits are recovered verbatim by the decoder, so the
            # net bits-back rate excludes them (they could carry other data).
            net_bpp=(len(blob) - init_len) * 8 / num_pixels,
            y_stream_bytes=sum(len(s) for s in y_streams),
            z_stack_bytes=len(z_stream),
            init_bytes=init_len,
        )
        return blob, info

    # -------------------------------------------------------------- decode

    def decompress(self, blob: bytes) -> Tuple[np.ndarray, bool]:
        """Returns (x_hat, initial_bits_recovered)."""
        packed = PackedBitstream.unpack(blob)
        if packed.has_ints("chained") and packed.get_ints("chained")[0]:
            return self._decompress_chained(packed)
        n = packed.get_ints("batch")[0]
        xh, xw = packed.get_ints("x_shape")
        yh, yw = packed.get_ints("y_shape")
        zh, zw = packed.get_ints("z_shape")
        seed = packed.get_ints("seed")[0]
        init_len = packed.get_ints("init_bits")[0]
        init_total = (
            packed.get_ints("init_total")[0]
            if packed.has_ints("init_total")
            else init_len
        )
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
        # bound][kept suffix of the seeded initial bits].
        init_ok = recovered == self._expected_initial(seed, init_total, init_len)

        return (
            np.asarray(jax.device_get(jnp.clip(x_hat, 0.0, 1.0))),
            bool(init_ok),
        )

    def _decompress_chained(self, packed: PackedBitstream) -> Tuple[np.ndarray, bool]:
        """Inverse of the chained compress(): images unwind in reverse
        order off the single stack (pop under the prior, decode y, push the
        bins back under the recomputed posterior), ending with the exact
        initial bits of the first image."""
        n = packed.get_ints("batch")[0]
        xh, xw = packed.get_ints("x_shape")
        yh, yw = packed.get_ints("y_shape")
        zh, zw = packed.get_ints("z_shape")
        seed = packed.get_ints("seed")[0]
        init_len = packed.get_ints("init_bits")[0]
        init_total = packed.get_ints("init_total")[0]
        sizes = packed.get_ints("string_sizes")
        c = self.model.num_filters
        z_shape1 = (1, zh, zw, c)
        img_elems = int(np.prod(z_shape1))

        y_blob = packed.get_stream("string")
        offs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
        y_streams = [y_blob[offs[i] : offs[i + 1]] for i in range(n)]

        p_cdfs, p_sizes = self.p_table()
        q_rows = np.arange(img_elems, dtype=np.int32)
        p_rows = np.broadcast_to(
            np.arange(c, dtype=np.int32), z_shape1[1:]
        ).reshape(-1)
        yt = self.y_table()

        stack = RansStack.deserialize(packed.get_stream("z_stack"))
        x_hats = [None] * n
        for i in range(n - 1, -1, -1):
            z_bins = stack.pop(p_rows, p_cdfs, p_sizes)
            z_tilde = jnp.asarray(self._grid_centers(z_bins).reshape(z_shape1))
            mu, _, y_rows = _mu_sigma(self.model, self.params, z_tilde, (yh, yw))
            y_rows = np.asarray(jax.device_get(y_rows))
            y_rel = self.coder.decode(y_streams[i], y_rows, yt.cdfs, yt.cdf_sizes)
            y_sym = yt.values_from_symbols(y_rel, y_rows)
            y_star = jnp.asarray(y_sym, jnp.float32) + jnp.round(mu)
            x_hats[i] = np.asarray(
                jax.device_get(
                    jnp.clip(
                        _synthesize(self.model, self.params, y_star, (xh, xw)),
                        0.0, 1.0,
                    )
                )
            )
            z_mean, z_logvar = self.model.apply(
                {"params": self.params}, y_star, method=self.model.hyper_posterior
            )
            q_cdfs, q_sizes = self.q_tables(
                jax.device_get(z_mean), jax.device_get(z_logvar)
            )
            stack.push(z_bins, q_rows, q_cdfs, q_sizes)

        recovered = stack.serialize()
        init_ok = recovered == self._expected_initial(seed, init_total, init_len)
        return np.concatenate(x_hats, axis=0), bool(init_ok)

    # ------------------------------------- optimized (non-amortized) posterior
    #
    # The reference's bb_sga/bb_no_sga optimize (z_mean, z_logvar) per image,
    # which a decoder cannot recompute — so their bits-back gains are ELBO
    # estimates only (SURVEY.md 3.4). Here the optimized posterior becomes
    # *decodable*: the decoder recomputes the amortized posterior from y*,
    # and the encoder transmits quantized posterior-parameter deltas under a
    # Laplacian prior, charged to the rate. Both sides then agree on the
    # exact quantized posterior used for the bits-back pop/push.

    DELTA_Q = 0.125        # posterior-parameter quantization step
    DELTA_CLIP = 96        # delta symbols clipped to [-CLIP, CLIP]

    def _laplace_table(self, scale_int: int):
        """Single-row quantized CDF of a discretized Laplacian over
        [-CLIP, CLIP] (tail mass folded into the edge bins). `scale_int` is
        the header-coded scale: b = scale_int / 256 (in symbol units)."""
        b = max(scale_int, 1) / 256.0
        k = np.arange(-self.DELTA_CLIP, self.DELTA_CLIP + 1, dtype=np.float64)
        pmf = np.exp(-np.abs(k) / b)
        return pmf_to_quantized_cdf_fast(pmf[None, :] / pmf.sum())

    def _quantize_posterior(self, z_mean_opt, z_logvar_opt, z_mean0, z_logvar0):
        """Returns (dm, dl) int32 symbols and the reconstructed (decodable)
        posterior both sides use."""
        q = self.DELTA_Q
        dm = np.clip(
            np.round((np.asarray(z_mean_opt, np.float64) - z_mean0) / q),
            -self.DELTA_CLIP, self.DELTA_CLIP,
        ).astype(np.int32)
        dl = np.clip(
            np.round((np.asarray(z_logvar_opt, np.float64) - z_logvar0) / q),
            -self.DELTA_CLIP, self.DELTA_CLIP,
        ).astype(np.int32)
        z_mean_hat = (z_mean0 + dm * q).astype(np.float32)
        z_logvar_hat = (z_logvar0 + dl * q).astype(np.float32)
        return dm, dl, z_mean_hat, z_logvar_hat

    def compress_optimized(
        self,
        x: np.ndarray,
        y_star: np.ndarray,
        z_mean_opt: np.ndarray,
        z_logvar_opt: np.ndarray,
        seed: int = 0,
    ) -> Tuple[bytes, Dict[str, Any]]:
        """Bits-back encode with a per-image *optimized* posterior
        (the output of BBLatentOptimizer.optimize), made decodable via
        quantized deltas from the amortized posterior.

        Returns (bytes, info); info['delta_bpp'] is the overhead paid to
        transmit the posterior and info['net_bpp'] the total net rate.
        """
        x = jnp.asarray(x, jnp.float32)
        y_star_np = np.asarray(y_star, np.float32)
        z_mean0, z_logvar0 = self.model.apply(
            {"params": self.params},
            jnp.asarray(y_star_np),
            method=self.model.hyper_posterior,
        )
        z_mean0 = np.asarray(jax.device_get(z_mean0), np.float64)
        z_logvar0 = np.asarray(jax.device_get(z_logvar0), np.float64)
        dm, dl, z_mean_hat, z_logvar_hat = self._quantize_posterior(
            z_mean_opt, z_logvar_opt, z_mean0, z_logvar0
        )
        z_shape = z_mean_hat.shape
        n_elem = int(np.prod(z_shape))

        # Delta streams under per-tensor Laplacian priors; scales in header.
        sm_int = max(1, int(round(np.mean(np.abs(dm)) * 256)))
        sl_int = max(1, int(round(np.mean(np.abs(dl)) * 256)))
        rows = np.zeros(n_elem, np.int32)
        m_cdfs, m_sizes = self._laplace_table(sm_int)
        l_cdfs, l_sizes = self._laplace_table(sl_int)
        dm_stream = self.coder.encode(
            dm.reshape(-1) + self.DELTA_CLIP, rows, m_cdfs, m_sizes
        )
        dl_stream = self.coder.encode(
            dl.reshape(-1) + self.DELTA_CLIP, rows, l_cdfs, l_sizes
        )

        # Bits-back under the reconstructed posterior q_hat: images chained
        # on one stack (see compress()), initial bits trimmed to one
        # image's measured pop consumption.
        p_cdfs, p_sizes = self.p_table()
        batch = z_shape[0]
        img_elems = int(np.prod(z_shape[1:]))
        q_rows = np.arange(img_elems, dtype=np.int32)
        p_rows = np.broadcast_to(
            np.arange(z_shape[-1], dtype=np.int32), z_shape[1:]
        ).reshape(-1)
        yt = self.y_table()
        y_hw = (y_star_np.shape[1], y_star_np.shape[2])
        y_streams = []
        stack = None
        init_len = init_total = 0
        for i in range(batch):
            q_cdfs, q_sizes = self.q_tables(z_mean_hat[i], z_logvar_hat[i])
            if stack is None:
                stack, z_bins, init_len, init_total = self._seeded_stack(
                    seed, img_elems, q_rows, q_cdfs, q_sizes
                )
            else:
                z_bins = stack.pop(q_rows, q_cdfs, q_sizes)
            z_tilde = jnp.asarray(
                self._grid_centers(z_bins).reshape((1,) + z_shape[1:])
            )
            mu, _, y_rows = _mu_sigma(self.model, self.params, z_tilde, y_hw)
            y_sym = (
                y_star_np[i : i + 1]
                - np.round(np.asarray(jax.device_get(mu)))
            ).astype(np.int32)
            y_rows = np.asarray(jax.device_get(y_rows))
            y_streams.append(
                self.coder.encode(
                    y_sym - yt.offsets[y_rows], y_rows, yt.cdfs, yt.cdf_sizes
                )
            )
            stack.push(z_bins, p_rows, p_cdfs, p_sizes)
        z_stream = stack.serialize()

        packed = PackedBitstream()
        packed.add_stream("string", b"".join(y_streams))
        packed.add_ints("string_sizes", [len(s) for s in y_streams])
        packed.add_stream("z_stack", z_stream)
        packed.add_stream("dm", dm_stream)
        packed.add_stream("dl", dl_stream)
        packed.add_ints("x_shape", x.shape[1:3])
        packed.add_ints("y_shape", y_star_np.shape[1:3])
        packed.add_ints("z_shape", z_shape[1:3])
        packed.add_ints("batch", [batch])
        packed.add_ints("seed", [seed])
        packed.add_ints("init_bits", [init_len])
        packed.add_ints("init_total", [init_total])
        packed.add_ints("post_delta", [sm_int, sl_int])
        packed.add_ints("chained", [1])
        blob = packed.pack()

        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        y_bytes = sum(len(s) for s in y_streams)
        info = dict(
            actual_bpp=len(blob) * 8 / num_pixels,
            net_bpp=(len(blob) - init_len) * 8 / num_pixels,
            delta_bpp=(len(dm_stream) + len(dl_stream)) * 8 / num_pixels,
            y_stream_bytes=y_bytes,
            z_stack_bytes=len(z_stream),
            dm_bytes=len(dm_stream),
            dl_bytes=len(dl_stream),
            init_bytes=init_len,
        )
        return blob, info

    def decompress_optimized(self, blob: bytes) -> Tuple[np.ndarray, bool]:
        """Decode a compress_optimized stream; returns (x_hat, init_ok)."""
        packed = PackedBitstream.unpack(blob)
        n = packed.get_ints("batch")[0]
        xh, xw = packed.get_ints("x_shape")
        yh, yw = packed.get_ints("y_shape")
        zh, zw = packed.get_ints("z_shape")
        seed = packed.get_ints("seed")[0]
        init_len = packed.get_ints("init_bits")[0]
        init_total = (
            packed.get_ints("init_total")[0]
            if packed.has_ints("init_total")
            else init_len
        )
        sm_int, sl_int = packed.get_ints("post_delta")
        c = self.model.num_filters
        z_shape = (n, zh, zw, c)
        n_elem = int(np.prod(z_shape))
        if packed.has_ints("chained") and packed.get_ints("chained")[0]:
            return self._decompress_optimized_chained(
                packed, n, (xh, xw), (yh, yw), z_shape, seed,
                init_len, init_total, sm_int, sl_int,
            )

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

        # Reconstruct the optimized posterior: amortized params + deltas.
        z_mean0, z_logvar0 = self.model.apply(
            {"params": self.params}, y_star, method=self.model.hyper_posterior
        )
        z_mean0 = np.asarray(jax.device_get(z_mean0), np.float64)
        z_logvar0 = np.asarray(jax.device_get(z_logvar0), np.float64)
        rows = np.zeros(n_elem, np.int32)
        m_cdfs, m_sizes = self._laplace_table(sm_int)
        l_cdfs, l_sizes = self._laplace_table(sl_int)
        dm = (
            self.coder.decode(packed.get_stream("dm"), rows, m_cdfs, m_sizes)
            - self.DELTA_CLIP
        ).reshape(z_shape)
        dl = (
            self.coder.decode(packed.get_stream("dl"), rows, l_cdfs, l_sizes)
            - self.DELTA_CLIP
        ).reshape(z_shape)
        q = self.DELTA_Q
        z_mean_hat = (z_mean0 + dm * q).astype(np.float32)
        z_logvar_hat = (z_logvar0 + dl * q).astype(np.float32)

        # Return the borrowed bits under the reconstructed posterior.
        q_cdfs, q_sizes = self.q_tables(z_mean_hat, z_logvar_hat)
        q_rows = np.arange(n_elem, dtype=np.int32)
        stack.push(z_bins, q_rows, q_cdfs, q_sizes)
        recovered = stack.serialize()
        expected = self._expected_initial(seed, init_total, init_len)
        return (
            np.asarray(jax.device_get(jnp.clip(x_hat, 0.0, 1.0))),
            bool(recovered == expected),
        )

    def _decompress_optimized_chained(self, packed, n, x_hw, y_hw, z_shape,
                                      seed, init_len, init_total,
                                      sm_int, sl_int):
        """Reverse-order unwind of the chained optimized-posterior stream:
        the delta streams decode up front (they are stack-independent);
        each image then pops z under the prior, decodes its y, reconstructs
        q_hat = amortized(y*) + delta, and pushes the bins back."""
        c = z_shape[-1]
        img_elems = int(np.prod(z_shape[1:]))
        n_elem = int(np.prod(z_shape))
        rows = np.zeros(n_elem, np.int32)
        m_cdfs, m_sizes = self._laplace_table(sm_int)
        l_cdfs, l_sizes = self._laplace_table(sl_int)
        dm = (
            self.coder.decode(packed.get_stream("dm"), rows, m_cdfs, m_sizes)
            - self.DELTA_CLIP
        ).reshape(z_shape)
        dl = (
            self.coder.decode(packed.get_stream("dl"), rows, l_cdfs, l_sizes)
            - self.DELTA_CLIP
        ).reshape(z_shape)

        sizes = packed.get_ints("string_sizes")
        y_blob = packed.get_stream("string")
        offs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
        y_streams = [y_blob[offs[i] : offs[i + 1]] for i in range(n)]

        p_cdfs, p_sizes = self.p_table()
        q_rows = np.arange(img_elems, dtype=np.int32)
        p_rows = np.broadcast_to(
            np.arange(c, dtype=np.int32), z_shape[1:]
        ).reshape(-1)
        yt = self.y_table()
        stack = RansStack.deserialize(packed.get_stream("z_stack"))
        x_hats = [None] * n
        dq = self.DELTA_Q
        for i in range(n - 1, -1, -1):
            z_bins = stack.pop(p_rows, p_cdfs, p_sizes)
            z_tilde = jnp.asarray(
                self._grid_centers(z_bins).reshape((1,) + z_shape[1:])
            )
            mu, _, y_rows = _mu_sigma(self.model, self.params, z_tilde, y_hw)
            y_rows = np.asarray(jax.device_get(y_rows))
            y_rel = self.coder.decode(y_streams[i], y_rows, yt.cdfs, yt.cdf_sizes)
            y_sym = yt.values_from_symbols(y_rel, y_rows)
            y_star = jnp.asarray(y_sym, jnp.float32) + jnp.round(mu)
            x_hats[i] = np.asarray(
                jax.device_get(
                    jnp.clip(
                        _synthesize(self.model, self.params, y_star, x_hw),
                        0.0, 1.0,
                    )
                )
            )
            z_mean0, z_logvar0 = self.model.apply(
                {"params": self.params}, y_star, method=self.model.hyper_posterior
            )
            z_mean_hat = (
                np.asarray(jax.device_get(z_mean0), np.float64) + dm[i : i + 1] * dq
            ).astype(np.float32)
            z_logvar_hat = (
                np.asarray(jax.device_get(z_logvar0), np.float64) + dl[i : i + 1] * dq
            ).astype(np.float32)
            q_cdfs, q_sizes = self.q_tables(z_mean_hat, z_logvar_hat)
            stack.push(z_bins, q_rows, q_cdfs, q_sizes)

        recovered = stack.serialize()
        init_ok = recovered == self._expected_initial(seed, init_total, init_len)
        return np.concatenate(x_hats, axis=0), bool(init_ok)
