"""End-to-end bitstream codec for the mean-scale hyperprior.

Implements the real-entropy-coding paths of the reference
(mbt2018.py:131-245 compress, mbt2018.py:248-295 decompress): the device
computes integer symbols + CDF-row indexes under jit; the host rANS coder
turns them into bytes. The bitstream is self-contained given (runname,
num_filters): z decodes against the factorized-prior table, then
mu/sigma = h_s(z_hat) selects per-element rows of the Gaussian scale table
to decode y, then x_hat = g_s(y_hat).
"""

import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# The decode-path default, set to the cross-window-median verdict of
# results/decode_rule.md (regenerate with scripts/decode_rule.py after every
# new bench_decode artifact). tests/test_reports.py::
# test_decode_rule_matches_default asserts this constant equals the committed
# verdict, so a measurement-driven default change can't drift from the code.
DECODE_DEFAULT = "single_stream_slim"


def _env_flag(name: str) -> Optional[bool]:
    """Tri-state env override: unset -> None (use DECODE_DEFAULT); "0"/"" ->
    forced off; anything else -> forced on (bench.py --decode pins every
    variant explicitly so A/Bs never depend on the shipped default)."""
    val = os.environ.get(name)
    if val is None:
        return None
    return val not in ("", "0")


def _decode_unfused() -> bool:
    """Select the pre-fusion decompress path (one device program per stage
    instead of the fused two-dispatch pipeline). Selectable via
    NIC_TPU_DECODE_UNFUSED for bench.py --decode A/Bs; default follows
    DECODE_DEFAULT."""
    env = _env_flag("NIC_TPU_DECODE_UNFUSED")
    if env is not None:
        return env
    return DECODE_DEFAULT == "single_stream_unfused"


def _decode_slim() -> bool:
    """Slim host<->device transfers on the decode path: scale-table indexes
    cross as uint8 (64 levels), y symbols as int16, and the reconstruction
    as uint8 pixels converted to float on the host. Per 4-image Kodak-sized
    decode this cuts the tunnel traffic ~28 MB -> ~8 MB; the returned image
    equals the wide path's after PNG quantization (round(x*255)/255), which
    is exactly what the reference's decompress writes (mbt2018.py:288-295).
    Selectable via NIC_TPU_DECODE_SLIM; default follows DECODE_DEFAULT.
    """
    env = _env_flag("NIC_TPU_DECODE_SLIM")
    if env is not None:
        return env
    return DECODE_DEFAULT == "single_stream_slim"

def _maybe_narrow(y_symbols: "np.ndarray", slim: bool) -> "np.ndarray":
    """int16 upload for the y symbols when slim and the range allows (it
    always does in practice: symbols live within the coding-table support,
    |s| <~ 128; bypass-coded outliers could exceed it, so check)."""
    if slim and np.abs(y_symbols).max(initial=0) < 32000:
        return y_symbols.astype(np.int16)
    return y_symbols


from nic_tpu.coding.coder import RansCoder
from nic_tpu.coding.container import PackedBitstream
from nic_tpu.coding.tables import CdfTable
from nic_tpu.models.conditional import GaussianConditional
from nic_tpu.models.mbt2018 import MeanScaleHyperprior

_GC = GaussianConditional()


@partial(jax.jit, static_argnums=0)
def _encode_pass(model, params, x):
    """Eval forward -> (outputs, z symbols, y symbols, y scale-row indexes)."""
    out = model.apply({"params": params}, x, training=False)
    medians = model.apply({"params": params}, method=model.medians)
    z_symbols = jnp.round(out["z"] - medians).astype(jnp.int32)
    y_symbols = _GC.symbols(out["y"], out["mu"])
    y_indexes = _GC.scale_indexes(_GC.bound_scale(out["sigma"]))
    return out, z_symbols, y_symbols, y_indexes


@partial(jax.jit, static_argnums=0)
def _dequantize_z(model, params, z_symbols):
    medians = model.apply({"params": params}, method=model.medians)
    return z_symbols.astype(jnp.float32) + medians


@partial(jax.jit, static_argnums=(0, 3, 4))
def _mu_sigma_pass(model, params, z_hat, y_hw, slim=False):
    mu, sigma = model.apply(
        {"params": params}, z_hat, y_hw, method=model.hyper_synthesize
    )
    indexes = _GC.scale_indexes(_GC.bound_scale(sigma))
    if slim:
        indexes = indexes.astype(jnp.uint8)
    return mu, sigma, indexes


@partial(jax.jit, static_argnums=(0, 3, 4))
def _z_symbols_to_mu_sigma(model, params, z_symbols, y_hw, slim=False):
    """Fused decode pass 1: median-dequantize the rANS-decoded z symbols and
    run h_s, one device program instead of two. Through the TPU tunnel each
    dispatch costs far more than the compute at serving batch sizes, so the
    decode wall is dispatch-count-bound (bench.py --decode breakdown).
    slim=True downloads the scale indexes as uint8 (64 levels)."""
    medians = model.apply({"params": params}, method=model.medians)
    z_hat = z_symbols.astype(jnp.float32) + medians
    mu, sigma = model.apply(
        {"params": params}, z_hat, y_hw, method=model.hyper_synthesize
    )
    indexes = _GC.scale_indexes(_GC.bound_scale(sigma))
    if slim:
        indexes = indexes.astype(jnp.uint8)
    return z_hat, mu, indexes


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _reconstruct_pass(model, params, y_symbols, mu, x_hw, round_mu=False,
                      as_uint8=False):
    """Fused decode pass 2: mean-dequantize the rANS-decoded y symbols, run
    g_s, and clip — one device program. round_mu selects the optimized-latent
    convention (y_star = symbols + round(mu), codec.compress_optimized).
    as_uint8 quantizes to PNG pixels on device (4x smaller host fetch; the
    reference decompress also only ever emits uint8, mbt2018.py:288-295)."""
    center = jnp.round(mu) if round_mu else mu
    y_hat = y_symbols.astype(jnp.float32) + center
    x_hat = model.apply({"params": params}, y_hat, x_hw, method=model.synthesize)
    x_hat = jnp.clip(x_hat, 0.0, 1.0)
    if as_uint8:
        return jnp.round(x_hat * 255.0).astype(jnp.uint8)
    return x_hat


@partial(jax.jit, static_argnums=(0, 3))
def _synthesize_pass(model, params, y_hat, x_hw):
    return model.apply({"params": params}, y_hat, x_hw, method=model.synthesize)


@partial(jax.jit, static_argnums=0)
def _optimized_symbols(model, params, y_star, z_star):
    """Symbols/rows for latents produced by SGA-style plain rounding.

    z_star lives on the integer grid, coded against the integer-grid
    factorized table; y_star is integer, coded as y_star - round(mu) against
    the scale-indexed Gaussian tables (mu, sigma from z_star).
    """
    y_hw = (y_star.shape[1], y_star.shape[2])
    mu, sigma = model.apply(
        {"params": params}, z_star, y_hw, method=model.hyper_synthesize
    )
    y_symbols = (y_star - jnp.round(mu)).astype(jnp.int32)
    y_indexes = _GC.scale_indexes(_GC.bound_scale(sigma))
    return y_symbols, y_indexes


@partial(jax.jit, static_argnums=0)
def _optimized_dequantize_y(model, params, z_star, y_symbols):
    y_hw = (y_symbols.shape[1], y_symbols.shape[2])
    mu, _ = model.apply(
        {"params": params}, z_star, y_hw, method=model.hyper_synthesize
    )
    return y_symbols.astype(jnp.float32) + jnp.round(mu)


class HyperpriorCodec:
    """Bitstream encoder/decoder around trained MeanScaleHyperprior params."""

    def __init__(self, model: MeanScaleHyperprior, params: Any):
        self.model = model
        self.params = params
        self.coder = RansCoder()
        self._z_table: Optional[CdfTable] = None
        self._z_int_table: Optional[CdfTable] = None
        self._y_table: Optional[CdfTable] = None

    # ------------------------------------------------------------- tables

    def z_table(self) -> CdfTable:
        """Factorized-prior CDF table over the median-centered integer grid
        (the reference's EntropyBottleneck update op, mbt2018.py:123)."""
        if self._z_table is None:
            pmf, offsets, lengths, tail = jax.device_get(
                self.model.apply(
                    {"params": self.params}, method=self.model.pmf_for_coding
                )
            )
            self._z_table = CdfTable.from_pmf(pmf, offsets, lengths, tail)
        return self._z_table

    def z_int_table(self) -> CdfTable:
        """Factorized-prior table over the plain integer grid, for coding
        plainly-rounded z (the SGA/STE/danneal transmitted latents)."""
        if self._z_int_table is None:
            pmf, offsets, lengths, tail = jax.device_get(
                self.model.apply(
                    {"params": self.params},
                    grid="integer",
                    method=self.model.pmf_for_coding,
                )
            )
            self._z_int_table = CdfTable.from_pmf(pmf, offsets, lengths, tail)
        return self._z_int_table

    def y_table(self) -> CdfTable:
        """Per-scale-level Gaussian CDF tables (tfc GaussianConditional)."""
        if self._y_table is None:
            pmf, offsets, lengths, tail = _GC.pmfs_for_coding()
            self._y_table = CdfTable.from_pmf(pmf, offsets, lengths, tail)
        return self._y_table

    # --------------------------------------------------------------- public

    def compress(self, x: np.ndarray, parallel: bool = False) -> Tuple[bytes, Dict[str, Any]]:
        """Compress a [N,H,W,3] float batch in [0,1] into one bitstream.

        parallel=False encodes one whole-batch rANS stream (most compact,
        matching the reference's PackedTensors behavior, mbt2018.py:219-221);
        parallel=True encodes one stream per image across C++ threads, which
        also lets the decoder parallelize. Returns (packed bytes, eval
        forward outputs for metric computation).
        """
        out, z_symbols, y_symbols, y_indexes = _encode_pass(
            self.model, self.params, jnp.asarray(x)
        )
        z_symbols = np.asarray(jax.device_get(z_symbols))
        y_symbols = np.asarray(jax.device_get(y_symbols))
        y_indexes = np.asarray(jax.device_get(y_indexes))

        zt, yt = self.z_table(), self.y_table()
        z_rows = np.broadcast_to(
            np.arange(z_symbols.shape[-1], dtype=np.int32), z_symbols.shape
        )
        z_rel = zt.symbols_from_values(z_symbols, z_rows)
        y_rel = yt.symbols_from_values(y_symbols, y_indexes)

        packed = PackedBitstream()
        if parallel:
            side_streams = self.coder.encode_batch(z_rel, z_rows, zt.cdfs, zt.cdf_sizes)
            y_streams = self.coder.encode_batch(y_rel, y_indexes, yt.cdfs, yt.cdf_sizes)
            packed.add_stream("string", b"".join(y_streams))
            packed.add_stream("side_string", b"".join(side_streams))
            packed.add_ints("string_sizes", [len(s) for s in y_streams])
            packed.add_ints("side_string_sizes", [len(s) for s in side_streams])
        else:
            packed.add_stream(
                "side_string", self.coder.encode(z_rel, z_rows, zt.cdfs, zt.cdf_sizes)
            )
            packed.add_stream(
                "string", self.coder.encode(y_rel, y_indexes, yt.cdfs, yt.cdf_sizes)
            )
        packed.add_ints("x_shape", x.shape[1:3])
        packed.add_ints("y_shape", y_symbols.shape[1:3])
        packed.add_ints("z_shape", z_symbols.shape[1:3])
        packed.add_ints("batch", [x.shape[0]])
        return packed.pack(), out

    def compress_latents(self, y_q: np.ndarray, z_hat: np.ndarray, x_hw) -> bytes:
        """Serialize median/mean-centered quantized latents (the unoise
        transmitted pair: z_hat = round(z - median) + median, y_q =
        round(y - mu) + mu with mu = h_s(z_hat)) into an
        amortized-compatible bitstream that plain decompress() decodes: the
        symbols are exactly the integers the standard scheme would code."""
        z_hat = jnp.asarray(z_hat)
        medians = self.model.apply(
            {"params": self.params}, method=self.model.medians
        )
        z_symbols = np.asarray(
            jax.device_get(jnp.round(z_hat - medians))
        ).astype(np.int32)
        mu, _, y_indexes = _mu_sigma_pass(
            self.model, self.params, z_hat, (y_q.shape[1], y_q.shape[2])
        )
        y_symbols = np.asarray(
            jax.device_get(jnp.round(jnp.asarray(y_q) - mu))
        ).astype(np.int32)
        y_indexes = np.asarray(jax.device_get(y_indexes))

        zt, yt = self.z_table(), self.y_table()
        z_rows = np.broadcast_to(
            np.arange(z_symbols.shape[-1], dtype=np.int32), z_symbols.shape
        )
        packed = PackedBitstream()
        packed.add_stream(
            "side_string",
            self.coder.encode(
                zt.symbols_from_values(z_symbols, z_rows), z_rows,
                zt.cdfs, zt.cdf_sizes,
            ),
        )
        packed.add_stream(
            "string",
            self.coder.encode(
                yt.symbols_from_values(y_symbols, y_indexes), y_indexes,
                yt.cdfs, yt.cdf_sizes,
            ),
        )
        packed.add_ints("x_shape", x_hw)
        packed.add_ints("y_shape", y_q.shape[1:3])
        packed.add_ints("z_shape", z_hat.shape[1:3])
        packed.add_ints("batch", [y_q.shape[0]])
        return packed.pack()

    def compress_optimized(self, y_star: np.ndarray, z_star: np.ndarray, x_hw) -> bytes:
        """Serialize latents produced by SGA-style plain rounding into a real
        bitstream — a capability beyond the reference, which only *estimates*
        rates for the iterative methods (SURVEY.md section 3.4 note)."""
        y_symbols, y_indexes = _optimized_symbols(
            self.model, self.params, jnp.asarray(y_star), jnp.asarray(z_star)
        )
        y_symbols = np.asarray(jax.device_get(y_symbols))
        y_indexes = np.asarray(jax.device_get(y_indexes))
        z_int = np.asarray(z_star).astype(np.int32)

        zt, yt = self.z_int_table(), self.y_table()
        z_rows = np.broadcast_to(
            np.arange(z_int.shape[-1], dtype=np.int32), z_int.shape
        )
        side_string = self.coder.encode(
            zt.symbols_from_values(z_int, z_rows), z_rows, zt.cdfs, zt.cdf_sizes
        )
        string = self.coder.encode(
            yt.symbols_from_values(y_symbols, y_indexes), y_indexes, yt.cdfs, yt.cdf_sizes
        )
        packed = PackedBitstream()
        packed.add_stream("string", string)
        packed.add_stream("side_string", side_string)
        packed.add_ints("x_shape", x_hw)
        packed.add_ints("y_shape", y_star.shape[1:3])
        packed.add_ints("z_shape", z_star.shape[1:3])
        packed.add_ints("batch", [y_star.shape[0]])
        packed.add_ints("mode", [1])  # integer-grid latents
        return packed.pack()

    def decompress_optimized(self, blob: bytes) -> np.ndarray:
        """Inverse of compress_optimized."""
        packed = PackedBitstream.unpack(blob)
        mode = packed.get_ints("mode")[0] if packed.has_ints("mode") else 0
        if mode != 1:
            raise ValueError(
                f"bitstream mode={mode} is not an optimized-latent (mode=1) "
                "stream; decode it with decompress()"
            )
        n = packed.get_ints("batch")[0]
        xh, xw = packed.get_ints("x_shape")
        yh, yw = packed.get_ints("y_shape")
        zh, zw = packed.get_ints("z_shape")
        c = self.model.num_filters

        zt, yt = self.z_int_table(), self.y_table()
        z_rows = np.broadcast_to(np.arange(c, dtype=np.int32), (n, zh, zw, c))
        z_rel = self.coder.decode(
            packed.get_stream("side_string"), z_rows, zt.cdfs, zt.cdf_sizes
        )
        z_star = jnp.asarray(zt.values_from_symbols(z_rel, z_rows), jnp.float32)

        if _decode_unfused():
            _, _, y_indexes = _mu_sigma_pass(
                self.model, self.params, z_star, (yh, yw)
            )
            y_indexes = np.asarray(jax.device_get(y_indexes))
            y_rel = self.coder.decode(
                packed.get_stream("string"), y_indexes, yt.cdfs, yt.cdf_sizes
            )
            y_symbols = yt.values_from_symbols(y_rel, y_indexes)
            y_star = _optimized_dequantize_y(
                self.model, self.params, z_star, jnp.asarray(y_symbols)
            )
            x_hat = _synthesize_pass(self.model, self.params, y_star, (xh, xw))
            return np.asarray(jax.device_get(jnp.clip(x_hat, 0.0, 1.0)))

        slim = _decode_slim()
        mu, _, y_indexes = _mu_sigma_pass(
            self.model, self.params, z_star, (yh, yw), slim
        )
        y_indexes = np.asarray(jax.device_get(y_indexes)).astype(np.int32)
        y_rel = self.coder.decode(
            packed.get_stream("string"), y_indexes, yt.cdfs, yt.cdf_sizes
        )
        y_symbols = _maybe_narrow(yt.values_from_symbols(y_rel, y_indexes), slim)
        x_hat = _reconstruct_pass(
            self.model, self.params, jnp.asarray(y_symbols), mu, (xh, xw), True,
            slim,
        )
        x_hat = np.asarray(jax.device_get(x_hat))
        return x_hat.astype(np.float32) / 255.0 if slim else x_hat

    def decompress(self, blob: bytes) -> np.ndarray:
        """Inverse of compress: bitstream -> float [N,H,W,3] reconstruction
        (mbt2018.py:248-295). Optimized-latent streams (mode=1, written by
        compress_optimized) carry integer-grid latents coded against
        different tables; dispatch on the mode marker so they are never
        silently mis-decoded against the median-grid table."""
        packed = PackedBitstream.unpack(blob)
        if packed.has_ints("mode") and packed.get_ints("mode")[0] == 1:
            return self.decompress_optimized(blob)
        n = packed.get_ints("batch")[0]
        xh, xw = packed.get_ints("x_shape")
        yh, yw = packed.get_ints("y_shape")
        zh, zw = packed.get_ints("z_shape")
        c = self.model.num_filters

        def _split(blob_bytes, sizes):
            outs, pos = [], 0
            for s in sizes:
                outs.append(blob_bytes[pos : pos + s])
                pos += s
            return outs

        zt, yt = self.z_table(), self.y_table()
        z_rows = np.broadcast_to(np.arange(c, dtype=np.int32), (n, zh, zw, c))
        try:
            side_sizes = packed.get_ints("side_string_sizes")
        except KeyError:
            side_sizes = None
        if side_sizes is not None:
            z_rel = self.coder.decode_batch(
                _split(packed.get_stream("side_string"), side_sizes),
                z_rows, zt.cdfs, zt.cdf_sizes,
            )
        else:
            z_rel = self.coder.decode(
                packed.get_stream("side_string"), z_rows, zt.cdfs, zt.cdf_sizes
            )
        z_symbols = zt.values_from_symbols(z_rel, z_rows)

        slim = _decode_slim()
        if _decode_unfused():
            # Pre-fusion path (4 device programs + clip), kept selectable so
            # bench.py --decode can A/B the dispatch-count saving.
            z_hat = _dequantize_z(self.model, self.params, jnp.asarray(z_symbols))
            mu, _, y_indexes = _mu_sigma_pass(
                self.model, self.params, z_hat, (yh, yw), slim
            )
        else:
            _, mu, y_indexes = _z_symbols_to_mu_sigma(
                self.model, self.params, jnp.asarray(z_symbols), (yh, yw), slim
            )
        y_indexes = np.asarray(jax.device_get(y_indexes)).astype(np.int32)
        if side_sizes is not None:
            y_rel = self.coder.decode_batch(
                _split(packed.get_stream("string"), packed.get_ints("string_sizes")),
                y_indexes, yt.cdfs, yt.cdf_sizes,
            )
        else:
            y_rel = self.coder.decode(
                packed.get_stream("string"), y_indexes, yt.cdfs, yt.cdf_sizes
            )
        y_symbols = _maybe_narrow(yt.values_from_symbols(y_rel, y_indexes), slim)
        if _decode_unfused():
            y_hat = jnp.asarray(y_symbols).astype(jnp.float32) + mu
            x_hat = _synthesize_pass(self.model, self.params, y_hat, (xh, xw))
            return np.asarray(jax.device_get(jnp.clip(x_hat, 0.0, 1.0)))
        x_hat = _reconstruct_pass(
            self.model, self.params, jnp.asarray(y_symbols), mu, (xh, xw), False,
            slim,
        )
        x_hat = np.asarray(jax.device_get(x_hat))
        return x_hat.astype(np.float32) / 255.0 if slim else x_hat
