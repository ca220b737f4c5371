"""Spatial (halo-exchange) model parallelism for single-image inference.

The reference copes with large inputs only via pixel-budget batching on one
device (configs.py:5-9) — one Tecnick-sized image is one graph execution.
This module is the TPU-native analog of context/sequence parallelism for an
image codec (SURVEY.md §2.3 lists none in the reference): a SINGLE image's
rows are sharded across the mesh and the whole iterative-inference loop runs
SPMD under ``jax.shard_map``:

- The heavy transforms (g_a and g_s — the top of the FLOP pyramid, running
  at image and y resolution) execute on row shards. Exactness across shard
  boundaries comes from a halo exchange: each device ``lax.ppermute``s its
  boundary rows to its neighbors, runs the full conv stack on the extended
  slab, and crops. Halo widths cover the transforms' composed receptive
  fields (g_a: 4x [5x5 stride-2] => y row j reads x rows 16j±30 -> 32-row
  image halo; g_s: the transpose stack spreads y row j to x rows 16j±30 ->
  2-row y halo). ppermute zero-fills at the mesh edges, which is exactly
  the SAME zero padding the unsharded conv applies at image borders, so
  sharded == unsharded bit-for-bit in fp32 (pinned by tests).
- The z-level tensors (64x downsampled; <1% of FLOPs) are computed
  REPLICATED: y is row-all-gathered (tiny at y resolution relative to ICI
  bandwidth), h_a / the factorized prior / h_s run identically on every
  device, and each device slices its own rows of (mu, sigma). Replicated z
  latents stay bit-identical across devices because their gradient is
  explicitly ``psum``-reduced and their SGA noise uses a shared key.
- The RD loss is a ``psum`` of per-shard partial sums; autodiff through
  ppermute/all_gather routes cross-shard cotangents automatically, so each
  Adam step sees exact global gradients while only boundary rows and
  scalars cross ICI.

Per optimization step the cross-chip traffic is two y-level halo exchanges
(forward + transposed backward), one y all-gather, and a handful of psum'd
scalars — all riding ICI, never the host.
"""

import math
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nic_tpu.infer.adam import AdamState, adam_init, adam_update
from nic_tpu.infer.engine import Latents, _relax
from nic_tpu.infer.methods import SGA, MethodSpec
from nic_tpu.models.conditional import GaussianConditional
from nic_tpu.models.layers import GDN, SignalConv
from nic_tpu.models.mbt2018 import LN2, MeanScaleHyperprior
from nic_tpu.ops.schedules import annealed_temperature
from nic_tpu.parallel.mesh import DATA_AXIS

_GC = GaussianConditional()

# Per-layer halo width. Exchanging around EVERY conv (rather than one big
# input halo for the whole stack) is what makes edge shards exact: a zero
# ppermute fill at the mesh edge is then identical to the SAME zero padding
# the unsharded conv applies at that layer — whereas zero *input* rows fed
# through the stack would turn into nonzero activations (bias, GDN) and
# pollute the edge. 2 rows cover a 5x5 kernel at stride 2 (window reach
# [2o-1, 2o+3]) and at transpose-stride 2 (in rows [(o-3)/2, (o+1)/2]).
_HALO = 2


def _exchange_halo(x, halo: int, axis: str):
    """Extend a row-sharded (N, Hs, W, C) block with `halo` rows from each
    neighbor; mesh-edge devices receive zeros (= global SAME zero padding)."""
    n = lax.axis_size(axis)
    from_above = lax.ppermute(
        x[:, -halo:], axis, [(i, i + 1) for i in range(n - 1)]
    )
    from_below = lax.ppermute(
        x[:, :halo], axis, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([from_above, x, from_below], axis=1)


def _conv_down2(p, feats, x, dtype):
    """One 5x5/stride-2 SignalConv on a halo-extended slab, cropped back to
    this shard's output rows. Extended in rows [i0-2, i1+2) give out rows
    offset by 1: SAME on the slab reproduces the global window [2o-1, 2o+3]
    for every kept row (alignment holds because shard offsets are even)."""
    y = SignalConv(feats, (5, 5), strides_down=2, dtype=dtype).apply(
        {"params": p}, x
    )
    return y[:, 1:-1]


def _conv_up2(p, feats, x, dtype, use_bias=True):
    """One 5x5/up-2 SignalConv on a halo-extended slab: out rows 2*(Hs+4),
    kept block offset 4 (= 2 * halo)."""
    y = SignalConv(feats, (5, 5), strides_up=2, dtype=dtype,
                   use_bias=use_bias).apply({"params": p}, x)
    return y[:, 4:-4]


def _analyze_sharded(model, params, x_local, axis: str):
    """y rows for this shard: g_a with per-layer halo exchange
    (AnalysisTransform structure: 3x [conv5/down2 + GDN] + conv5/down2)."""
    p = params["analysis"]
    n, dt = model.num_filters, model.compute_dtype
    h = x_local
    for i in range(3):
        h = _conv_down2(p[f"layer_{i}"], n, _exchange_halo(h, _HALO, axis), dt)
        h = GDN(dtype=dt, use_pallas=model.use_pallas_gdn).apply(
            {"params": p[f"gdn_{i}"]}, h
        )
    h = _conv_down2(p["layer_3"], n, _exchange_halo(h, _HALO, axis), dt)
    return h.astype(jnp.float32)


def _synthesize_sharded(model, params, y_local, axis: str):
    """Reconstructed image rows for this shard: g_s with per-layer halos
    (SynthesisTransform structure: 3x [conv5/up2 + IGDN] + conv5/up2 -> 3)."""
    p = params["synthesis"]
    n, dt = model.num_filters, model.compute_dtype
    h = y_local
    for i in range(3):
        h = _conv_up2(p[f"layer_{i}"], n, _exchange_halo(h, _HALO, axis), dt)
        h = GDN(inverse=True, dtype=dt, use_pallas=model.use_pallas_gdn).apply(
            {"params": p[f"igdn_{i}"]}, h
        )
    h = _conv_up2(p["layer_3"], 3, _exchange_halo(h, _HALO, axis), dt)
    return h.astype(jnp.float32)


def _slice_rows(t, rows: int, axis: str):
    """This device's `rows`-row block of a replicated row-major tensor."""
    idx = lax.axis_index(axis)
    return lax.dynamic_slice_in_dim(t, idx * rows, rows, axis=1)


def _loss_local(model, params, latents, x_local, lmbda, num_pixels,
                temperature, key_y, key_z, method: str, axis: str):
    """Global RD objective, evaluated SPMD: psum of per-shard partials.

    `latents.y` is this shard's rows; `latents.z` is replicated (every
    device holds and relaxes the same z with the same key)."""
    n = lax.axis_size(axis)
    y_tilde = _relax(method, latents.y, temperature, key_y)
    z_tilde = _relax(method, latents.z, temperature, key_z)
    z_lik = model.apply({"params": params}, z_tilde, method=model.z_likelihood)
    mu, sigma = model.apply(
        {"params": params}, z_tilde, None, method=model.hyper_synthesize
    )
    y_rows = latents.y.shape[1]
    mu = _slice_rows(mu, y_rows, axis)
    sigma = _slice_rows(sigma, y_rows, axis)
    y_lik = _GC.likelihood(y_tilde, mu, sigma)
    x_tilde = _synthesize_sharded(model, params, y_tilde, axis)

    batch = x_local.shape[0]
    sq = jnp.sum(jnp.square(x_local - x_tilde))
    y_bits = -jnp.sum(jnp.log(y_lik)) / LN2
    # The replicated z term is scaled by 1/n so the psum counts it once.
    z_bits = -jnp.sum(jnp.log(z_lik)) / (LN2 * n)
    partial_bpp = (y_bits + z_bits) / (num_pixels * batch)
    partial_mse = (255.0 ** 2) * sq / (num_pixels * batch * 3)
    mse, bpp = lax.psum(jnp.stack([partial_mse, partial_bpp]), axis)
    return lmbda * mse + bpp, (mse, bpp)


def _quantize_local(model, params, method: str, y_local, z, axis: str):
    """Per-shard transmitted latents (engine._quantize_transmitted SPMD):
    y_local sharded, z replicated."""
    if method in ("sga", "ste", "danneal"):
        return jnp.round(y_local), jnp.round(z)
    z_hat = model.apply({"params": params}, z, method=model.quantize_z)
    mu_src = z if method == "map" else z_hat
    mu, _ = model.apply(
        {"params": params}, mu_src, None, method=model.hyper_synthesize
    )
    mu = _slice_rows(mu, y_local.shape[1], axis)
    return _GC.quantize(y_local, mu), z_hat


def _probe_objective_local(model, params, y_local, z, x_local, lmbda,
                           num_pixels, method: str, axis: str):
    """The true discrete objective after quantization, psum'd — identical on
    every device, so early-stop decisions stay replicated-consistent."""
    yq, zq = _quantize_local(model, params, method, y_local, z, axis)
    key = jax.random.PRNGKey(0)  # unused by the identity relaxation
    loss, _ = _loss_local(
        model, params, Latents(y=yq, z=zq), x_local, lmbda, num_pixels,
        1.0, key, key, "map", axis
    )
    return loss


def _make_chunk_fn(model, method: MethodSpec, num_pixels: int, axis: str,
                   chunk_len: int, probe_every: int = 0):
    """The shard_map body: `chunk_len` optimization steps on-device.

    probe_every > 0 (fixed-length methods only) additionally evaluates the
    true rounded objective every that many iterations — the reference's
    --verbose self-check (sga.py:218-233), psum'd so it is identical on
    every shard; other iterations report NaN."""

    def chunk(params, x_local, lmbda, carry):
        grad_fn = jax.value_and_grad(
            lambda lat, T, ky, kz: _loss_local(
                model, params, lat, x_local, lmbda, num_pixels,
                T, ky, kz, method.name, axis
            ),
            has_aux=True,
        )

        def common_step(c):
            y, z, ady, adz, rng, it = c
            T = annealed_temperature(
                it, r=method.annealing_rate, ub=method.temperature_ub,
                scheme=method.annealing_scheme, t0=method.t0,
            )
            rng, sub = jax.random.split(rng)
            # Per-device noise for the sharded y rows; a SHARED key for the
            # replicated z so every device draws the same z noise. The z
            # fold-in uses axis_size, which no device index can equal, so
            # the keys never collide on any mesh width.
            key_y = jax.random.fold_in(sub, lax.axis_index(axis))
            key_z = jax.random.fold_in(sub, lax.axis_size(axis))
            (loss, _), grads = grad_fn(Latents(y=y, z=z), T, key_y, key_z)
            gy, gz = grads.y, grads.z
            # z is replicated: its true global gradient is the sum of every
            # shard's contribution (each device saw only its own slice path).
            gz = lax.psum(gz, axis)
            (y,), ady = adam_update((y,), (gy,), ady, method.lr)
            (z,), adz = adam_update((z,), (gz,), adz, method.lr)
            return (y, z, ady, adz, rng, it + 1), loss

        if not method.early_stop:

            def step(c, _):
                it = c[5]
                c, loss = common_step(c)
                if probe_every > 0:
                    probe = lax.cond(
                        it % probe_every == 0,
                        lambda: _probe_objective_local(
                            model, params, c[0], c[1], x_local, lmbda,
                            num_pixels, method.name, axis,
                        ),
                        lambda: jnp.float32(jnp.nan),
                    )
                else:
                    probe = jnp.float32(jnp.nan)
                return c, (loss, probe)

            carry, (losses, probes) = lax.scan(
                step, carry, None, length=chunk_len
            )
            return carry, (losses, probes)

        # Early-stopping variant (map.py:186-193, ste.py:185-194): probe the
        # rounded objective every probe_interval its, keep the last improving
        # latents, stop when it worsens. The probe is psum'd, so every shard
        # takes the same branch.
        probe = method.probe_interval
        base, saved_y, saved_z, prev_obj, stopped = carry
        it_end = base[5] + chunk_len

        def cond(c):
            base, _, _, _, stopped = c
            it = base[5]
            return jnp.logical_and(
                jnp.logical_and(it < it_end, it < method.iterations), ~stopped
            )

        def body(c):
            base, saved_y, saved_z, prev_obj, stopped = c
            it = base[5]
            new_base, loss = common_step(base)

            def run_probe(args):
                nb, sy, sz, po, st = args
                if method.name == "ste":
                    # STE compares the relaxed objective (ste.py:185-193).
                    obj = loss
                else:
                    obj = _probe_objective_local(
                        model, params, nb[0], nb[1], x_local, lmbda,
                        num_pixels, method.name, axis
                    )
                improved = obj <= po
                sy = jnp.where(improved, nb[0], sy)
                sz = jnp.where(improved, nb[1], sz)
                return (
                    nb, sy, sz,
                    jnp.where(improved, obj, po),
                    jnp.logical_or(st, ~improved),
                )

            it_probe = (it % probe == 0) | (it == method.iterations - 1)
            return lax.cond(
                it_probe, run_probe, lambda a: a,
                (new_base, saved_y, saved_z, prev_obj, stopped),
            )

        carry = lax.while_loop(cond, body, (base, saved_y, saved_z, prev_obj,
                                            stopped))
        empty = jnp.zeros((0,), jnp.float32)
        return carry, (empty, empty)

    return chunk


@partial(jax.jit, static_argnums=(0, 1))
def _quantize_global(model, method, params, y, z):
    """Global-array transmitted-latent quantization (jit-cached at module
    level so repeated optimize() calls reuse the compiled graph)."""
    if method in ("sga", "ste", "danneal"):
        return jnp.round(y), jnp.round(z)
    z_hat = model.apply({"params": params}, z, method=model.quantize_z)
    mu_src = z if method == "map" else z_hat
    mu, _ = model.apply(
        {"params": params}, mu_src, (y.shape[1], y.shape[2]),
        method=model.hyper_synthesize,
    )
    return _GC.quantize(y, mu), z_hat


@jax.jit
def _msssim_jit(a, b):
    from nic_tpu.evaluation.metrics import msssim

    return msssim(a, b, 255.0)


@jax.jit
def _msssim_db_jit(ms):
    from nic_tpu.evaluation.metrics import msssim_db

    return msssim_db(ms)


def _row_spec():
    return P(None, DATA_AXIS)


def _adam_spec(param_spec):
    return AdamState(m=(param_spec,), v=(param_spec,), t=P())


def _carry_specs(early_stop: bool = False):
    base = (
        _row_spec(),                 # y (sharded by rows)
        P(),                         # z (replicated)
        _adam_spec(_row_spec()),     # adam(y)
        _adam_spec(P()),             # adam(z)
        P(),                         # rng key
        P(),                         # iteration counter
    )
    if not early_stop:
        return base
    return (base, _row_spec(), P(), P(), P())  # + saved y/z, prev_obj, stopped


@partial(jax.jit, static_argnums=(0, 1))
def _eval_transmitted_spatial(model, mesh, params, x, y, z):
    """Evaluate transmitted latents with the same psum'd partial sums,
    sharded over rows."""
    axis = DATA_AXIS

    def body(params, x_local, y_local, z):
        n = lax.axis_size(axis)
        z_lik = model.apply({"params": params}, z, method=model.z_likelihood)
        mu, sigma = model.apply(
            {"params": params}, z, None, method=model.hyper_synthesize
        )
        y_rows = y_local.shape[1]
        mu = _slice_rows(mu, y_rows, axis)
        sigma = _slice_rows(sigma, y_rows, axis)
        y_lik = _GC.likelihood(y_local, mu, sigma)
        x_tilde = _synthesize_sharded(model, params, y_local, axis)

        num_pixels = x_local.shape[1] * n * x_local.shape[2]
        x255 = x_local * 255.0
        xt255 = jnp.round(jnp.clip(x_tilde, 0.0, 1.0) * 255.0)
        sq = jnp.sum(jnp.square(x255 - xt255), axis=(1, 2, 3))
        y_bits = -jnp.sum(jnp.log(y_lik), axis=(1, 2, 3)) / LN2
        z_bits = -jnp.sum(jnp.log(z_lik), axis=(1, 2, 3)) / (LN2 * n)
        parts = lax.psum(jnp.stack([sq, y_bits, z_bits]), axis)
        sq, y_bits, z_bits = parts
        mse = sq / (num_pixels * 3)
        psnr = -10.0 * jnp.log(mse / (255.0 ** 2)) / jnp.log(10.0)
        return dict(
            mse=mse,
            psnr=psnr,
            est_y_bpp=y_bits / num_pixels,
            est_z_bpp=z_bits / num_pixels,
            est_bpp=(y_bits + z_bits) / num_pixels,
            x_tilde=x_tilde,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), _row_spec(), _row_spec(), P()),
        out_specs=dict(
            mse=P(), psnr=P(), est_y_bpp=P(), est_z_bpp=P(), est_bpp=P(),
            x_tilde=_row_spec(),
        ),
        check_vma=False,
    )(params, x, y, z)


class SpatialLatentOptimizer:
    """Iterative inference for ONE large image sharded by rows across chips.

    Complements `LatentOptimizer` (which shards a *batch* of images): here
    every chip cooperates on the same image, so latency for a single huge
    input drops with mesh size instead of only throughput.

    Arbitrary image sizes are edge-padded to the mesh grid (H to a multiple
    of lcm(64, 16*n) and >= 32*n, W to a multiple of 64); distortion metrics
    and the returned reconstruction cover only the original pixels, and the
    rate renormalizes to the original pixel count (actual-transmission
    semantics for non-aligned sizes).

    MAP/STE early stopping works exactly as in the batch engine: the rounded
    objective is probed every `probe_interval` iterations and the loop exits
    on the first worsening probe; the probe is psum'd so every shard takes
    the same branch.
    """

    def __init__(self, model: MeanScaleHyperprior, params: Any,
                 mesh: Optional[Mesh] = None):
        from nic_tpu.parallel.mesh import data_mesh

        self.model = model
        self.mesh = mesh if mesh is not None else data_mesh()
        self.params = jax.device_put(params, NamedSharding(self.mesh, P()))
        self._chunk_cache = {}
        self._init_cache = None

    @property
    def n(self) -> int:
        return int(np.prod(self.mesh.devices.shape))

    def _check(self, H: int, W: int):
        n = self.n
        if H % 64 or W % 64:
            raise ValueError(f"H, W must be multiples of 64; got {H}x{W}")
        if H % (16 * n):
            raise ValueError(
                f"H={H} must be a multiple of 16*n_devices={16 * n} "
                "(whole y rows per shard)"
            )
        if H < 32 * n:
            raise ValueError(
                f"H={H} too small to shard {n} ways (need >= {32 * n})"
            )

    def _sharded(self, t):
        return jax.device_put(t, NamedSharding(self.mesh, _row_spec()))

    def _replicated(self, t):
        return jax.device_put(t, NamedSharding(self.mesh, P()))

    def _chunk_runner(self, method: MethodSpec, num_pixels: int,
                      chunk_len: int, probe_every: int = 0):
        key = (method, num_pixels, chunk_len, probe_every)
        if key not in self._chunk_cache:
            body = _make_chunk_fn(
                self.model, method, num_pixels, DATA_AXIS, chunk_len,
                probe_every=probe_every,
            )
            specs = _carry_specs(method.early_stop)
            fn = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(), _row_spec(), P(), specs),
                out_specs=(specs, (P(), P())),
                check_vma=False,
            )
            self._chunk_cache[key] = jax.jit(fn, donate_argnums=(3,))
        return self._chunk_cache[key]

    def amortized_init(self, x):
        """Sharded y = g_a(x) (halo-exact) and replicated z = h_a(y)."""
        if self._init_cache is None:

            def body(params, x_local):
                y = _analyze_sharded(self.model, params, x_local, DATA_AXIS)
                y_full = lax.all_gather(y, DATA_AXIS, axis=1, tiled=True)
                z = self.model.apply(
                    {"params": params}, y_full, method=self.model.hyper_analyze
                )
                return y, z

            fn = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(), _row_spec()),
                out_specs=(_row_spec(), P()),
                check_vma=False,
            )
            self._init_cache = jax.jit(fn)
        return self._init_cache(self.params, x)

    def _quantize_transmitted(self, method: str, y, z):
        """Global-array quantization (outside shard_map; XLA propagates the
        row sharding). Mirrors engine._quantize_transmitted semantics."""
        return _quantize_global(self.model, method, self.params, y, z)

    def _pad_to_grid(self, x):
        """Edge-pad H to a multiple of max(64, 16*n, 32*n-alignment) and W to
        a multiple of 64, so arbitrary image sizes work like the batch path.
        Returns (padded, (orig_H, orig_W))."""
        n = self.n
        H, W = x.shape[1], x.shape[2]

        def up(v, m):
            return v + (-v) % m

        m = math.lcm(64, 16 * n)
        Hp = max(up(H, m), up(32 * n, m))
        Wp = up(W, 64)
        if (Hp, Wp) != (H, W):
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)),
                        mode="edge")
        return x, (H, W)

    def optimize(
        self,
        x,
        lmbda: float,
        method: MethodSpec = SGA,
        seed: int = 0,
        chunk_size: int = 200,
        probe_every: int = 0,
    ) -> Dict[str, Any]:
        if method.distortion != "mse":
            raise ValueError(
                "SpatialLatentOptimizer optimizes the MSE objective only "
                f"(got distortion={method.distortion!r}); use the batch "
                "LatentOptimizer for msssim."
            )
        if probe_every and method.early_stop:
            # Early-stop methods already probe on their own schedule (the
            # psum'd improving-probe loop); the batch engine likewise only
            # records probe traces for fixed-length methods.
            probe_every = 0
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 3:
            x = x[None]
        if x.shape[0] > 1:
            # Multi-image input: the spatial path shards one image's rows
            # across the whole mesh, so process images sequentially (bounded
            # memory — the design intent is single LARGE images) and present
            # the batch engine's result surface: per-image metric arrays and
            # batch-mean per-iteration losses.
            outs = [
                self.optimize(
                    img[None], lmbda, method=method, seed=seed,
                    chunk_size=chunk_size, probe_every=probe_every,
                )
                for img in x
            ]
            combined: Dict[str, Any] = {}
            for k in outs[0]:
                parts = [o[k] for o in outs]
                if k in ("losses", "rounded_losses"):
                    combined[k] = (
                        np.mean(np.stack(parts), axis=0)
                        if parts[0].size
                        else parts[0]
                    )
                else:
                    combined[k] = np.concatenate(
                        [np.atleast_1d(p) for p in parts]
                    )
            return combined
        x, (orig_h, orig_w) = self._pad_to_grid(x)
        self._check(x.shape[1], x.shape[2])
        num_pixels = x.shape[1] * x.shape[2]
        x = self._sharded(x)

        y0, z0 = self.amortized_init(x)
        ady = AdamState(
            m=(self._sharded(jnp.zeros_like(y0)),),
            v=(self._sharded(jnp.zeros_like(y0)),),
            t=self._replicated(jnp.zeros((), jnp.int32)),
        )
        carry = (
            y0,
            z0,
            ady,
            jax.tree.map(self._replicated, adam_init((z0,))),
            self._replicated(jax.random.PRNGKey(seed)),
            self._replicated(jnp.zeros((), jnp.int32)),
        )
        if method.early_stop:
            carry = (
                carry,
                self._sharded(jnp.copy(y0)),
                self._replicated(jnp.copy(z0)),
                self._replicated(jnp.float32(jnp.inf)),
                self._replicated(jnp.zeros((), bool)),
            )

        losses = []
        probes = []
        its_done = 0
        while its_done < method.iterations:
            this = min(chunk_size, method.iterations - its_done)
            runner = self._chunk_runner(method, num_pixels, this, probe_every)
            carry, (chunk_losses, chunk_probes) = runner(
                self.params, x, jnp.float32(lmbda), carry
            )
            its_done += this
            if not method.early_stop:
                losses.append(chunk_losses)
                if probe_every:
                    probes.append(chunk_probes)
            elif bool(jax.device_get(carry[4])):
                break

        if method.early_stop:
            base, saved_y, saved_z, _, stopped = carry
            yf = jnp.where(stopped, saved_y, base[0])
            zf = jnp.where(stopped, saved_z, base[1])
            losses = [jnp.zeros((0,), jnp.float32)]
        else:
            yf, zf = carry[0], carry[1]

        yq, zq = self._quantize_transmitted(method.name, yf, zf)
        metrics = _eval_transmitted_spatial(
            self.model, self.mesh, self.params, x, yq, zq
        )
        out = dict(
            y=np.asarray(yq),
            z=np.asarray(zq),
            losses=np.asarray(jnp.concatenate(losses)),
            rounded_losses=(
                np.asarray(jnp.concatenate(probes))
                if probes
                else np.zeros((0,), np.float32)
            ),
            **{k: np.asarray(v) for k, v in metrics.items()},
        )

        padded = (orig_h, orig_w) != (x.shape[1], x.shape[2])
        if padded:
            # Distortion metrics count only the original pixels; the rate
            # (which really codes the padded latents) renormalizes to the
            # original pixel count — actual-transmission semantics for
            # non-aligned sizes, matching how the codec reports actual_bpp.
            scale = num_pixels / (orig_h * orig_w)
            for k in ("est_bpp", "est_y_bpp", "est_z_bpp"):
                out[k] = out[k] * scale
            x_np = np.asarray(x)[:, :orig_h, :orig_w]
            xt = out["x_tilde"][:, :orig_h, :orig_w]
            x255 = x_np * 255.0
            xt255 = np.round(np.clip(xt, 0.0, 1.0) * 255.0)
            out["mse"] = np.mean(
                np.square(x255 - xt255), axis=(1, 2, 3)
            ).astype(np.float32)
            out["psnr"] = (
                -10.0 * np.log(out["mse"] / 255.0 ** 2) / np.log(10.0)
            ).astype(np.float32)
            out["x_tilde"] = xt
        else:
            x_np = np.asarray(x)

        batch = x_np.shape[0]
        if min(orig_h, orig_w) >= 176:
            x255 = jnp.asarray(x_np) * 255.0
            xt255 = jnp.round(
                jnp.clip(jnp.asarray(out["x_tilde"]), 0, 1) * 255.0
            )
            ms = _msssim_jit(xt255, x255)
            out["msssim"] = np.asarray(ms)
            out["msssim_db"] = np.asarray(_msssim_db_jit(ms))
        else:
            # Too small for the 5-scale window: NaN-fill like the batch
            # engine so the result surface stays uniform.
            out["msssim"] = np.full((batch,), np.nan, np.float32)
            out["msssim_db"] = np.full((batch,), np.nan, np.float32)
        return out
