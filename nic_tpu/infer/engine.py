"""Iterative latent-optimization engine (SGA / MAP / STE / UNOISE / DANNEAL).

TPU-native redesign of the reference's flagship inference loop
(sga.py:170-253 and its four ablation scripts): where the reference runs
2000 x { device fwd+bwd -> host gradient transfer -> numpy Adam -> feed
back }, here the *entire* optimization is one jit-compiled computation —
a ``lax.scan`` (or ``lax.while_loop`` for the early-stopping methods) whose
body fuses the relaxation, the model fwd+bwd, and the Adam update, with all
state resident in HBM. The temperature schedule evaluates inside the loop.

Per-method relaxations (all pluggable through MethodSpec.name):
  sga      stochastic Gumbel annealing               sga.py:80-121
  map      identity (continuous MAP descent)         map.py:77-104
  ste      straight-through rounding                 ste.py:78-88
  unoise   fresh uniform noise each step             unoise.py:70-97
  danneal  deterministic softmax annealing           danneal.py:76-101
"""

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nic_tpu.infer.adam import AdamState, adam_init, adam_update
from nic_tpu.infer.methods import SGA, MethodSpec
from nic_tpu.models.conditional import GaussianConditional
from nic_tpu.models.mbt2018 import LN2, MeanScaleHyperprior
from nic_tpu.ops.quantize import danneal_relax, round_ste, sga_relax
from nic_tpu.ops.schedules import annealed_temperature

_GC = GaussianConditional()


class Latents(NamedTuple):
    y: jnp.ndarray
    z: jnp.ndarray


# --------------------------------------------------------------------- core


def _relax(method: str, v, temperature, rng):
    if method == "sga":
        return sga_relax(v, temperature, rng)
    if method == "danneal":
        return danneal_relax(v, temperature)
    if method == "map":
        return v
    if method == "ste":
        return round_ste(v)
    if method == "unoise":
        return v + jax.random.uniform(rng, v.shape, v.dtype, -0.5, 0.5)
    raise ValueError(f"Unknown relaxation {method!r}")


def _space_to_depth2(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel order matching the
    block-space synthesis output (phase-major: (r*2+t)*C + c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _forward(model, params, latents: Latents, x, temperature, rng, method: str,
             block_space: bool = False):
    """Relax -> likelihoods -> reconstruction, mirroring the per-script
    compression graphs (e.g. sga.py:77-136).

    With block_space=True the reconstruction comes back in 2x2-block space
    (pixels identical, reordered) — only valid for even image sizes and only
    used inside the reorder-invariant MSE of the optimization loss.
    """
    ky, kz = jax.random.split(rng)
    z_tilde = _relax(method, latents.z, temperature, kz)
    z_lik = model.apply({"params": params}, z_tilde, method=model.z_likelihood)
    y_hw = (latents.y.shape[1], latents.y.shape[2])
    mu, sigma = model.apply(
        {"params": params}, z_tilde, y_hw, method=model.hyper_synthesize
    )
    y_tilde = _relax(method, latents.y, temperature, ky)
    y_lik = _GC.likelihood(y_tilde, mu, sigma)
    if block_space:
        block_hw = (x.shape[1] // 2, x.shape[2] // 2)
        x_tilde = model.apply(
            {"params": params}, y_tilde, block_hw, method=model.synthesize_blocks
        )
    else:
        x_hw = (x.shape[1], x.shape[2])
        x_tilde = model.apply(
            {"params": params}, y_tilde, x_hw, method=model.synthesize
        )
    return y_tilde, z_tilde, y_lik, z_lik, mu, sigma, x_tilde


def _rd_loss(model, params, latents, x, lmbda, temperature, rng, method: str,
             distortion: str = "mse"):
    """lambda * distortion + mean bpp (sga.py:144-163).

    distortion "mse": 255^2 * MSE (the reference's only objective);
    "msssim": 1 - MS-SSIM, for models trained with --distortion msssim
    (an extension; images must be >= 176px for the 5-scale window).

    Note: computing the distortion in 2x2-block space (bit-identical MSE,
    see synthesize_blocks) benchmarked 7% slower end-to-end on v5e — the
    36-tap dense subpixel conv loses to XLA's native transposed-conv
    emitters — so the pixel-space path stays on."""
    block_space = False
    _, _, y_lik, z_lik, _, _, x_tilde = _forward(
        model, params, latents, x, temperature, rng, method, block_space
    )
    x_cmp = _space_to_depth2(x) if block_space else x
    num_pixels = x.shape[1] * x.shape[2]
    y_bpp = -jnp.sum(jnp.log(y_lik), axis=(1, 2, 3)) / (LN2 * num_pixels)
    z_bpp = -jnp.sum(jnp.log(z_lik), axis=(1, 2, 3)) / (LN2 * num_pixels)
    train_bpp = jnp.mean(y_bpp + z_bpp)
    mse = jnp.mean(jnp.square(x_cmp - x_tilde)) * (255.0 ** 2)
    if distortion == "msssim":
        from nic_tpu.evaluation.metrics import msssim as msssim_fn

        dist = 1.0 - jnp.mean(msssim_fn(x_tilde, x_cmp, 1.0))
    else:
        dist = mse
    loss = jnp.where(lmbda > 0, lmbda * dist + train_bpp, train_bpp)
    return loss, dict(mse=mse, bpp=train_bpp)


@partial(jax.jit, static_argnums=(0, 3, 5))
def _quantize_transmitted(model, params, latents: Latents, method: str,
                          rng=None, unoise_mu_source: str = "quantized_z") -> Latents:
    """The latents each method actually transmits.

    sga/ste/danneal: plain rounding (sga.py:240-241, ste.py:201-202,
    danneal.py:237-238). map: median-centered z, mean-centered y with the
    mean from *continuous* z (map.py:85-100, 178,201). unoise: same
    quantizers; the y-quantizing mean comes from the quantized z by default
    (decodable — a deliberate deviation) or, with
    unoise_mu_source="noisy_z", from a fresh noisy z sample exactly as the
    reference does (unoise.py:81-82,97: mu = h_s(z + U(-.5,.5))).
    """
    if method in ("sga", "ste", "danneal"):
        return Latents(y=jnp.round(latents.y), z=jnp.round(latents.z))
    z_hat = model.apply({"params": params}, latents.z, method=model.quantize_z)
    y_hw = (latents.y.shape[1], latents.y.shape[2])
    if method == "map":
        mu_src = latents.z
    elif method == "unoise":
        if unoise_mu_source == "noisy_z":
            mu_src = latents.z + jax.random.uniform(
                rng, latents.z.shape, latents.z.dtype, -0.5, 0.5
            )
        else:
            mu_src = z_hat
    else:
        raise ValueError(method)
    mu, _ = model.apply(
        {"params": params}, mu_src, y_hw, method=model.hyper_synthesize
    )
    return Latents(y=_GC.quantize(latents.y, mu), z=z_hat)


def _probe_objective(model, params, latents, x, lmbda, method: str,
                     distortion: str = "mse"):
    """Early-stop probe: the true discrete objective after quantization
    (map.py:178-193). Evaluated with the MAP graph semantics (identity
    relaxation on the quantized latents)."""
    q = _quantize_transmitted(model, params, latents, method)
    key = jax.random.PRNGKey(0)  # unused by the identity relaxation
    loss, _ = _rd_loss(model, params, q, x, lmbda, 1.0, key, "map", distortion)
    return loss


# ------------------------------------------------------------------- engine


class _Carry(NamedTuple):
    latents: Latents
    adam: AdamState
    rng: jnp.ndarray
    it: jnp.ndarray
    saved: Latents        # last improving probe point (early stop)
    prev_obj: jnp.ndarray
    stopped: jnp.ndarray


def _init_carry(latents0: Latents, rng) -> _Carry:
    return _Carry(
        # Copy: the donating chunk runner consumes the carry's buffers, and
        # latents0 may be caller-owned (e.g. y0/z0 passed into
        # _run_optimization); a one-time copy keeps donation safe for them.
        latents=jax.tree.map(jnp.copy, latents0),
        adam=adam_init(latents0),
        rng=rng,
        it=jnp.zeros((), jnp.int32),
        saved=jax.tree.map(jnp.copy, latents0),
        prev_obj=jnp.inf,
        stopped=jnp.zeros((), bool),
    )


def _optimize_chunk_impl(model, params, x, lmbda, method: MethodSpec,
                         chunk_len: int, carry: _Carry, probe_every: int = 0,
                         unroll: int = 1):
    """Run `chunk_len` optimization iterations on device.

    The whole 2000-step loop is pure device work; it is sliced into chunks of
    a few hundred iterations only so each dispatched XLA program stays well
    under runtime watchdog limits — the carry (latents, Adam state, RNG,
    early-stop bookkeeping) never leaves HBM between chunks.

    probe_every > 0 additionally evaluates the true rounded objective every
    that many iterations (the reference's --verbose self-check,
    sga.py:218-233); other iterations report NaN.
    """
    grad_fn = jax.value_and_grad(
        lambda lat, T, k: _rd_loss(
            model, params, lat, x, lmbda, T, k, method.name, method.distortion
        ),
        has_aux=True,
    )

    def temperature_at(it):
        return annealed_temperature(
            it,
            r=method.annealing_rate,
            ub=method.temperature_ub,
            scheme=method.annealing_scheme,
            t0=method.t0,
        )

    def common_step(carry: _Carry):
        T = temperature_at(carry.it)
        rng, sub = jax.random.split(carry.rng)
        (loss, _), grads = grad_fn(carry.latents, T, sub)
        new_latents, new_adam = adam_update(
            carry.latents, grads, carry.adam, method.lr
        )
        return carry._replace(
            latents=Latents(*new_latents), adam=new_adam, rng=rng, it=carry.it + 1
        ), loss

    if not method.early_stop:

        def scan_body(c, _):
            it = c.it
            c, loss = common_step(c)
            if probe_every > 0:
                probe = lax.cond(
                    it % probe_every == 0,
                    lambda: _probe_objective(
                        model, params, c.latents, x, lmbda, method.name,
                        method.distortion,
                    ),
                    lambda: jnp.float32(jnp.nan),
                )
                return c, (loss, probe)
            return c, (loss, jnp.float32(jnp.nan))

        carry, (losses, probes) = lax.scan(
            scan_body, carry, None, length=chunk_len, unroll=unroll
        )
        return carry, losses, probes

    # Early-stopping variant: lax.while_loop so we actually stop computing
    # when the probe worsens, matching the reference's `break`
    # (map.py:186-193, ste.py:185-194).
    probe = method.probe_interval
    it_end = carry.it + chunk_len

    def cond(c: _Carry):
        return jnp.logical_and(
            jnp.logical_and(c.it < it_end, c.it < method.iterations), ~c.stopped
        )

    def body(c: _Carry):
        post_step, loss = common_step(c)

        def run_probe(cc: _Carry):
            if method.name == "ste":
                # STE compares the relaxed objective itself (ste.py:185-193).
                obj = loss
            else:
                obj = _probe_objective(
                    model, params, cc.latents, x, lmbda, method.name,
                    method.distortion,
                )
            improved = obj <= cc.prev_obj
            return cc._replace(
                saved=jax.tree.map(
                    lambda new, old: jnp.where(improved, new, old),
                    cc.latents,
                    cc.saved,
                ),
                prev_obj=jnp.where(improved, obj, cc.prev_obj),
                stopped=jnp.logical_or(cc.stopped, ~improved),
            )

        it_probe = (c.it % probe == 0) | (c.it == method.iterations - 1)
        return lax.cond(it_probe, run_probe, lambda cc: cc, post_step)

    carry = lax.while_loop(cond, body, carry)
    empty = jnp.zeros((0,), jnp.float32)
    return carry, empty, empty


# Two jit flavors of the chunk runner. The donating one hands the carry's
# HBM buffers (latents + Adam state, ~8x the latent size at bench shapes)
# back to XLA for in-place reuse between chunks. Donation is the default
# (paired A/B on v5e: median +3.6-3.9% over 2 experiments, never harmful,
# and it halves the carry's peak HBM footprint); donate=False remains for
# callers that need the inputs preserved.
_optimize_chunk = partial(jax.jit, static_argnums=(0, 4, 5, 7, 8))(
    _optimize_chunk_impl
)
_optimize_chunk_donate = partial(
    jax.jit, static_argnums=(0, 4, 5, 7, 8), donate_argnums=(6,)
)(_optimize_chunk_impl)


def _run_optimization(
    model, params, x, lmbda, rng, method: MethodSpec, y0, z0,
    chunk_size: int = 200, probe_every: int = 0, unroll: int = 1,
    donate: bool = True,
):
    """Host-side chunk loop around _optimize_chunk.

    Returns (latents, losses, rounded_probes)."""
    carry = _init_carry(Latents(y=y0, z=z0), rng)
    losses = []
    probes = []
    its_done = 0
    empty = jnp.zeros((0,), jnp.float32)
    chunk_fn = _optimize_chunk_donate if donate else _optimize_chunk
    # Full-size chunks plus at most one remainder chunk (one extra compile).
    while its_done < method.iterations:
        this = min(chunk_size, method.iterations - its_done)
        carry, chunk_losses, chunk_probes = chunk_fn(
            model, params, x, lmbda, method, this, carry, probe_every, unroll
        )
        its_done += this
        if not method.early_stop:
            losses.append(chunk_losses)
            probes.append(chunk_probes)
        elif bool(jax.device_get(carry.stopped)):
            break
    if method.early_stop:
        final = jax.tree.map(
            lambda s, c: jnp.where(carry.stopped, s, c), carry.saved, carry.latents
        )
        return Latents(*final), empty, empty
    return (
        carry.latents,
        jnp.concatenate(losses) if losses else empty,
        jnp.concatenate(probes) if probes else empty,
    )


@partial(jax.jit, static_argnums=0)
def _amortized_init(model, params, x):
    """y = g_a(x), z = h_a(y) — the amortized starting point (sga.py:77-78)."""
    y = model.apply({"params": params}, x, method=model.analyze)
    z = model.apply({"params": params}, y, method=model.hyper_analyze)
    return y, z


@partial(jax.jit, static_argnums=(0, 4))
def _eval_transmitted(model, params, x, latents: Latents, compute_msssim: bool):
    """Evaluate the transmitted latents exactly as the reference's final
    sess.run with fed y_tilde/z_tilde (sga.py:244-247)."""
    from nic_tpu.evaluation.metrics import msssim as msssim_fn
    from nic_tpu.evaluation.metrics import msssim_db as msssim_db_fn
    from nic_tpu.evaluation.metrics import psnr as psnr_fn

    z_lik = model.apply({"params": params}, latents.z, method=model.z_likelihood)
    y_hw = (latents.y.shape[1], latents.y.shape[2])
    mu, sigma = model.apply(
        {"params": params}, latents.z, y_hw, method=model.hyper_synthesize
    )
    y_lik = _GC.likelihood(latents.y, mu, sigma)
    x_hw = (x.shape[1], x.shape[2])
    x_tilde = model.apply({"params": params}, latents.y, x_hw, method=model.synthesize)

    num_pixels = x.shape[1] * x.shape[2]
    y_bpp = -jnp.sum(jnp.log(y_lik), axis=(1, 2, 3)) / (LN2 * num_pixels)
    z_bpp = -jnp.sum(jnp.log(z_lik), axis=(1, 2, 3)) / (LN2 * num_pixels)

    x255 = x * 255.0
    xt255 = jnp.round(jnp.clip(x_tilde, 0.0, 1.0) * 255.0)
    mse = jnp.mean(jnp.square(x255 - xt255), axis=(1, 2, 3))
    psnr = psnr_fn(xt255, x255, 255.0)
    if compute_msssim:
        ms = msssim_fn(xt255, x255, 255.0)
        ms_db = msssim_db_fn(ms)
    else:
        ms = jnp.full(x.shape[:1], jnp.nan)
        ms_db = jnp.full(x.shape[:1], jnp.nan)
    return dict(
        mse=mse,
        psnr=psnr,
        msssim=ms,
        msssim_db=ms_db,
        est_bpp=y_bpp + z_bpp,
        est_y_bpp=y_bpp,
        est_z_bpp=z_bpp,
        x_tilde=x_tilde,
    )


class LatentOptimizer:
    """Binds (model, params); runs any MethodSpec over an image batch.

    Pass a ``mesh`` (1-D 'data' axis) to shard the image batch across chips:
    inputs are device_put with a batch sharding and params replicated, and
    XLA propagates the sharding through the whole jitted optimization — the
    per-image latents, Adam state, and gradients all stay chip-local; only
    the scalar loss mean crosses ICI.
    """

    def __init__(self, model: MeanScaleHyperprior, params: Any, mesh=None):
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from nic_tpu.parallel.mesh import replicated_sharding

            params = jax.device_put(params, replicated_sharding(mesh))
        self.params = params

    def _place(self, x):
        if self.mesh is None:
            return x
        from nic_tpu.parallel.mesh import batch_sharding, replicated_sharding

        if x.shape[0] % self.mesh.size:
            # Remainder batches (batch not divisible by the mesh) run
            # replicated — correct, just not parallel; only the final
            # partial batch of an eval sweep hits this. Warn so a sweep
            # whose batch never divides doesn't silently run at 1/N
            # throughput (mirrors the trainer's mesh-shrink warning).
            import warnings

            warnings.warn(
                f"batch of {x.shape[0]} does not divide the {self.mesh.size}-"
                "device data mesh; this batch runs replicated (no data "
                "parallelism). Pick eval batch sizes divisible by the mesh "
                "to keep all chips busy.",
                stacklevel=3,
            )
            return jax.device_put(x, replicated_sharding(self.mesh))
        return jax.device_put(x, batch_sharding(self.mesh))

    def amortized_init(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return _amortized_init(self.model, self.params, x)

    def optimize(
        self,
        x,
        lmbda: float,
        method: MethodSpec = SGA,
        rng: Optional[jax.Array] = None,
        seed: int = 0,
        chunk_size: int = 200,
        probe_every: int = 0,
        unroll: int = 1,
        donate: bool = True,
    ) -> Dict[str, Any]:
        """Run the full iterative inference for one image batch.

        Returns transmitted latents, per-image eval metrics, and (for
        fixed-length methods) the per-iteration loss history. With
        probe_every > 0 the result also contains `rounded_losses`: the true
        discrete objective sampled every that many iterations (NaN
        elsewhere) — the reference's --verbose probes (sga.py:218-233).
        """
        x = self._place(jnp.asarray(x, jnp.float32))
        if method.distortion == "msssim" and min(x.shape[1], x.shape[2]) < 176:
            raise ValueError(
                "msssim optimization objective needs images >= 176px on the "
                f"short side (5 scales x 11-tap window); got {x.shape[1:3]}."
            )
        if rng is None:
            rng = jax.random.PRNGKey(seed)
        # Derived before the optimization loop: the loop's donating chunks
        # consume the rng buffer.
        transmit_key = jax.random.fold_in(rng, 0x7A31)
        y0, z0 = _amortized_init(self.model, self.params, x)
        latents, losses, probes = _run_optimization(
            self.model, self.params, x, jnp.float32(lmbda), rng, method, y0, z0,
            chunk_size=chunk_size, probe_every=probe_every, unroll=unroll,
            donate=donate,
        )
        transmitted = _quantize_transmitted(
            self.model, self.params, latents, method.name,
            # Fresh key for the reference-parity unoise transmit sample (the
            # reference's final sess.run draws new graph noise,
            # unoise.py:195); unused by every other path.
            transmit_key, method.unoise_mu_source,
        )
        compute_msssim = min(x.shape[1], x.shape[2]) >= 176
        metrics = _eval_transmitted(
            self.model, self.params, x, Latents(*transmitted), compute_msssim
        )
        return dict(
            y=np.asarray(transmitted.y),
            z=np.asarray(transmitted.z),
            losses=np.asarray(losses),
            rounded_losses=np.asarray(probes),
            **{k: np.asarray(v) for k, v in metrics.items()},
        )

    def eval_rounded(self, x, y, z) -> Dict[str, Any]:
        """Evaluate plainly-rounded latents — the explicit form of the
        reference's trick of feeding rounded values into the relaxed graph
        tensors (sga.py:244-245; SURVEY.md flags this as the API the JAX
        design should expose)."""
        x = jnp.asarray(x, jnp.float32)
        latents = Latents(y=jnp.round(jnp.asarray(y)), z=jnp.round(jnp.asarray(z)))
        compute_msssim = min(x.shape[1], x.shape[2]) >= 176
        metrics = _eval_transmitted(self.model, self.params, x, latents, compute_msssim)
        return {k: np.asarray(v) for k, v in metrics.items()}

    def eval_amortized(self, x) -> Dict[str, Any]:
        """No-optimization baseline: quantize the amortized latents
        (the mbt2018 compress path, mbt2018.py:131-245, estimated rates)."""
        x = jnp.asarray(x, jnp.float32)
        out = self.model.apply({"params": self.params}, x, training=False)
        compute_msssim = min(x.shape[1], x.shape[2]) >= 176
        metrics = _eval_transmitted(
            self.model,
            self.params,
            x,
            Latents(y=out["y_tilde"], z=out["z_tilde"]),
            compute_msssim,
        )
        return {k: np.asarray(v) for k, v in metrics.items()}
