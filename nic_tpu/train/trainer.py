"""Data-parallel pjit trainer for the hyperprior models.

TPU-native redesign of the reference training harness
(tf_boilerplate.py:10-88 + mbt2018.py:92-128):

- Whole train step (fwd + bwd + dual-Adam update) is one jitted, sharded
  computation. Batches shard along a 1-D 'data' mesh axis; parameters are
  replicated; XLA inserts the gradient all-reduce over ICI.
- Dual optimizer exactly mirrors mbt2018.py:117-123: Adam(1e-4) on model
  parameters driven by the RD loss, Adam(1e-3) on the entropy-bottleneck
  quantiles driven by the auxiliary quantile loss. Both fit in a single
  backward pass because the two losses touch disjoint parameters
  (`optax.multi_transform` routes per-group learning rates).
  The reference's third group member — the EntropyBottleneck CDF-table
  refresh (`updates[0]`) — is unnecessary here: coding tables are built
  lazily from the current parameters at compress time.
- NaN guard = NanTensorHook (tf_boilerplate.py:67); run metadata
  (record.txt/args.json) mirrors tf_boilerplate.py:47-63.
"""

import datetime
import json
import os
import re
import time
from dataclasses import asdict, dataclass, field
from functools import partial
from typing import Any, Dict, Iterator, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from nic_tpu.models.mbt2018 import MeanScaleHyperprior, rd_loss
from nic_tpu.models.mbt2018_bb import BitsBackHyperprior, bb_rd_loss
from nic_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    default_device_count,
    make_global_batch,
    replicated_sharding,
)
from nic_tpu.train import checkpoint as ckpt_lib


@dataclass
class TrainConfig:
    model: str = "mbt2018"  # or "mbt2018_bb"
    num_filters: int = 192
    lmbda: float = 0.01
    # Distortion objective: "mse" (the reference's only objective) or
    # "msssim" (1 - MS-SSIM; requires patchsize >= 176 for the 5 scales).
    distortion: str = "mse"
    batchsize: int = 8
    patchsize: int = 256
    last_step: int = 1_000_000
    main_lr: float = 1e-4
    aux_lr: float = 1e-3
    # Optional global-norm gradient clip (0 = off, the reference's behavior,
    # mbt2018.py:117-123 has no clipping). Long runs occasionally hit a
    # GDN/synthesis blow-up step (observed: loss 3 -> 1045 in one step at
    # step ~11k of an nf=192 run) that costs ~15k steps to recover from;
    # a generous clip engages only on such spikes.
    grad_clip: float = 0.0
    # Optional absolute loss ceiling (0 = off). A GDN blow-up can diverge
    # without ever producing NaN (observed: loss 2.2 -> 4e7, finite), so the
    # NaN guard never fires and the run quietly ruins itself. Crossing the
    # ceiling raises FloatingPointError like the NaN guard, so `--retries`
    # restarts from the last (<= save_checkpoint_secs old) good checkpoint.
    divergence_threshold: float = 0.0
    seed: int = 0
    checkpoint_dir: str = "./checkpoints"
    runname: Optional[str] = None
    save_checkpoint_secs: int = 300
    save_summary_secs: int = 60
    log_every: int = 100
    logdir: str = ""
    num_devices: Optional[int] = None
    # Warm-start: checkpoint dir of another finished run whose params seed
    # this run's initial state (fresh optimizer, step 0). Used to finetune
    # nearby rate points from one from-scratch model: a new lambda converges
    # in a small fraction of the from-scratch budget when started from a
    # trained model (the transforms transfer; only the rate balance moves).
    # Ignored once this run has its own checkpoint (resume wins).
    init_from: str = ""
    # With init_from: transfer only leaves whose path AND shape match,
    # leaving the rest fresh-initialized (e.g. warm-start mbt2018_bb's
    # shared g_a/g_s/h_s transforms from a trained mbt2018 whose h_a head
    # and prior differ). Off by default so an architecture mismatch is an
    # error, not a silent part-transfer.
    init_from_partial: bool = False
    # Train steps fused into one device program (lax.scan over stacked
    # batches): amortizes per-dispatch overhead, which dominates single
    # steps on remote-attached TPUs. 1 = one dispatch per step.
    steps_per_call: int = 1

    def resolved_runname(self) -> str:
        if self.runname:
            return self.runname
        from nic_tpu.utils import get_runname

        keys = ["num_filters", "num_hfilters", "lmbda"]
        d = dict(num_filters=self.num_filters, num_hfilters=-1, lmbda=self.lmbda)
        if self.distortion != "mse":
            keys.append("distortion")
            d["distortion"] = self.distortion
        return get_runname(d, record_keys=tuple(keys), prefix=self.model)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jnp.ndarray


def _is_aux_param(path) -> bool:
    return any(getattr(p, "key", None) == "quantiles" for p in path)


def make_optimizer(
    params, main_lr: float, aux_lr: float, dual: bool, grad_clip: float = 0.0
):
    """Adam(main_lr) on model params (+ Adam(aux_lr) on quantiles if dual)."""
    if not dual:
        tx = optax.adam(main_lr)
    else:
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "aux" if _is_aux_param(path) else "main", params
        )
        tx = optax.multi_transform(
            {"main": optax.adam(main_lr), "aux": optax.adam(aux_lr)}, labels
        )
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


class Trainer:
    """Owns model, mesh, jitted step, checkpoints, and the fit loop."""

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        if cfg.distortion == "msssim" and cfg.patchsize < 176:
            raise ValueError(
                "MS-SSIM training needs patchsize >= 176 (5 scales x 11-tap "
                f"window); got {cfg.patchsize}"
            )
        # The data axis cannot exceed the batch size and must divide it.
        requested = cfg.num_devices or default_device_count()
        n = min(requested, cfg.batchsize)
        while cfg.batchsize % n:
            n -= 1
        if n < requested:
            import warnings

            warnings.warn(
                f"data mesh shrunk from {requested} to {n} device(s) so the "
                f"batch size {cfg.batchsize} divides evenly; "
                f"{requested - n} device(s) will idle. Pick a batchsize "
                f"divisible by {requested} to use the full mesh.",
                stacklevel=2,
            )
        self.mesh = data_mesh(n)
        if cfg.model == "mbt2018":
            self.model = MeanScaleHyperprior(num_filters=cfg.num_filters)
            self._dual = True
        elif cfg.model == "mbt2018_bb":
            self.model = BitsBackHyperprior(num_filters=cfg.num_filters)
            self._dual = False
        else:
            raise ValueError(f"Unknown model {cfg.model!r}")
        self.save_dir = os.path.join(cfg.checkpoint_dir, cfg.resolved_runname())
        self._tx = None
        self._step_fn = None

    # ------------------------------------------------------------------ init

    def init_state(self) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        init_rng, model_rng, state_rng = jax.random.split(rng, 3)
        x = jnp.zeros((1, self.cfg.patchsize, self.cfg.patchsize, 3), jnp.float32)
        variables = self.model.init(init_rng, x, training=True, rng=model_rng)
        params = variables["params"]
        self._tx = make_optimizer(
            params, self.cfg.main_lr, self.cfg.aux_lr, self._dual, self.cfg.grad_clip
        )
        opt_state = self._tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=state_rng,
        )

    def restore_params_only(self):
        """(step, params) from the latest checkpoint, or (0, init params).

        The inference/eval paths need only the model parameters; a raw
        (template-free) restore keeps them decoupled from the optimizer
        state's tree structure (which changes with --grad_clip).

        When a params-<step>.npz exists at EXACTLY the latest orbax
        checkpoint's step, the npz wins: post-hoc repairs (converge_aux.py's
        quantile convergence) rewrite only the npz, and at an equal step
        the two are otherwise identical. Orbax stays authoritative in
        every other case — including an npz whose step is AHEAD of orbax,
        which can only be a stale leftover from a prior run in a reused
        checkpoint dir (ADVICE r4, low: shape checks catch architecture
        changes, not staleness). The chosen source is logged.
        """
        orbax_step = ckpt_lib.latest_step(self.save_dir)
        npz_matches = False
        if orbax_step is not None:
            p = ckpt_lib.latest_npz(self.save_dir)
            if p is not None:
                m = re.fullmatch(r"params-(\d+)\.npz", os.path.basename(p))
                npz_step = int(m.group(1)) if m else None
                npz_matches = npz_step == orbax_step
                if npz_step is not None and npz_step > orbax_step:
                    print(
                        f"restore_params_only: ignoring {p} (step {npz_step} "
                        f"ahead of latest orbax step {orbax_step} — stale "
                        "leftover from a prior run?)"
                    )
        if orbax_step is None or npz_matches:
            npz = ckpt_lib.latest_npz(self.save_dir)
            if npz is not None:
                # Git-committed archive (survives round resets; see
                # checkpoint.export_params_npz). Validate the tree against a
                # freshly-initialized one so a stale archive fails loudly.
                step, params = ckpt_lib.load_params_npz(npz)
                template = self.init_state().params
                jax.tree_util.tree_map(
                    lambda a, b: None
                    if a.shape == b.shape
                    else (_ for _ in ()).throw(
                        ValueError(f"{npz}: shape mismatch {a.shape} vs {b.shape}")
                    ),
                    jax.tree_util.tree_map(jnp.asarray, params),
                    template,
                )
                print(f"restore_params_only: {npz} (step {step})")
                return step, jax.tree_util.tree_map(jnp.asarray, params)
            return 0, self.init_state().params
        raw = ckpt_lib.restore_raw(self.save_dir)
        print(f"restore_params_only: orbax step {int(raw['step'])} "
              f"from {self.save_dir}")
        return int(raw["step"]), raw["params"]

    def restore_or_init(self) -> TrainState:
        state = self.init_state()
        if (
            ckpt_lib.latest_step(self.save_dir) is None
            and ckpt_lib.latest_npz(self.save_dir) is None
            and self.cfg.init_from
        ):
            # Warm-start a new run from another run's trained params (see
            # TrainConfig.init_from). Fresh optimizer/rng/step=0: only the
            # weights transfer. Restart-safe: once this run checkpoints,
            # resume takes precedence and init_from is never re-applied.
            donor_dir = os.path.abspath(self.cfg.init_from)
            if ckpt_lib.latest_step(donor_dir) is not None:
                raw = ckpt_lib.restore_raw(donor_dir)
                step, donor_params = int(raw["step"]), raw["params"]
            else:
                npz = ckpt_lib.latest_npz(donor_dir)
                if npz is None:
                    raise FileNotFoundError(
                        f"--init_from {self.cfg.init_from}: no trained checkpoint"
                    )
                step, donor_params = ckpt_lib.load_params_npz(npz)
            donor_params = jax.tree_util.tree_map(jnp.asarray, donor_params)
            if self.cfg.init_from_partial:
                from flax import traverse_util

                donor_flat = traverse_util.flatten_dict(donor_params, sep="/")
                fresh_flat = traverse_util.flatten_dict(state.params, sep="/")
                taken, kept = [], []
                merged = {}
                for k, v in fresh_flat.items():
                    d = donor_flat.get(k)
                    if d is not None and d.shape == v.shape:
                        merged[k] = d.astype(v.dtype)
                        taken.append(k)
                    else:
                        merged[k] = v
                        kept.append(k)
                print(
                    f"Warm-starting (partial) from {self.cfg.init_from} "
                    f"(step {step}): {len(taken)} leaves transferred, "
                    f"{len(kept)} fresh: {kept}"
                )
                state = state.replace(
                    params=traverse_util.unflatten_dict(merged, sep="/")
                )
            else:
                jax.tree_util.tree_map(
                    lambda a, b: None
                    if a.shape == b.shape
                    else (_ for _ in ()).throw(
                        ValueError(
                            f"--init_from shape mismatch {a.shape} vs {b.shape}"
                            " (use init_from_partial for cross-model transfer)"
                        )
                    ),
                    donor_params,
                    state.params,
                )
                print(
                    f"Warm-starting params from {self.cfg.init_from} (step {step})"
                )
                state = state.replace(params=donor_params)
        if ckpt_lib.latest_step(self.save_dir) is None:
            npz = ckpt_lib.latest_npz(self.save_dir)
            if npz is not None:
                # Only the committed npz archive survived (round reset). No
                # optimizer state in it: resume with trained params at the
                # recorded step and fresh Adam moments — a brief re-warmup
                # beats losing the run.
                step, params = ckpt_lib.load_params_npz(npz)
                print(f"Resuming params (fresh optimizer) from {npz}")
                return state.replace(
                    step=jnp.asarray(step, jnp.int32),
                    params=jax.tree_util.tree_map(jnp.asarray, params),
                )
        if ckpt_lib.latest_step(self.save_dir) is not None:
            try:
                state = ckpt_lib.restore_checkpoint(self.save_dir, state)
            except (ValueError, TypeError) as e:
                # Orbax raises ValueError/TypeError on a tree-structure
                # mismatch; under --grad_clip that most likely means a
                # pre-clip checkpoint whose opt_state lacks the
                # optax.chain(clip, tx) wrapper. Any other failure mode
                # (corrupt file, wrong model) re-raises the original error.
                if self.cfg.grad_clip <= 0:
                    raise
                # Migrate a pre-clip checkpoint: optax.chain(clip, tx) nests
                # the old optimizer state as element 1 of a 2-tuple (element
                # 0, the clip's EmptyState, is stateless). Restore against
                # the un-chained template, then wrap.
                import dataclasses

                noclip = Trainer(dataclasses.replace(self.cfg, grad_clip=0.0))
                try:
                    old = ckpt_lib.restore_checkpoint(
                        self.save_dir, noclip.init_state()
                    )
                except Exception:
                    raise e  # not a clip migration — surface the original
                state = TrainState(
                    step=old.step,
                    params=old.params,
                    opt_state=(optax.EmptyState(), old.opt_state),
                    rng=old.rng,
                )
        return state

    # ------------------------------------------------------------------ step

    def _build_step(self):
        model, cfg, dual = self.model, self.cfg, self._dual
        loss_fn_impl = rd_loss if cfg.model == "mbt2018" else bb_rd_loss
        tx = self._tx

        def loss_fn(params, batch, rng):
            out = model.apply({"params": params}, batch, training=True, rng=rng)
            loss, metrics = loss_fn_impl(out, batch, cfg.lmbda, cfg.distortion)
            if dual:
                aux = model.apply({"params": params}, method=model.aux_loss)
                metrics = dict(metrics, aux_loss=aux)
                loss = loss + aux
            return loss, metrics

        def step(state: TrainState, batch) -> tuple:
            # uint8 batches (the PatchPipeline contract) normalize on device;
            # fp32 batches (tests, numpy feeds) pass through unchanged.
            if batch.dtype == jnp.uint8:
                batch = batch.astype(jnp.float32) / 255.0
            step_rng = jax.random.fold_in(state.rng, state.step)
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                state.params, batch, step_rng
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                rng=state.rng,
            )
            return new_state, metrics

        def multi_step(state: TrainState, batches) -> tuple:
            if batches.ndim == 4:  # single step, [B, H, W, 3]
                return step(state, batches)
            # batches: [k, B, H, W, 3]; report the last step's metrics.
            # (jit retraces per leading length, so a smaller remainder stack
            # at the end of training is just one extra compile.)
            state, ms = jax.lax.scan(step, state, batches)
            return state, jax.tree.map(lambda a: a[-1], ms)

        repl = replicated_sharding(self.mesh)
        # The batch inherits the sharding it was device_put with (a 4-D
        # batch shards P('data'), a stacked one P(None, 'data')).
        return jax.jit(
            multi_step,
            in_shardings=(repl, None),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    @property
    def step_fn(self):
        if self._step_fn is None:
            if self._tx is None:
                self.init_state()  # builds tx
            self._step_fn = self._build_step()
        return self._step_fn

    # ------------------------------------------------------------------- fit

    def _write_metadata(self):
        os.makedirs(self.save_dir, exist_ok=True)
        args = asdict(self.cfg)
        with open(os.path.join(self.save_dir, "record.txt"), "a") as f:
            f.write(datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S") + "\n")
            f.write(json.dumps(args, indent=4, sort_keys=True) + "\n\n")
        with open(os.path.join(self.save_dir, "args.json"), "w") as f:
            json.dump(args, f, indent=4, sort_keys=True)
        # Reproducibility-by-snapshot: copy the model source next to the
        # checkpoints (tf_boilerplate.py:60-63).
        import inspect
        import shutil

        try:
            src = inspect.getsourcefile(type(self.model))
            if src:
                shutil.copy(src, self.save_dir)
        except (OSError, TypeError):
            pass

    def fit(
        self,
        data: Iterator,
        state: Optional[TrainState] = None,
        verbose: bool = True,
    ) -> TrainState:
        """Run the training loop up to cfg.last_step (resumable)."""
        from nic_tpu.train.summaries import SummaryWriter, ThroughputMeter

        cfg = self.cfg
        # Multi-host (DCN) runs: every process executes the same loop over the
        # global mesh; `data` yields each host's LOCAL share of the global
        # batch (batchsize // process_count images) and make_global_batch
        # stitches the shards. Host-side writes happen on process 0 only
        # (the state is replicated, so its copy is authoritative).
        is_writer = jax.process_index() == 0
        if state is None:
            state = self.restore_or_init()
            if jax.process_count() > 1:
                # Only process 0 saves checkpoints; without a shared
                # filesystem a restarted non-zero host would silently
                # random-init (step 0) while host 0 resumes, leaving the
                # "replicated" state inconsistent across the SPMD program.
                # Cross-check the restored step on every process and fail
                # loudly on mismatch.
                from jax.experimental import multihost_utils

                steps = multihost_utils.process_allgather(
                    jnp.asarray(int(state.step), jnp.int32)
                )
                if int(steps.min()) != int(steps.max()):
                    raise RuntimeError(
                        "Checkpoint restore diverged across hosts (restored "
                        f"steps per process: {list(map(int, steps))}). All "
                        "processes must see the same checkpoint directory "
                        "(shared filesystem) to resume a multi-host run."
                    )
        if is_writer:
            self._write_metadata()
        step_fn = self.step_fn
        writer = SummaryWriter(
            os.path.join(self.save_dir, "metrics.jsonl"),
            logdir=os.path.join(cfg.logdir, cfg.resolved_runname()) if cfg.logdir else None,
        ) if is_writer else None
        meter = ThroughputMeter()
        last_ckpt = time.time()
        last_log = 0.0
        last_image_summary = time.time()
        bsh = batch_sharding(self.mesh)

        k = cfg.steps_per_call
        if k > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bsh = NamedSharding(self.mesh, P(None, "data"))

        import numpy as _np

        from nic_tpu.train.data import DeviceDataset

        # HBM-resident corpus: batches are sampled on device (data.py
        # DeviceDataset) — no per-step host->device image traffic.
        on_device = isinstance(data, DeviceDataset)

        # Graceful SIGTERM: finish the in-flight fused call, then fall
        # through to the trailing checkpoint+npz save. Without this a
        # timeout-wrapped or deadline-killed run loses everything since the
        # last periodic save (observed: 8k steps). Main thread only; the
        # previous handler is restored on exit.
        import signal
        import threading

        stop_requested = threading.Event()
        prev_handler = None
        if threading.current_thread() is threading.main_thread():
            prev_handler = signal.signal(
                signal.SIGTERM, lambda *_: stop_requested.set()
            )

        step = int(state.step)
        while step < cfg.last_step and not stop_requested.is_set():
            # Never overshoot last_step (StopAtStepHook semantics,
            # tf_boilerplate.py:66): the final call shrinks to the remainder.
            this = min(k, cfg.last_step - step)
            if on_device:
                batch = data.sample(this) if k > 1 else data.sample(1)[0]
            elif k == 1:
                batch = make_global_batch(next(data), self.mesh, bsh)
            else:
                batch = make_global_batch(
                    _np.stack([next(data) for _ in range(this)]), self.mesh, bsh
                )
            state, metrics = step_fn(state, batch)
            step += this
            # One fused device call advances `this` optimizer steps; count
            # them all or steps_per_sec reports calls/sec (64x low).
            meter.update(cfg.batchsize * this, steps=this)
            if step % cfg.log_every == 0 or step == cfg.last_step:
                metrics = jax.device_get(metrics)
                loss = float(metrics["loss"])
                if not (loss == loss and abs(loss) != float("inf")):
                    raise FloatingPointError(
                        f"NaN/Inf loss at step {step}"  # NanTensorHook behavior
                    )
                if 0 < cfg.divergence_threshold < loss:
                    raise FloatingPointError(
                        f"Diverged: loss {loss:.4g} > threshold "
                        f"{cfg.divergence_threshold:g} at step {step}"
                    )
                now = time.time()
                rates = meter.rates()
                if is_writer and verbose and now - last_log >= 1.0:
                    last_log = now
                    print(
                        f"step={step} loss={loss:.4f} bpp={float(metrics['bpp']):.4f} "
                        f"mse={float(metrics['mse']):.3f} "
                        f"({rates['images_per_sec']:.1f} img/s)"
                    )
                if is_writer:
                    writer.write(
                        step, {**{k: float(v) for k, v in metrics.items()}, **rates}
                    )
                # Image summaries run a process-0-only eval forward, which
                # would deadlock a multi-host mesh (every process must join
                # SPMD computations) — skipped when process_count > 1.
                if (
                    is_writer
                    and jax.process_count() == 1
                    and cfg.logdir
                    and now - last_image_summary >= cfg.save_summary_secs
                ):
                    # original/reconstruction image summaries
                    # (tf_boilerplate.py:71-76): one eval forward per cadence.
                    img_batch = batch[-1] if k > 1 else batch
                    if img_batch.dtype == jnp.uint8:
                        img_batch = img_batch.astype(jnp.float32) / 255.0
                    out = self.model.apply(
                        {"params": state.params}, img_batch, training=False
                    )
                    writer.write_images(
                        step,
                        {
                            "original": jax.device_get(img_batch),
                            "reconstruction": jax.device_get(out["x_tilde"]),
                        },
                    )
                    last_image_summary = now
                if is_writer and now - last_ckpt >= cfg.save_checkpoint_secs:
                    host_state = jax.device_get(state)
                    ckpt_lib.save_checkpoint(self.save_dir, step, host_state)
                    # Refresh the durable npz archive too (a run cut short by
                    # the session deadline must still leave committable
                    # weights); keep only the newest to bound repo size.
                    prev = ckpt_lib.latest_npz(self.save_dir)
                    ckpt_lib.export_params_npz(self.save_dir, step, host_state.params)
                    if prev is not None:
                        os.remove(prev)
                    last_ckpt = now
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
        if stop_requested.is_set() and verbose:
            print(f"SIGTERM: stopping at step {step}; saving checkpoint.")
        if is_writer:
            host_state = jax.device_get(state)
            ckpt_lib.save_checkpoint(self.save_dir, step, host_state)
            # Durable, git-committable weights archive alongside the orbax
            # tree (orbax dirs are untracked and do not survive round
            # resets; the npz does — see checkpoint.export_params_npz).
            prev = ckpt_lib.latest_npz(self.save_dir)
            ckpt_lib.export_params_npz(self.save_dir, step, host_state.params)
            if prev is not None and prev != os.path.join(
                self.save_dir, f"params-{step}.npz"
            ):
                os.remove(prev)
        return state
