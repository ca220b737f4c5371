"""Command-line interface with the reference's command surface.

Usage (mirrors `python <script>.py {train,compress,decompress}` of the
reference, tf_boilerplate.py:91-204):

  python -m nic_tpu mbt2018 train --train_glob 'data/*.png' --lambda 0.01 ...
  python -m nic_tpu mbt2018 compress <runname> <input.png> [out.ntc]
  python -m nic_tpu mbt2018 decompress <runname> <input.ntc> [out.png]
  python -m nic_tpu sga compress <runname> <input.png|batch.npy>
  python -m nic_tpu bb_sga compress <runname> ...

Unlike the reference, --sga_its is honored (the reference exposes the flag
but hardcodes 2000 iterations, sga.py:191-192 vs tf_boilerplate.py:169-170).
"""

import argparse
import os
import sys
from dataclasses import replace

import numpy as np

from nic_tpu import config as cfg
from nic_tpu.utils import get_runname, load_input, parse_lmbda_from_runname, write_png

MODELS = ("mbt2018", "mbt2018_bb")
METHOD_SCRIPTS = ("sga", "map", "ste", "unoise", "danneal")
BB_SCRIPTS = ("bb_sga", "bb_no_sga", "bb_plain")
ALL_SCRIPTS = MODELS + METHOD_SCRIPTS + BB_SCRIPTS


def build_prior_parser() -> argparse.ArgumentParser:
    """Standalone prior-fitting CLI (learned_prior.py:498-535)."""
    p = argparse.ArgumentParser(
        prog="nic_tpu learned_prior",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_channels", type=int, required=True)
    p.add_argument("--dims", nargs="*", type=int, default=[3, 3, 3])
    p.add_argument("--init_scale", default=1.0, type=float)
    p.add_argument("--data_path", required=True)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--its", type=int, default=500)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--logging_freq", type=int, default=10)
    p.add_argument("--plot", action="store_true", help="Save fitted-density plots.")
    return p


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="nic_tpu", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("script", choices=ALL_SCRIPTS, help="Model or inference method.")
    parser.add_argument("--verbose", "-V", action="store_true")
    parser.add_argument("--num_filters", type=int, default=192)
    parser.add_argument("--num_hfilters", type=int, default=-1)
    parser.add_argument("--checkpoint_dir", default=cfg.CHECKPOINT_DIR)
    sub = parser.add_subparsers(dest="command")

    train_cmd = sub.add_parser("train")
    train_cmd.add_argument("--train_glob", default="images/*.png")
    train_cmd.add_argument("--batchsize", type=int, default=8)
    train_cmd.add_argument("--patchsize", type=int, default=256)
    train_cmd.add_argument("--lambda", type=float, default=0.01, dest="lmbda")
    train_cmd.add_argument(
        "--distortion",
        choices=("mse", "msssim"),
        default="mse",
        help="Training distortion objective (msssim trains the perceptual "
        "model variant; needs --patchsize >= 176).",
    )
    train_cmd.add_argument("--last_step", type=int, default=1_000_000)
    train_cmd.add_argument("--preprocess_threads", type=int, default=16)
    train_cmd.add_argument(
        "--data_pipeline", choices=("auto", "host", "device"), default="auto",
        help="'device' keeps the whole (uniformly-sized) corpus in HBM and "
        "samples crops on-chip — zero per-step host->device image bytes; "
        "'host' is the threaded decode/crop pipeline; 'auto' (default) "
        "picks 'device' for single-process runs whose decoded corpus fits "
        "NIC_TPU_DEVICE_DATA_BUDGET (2 GiB).",
    )
    train_cmd.add_argument("--logdir", default="")
    train_cmd.add_argument("--save_checkpoint_secs", type=int, default=300)
    train_cmd.add_argument("--save_summary_secs", type=int, default=60)
    train_cmd.add_argument(
        "--steps_per_call", type=int, default=8,
        help="Train steps fused into one device program (lax.scan); "
             "amortizes dispatch overhead (~7x throughput on remote TPUs).",
    )
    # Multi-host (DCN) training: run the same command on every host with its
    # process_id; jax.distributed forms the cluster and the same pjit DP path
    # scales across hosts (parallel/mesh.py initialize_multihost).
    train_cmd.add_argument("--coordinator_address", default=None)
    train_cmd.add_argument("--num_processes", type=int, default=None)
    train_cmd.add_argument("--process_id", type=int, default=None)
    train_cmd.add_argument(
        "--grad_clip", type=float, default=0.0,
        help="Global-norm gradient clip (0 = off, matching the reference). "
        "A generous value (e.g. 10) guards long runs against rare "
        "GDN blow-up steps without touching normal updates. Changes the "
        "optimizer state tree, so it cannot be flipped mid-run on an "
        "existing checkpoint.",
    )
    train_cmd.add_argument(
        "--divergence_threshold", type=float, default=0.0,
        help="Abort (FloatingPointError) when the logged loss exceeds this "
        "value (0 = off). GDN blow-ups can diverge while staying finite, "
        "dodging the NaN guard; with --retries the run restarts from the "
        "last good checkpoint instead of training a ruined model.",
    )
    train_cmd.add_argument(
        "--init_from", default="",
        help="Warm-start a NEW run's params from another run's checkpoint "
        "directory (e.g. checkpoints/mbt2018-num_filters=192-lmbda=0.01). "
        "Fresh optimizer, step 0; used to finetune nearby rate points from "
        "one from-scratch model. Ignored once this run has checkpoints.",
    )
    train_cmd.add_argument(
        "--init_from_partial", action="store_true",
        help="With --init_from: transfer only path+shape-matching leaves "
        "(cross-model warm-start, e.g. mbt2018_bb from mbt2018); the rest "
        "stay fresh-initialized.",
    )
    train_cmd.add_argument(
        "--retries", type=int, default=0,
        help="Re-exec training in a fresh process up to N times on crash, "
        "resuming from the latest checkpoint (train/supervisor.py); needed "
        "for long runs over flaky device transports.",
    )

    compress_cmd = sub.add_parser("compress")
    compress_cmd.add_argument("--results_dir", default="./results")
    compress_cmd.add_argument("--lambda", type=float, default=-1, dest="lmbda")
    compress_cmd.add_argument("--sga_its", type=int, default=2000)
    compress_cmd.add_argument("--annealing_rate", type=float, default=1e-3)
    compress_cmd.add_argument("--t0", type=int, default=700)
    compress_cmd.add_argument("--seed", type=int, default=cfg.DEFAULT_SEED)
    compress_cmd.add_argument(
        "--distortion", choices=("mse", "msssim"), default="mse",
        help="Distortion term of the optimized objective (use msssim for "
        "models trained with --distortion msssim; images >= 176px).",
    )
    compress_cmd.add_argument(
        "--unoise_mean_source",
        choices=("quantized_z", "noisy_z"),
        default="quantized_z",
        help="unoise only: mean used to quantize the transmitted y. "
        "quantized_z (default) is decodable; noisy_z reproduces the "
        "reference's exact A3 semantics (unoise.py:82,97) but its streams "
        "are estimate-only.",
    )
    compress_cmd.add_argument(
        "--save_opt_record", action="store_true",
        help="Save per-iteration loss records (configs.py save_opt_record).",
    )
    compress_cmd.add_argument(
        "--save_reconstruction", action="store_true",
        help="Save the reconstruction PNG (single-image inputs, sga.py:280-291).",
    )
    compress_cmd.add_argument(
        "--data_parallel", action="store_true",
        help="Shard the image batch across all available chips through the "
        "whole jitted optimization loop (LatentOptimizer(mesh=...)); "
        "per-image latents and Adam state stay chip-local.",
    )
    compress_cmd.add_argument(
        "--spatial", action="store_true",
        help="Shard each image's rows across all devices (halo-exchange "
        "model parallelism, parallel/spatial.py) instead of batching "
        "images. For single large images; arbitrary sizes are edge-padded "
        "to the mesh grid and metrics are reported on the original pixels.",
    )

    decompress_cmd = sub.add_parser("decompress")

    for c, ext in ((compress_cmd, ".ntc"), (decompress_cmd, ".png")):
        c.add_argument("runname")
        c.add_argument("input_file")
        c.add_argument("output_file", nargs="?")
        c.add_argument(
            "--quant", choices=("none", "int8", "int8_all"), default="none",
            help="Dynamic-quantized int8 convolutions for the frozen-weight "
            "transforms (mbt2018 only; ops/int8conv.py). int8 quantizes the "
            "decode-side forward convs; int8_all additionally runs the "
            "input-cotangent conv of the 5x5/up2 layers in int8 during "
            "optimization. The decoder recomputes coding distributions "
            "through h_s, so compress and decompress MUST use the same "
            "--quant value. RD effect measured in VALIDATION.md.",
        )
    return parser


# ------------------------------------------------------------------ commands


def _load_params(args, model_name: str):
    """Restore trained params for `runname` from checkpoint_dir."""
    from nic_tpu.train.trainer import TrainConfig, Trainer

    tc = TrainConfig(
        model=model_name,
        num_filters=args.num_filters,
        checkpoint_dir=args.checkpoint_dir,
        runname=args.runname,
    )
    trainer = Trainer(tc)
    step, params = trainer.restore_params_only()
    if step == 0:
        print(
            f"WARNING: no checkpoint under {trainer.save_dir}; using random init.",
            file=sys.stderr,
        )
    model = trainer.model
    quant = getattr(args, "quant", "none")
    if quant and quant != "none":
        if model_name != "mbt2018":
            raise SystemExit("--quant supports the mbt2018 model only")
        model = model.clone(quant=quant)
    return model, params


def run_train(args, argv=None):
    if args.retries > 0 and argv is not None:
        from nic_tpu.train.supervisor import is_supervised_child, supervise

        if not is_supervised_child():
            sys.exit(supervise(argv, args.retries))
    if args.coordinator_address:
        from nic_tpu.parallel.mesh import initialize_multihost

        initialize_multihost(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    from nic_tpu.train.data import PatchPipeline
    from nic_tpu.train.trainer import TrainConfig, Trainer

    tc = TrainConfig(
        model=args.script,
        num_filters=args.num_filters,
        lmbda=args.lmbda,
        distortion=args.distortion,
        batchsize=args.batchsize,
        patchsize=args.patchsize,
        last_step=args.last_step,
        checkpoint_dir=args.checkpoint_dir,
        save_checkpoint_secs=args.save_checkpoint_secs,
        save_summary_secs=args.save_summary_secs,
        logdir=args.logdir,
        steps_per_call=args.steps_per_call,
        grad_clip=args.grad_clip,
        divergence_threshold=args.divergence_threshold,
        init_from=args.init_from,
        init_from_partial=args.init_from_partial,
    )
    # Each host's pipeline feeds its local share of the global batch
    # (Trainer.fit stitches shards via make_global_batch).
    import jax

    n_proc = jax.process_count()
    if args.batchsize % n_proc:
        sys.exit(f"--batchsize {args.batchsize} must divide by {n_proc} processes.")
    trainer = Trainer(tc)
    pipeline = _make_train_pipeline(args, trainer, n_proc)
    try:
        trainer.fit(pipeline, verbose=True)
    finally:
        pipeline.close()


def _make_train_pipeline(args, trainer, n_proc):
    """Pick the data path: HBM-resident on-device sampling when the corpus
    fits (zero per-step host->device image bytes — the transfer, not
    compute, bounds throughput over remote-TPU links), host worker threads
    otherwise. `--data_pipeline` forces either."""
    import jax

    from nic_tpu.train.data import DeviceDataset, PatchPipeline

    choice = args.data_pipeline
    if choice == "auto" and n_proc == 1:
        try:
            import glob as globlib

            from PIL import Image

            files = sorted(globlib.glob(args.train_glob))
            sizes = set()
            total = 0
            for f in files[:10000]:
                if f.endswith(".npy"):
                    raise ValueError("npy corpus: keep host pipeline")
                with Image.open(f) as im:  # header-only read
                    sizes.add(im.size)
                    total += im.size[0] * im.size[1] * 3
            budget = int(os.environ.get("NIC_TPU_DEVICE_DATA_BUDGET", 2 << 30))
            if files and len(sizes) == 1 and total <= budget:
                choice = "device"
        except Exception:
            pass
    if choice == "device":
        ds = DeviceDataset(
            args.train_glob,
            batchsize=args.batchsize,
            patchsize=args.patchsize,
            seed=0,
            mesh=trainer.mesh,
        )
        print(
            f"Device-resident dataset: {ds.num_images} images, "
            f"{ds.nbytes / 1e6:.0f} MB in HBM; batches sampled on device."
        )
        return ds
    return PatchPipeline(
        args.train_glob,
        batchsize=args.batchsize // n_proc,
        patchsize=args.patchsize,
        num_threads=args.preprocess_threads,
        seed=0 if n_proc == 1 else 1000 + jax.process_index(),
    )


def _resolve_lmbda(args):
    if args.lmbda < 0:
        args.lmbda = parse_lmbda_from_runname(args.runname)
        print(f"Defaulting lmbda to {args.lmbda:g} as used in model training.")
    return args.lmbda


def _batches(X):
    n = X.shape[0]
    bs = cfg.get_eval_batch_size(int(np.prod(X.shape[1:3])))
    for i in range(0, n, bs):
        yield X[i : i + bs]


def run_compress(args):
    from nic_tpu.evaluation.results import save_rd_results

    if getattr(args, "spatial", False) and args.script not in METHOD_SCRIPTS:
        sys.exit(
            f"--spatial is only supported for {METHOD_SCRIPTS} "
            f"(not {args.script}); it shards the iterative-optimization loop."
        )
    X = load_input(args.input_file)
    lmbda = _resolve_lmbda(args)

    if args.script == "mbt2018":
        _compress_amortized(args, X)
        return

    if args.script in METHOD_SCRIPTS:
        from nic_tpu.infer.engine import LatentOptimizer
        from nic_tpu.infer.methods import METHODS

        model, params = _load_params(args, "mbt2018")
        if getattr(args, "data_parallel", False):
            if getattr(args, "spatial", False):
                sys.exit("--data_parallel and --spatial are mutually exclusive.")
            from nic_tpu.parallel.mesh import data_mesh

            mesh = data_mesh()
            print(f"Data-parallel inference over {mesh.size} device(s).")
            opt = LatentOptimizer(model, params, mesh=mesh)
        else:
            opt = LatentOptimizer(model, params)
        spec = METHODS[args.script]
        spec = replace(
            spec,
            iterations=args.sga_its,
            annealing_rate=args.annealing_rate,
            t0=args.t0,
            distortion=args.distortion,
            unoise_mu_source=args.unoise_mean_source,
        )
        if getattr(args, "spatial", False):
            if args.distortion != "mse":
                sys.exit("--spatial supports the mse objective only.")
            from nic_tpu.parallel.spatial import SpatialLatentOptimizer

            # Same optimize() surface as LatentOptimizer (batches handled
            # image-by-image inside, batch-mean loss records); --verbose
            # probes are psum'd under shard_map, so the probe record
            # matches the batch engine's.
            opt = SpatialLatentOptimizer(model, params)
        fields = ["mse", "psnr", "msssim", "msssim_db", "est_bpp", "est_y_bpp", "est_z_bpp"]
        results = {k: [] for k in fields}
        # One loss history per eval batch (the reference writes an opt
        # record per batch when enabled, sga.py:271-279) — accumulated,
        # not overwritten, so multi-batch runs keep every history.
        rd_losses, rounded_losses = [], []
        last_res = None
        # --verbose: probe the true discrete objective every 100 its
        # (sga.py:218-233), in both the batch and spatial engines.
        probe_every = 100 if args.verbose else 0
        for batch in _batches(X):
            res = last_res = opt.optimize(
                batch, lmbda, method=spec, seed=args.seed, probe_every=probe_every
            )
            for k in fields:
                results[k].extend(np.asarray(res[k]).tolist())
            if res["losses"].size:
                rd_losses.append(np.asarray(res["losses"]))
                rounded_losses.append(np.asarray(res["rounded_losses"]))
        if args.save_opt_record and rd_losses:
            # [num_batches, its] when batches share a length (fixed-length
            # scans do); a single batch stays 1-D for round-1 compatibility.
            stackable = len({a.shape for a in rd_losses}) == 1
            pack = (lambda ls: np.stack(ls)) if stackable else (
                lambda ls: np.asarray(ls, dtype=object)
            )
            opt_record = {
                "its": np.arange(rd_losses[0].size),
                "rd_loss": pack(rd_losses) if len(rd_losses) > 1 else rd_losses[0],
                "rd_loss_after_rounding": (
                    pack(rounded_losses)
                    if len(rounded_losses) > 1
                    else rounded_losses[0]
                ),
            }
            save_rd_results(
                opt_record,
                args.results_dir, args.script, args.runname, args.input_file,
                lmbda, prefix="opt", verbose=False,
            )
        if args.save_reconstruction and last_res is not None and X.shape[0] == 1:
            recon_path = os.path.join(
                args.results_dir,
                f"recon-{args.script}-lmbda={lmbda:g}+{args.runname}"
                f"-input={os.path.basename(args.input_file)}.png",
            )
            os.makedirs(args.results_dir, exist_ok=True)
            write_png(recon_path, np.asarray(last_res["x_tilde"])[0])
            print(f"Saved reconstruction to {recon_path}")
        if args.output_file and last_res is not None:
            # Beyond the reference: actually serialize the optimized latents
            # (the reference only estimates these rates). sga/ste/danneal
            # transmit integer-grid latents (mode=1 streams); unoise with
            # the default quantized_z mean transmits median/mean-centered
            # latents that the standard amortized scheme codes exactly. map
            # (mean from continuous z, map.py:100) and unoise --noisy_z are
            # not decodable by construction — refuse rather than write a
            # stream no decoder can invert.
            undecodable = args.script == "map" or (
                args.script == "unoise" and args.unoise_mean_source == "noisy_z"
            )
            if undecodable:
                print(
                    f"WARNING: not writing {args.output_file} — "
                    f"{args.script} transmitted latents use a quantization "
                    "mean the decoder cannot reproduce (reference "
                    "semantics); rates are estimate-only. Use unoise "
                    "--unoise_mean_source quantized_z for a decodable "
                    "stream.",
                    file=sys.stderr,
                )
            else:
                from nic_tpu.coding.codec import HyperpriorCodec

                codec = HyperpriorCodec(model, params)
                if args.script == "unoise":
                    blob = codec.compress_latents(
                        last_res["y"], last_res["z"], X.shape[1:3]
                    )
                else:
                    blob = codec.compress_optimized(
                        last_res["y"], last_res["z"], X.shape[1:3]
                    )
                with open(args.output_file, "wb") as f:
                    f.write(blob)
                num_pixels = int(np.prod(X.shape[:3]))
                print(
                    f"Wrote {args.output_file}: {len(blob)} bytes "
                    f"({len(blob) * 8 / num_pixels:.4f} bpp actual)"
                )
    else:  # bits-back scripts
        from nic_tpu.infer.bb import BB_NO_SGA, BB_PLAIN, BB_SGA, BBLatentOptimizer

        model, params = _load_params(args, "mbt2018_bb")
        opt = BBLatentOptimizer(model, params)
        spec = {"bb_sga": BB_SGA, "bb_no_sga": BB_NO_SGA, "bb_plain": BB_PLAIN}[args.script]
        if args.script == "bb_sga":
            spec = replace(
                spec,
                rd_iterations=args.sga_its,
                annealing_rate=args.annealing_rate,
                t0=args.t0,
            )
        fields = [
            "mse", "psnr", "msssim", "msssim_db",
            "est_bpp", "est_y_bpp", "est_z_bpp", "est_bpp_back",
        ]
        results = {k: [] for k in fields}
        opt_latents = {"y": [], "z_mean": [], "z_logvar": []}
        for batch in _batches(X):
            res = opt.optimize(batch, lmbda, spec=spec, seed=args.seed)
            for k in fields:
                results[k].extend(np.asarray(res[k]).tolist())
            for k in opt_latents:
                opt_latents[k].append(np.asarray(res[k]))
        if args.output_file:
            # Beyond the reference: real BB-ANS bits-back bitstreams. The
            # reference never serializes its bb models at all. bb_plain codes
            # against the amortized posterior; bb_sga/bb_no_sga make the
            # per-image *optimized* posterior decodable by entropy-coding
            # quantized posterior-parameter deltas (charged to the rate).
            from nic_tpu.coding.bb_codec import BitsBackCodec

            bbc = BitsBackCodec(model, params)
            if args.script == "bb_plain":
                blob, info = bbc.compress(X, seed=args.seed)
                extra = ""
            else:
                blob, info = bbc.compress_optimized(
                    X,
                    np.concatenate(opt_latents["y"]),
                    np.concatenate(opt_latents["z_mean"]),
                    np.concatenate(opt_latents["z_logvar"]),
                    seed=args.seed,
                )
                extra = f", posterior deltas {info['delta_bpp']:.4f} bpp"
            with open(args.output_file, "wb") as f:
                f.write(blob)
            print(
                f"Wrote {args.output_file}: {len(blob)} bytes "
                f"(actual {info['actual_bpp']:.4f} bpp, net bits-back "
                f"{info['net_bpp']:.4f} bpp{extra})"
            )

    results = {k: np.asarray(v) for k, v in results.items()}
    save_rd_results(
        results, args.results_dir, args.script, args.runname, args.input_file, lmbda
    )


def _compress_amortized(args, X):
    """mbt2018 compress: estimated metrics + real range coding
    (mbt2018.py:131-245)."""
    from nic_tpu.coding.codec import HyperpriorCodec
    from nic_tpu.evaluation.results import save_rd_results
    from nic_tpu.infer.engine import LatentOptimizer, Latents, _eval_transmitted

    model, params = _load_params(args, "mbt2018")
    codec = HyperpriorCodec(model, params)
    opt = LatentOptimizer(model, params)
    fields = ["mse", "psnr", "msssim", "msssim_db", "est_bpp", "est_y_bpp", "est_z_bpp"]
    results = {k: [] for k in fields}
    batch_actual_bpp, batch_sizes = [], []
    num_pixels = int(np.prod(X.shape[1:3]))

    blob = b""
    for batch in _batches(X):
        metrics = opt.eval_amortized(batch)
        for k in fields:
            results[k].extend(np.asarray(metrics[k]).tolist())
        blob, _ = codec.compress(batch)
        batch_actual_bpp.append(len(blob) * 8 / (num_pixels * batch.shape[0]))
        batch_sizes.append(batch.shape[0])

    if args.output_file or cfg.WRITE_BITSTREAM_FOR_EVAL:
        out = args.output_file or (args.input_file + ".ntc")
        with open(out, "wb") as f:
            f.write(blob)

    results = {k: np.asarray(v) for k, v in results.items()}
    results["batch_actual_bpp"] = np.asarray(batch_actual_bpp)
    results["batch_sizes"] = np.asarray(batch_sizes)
    results["avg_batch_actual_bpp"] = np.asarray(
        np.sum(np.asarray(batch_actual_bpp) * np.asarray(batch_sizes))
        / np.sum(batch_sizes)
    )
    save_rd_results(
        results,
        args.results_dir,
        args.script,
        args.runname,
        args.input_file,
        lmbda=None,  # trained-script naming: rd-<runname>-input=...
    )


def run_decompress(args):
    with open(args.input_file, "rb") as f:
        blob = f.read()
    if args.script == "mbt2018" or args.script in METHOD_SCRIPTS:
        from nic_tpu.coding.codec import HyperpriorCodec

        # Optimized-latent (.ntc mode=1) streams written by
        # `sga/map/... compress` decode against the same mbt2018 params;
        # HyperpriorCodec.decompress dispatches on the mode marker. The
        # reference's only decode surface is mbt2018.py:248-295.
        model, params = _load_params(args, "mbt2018")
        x_hat = HyperpriorCodec(model, params).decompress(blob)
    else:  # bits-back streams
        from nic_tpu.coding.bb_codec import BitsBackCodec

        model, params = _load_params(args, "mbt2018_bb")
        bbc = BitsBackCodec(model, params)
        if args.script == "bb_plain":
            x_hat, init_ok = bbc.decompress(blob)
        else:
            x_hat, init_ok = bbc.decompress_optimized(blob)
        if not init_ok:
            sys.exit("bits-back integrity check failed: initial bits not recovered")
    out = args.output_file or (args.input_file + ".png")
    write_png(out, x_hat[0])
    print(f"Wrote {out}")


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "learned_prior":
        from nic_tpu.train.prior_trainer import train_prior_cli

        args = build_prior_parser().parse_args(argv[1:])
        train_prior_cli(args)
        return
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.command is None:
        parser.print_usage()
        sys.exit(2)
    if args.command == "train":
        if args.script not in MODELS:
            sys.exit(f"{args.script} does not support training.")
        run_train(args, argv=list(argv))
    elif args.command == "compress":
        run_compress(args)
    elif args.command == "decompress":
        if args.script not in ("mbt2018", "bb_plain", "bb_sga", "bb_no_sga") and (
            args.script not in METHOD_SCRIPTS
        ):
            sys.exit(f"{args.script} does not support decompression.")
        run_decompress(args)


if __name__ == "__main__":
    main()
