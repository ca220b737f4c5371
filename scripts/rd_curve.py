"""Assemble an RD curve across every trained lambda checkpoint.

The reference publishes its results as per-method CSVs of (bpp, psnr) rows,
one row per training lambda (results/kodak/sga-psnr.csv etc.). This script
is the producing side of that artifact for this framework: it scans a
checkpoint directory for runs of one model family, evaluates each at
amortized + the requested iterative methods on a held-out .npy batch, and
writes

  <out>/<method>-psnr.csv      "bpp,psnr" rows sorted by bpp (reference format)
  <out>/rd_curve.json          full structured results
  <out>/rd_curve.png           the curve plot (matplotlib, if available)

Usage:
  python scripts/rd_curve.py EVAL_NPY [--checkpoint_dir D] [--out results/synth]
      [--methods amortized,sga] [--its 2000] [--num_filters N]
"""

import argparse
import glob
import json
import os
import re
import time

import numpy as np


def find_runs(checkpoint_dir: str, num_filters: int, model: str = "mbt2018"):
    """(runname, lmbda) for every run of `model` with a checkpoint."""
    runs = []
    pat = re.compile(
        rf"^{model}-num_filters={num_filters}-lmbda=([0-9.eE+-]+)$"
    )
    for d in sorted(glob.glob(os.path.join(checkpoint_dir, "*"))):
        m = pat.match(os.path.basename(d))
        if m and (
            glob.glob(os.path.join(d, "ckpt-*"))
            or glob.glob(os.path.join(d, "params-*.npz"))
        ):
            runs.append((os.path.basename(d), float(m.group(1))))
    return runs


def _atomic_write(path, text):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def _merge_detail(out_dir, detail):
    """Merge this run's rows into the rd_curve.json already on disk.

    Pipelines re-run evals into the same out dir under tight `timeout`
    budgets; without merging, a deadline-killed re-eval would replace a
    committed 5-point curve with a 1-point partial one (ADVICE r3,
    medium). Rows are keyed by runname: fresh results win, rows not
    re-evaluated this run are kept.

    A merge across DIFFERENT eval sets is refused (ADVICE r4, low): a
    partial re-eval with another --eval_npy into the same out dir would
    silently mix points from two eval sets into one curve. One out dir =
    one eval set; pass --fresh to replace the directory's curve."""
    merged = {}
    path = os.path.join(out_dir, "rd_curve.json")
    try:
        with open(path) as f:
            for row in json.load(f):
                merged[row["runname"]] = row
    except (OSError, ValueError):
        pass
    on_disk_evals = {r["eval"] for r in merged.values() if "eval" in r}
    incoming_evals = {r["eval"] for r in detail if "eval" in r}
    foreign = incoming_evals - on_disk_evals
    if on_disk_evals and foreign:
        raise SystemExit(
            f"refusing to merge rows evaluated on {sorted(foreign)} into "
            f"{path} which holds rows for {sorted(on_disk_evals)}; use a "
            "different --out or pass --fresh to replace the curve"
        )
    for row in detail:
        merged[row["runname"]] = row
    return sorted(merged.values(), key=lambda r: (r["lmbda"], r["runname"]))


def _write_artifacts(out_dir, detail, verbose=False, fresh=False):
    """Write the CSV/JSON artifacts (atomically — a SIGTERM mid-write must
    not truncate a committed curve). Called after EVERY checkpoint so a
    deadline-killed run still leaves a valid partial curve on disk; the
    curves are rebuilt from the on-disk-merged detail, never shrinking."""
    os.makedirs(out_dir, exist_ok=True)
    merged = detail if fresh else _merge_detail(out_dir, detail)
    curve = {}
    for row in merged:
        for name, res in row["methods"].items():
            curve.setdefault(name, []).append((res["bpp"], res["psnr"]))
    for name, pts in curve.items():
        path = os.path.join(out_dir, f"{name}-psnr.csv")
        _atomic_write(
            path, "".join(f"{b:.4f},{p:.6f}\n" for b, p in sorted(pts))
        )
        if verbose:
            print(f"wrote {path}")
    _atomic_write(
        os.path.join(out_dir, "rd_curve.json"), json.dumps(merged, indent=2)
    )
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("eval_npy")
    ap.add_argument("--checkpoint_dir", default="./checkpoints")
    ap.add_argument("--out", default="./results/synth")
    ap.add_argument("--methods", default="amortized,sga")
    ap.add_argument("--its", type=int, default=2000)
    ap.add_argument("--num_filters", type=int, default=192)
    ap.add_argument(
        "--fresh", action="store_true",
        help="Do not merge with an existing rd_curve.json in --out "
        "(default merges so partial re-evals never shrink the curve).",
    )
    ap.add_argument(
        "--model", default="mbt2018", choices=("mbt2018", "mbt2018_bb"),
        help="mbt2018_bb scans bb checkpoints and evaluates the bits-back "
        "family (methods like bb_plain,bb_sga; net rate = est_bpp - "
        "bpp_back, matching the reference's bb_sga curves).",
    )
    ap.add_argument(
        "--lmbda", default=None,
        help="Evaluate only run(s) with these training lambdas (comma "
        "list; default: every run under --checkpoint_dir). For partial "
        "re-evals that should not re-run the whole curve; one process "
        "for several lambdas also shares jit compilations, which "
        "per-lambda processes pay repeatedly.",
    )
    args = ap.parse_args()

    import jax.numpy as jnp

    from nic_tpu.config import get_eval_batch_size
    from nic_tpu.infer import methods as M
    from nic_tpu.infer.engine import LatentOptimizer
    from nic_tpu.models.mbt2018 import MeanScaleHyperprior
    from nic_tpu.train.trainer import TrainConfig, Trainer

    runs = find_runs(args.checkpoint_dir, args.num_filters, args.model)
    if args.lmbda is not None:
        wanted = [float(v) for v in str(args.lmbda).split(",")]
        runs = [
            r for r in runs if any(abs(r[1] - w) < 1e-12 for w in wanted)
        ]
    if not runs:
        raise SystemExit(
            f"no {args.model}-num_filters={args.num_filters}-lmbda=* "
            f"checkpoints under {args.checkpoint_dir}"
            + (f" with lmbda={args.lmbda}" if args.lmbda is not None else "")
        )
    print(f"runs: {[r[0] for r in runs]}")

    X = np.load(args.eval_npy).astype(np.float32)
    if X.max() > 1.5:
        X = X / 255.0

    method_names = args.methods.split(",")
    detail = []
    fresh = args.fresh
    for runname, lmbda in runs:
        tc = TrainConfig(
            model=args.model,
            num_filters=args.num_filters,
            checkpoint_dir=args.checkpoint_dir,
            runname=runname,
        )
        trainer = Trainer(tc)
        step, params = trainer.restore_params_only()
        if args.model == "mbt2018_bb":
            from nic_tpu.infer import bb as BB
            from nic_tpu.models.mbt2018_bb import BitsBackHyperprior

            model = BitsBackHyperprior(
                num_filters=args.num_filters, compute_dtype=jnp.bfloat16
            )
            opt = BB.BBLatentOptimizer(model, params)
        else:
            model = MeanScaleHyperprior(
                num_filters=args.num_filters, compute_dtype=jnp.bfloat16
            )
            opt = LatentOptimizer(model, params)
        row = dict(
            runname=runname,
            lmbda=lmbda,
            step=step,
            eval=os.path.basename(args.eval_npy),
            methods={},
        )
        for name in method_names:
            t0 = time.time()
            if args.model == "mbt2018_bb":
                import dataclasses

                spec = getattr(BB, name.upper())
                if spec.rd_iterations > 0:
                    spec = dataclasses.replace(spec, rd_iterations=args.its)
                fn = lambda xs: opt.optimize(xs, lmbda=lmbda, spec=spec, seed=0)
            elif name == "amortized":
                fn = opt.eval_amortized
            else:
                spec = getattr(M, name.upper()).replace(iterations=args.its)
                fn = lambda xs: opt.optimize(xs, lmbda=lmbda, method=spec, seed=0)
            # Pixel-budget chunking (configs.py:5-9 via get_eval_batch_size),
            # same as the CLI compress path (cli/main.py) — a 16x1200x1200
            # eval set as ONE batch exhausts HBM on a single chip.
            bs = get_eval_batch_size(int(np.prod(X.shape[1:3])))
            parts = [fn(X[i : i + bs]) for i in range(0, len(X), bs)]
            r = {
                k: np.concatenate(
                    [np.atleast_1d(np.asarray(p[k])) for p in parts]
                )
                for k in ("est_bpp", "psnr", "msssim")
            }
            bpp = float(np.mean(r["est_bpp"]))
            psnr = float(np.mean(r["psnr"]))
            ms = float(np.mean(r["msssim"]))
            row["methods"][name] = dict(
                bpp=bpp, psnr=psnr, msssim=ms, secs=time.time() - t0
            )
            print(
                f"{runname} {name:10s} step={step} bpp={bpp:.4f} "
                f"psnr={psnr:6.3f} msssim={ms:.4f}"
            )
        detail.append(row)
        _write_artifacts(args.out, detail, fresh=fresh)
        fresh = False  # after the first write, merging == appending to it

    curve = _write_artifacts(args.out, detail, verbose=True, fresh=fresh)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5.2, 4.2), dpi=140)
        for name, pts in curve.items():
            pts = sorted(pts)
            ax.plot(
                [p[0] for p in pts],
                [p[1] for p in pts],
                marker="o",
                label=name,
            )
        ax.set_xlabel("bits per pixel")
        ax.set_ylabel("PSNR (dB)")
        ax.set_title("RD curve (held-out eval batch)")
        ax.grid(True, alpha=0.3)
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "rd_curve.png"))
        print(f"wrote {os.path.join(args.out, 'rd_curve.png')}")
    except Exception as e:  # plotting is best-effort
        print(f"plot skipped: {e}")


if __name__ == "__main__":
    main()
