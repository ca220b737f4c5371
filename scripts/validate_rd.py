"""RD-ordering validation on a trained checkpoint.

Runs every inference method on a held-out eval batch and checks the paper's
qualitative claims (Yang et al. 2020, Table 1 / Fig. 2; reference
results/*.csv): every iterative method improves the RD objective over
amortized inference, and SGA is the best of the non-bits-back methods.
Absolute Kodak parity needs the reference's CLIC training run (1-3M steps on
photos); this validates the *method ordering* end-to-end on any checkpoint.

Usage:
  python scripts/validate_rd.py RUNNAME EVAL_NPY [--checkpoint_dir D]
      [--lambda L] [--num_filters N] [--its K] [--methods m1,m2,...]

Writes results to stdout and VALIDATION.json next to the checkpoint.
"""

import argparse
import json
import os
import time

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runname")
    ap.add_argument("eval_npy")
    ap.add_argument("--checkpoint_dir", default="./checkpoints")
    ap.add_argument("--lambda", type=float, default=-1.0, dest="lmbda")
    ap.add_argument("--num_filters", type=int, default=192)
    ap.add_argument("--its", type=int, default=2000)
    ap.add_argument("--methods", default="amortized,sga,map,ste,unoise,danneal")
    ap.add_argument(
        "--bb", action="store_true",
        help="Validate the bits-back family on an mbt2018_bb checkpoint "
        "(bb_plain/bb_no_sga/bb_sga orderings + real BB-ANS bitstream rates).",
    )
    args = ap.parse_args()
    if args.bb:
        return bb_main(args)

    from nic_tpu.infer.engine import LatentOptimizer
    from nic_tpu.infer import methods as M
    from nic_tpu.train.checkpoint import latest_step, restore_checkpoint
    from nic_tpu.train.trainer import TrainConfig, Trainer
    from nic_tpu.utils import parse_lmbda_from_runname

    lmbda = args.lmbda if args.lmbda > 0 else parse_lmbda_from_runname(args.runname)

    tc = TrainConfig(
        model="mbt2018",
        num_filters=args.num_filters,
        checkpoint_dir=args.checkpoint_dir,
        runname=args.runname,
    )
    trainer = Trainer(tc)
    step = latest_step(trainer.save_dir)
    if step is None:
        raise SystemExit(f"no checkpoint under {trainer.save_dir}")
    _, params = trainer.restore_params_only()
    print(f"restored step {step} from {trainer.save_dir}")

    from nic_tpu.models.mbt2018 import MeanScaleHyperprior

    model = MeanScaleHyperprior(
        num_filters=args.num_filters, compute_dtype=jnp.bfloat16
    )
    opt = LatentOptimizer(model, params)

    X = np.load(args.eval_npy).astype(np.float32)
    if X.max() > 1.5:
        X = X / 255.0
    print(f"eval batch {X.shape}, lambda={lmbda}")

    specs = {
        "sga": M.SGA,
        "map": M.MAP,
        "ste": M.STE,
        "unoise": M.UNOISE,
        "danneal": M.DANNEAL,
    }
    results = {}
    for name in args.methods.split(","):
        t0 = time.time()
        if name == "amortized":
            r = opt.eval_amortized(X)
        else:
            spec = specs[name].replace(iterations=args.its)
            r = opt.optimize(X, lmbda=lmbda, method=spec, seed=0)
        bpp = float(np.mean(r["est_bpp"]))
        psnr = float(np.mean(r["psnr"]))
        # The objective all methods optimize: lambda*255^2*float-MSE + bpp.
        mse_float = np.mean(r["mse"]) / 255.0 ** 2
        rd = float(lmbda * 255.0 ** 2 * mse_float + bpp)
        results[name] = dict(
            bpp=bpp, psnr=psnr, rd_loss=rd,
            msssim=float(np.mean(r["msssim"])), secs=time.time() - t0,
        )
        print(
            f"{name:10s} bpp={bpp:.4f} psnr={psnr:6.3f} rd_loss={rd:.4f} "
            f"msssim={results[name]['msssim']:.4f} ({results[name]['secs']:.0f}s)"
        )

    ok = True
    if "sga" in results and "amortized" in results:
        for name, r in results.items():
            if name in ("amortized", "sga"):
                continue
            if r["rd_loss"] > results["amortized"]["rd_loss"] + 1e-3:
                print(f"WARN: {name} did not improve over amortized")
        gain = results["amortized"]["rd_loss"] - results["sga"]["rd_loss"]
        print(f"SGA rd_loss gain over amortized: {gain:.4f}")
        if gain <= 0:
            ok = False
            print("FAIL: SGA did not improve the RD objective")
        best_iter = min(
            (r["rd_loss"], n) for n, r in results.items() if n != "amortized"
        )
        print(f"best iterative method: {best_iter[1]} ({best_iter[0]:.4f})")
    out = os.path.join(trainer.save_dir, "VALIDATION.json")
    with open(out, "w") as f:
        json.dump(dict(step=step, lmbda=lmbda, results=results), f, indent=2)
    print(("PASS" if ok else "FAIL") + f" -> {out}")
    return 0 if ok else 1


def bb_main(args):
    """Bits-back family validation (paper Table 1, M2/A5/A6 rows): each bb
    method's net-rate objective improves with optimization, and the real
    BB-ANS bitstream rates track the estimates."""
    import jax

    from nic_tpu.coding.bb_codec import BitsBackCodec
    from nic_tpu.infer.bb import BB_NO_SGA, BB_PLAIN, BB_SGA, BBLatentOptimizer
    from nic_tpu.models.mbt2018_bb import BitsBackHyperprior
    from nic_tpu.train.checkpoint import latest_step
    from nic_tpu.train.trainer import TrainConfig, Trainer
    from nic_tpu.utils import parse_lmbda_from_runname

    lmbda = args.lmbda if args.lmbda > 0 else parse_lmbda_from_runname(args.runname)
    tc = TrainConfig(
        model="mbt2018_bb",
        num_filters=args.num_filters,
        checkpoint_dir=args.checkpoint_dir,
        runname=args.runname,
    )
    trainer = Trainer(tc)
    step = latest_step(trainer.save_dir)
    if step is None:
        raise SystemExit(f"no checkpoint under {trainer.save_dir}")
    _, params = trainer.restore_params_only()
    print(f"restored step {step} from {trainer.save_dir}")

    model = BitsBackHyperprior(
        num_filters=args.num_filters, compute_dtype=jnp.bfloat16
    )
    opt = BBLatentOptimizer(model, params)
    codec = BitsBackCodec(
        BitsBackHyperprior(num_filters=args.num_filters), params
    )

    X = np.load(args.eval_npy).astype(np.float32)
    if X.max() > 1.5:
        X = X / 255.0
    print(f"eval batch {X.shape}, lambda={lmbda}")

    specs = {"bb_plain": BB_PLAIN, "bb_no_sga": BB_NO_SGA, "bb_sga": BB_SGA}
    results = {}
    last = {}
    for name in specs:
        t0 = time.time()
        r = opt.optimize(X, lmbda, spec=specs[name], seed=0)
        net_bpp = float(np.mean(r["est_bpp"]))
        psnr = float(np.mean(r["psnr"]))
        mse_float = np.mean(r["mse"]) / 255.0 ** 2
        rd = float(lmbda * 255.0 ** 2 * mse_float + net_bpp)
        results[name] = dict(
            net_bpp=net_bpp, psnr=psnr, rd_loss=rd,
            bpp_back=float(np.mean(r["est_bpp_back"])), secs=time.time() - t0,
        )
        last[name] = r
        print(
            f"{name:10s} net_bpp={net_bpp:.4f} psnr={psnr:6.3f} rd_loss={rd:.4f} "
            f"bpp_back={results[name]['bpp_back']:.4f} "
            f"({results[name]['secs']:.0f}s)"
        )

    # Real bitstreams: amortized posterior (bb_plain) and optimized
    # posterior (bb_sga, via coded deltas). Net actual rates vs estimates.
    num_pixels = float(np.prod(X.shape[:3]))
    blob_p, info_p = codec.compress(X, seed=0)
    _, ok_p = codec.decompress(blob_p)
    r = last["bb_sga"]
    blob_o, info_o = codec.compress_optimized(
        X, r["y"], r["z_mean"], r["z_logvar"], seed=0
    )
    _, ok_o = codec.decompress_optimized(blob_o)
    print(
        f"bb_plain  actual net {info_p['net_bpp']:.4f} bpp "
        f"(est {results['bb_plain']['net_bpp']:.4f}), bits recovered: {ok_p}"
    )
    print(
        f"bb_sga    actual net {info_o['net_bpp']:.4f} bpp incl. "
        f"{info_o['delta_bpp']:.4f} posterior-delta overhead "
        f"(est {results['bb_sga']['net_bpp']:.4f}), bits recovered: {ok_o}"
    )

    ok = (
        ok_p and ok_o
        and results["bb_sga"]["rd_loss"] < results["bb_plain"]["rd_loss"]
        and results["bb_no_sga"]["net_bpp"] < results["bb_plain"]["net_bpp"] + 1e-4
    )
    out = os.path.join(trainer.save_dir, "VALIDATION.json")
    with open(out, "w") as f:
        json.dump(
            dict(step=step, lmbda=lmbda, results=results,
                 actual=dict(bb_plain_net_bpp=info_p["net_bpp"],
                             bb_sga_net_bpp=info_o["net_bpp"],
                             bb_sga_delta_bpp=info_o["delta_bpp"])),
            f, indent=2,
        )
    print(("PASS" if ok else "FAIL") + f" -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
