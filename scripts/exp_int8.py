"""A/B: int8 dynamic-quantized decode-side convs vs bf16 in the SGA engine.

End-to-end (same protocol as bench.py — full chunked SGA loops on identical
inputs, best-of-N), because microbenchmarks through the tunnel lie
(NEXT.md). Also reports the RD-quality delta of the quantized forward:
int8 changes the optimization landscape slightly, so est_bpp/psnr drift is
part of the verdict, not just throughput.

Usage (real TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_int8.py \
      [--batch 24] [--its 2000] [--h 768] [--w 512] [--reps 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--its", type=int, default=2000)
    ap.add_argument("--h", type=int, default=768)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--nf", type=int, default=192)
    # Optional trained checkpoint + real eval set: makes the RD-delta
    # numbers meaningful (random init still measures throughput fine).
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--runname", default=None)
    ap.add_argument("--eval_npy", default=None)
    ap.add_argument("--only", default=None,
                    help="comma list of variants to run (bf16,int8,int8_all)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nic_tpu_jax_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    import jax.numpy as jnp
    import numpy as np

    from nic_tpu.infer.engine import LatentOptimizer
    from nic_tpu.infer.methods import SGA
    from nic_tpu.models.mbt2018 import MeanScaleHyperprior

    rng = np.random.default_rng(0)
    if args.eval_npy:
        x = np.load(args.eval_npy).astype(np.float32)
        if x.max() > 1.5:
            x = x / 255.0
        x = x[: args.batch]
    else:
        x = rng.random((args.batch, args.h, args.w, 3), np.float32)

    if args.checkpoint_dir and args.runname:
        from nic_tpu.train.trainer import TrainConfig, Trainer

        trainer = Trainer(
            TrainConfig(
                model="mbt2018",
                num_filters=args.nf,
                checkpoint_dir=args.checkpoint_dir,
                runname=args.runname,
            )
        )
        params = trainer.restore_params_only()[1]
    else:
        base = MeanScaleHyperprior(num_filters=args.nf, compute_dtype=jnp.bfloat16)
        variables = base.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), training=False
        )
        params = variables["params"]

    variants = [("bf16", None), ("int8", "int8"), ("int8_all", "int8_all")]
    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]
    results = {}
    for name, quant in variants:
        model = MeanScaleHyperprior(
            num_filters=args.nf, compute_dtype=jnp.bfloat16, quant=quant
        )
        opt = LatentOptimizer(model, params)
        warm = opt.optimize(
            x, lmbda=0.01, method=SGA.replace(iterations=400), seed=0
        )
        assert np.all(np.isfinite(warm["est_bpp"])), name
        best = float("inf")
        for s in range(1, args.reps + 1):
            t0 = time.perf_counter()
            r = opt.optimize(
                x, lmbda=0.01, method=SGA.replace(iterations=args.its), seed=s
            )
            best = min(best, time.perf_counter() - t0)
        results[name] = dict(
            secs=best,
            images_per_sec=args.batch / best,
            est_bpp=float(np.mean(r["est_bpp"])),
            psnr=float(np.mean(r["psnr"])),
        )
        print(name, json.dumps(results[name]), flush=True)

    if "bf16" in results:
        base = results["bf16"]
        for name in results:
            if name == "bf16":
                continue
            print(
                json.dumps(
                    {
                        f"speedup_{name}_over_bf16": round(
                            results[name]["images_per_sec"]
                            / base["images_per_sec"], 4
                        ),
                        "dpsnr": round(results[name]["psnr"] - base["psnr"], 4),
                        "dbpp": round(
                            results[name]["est_bpp"] - base["est_bpp"], 5
                        ),
                    }
                )
            )


if __name__ == "__main__":
    main()
