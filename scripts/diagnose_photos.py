"""Diagnose the amortized-rate blowup on the real-photo eval set.

VERDICT r3 weak #6: on data_real/eval_photos.npy the lambda=0.01 model's
amortized rate (1.275 bpp) dwarfed SGA at lambda=0.003 (0.379 bpp) — a
gap far larger than on the synthetic sets. This script splits the
estimated rate per image into y/z components and reports:
  - est_y_bpp / est_z_bpp per image (is it a z-rate (hyper-latent OOD)
    blowup or a y-rate one?)
  - sigma saturation: fraction of predicted scales clamped at the scale
    table's bounds (SCALES_MIN/SCALES_MAX; mbt2018.py:45-47 in the
    reference) — saturation at the top means the hyper-synthesizer is
    predicting "maximum surprise" for OOD content
  - z magnitude stats vs a reference image from the training corpus

Runs the amortized forward pass only (no latent optimization), so it is
CPU-feasible at num_filters=192. Usage:
  python scripts/diagnose_photos.py CKPT_DIR/RUNNAME EVAL.npy [--limit N]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="checkpoint dir containing params-*.npz")
    ap.add_argument("eval_npy")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out", default="", help="Optional JSON output path.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nic_tpu import config
    from nic_tpu.models.mbt2018 import MeanScaleHyperprior
    from nic_tpu.train.checkpoint import latest_npz

    run_args = json.load(open(os.path.join(args.run_dir, "args.json")))
    nf = run_args.get("num_filters", 192)
    model = MeanScaleHyperprior(num_filters=nf)

    npz_path = latest_npz(args.run_dir)
    if npz_path is None:
        raise SystemExit(f"no params-*.npz under {args.run_dir}")
    import nic_tpu.train.checkpoint as ck
    step, params = ck.load_params_npz(npz_path)
    print(f"params: {npz_path} (step {step})")

    images = np.load(args.eval_npy)
    if args.limit:
        images = images[: args.limit]

    @jax.jit
    def forward(params, x):
        out = model.apply({"params": params}, x, training=False)
        h, w = x.shape[1:3]
        npx = h * w
        y_bits = -jnp.sum(jnp.log2(out["y_likelihoods"]), axis=(1, 2, 3))
        z_bits = -jnp.sum(jnp.log2(out["z_likelihoods"]), axis=(1, 2, 3))
        sigma = out["sigma"]
        lo = jnp.mean(sigma <= config.SCALES_MIN * 1.0001, axis=(1, 2, 3))
        hi = jnp.mean(sigma >= config.SCALES_MAX * 0.9999, axis=(1, 2, 3))
        mse = jnp.mean(
            (out["x_tilde"] * 255.0 - x.astype(jnp.float32) * 255.0) ** 2,
            axis=(1, 2, 3),
        )
        z = out["z"] if "z" in out else None
        zstat = (
            (jnp.mean(jnp.abs(z), axis=(1, 2, 3)), jnp.max(jnp.abs(z), axis=(1, 2, 3)))
            if z is not None
            else (jnp.zeros(x.shape[0]), jnp.zeros(x.shape[0]))
        )
        return dict(
            y_bpp=y_bits / npx,
            z_bpp=z_bits / npx,
            sig_lo=lo,
            sig_hi=hi,
            psnr=10 * jnp.log10(255.0**2 / mse),
            z_absmean=zstat[0],
            z_absmax=zstat[1],
        )

    rows = []
    for i, img in enumerate(images):
        x = jnp.asarray(img[None].astype(np.float32) / 255.0)
        # pad to multiple of 64 like the engine does
        h, w = x.shape[1:3]
        ph, pw = (-h) % 64, (-w) % 64
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        r = {k: float(np.asarray(v)[0]) for k, v in forward(params, x).items()}
        r["image"] = i
        rows.append(r)
        print(
            f"img{i}: y={r['y_bpp']:.3f} z={r['z_bpp']:.3f} bpp  "
            f"psnr={r['psnr']:.2f}  sigma@min={r['sig_lo']:.3f} "
            f"sigma@max={r['sig_hi']:.4f}  |z| mean={r['z_absmean']:.2f} "
            f"max={r['z_absmax']:.1f}"
        )
    tot = {
        k: float(np.mean([r[k] for r in rows]))
        for k in rows[0]
        if k != "image"
    }
    print("mean:", {k: round(v, 4) for k, v in tot.items()})
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "mean": tot, "params": npz_path}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
