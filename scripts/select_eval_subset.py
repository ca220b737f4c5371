"""Select a Kodak-difficulty-matched eval subset from candidate pools.

Single 24-image draws from the calibrated photo2 generator vary by
+-1 dB in mean JPEG PSNR at matched rate (wide per-image difficulty
spread), and the population drifts ~1 dB easier than Kodak at 0.5 bpp.
Rather than re-tuning the generator blindly, curate the eval set the way
Kodak itself is a curated set: pool N candidate images, compute each
image's JPEG (bpp, PSNR) curve, and greedily pick the fixed-size subset
whose MEAN curve interpolates closest to the centers of the published
JPEG-on-Kodak band at 0.5 / 0.75 / 1.0 bpp. The selection is by the
model-free JPEG probe only — no learned model is consulted, so the
subset is unbiased w.r.t. any codec under evaluation.

Usage:
  python scripts/select_eval_subset.py OUT.npy CAND1.npy [CAND2.npy ...]
      [--size 24] [--iters 20000]
Writes OUT.npy and prints the final anchor verdicts.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from jpeg_anchor import KODAK_JPEG_BAND, jpeg_rd  # noqa: E402

QUALITIES = (10, 20, 30, 40, 50, 65, 75, 85, 92)
TARGET_BPP = (0.5, 0.75, 1.0)


def per_image_curves(images):
    """(N, Q) bpp and (N, Q) psnr arrays, one JPEG curve per image."""
    bpps = np.zeros((len(images), len(QUALITIES)))
    psnrs = np.zeros_like(bpps)
    for i, img in enumerate(images):
        for j, q in enumerate(QUALITIES):
            bpps[i, j], psnrs[i, j] = jpeg_rd(img[None], q)
    return bpps, psnrs


def subset_score(bpps, psnrs, idx, targets):
    """Sum of squared deviations of the subset mean curve from targets."""
    mb = bpps[idx].mean(axis=0)
    mp = psnrs[idx].mean(axis=0)
    err = 0.0
    for bpp, t in targets:
        if bpp < mb[0] or bpp > mb[-1]:
            err += 25.0
            continue
        err += (np.interp(bpp, mb, mp) - t) ** 2
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("candidates", nargs="+")
    ap.add_argument("--size", type=int, default=24)
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--band_offset", type=float, default=0.0,
        help="Shift the Kodak JPEG band targets by this many dB. The "
        "Tecnick-analog 1200x1200 set targets +2.9 dB: the golden "
        "mbt2018 curves sit 2.9 dB higher on Tecnick than Kodak at "
        "matched bpp (mean over the overlapping range), and the probe "
        "assumes JPEG's content-difficulty offset matches the learned "
        "codec's.",
    )
    ap.add_argument(
        "--target_bpp", default="0.5,0.75,1.0",
        help="Comma-separated bpps at which the subset mean JPEG curve is "
        "matched to the (offset) band centers.",
    )
    args = ap.parse_args()

    pool = np.concatenate([np.load(p) for p in args.candidates])
    print(f"pool: {pool.shape[0]} candidates from {len(args.candidates)} files")
    bpps, psnrs = per_image_curves(pool)

    centers = {
        b: (lo + hi) / 2 + args.band_offset for b, lo, hi in KODAK_JPEG_BAND
    }
    target_bpp = tuple(float(v) for v in args.target_bpp.split(","))
    targets = [(b, centers[b]) for b in target_bpp]

    rng = np.random.default_rng(args.seed)
    idx = np.sort(rng.choice(pool.shape[0], args.size, replace=False))
    best = subset_score(bpps, psnrs, idx, targets)
    for _ in range(args.iters):
        out_pos = int(rng.integers(0, args.size))
        candidates_out = np.setdiff1d(np.arange(pool.shape[0]), idx)
        newcomer = int(rng.choice(candidates_out))
        trial = idx.copy()
        trial[out_pos] = newcomer
        trial = np.sort(trial)
        s = subset_score(bpps, psnrs, trial, targets)
        if s < best:
            best, idx = s, trial
    print(f"final score (sum sq dB err at {target_bpp}): {best:.4f}")

    subset = pool[idx]
    np.save(args.out, subset)
    print(f"wrote {args.out} {subset.shape} (pool indices: {idx.tolist()})")

    mb = bpps[idx].mean(axis=0)
    mp = psnrs[idx].mean(axis=0)
    off = args.band_offset
    for bpp, lo, hi in KODAK_JPEG_BAND:
        if bpp < mb[0] or bpp > mb[-1]:
            continue
        got = float(np.interp(bpp, mb, mp))
        lo, hi = lo + off, hi + off
        tag = "matched" if lo - 0.5 <= got <= hi + 0.5 else "OFF"
        print(f"  @{bpp:.2f} bpp: {got:6.2f} dB (target {lo:.1f}-{hi:.1f}) {tag}")


if __name__ == "__main__":
    main()
