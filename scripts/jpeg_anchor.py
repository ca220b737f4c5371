"""JPEG difficulty anchor for synthetic eval sets.

The absolute-RD comparison against the reference's golden Kodak curves
(/root/reference/results/kodak/*.csv) is only meaningful if the eval
content is about as hard to compress as Kodak. JPEG is a model-free
difficulty probe: sweep libjpeg qualities over an eval set, report the
(bpp, RGB-PSNR) curve, and compare it with the published JPEG-on-Kodak
band (e.g. Balle et al. 2018 fig. 1; CompressAI docs): JPEG reaches
roughly 29.5-30.5 dB at 0.5 bpp and 33-34.5 dB at 1.0 bpp on Kodak.
A set where JPEG lands >2 dB below that band is intrinsically harder
than Kodak and will understate parity; >2 dB above overstates it.

Usage: python scripts/jpeg_anchor.py EVAL.npy [--qualities 10,20,...]
Prints one line per quality plus interpolated PSNR at 0.25/0.5/1.0 bpp.
"""

import argparse
import io

import numpy as np
from PIL import Image

# Approximate published JPEG-on-Kodak band (RGB PSNR), from the baseline
# curves reproduced in learned-compression papers. (bpp, lo_dB, hi_dB).
KODAK_JPEG_BAND = [
    (0.25, 26.0, 27.5),
    (0.50, 29.5, 30.5),
    (0.75, 31.5, 32.8),
    (1.00, 33.0, 34.5),
]


def jpeg_rd(images, quality):
    """Mean (bpp, psnr) of libjpeg at `quality` over a uint8 [N,H,W,3] set."""
    bpps, psnrs = [], []
    for img in images:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=int(quality))
        nbytes = buf.tell()
        buf.seek(0)
        dec = np.asarray(Image.open(buf).convert("RGB"), dtype=np.float64)
        mse = np.mean((dec - img.astype(np.float64)) ** 2)
        psnrs.append(10 * np.log10(255.0**2 / max(mse, 1e-12)))
        bpps.append(nbytes * 8.0 / (img.shape[0] * img.shape[1]))
    return float(np.mean(bpps)), float(np.mean(psnrs))


def anchor_curve(images, qualities=(10, 20, 30, 40, 50, 65, 75, 85, 92)):
    return [(q,) + jpeg_rd(images, q) for q in qualities]


def psnr_at_bpp(curve, bpp):
    """Linear interpolation of PSNR at a given bpp along the JPEG curve."""
    xs = np.array([c[1] for c in curve])
    ys = np.array([c[2] for c in curve])
    order = np.argsort(xs)
    xs, ys = xs[order], ys[order]
    if bpp < xs[0] or bpp > xs[-1]:
        return None
    return float(np.interp(bpp, xs, ys))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("eval_npy")
    ap.add_argument("--qualities", default="10,20,30,40,50,65,75,85,92")
    ap.add_argument("--limit", type=int, default=0,
                    help="Probe only the first N images (0 = all).")
    args = ap.parse_args()

    images = np.load(args.eval_npy)
    if args.limit:
        images = images[: args.limit]
    qualities = [int(q) for q in args.qualities.split(",")]
    curve = anchor_curve(images, qualities)
    print(f"{args.eval_npy}: {images.shape[0]} images {images.shape[1:]}")
    for q, bpp, psnr in curve:
        print(f"  q={q:3d}  {bpp:6.3f} bpp  {psnr:6.2f} dB")
    print("vs Kodak JPEG band:")
    for bpp, lo, hi in KODAK_JPEG_BAND:
        got = psnr_at_bpp(curve, bpp)
        if got is None:
            verdict = "out of range"
        elif got < lo - 0.5:
            verdict = f"HARDER than Kodak by {lo - got:.1f} dB"
        elif got > hi + 0.5:
            verdict = f"EASIER than Kodak by {got - hi:.1f} dB"
        else:
            verdict = "matched"
        shown = "   -  " if got is None else f"{got:6.2f}"
        print(f"  @{bpp:.2f} bpp: {shown} dB  (Kodak {lo:.1f}-{hi:.1f})  {verdict}")


if __name__ == "__main__":
    main()
