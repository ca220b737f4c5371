"""Generate a synthetic natural-image-like corpus for RD validation runs.

No image dataset ships in this environment (zero egress), so RD-curve
validation uses synthetic images engineered toward photographic statistics:

  v1 (--style grf): Gaussian-random-field images with a 1/f^alpha power
  spectrum composited with smooth-shaded rectangles/ellipses for edges.
  v2 (--style photo, default): adds the structures photos have beyond the
  power spectrum — oriented band-pass textures (Gabor-like, masked into
  regions), multi-scale occluders (large objects down to small detail,
  scale count ~ log of image size), polygonal shapes, a global illumination
  gradient, and fine sensor-like grain. Kurtotic wavelet marginals and
  piecewise-smooth regions are the statistics hyperprior models exploit on
  photos; matching them tightens the absolute-RD comparison against the
  paper's Kodak curves (VERDICT r1 item 1).
  v3 (--style photo2 --textures data_synth3/textures.npz): Kodak-difficulty
  -matched scenes. The JPEG anchor probe (scripts/jpeg_anchor.py) showed
  the v2 corpus is ~4.5 dB harder than Kodak at matched rate — noise
  textures carry far more incompressible high-frequency energy than real
  photographs. v3 composites piecewise-smooth scenes whose object fills
  are REAL photographic texture crops (scripts/harvest_textures.py),
  with depth-of-field blur (a subset of objects in focus), feathered
  occlusion boundaries, illumination gradients and mild grain. Difficulty
  is tuned so JPEG's RD curve on the eval set lands inside the published
  JPEG-on-Kodak band (see jpeg_anchor.KODAK_JPEG_BAND).

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


def oriented_texture(rng, h, w):
    """Band-pass oriented noise (Gabor-like): white noise filtered by an
    annular Fourier mask with an orientation-selective angular window."""
    f0 = rng.uniform(0.04, 0.25)       # center frequency (cycles/px)
    bw = f0 * rng.uniform(0.4, 1.0)    # radial bandwidth
    theta0 = rng.uniform(0, np.pi)
    ang_bw = rng.uniform(0.3, 1.2)     # angular bandwidth (radians)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    theta = np.arctan2(fy, fx)
    d_theta = np.angle(np.exp(2j * (theta - theta0))) / 2.0  # pi-periodic
    mask = np.exp(-0.5 * ((f - f0) / bw) ** 2) * np.exp(
        -0.5 * (d_theta / ang_bw) ** 2
    )
    spec = mask * (rng.standard_normal((h, w)) + 1j * rng.standard_normal((h, w)))
    tex = np.fft.ifft2(spec).real
    s = tex.std() + 1e-9
    return tex / s


def region_mask(rng, yy, xx, h, w, scale):
    """Random ellipse / rectangle / convex polygon at a given scale."""
    cy, cx = rng.integers(0, h), rng.integers(0, w)
    ry = max(2, int(rng.uniform(0.5, 1.5) * scale))
    rx = max(2, int(rng.uniform(0.5, 1.5) * scale))
    kind = rng.random()
    if kind < 0.4:
        return ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
    if kind < 0.7:
        return (np.abs(yy - cy) < ry) & (np.abs(xx - cx) < rx)
    # Convex polygon: intersection of random half-planes around the center.
    mask = np.ones((h, w), bool)
    for _ in range(rng.integers(3, 6)):
        phi = rng.uniform(0, 2 * np.pi)
        d = rng.uniform(0.5, 1.0) * (ry + rx) / 2
        mask &= (np.cos(phi) * (yy - cy) + np.sin(phi) * (xx - cx)) < d
    return mask


def synth_image_photo(rng, h, w):
    """Photographic-statistics image: 1/f base + multi-scale piecewise-
    smooth occluders + oriented textures + illumination + grain."""
    alpha = rng.uniform(1.6, 2.4)
    luma = grf(rng, h, w, alpha)
    img = np.stack([luma] * 3, axis=-1)
    for c in range(3):
        img[..., c] = np.clip(
            img[..., c] + 0.2 * (grf(rng, h, w, alpha) - 0.5), 0, 1
        )
    yy, xx = np.mgrid[0:h, 0:w]

    # Multi-scale occluders: a few large objects, more at each finer scale.
    n_scales = max(2, int(np.log2(min(h, w))) - 4)  # 256 -> 4 scales
    for s in range(n_scales):
        scale = min(h, w) // (3 * 2 ** s)
        if scale < 3:
            break
        for _ in range(rng.integers(1, 3) * 2 ** s):
            mask = region_mask(rng, yy, xx, h, w, scale)
            color = rng.random(3)
            shade = 0.6 + 0.4 * grf(rng, h, w, 2.0)
            blend = rng.uniform(0.65, 1.0)  # partial opacity ~ soft edges
            for c in range(3):
                img[..., c] = np.where(
                    mask,
                    blend * color[c] * shade + (1 - blend) * img[..., c],
                    img[..., c],
                )

    # Oriented textures masked into 1-3 regions (fabric/grass/wood analogs).
    for _ in range(rng.integers(1, 4)):
        tex = oriented_texture(rng, h, w)
        tmask = region_mask(rng, yy, xx, h, w, min(h, w) // rng.integers(2, 5))
        amp = rng.uniform(0.03, 0.12)
        for c in range(3):
            img[..., c] = np.where(
                tmask, np.clip(img[..., c] + amp * tex, 0, 1), img[..., c]
            )

    # Global illumination gradient (vignette/directional light).
    gy, gx = rng.uniform(-1, 1, 2)
    illum = 1.0 + 0.25 * (gy * (yy / h - 0.5) + gx * (xx / w - 0.5))
    img *= illum[..., None]

    # Fine sensor-like grain (keeps the high-frequency tail realistic).
    img += rng.normal(0, rng.uniform(0.002, 0.008), img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _texture_fill(rng, textures, h, w, zoom_range=(0.8, 3.0)):
    """An (h, w, 3) float field tiled from a random real-texture crop.

    zoom > 1 magnifies the texture (smoother content, fewer cycles/px —
    the main difficulty knob); mirror tiling avoids seam discontinuities.
    """
    tex = textures[rng.integers(0, len(textures))].astype(np.float32) / 255.0
    if rng.random() < 0.5:
        tex = tex[:, ::-1]
    tex = np.rot90(tex, k=int(rng.integers(0, 4)))
    zoom = rng.uniform(*zoom_range)
    th, tw = tex.shape[:2]
    crop = max(16, min(int(round(min(th, tw) / zoom)), min(th, tw)))
    ty = int(rng.integers(0, th - crop + 1))
    tx = int(rng.integers(0, tw - crop + 1))
    patch = tex[ty:ty + crop, tx:tx + crop]
    # Resample the crop to a tile whose size covers a good fraction of the
    # region, then mirror-tile to (h, w).
    from PIL import Image

    tile = int(np.clip(crop * zoom, 32, 1024))
    patch = np.asarray(
        Image.fromarray((patch * 255).astype(np.uint8)).resize(
            (tile, tile), Image.Resampling.LANCZOS
        ),
        dtype=np.float32,
    ) / 255.0
    reps_y = -(-h // tile) + 1
    reps_x = -(-w // tile) + 1
    mirrored = np.concatenate([patch, patch[::-1]], axis=0)
    mirrored = np.concatenate([mirrored, mirrored[:, ::-1]], axis=1)
    big = np.tile(mirrored, (max(1, (reps_y + 1) // 2), max(1, (reps_x + 1) // 2), 1))
    oy = int(rng.integers(0, max(1, big.shape[0] - h + 1)))
    ox = int(rng.integers(0, max(1, big.shape[1] - w + 1)))
    return big[oy:oy + h, ox:ox + w]


def synth_image_photo2(rng, h, w, textures, cfg=None):
    """Kodak-difficulty scene: real-texture object fills + depth of field.

    cfg knobs (defaults tuned via scripts/jpeg_anchor.py):
      n_objects     number of occluding objects
      p_focus       probability an object is in focus (sharp texture)
      dof_sigma     blur sigma range for out-of-focus objects
      grain         sensor grain sigma range
      base_zoom     texture zoom range (higher = smoother fills)
    """
    from scipy.ndimage import gaussian_filter

    # Defaults = the JPEG-anchor-calibrated knob set: with these, libjpeg's
    # RD curve on a 512x768 eval set lands inside KODAK_JPEG_BAND at 0.5 /
    # 0.75 / 1.0 bpp on multiple seeds (scripts/jpeg_anchor.py, round 4).
    cfg = cfg or {}
    n_objects = cfg.get("n_objects", (6, 14))
    p_focus = cfg.get("p_focus", 0.8)
    dof_sigma = cfg.get("dof_sigma", (1.0, 2.5))
    grain = cfg.get("grain", (0.004, 0.010))
    base_zoom = cfg.get("base_zoom", (0.5, 1.4))
    bg_blur = cfg.get("bg_blur", (1.5, 6.0))
    bg_zoom = cfg.get("bg_zoom", (1.0, 2.5))
    psf = cfg.get("psf", (0.2, 0.45))
    ref = min(h, w)

    def blur(img, sigma):
        if sigma <= 0.05:
            return img
        return gaussian_filter(img, sigma=(sigma, sigma, 0))

    # Background: heavily defocused texture or smooth sky-like gradient,
    # always low-frequency (Kodak frames usually have one).
    if rng.random() < 0.65:
        bg = _texture_fill(rng, textures, h, w, zoom_range=bg_zoom)
        bg = blur(bg, rng.uniform(*bg_blur))
    else:
        yy, xx = np.mgrid[0:h, 0:w]
        c0, c1 = rng.random(3), rng.random(3)
        t = ((yy / h) * rng.uniform(-1, 1) + (xx / w) * rng.uniform(-1, 1))
        t = (t - t.min()) / (np.ptp(t) + 1e-9)
        bg = c0 * (1 - t[..., None]) + c1 * t[..., None]
        bg += 0.08 * (grf(rng, h, w, 2.5)[..., None] - 0.5)
    img = np.clip(bg, 0, 1).astype(np.float32)

    yy, xx = np.mgrid[0:h, 0:w]
    lo, hi = n_objects
    for _ in range(int(rng.integers(lo, hi))):
        scale = int(ref * rng.uniform(0.12, 0.45))
        mask = region_mask(rng, yy, xx, h, w, scale).astype(np.float32)
        if mask.mean() < 1e-3:
            continue
        # Feathered boundary: real occlusion edges span ~1-2 px.
        mask = gaussian_filter(mask, sigma=rng.uniform(0.6, 1.8))[..., None]
        fill = _texture_fill(rng, textures, h, w, zoom_range=base_zoom)
        # Per-object color/brightness jitter + smooth shading.
        gain = 0.55 + 0.7 * rng.random(3)
        shade = 0.7 + 0.3 * grf(rng, h, w, 2.0)
        fill = np.clip(fill * gain * shade[..., None], 0, 1)
        if rng.random() > p_focus:
            fill = blur(fill, rng.uniform(*dof_sigma))
        img = mask * fill + (1 - mask) * img

    # Global illumination gradient.
    gy, gx = rng.uniform(-1, 1, 2)
    illum = 1.0 + 0.18 * (gy * (yy / h - 0.5) + gx * (xx / w - 0.5))
    img = img * illum[..., None].astype(np.float32)

    # Lens/demosaic PSF + sensor grain.
    img = blur(img, rng.uniform(*psf))
    img = img + rng.normal(0, rng.uniform(*grain), img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def synth_image_photo3(rng, h, w, textures, cfg=None):
    """Held-out-generator scene (round 5): statistics deliberately DIFFERENT
    from photo2 so synth4 evals probe cross-generator generalization
    (VERDICT r4 missing #1), while remaining JPEG-anchor calibratable.

    Structural differences vs photo2:
      - scene partition is a warped-Voronoi mosaic (organic wavy cell
        boundaries), not a background + stacked ellipse/rect occluders;
      - focus follows a per-cell DEPTH RANK (continuous blur gradient),
        not an independent in/out-of-focus coin per object;
      - cells may be smooth shaded gradients, not only texture fills;
      - foreground occluders cast soft drop shadows.

    cfg knobs (JPEG-anchor calibration): n_cells, warp_amp, p_texture,
    depth_blur, p_sharp, n_fg, grain, base_zoom, psf, feather.
    """
    from scipy.ndimage import gaussian_filter

    cfg = cfg or {}
    n_cells = cfg.get("n_cells", (6, 13))
    warp_amp = cfg.get("warp_amp", (6.0, 28.0))
    p_texture = cfg.get("p_texture", 0.75)
    depth_blur = cfg.get("depth_blur", (1.0, 3.5))
    p_sharp = cfg.get("p_sharp", 0.55)
    n_fg = cfg.get("n_fg", (0, 3))
    grain = cfg.get("grain", (0.004, 0.010))
    base_zoom = cfg.get("base_zoom", (0.5, 1.4))
    psf = cfg.get("psf", (0.2, 0.45))
    feather = cfg.get("feather", (0.8, 2.0))
    ref = min(h, w)

    def blur(img, sigma):
        if sigma <= 0.05:
            return img
        ax = (sigma, sigma, 0) if img.ndim == 3 else sigma
        return gaussian_filter(img, sigma=ax)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # Warped coordinates: smooth random displacement field -> wavy borders.
    amp = rng.uniform(*warp_amp) * ref / 512.0
    wy = yy + amp * (grf(rng, h, w, 2.6).astype(np.float32) - 0.5) * 4.0
    wx = xx + amp * (grf(rng, h, w, 2.6).astype(np.float32) - 0.5) * 4.0

    K = int(rng.integers(n_cells[0], n_cells[1] + 1))
    seeds = np.stack([rng.uniform(0, h, K), rng.uniform(0, w, K)], axis=1)
    # Anisotropic metric per seed: stretches cells into elongated shapes.
    aniso = rng.uniform(0.5, 2.0, (K, 2)).astype(np.float32)
    d = np.stack(
        [
            ((wy - sy) * ay) ** 2 + ((wx - sx) * ax_) ** 2
            for (sy, sx), (ay, ax_) in zip(seeds, aniso)
        ]
    )
    labels = np.argmin(d, axis=0)

    # Per-cell fills, composited back-to-front by depth rank with
    # rank-dependent defocus. A p_sharp fraction of nearest cells is sharp.
    order = rng.permutation(K)  # order[i] = depth rank of cell i (0=near)
    img = np.zeros((h, w, 3), np.float32)
    wsum = np.zeros((h, w, 1), np.float32)
    sig_f = rng.uniform(*feather)
    for k in range(K):
        mask = gaussian_filter((labels == k).astype(np.float32), sig_f)
        if mask.max() < 1e-3:
            continue
        rank = order[k] / max(1, K - 1)
        if rng.random() < p_texture:
            fill = _texture_fill(rng, textures, h, w, zoom_range=base_zoom)
            gain = 0.55 + 0.7 * rng.random(3)
            shade = 0.7 + 0.3 * grf(rng, h, w, 2.0)
            fill = np.clip(fill * gain * shade[..., None], 0, 1)
        else:
            c0, c1 = rng.random(3), rng.random(3)
            t = ((yy / h) * rng.uniform(-1, 1) + (xx / w) * rng.uniform(-1, 1))
            t = (t - t.min()) / (np.ptp(t) + 1e-9)
            fill = (c0 * (1 - t[..., None]) + c1 * t[..., None]).astype(
                np.float32
            )
            fill += 0.06 * (grf(rng, h, w, 2.5)[..., None] - 0.5)
            fill = np.clip(fill, 0, 1)
        if rank > p_sharp:
            # Depth-of-field: blur grows with normalized rank past the
            # in-focus fraction.
            t_blur = (rank - p_sharp) / max(1e-6, 1 - p_sharp)
            fill = blur(fill, depth_blur[0] + t_blur * (depth_blur[1] - depth_blur[0]))
        img += mask[..., None] * fill
        wsum += mask[..., None]
    img = img / np.maximum(wsum, 1e-6)

    # Foreground occluders with soft drop shadows.
    for _ in range(int(rng.integers(n_fg[0], n_fg[1] + 1))):
        scale = int(ref * rng.uniform(0.10, 0.30))
        mask = region_mask(rng, yy.astype(int), xx.astype(int), h, w, scale)
        mask = gaussian_filter(mask.astype(np.float32), rng.uniform(0.6, 1.5))
        if mask.max() < 1e-3:
            continue
        # Shadow: the mask shifted down-right, blurred, darkens the scene.
        sh = np.roll(mask, (int(ref * 0.015), int(ref * 0.015)), (0, 1))
        sh = gaussian_filter(sh, 3.0)
        img *= (1.0 - 0.35 * sh)[..., None]
        fill = _texture_fill(rng, textures, h, w, zoom_range=base_zoom)
        gain = 0.55 + 0.7 * rng.random(3)
        fill = np.clip(fill * gain, 0, 1)
        img = mask[..., None] * fill + (1 - mask[..., None]) * img

    # Illumination: radial vignette + directional gradient (stronger and
    # differently shaped than photo2's purely directional term).
    cy, cx = rng.uniform(0.3, 0.7) * h, rng.uniform(0.3, 0.7) * w
    r2 = ((yy - cy) / h) ** 2 + ((xx - cx) / w) ** 2
    gy, gx = rng.uniform(-1, 1, 2)
    illum = (1.0 - rng.uniform(0.05, 0.25) * r2) * (
        1.0 + 0.12 * (gy * (yy / h - 0.5) + gx * (xx / w - 0.5))
    )
    img = img * illum[..., None].astype(np.float32)

    img = blur(img, rng.uniform(*psf))
    img = img + rng.normal(0, rng.uniform(*grain), img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--train", type=int, default=400)
    ap.add_argument("--eval", type=int, default=8)
    ap.add_argument("--train_hw", default="256x256",
                    help="Training image size HxW. Larger than the training "
                    "patchsize gives random-crop variety (256x256 images "
                    "with patchsize 256 are seen whole every epoch).")
    ap.add_argument("--prefix", default="img_",
                    help="Training filename prefix; use a distinct prefix "
                    "(e.g. imgL_) to ADD images to an existing corpus. The "
                    "round-2 extension was: --train 300 --train_hw 384x384 "
                    "--prefix imgL_ --seed 42 --eval 0.")
    ap.add_argument("--eval_hw", default="256x384",
                    help="Eval image size HxW, e.g. 256x384 (Kodak-ish "
                    "aspect) or 576x768 (Tecnick-analog large images).")
    ap.add_argument("--eval_only", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--style", choices=("photo", "grf", "photo2", "photo3"),
                    default="photo")
    ap.add_argument("--textures", default="data_synth3/textures.npz",
                    help="Real-texture library for --style photo2 "
                    "(from scripts/harvest_textures.py).")
    ap.add_argument("--photo2_cfg", default="",
                    help="JSON dict overriding synth_image_photo2 cfg knobs "
                    "(n_objects, p_focus, dof_sigma, grain, base_zoom, "
                    "bg_blur, bg_zoom, psf) for JPEG-anchor calibration.")
    args = ap.parse_args()

    from PIL import Image

    if args.style in ("photo2", "photo3"):
        import json

        textures = np.load(args.textures)["patches"]
        cfg = json.loads(args.photo2_cfg) if args.photo2_cfg else {}
        cfg = {k: tuple(v) if isinstance(v, list) else v
               for k, v in cfg.items()}
        fn = synth_image_photo2 if args.style == "photo2" else synth_image_photo3
        gen = lambda rng, h, w: fn(rng, h, w, textures, cfg)
    else:
        gen = synth_image_photo if args.style == "photo" else synth_image
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.outdir, exist_ok=True)
    if not args.eval_only:
        th, tw = (int(v) for v in args.train_hw.split("x"))
        train_dir = os.path.join(args.outdir, "train")
        os.makedirs(train_dir, exist_ok=True)
        for i in range(args.train):
            Image.fromarray(gen(rng, th, tw)).save(
                os.path.join(train_dir, f"{args.prefix}{i:04d}.png")
            )
    n_train = 0 if args.eval_only else args.train
    if args.eval:
        eh, ew = (int(v) for v in args.eval_hw.split("x"))
        evals = np.stack([gen(rng, eh, ew) for _ in range(args.eval)])
        name = "eval.npy" if (eh, ew) == (256, 384) else f"eval_{eh}x{ew}.npy"
        np.save(os.path.join(args.outdir, name), evals)
        print(f"wrote {n_train} train pngs + {name} {evals.shape}")
    else:
        print(f"wrote {n_train} train pngs")


if __name__ == "__main__":
    main()
