"""Harvest real photographic texture patches from package-bundled assets.

The environment has zero egress, so no natural-image corpus (Kodak/CLIC)
can be fetched. But the installed simulation packages (dm_control,
gymnasium_robotics) bundle real PHOTOGRAPHIC textures — grass, sky, wood,
marble, stone, metal, mosaic. Crops of those carry the phase-coherent
high-frequency structure that purely synthetic (random-phase Gaussian)
textures cannot: natural images are sparse/kurtotic in wavelet bands,
random-phase fields are not, which is exactly why the synth2 corpus
measures ~5 dB harder than Kodak for JPEG at equal rate (VALIDATION.md
round-4 difficulty analysis).

Selection is an explicit whitelist (a statistical filter was tried first
and favored UI screenshots/logos — text has the most kurtotic gradients
of all). The three real PHOTOS used by data_real/eval_photos.npy
(china/flower/grace_hopper) are deliberately NOT harvested: they are the
held-out real-photo eval set and must not leak into training material.

Writes data_synth3/textures.npz: uint8 [N,256,256,3] patches, multi-scale
crops per source, used by make_synthetic_corpus.py --style photo2 as
occluder fills.

Usage: python scripts/harvest_textures.py [--out data_synth3/textures.npz]
"""

import argparse
import glob
import os
import site

import numpy as np
from PIL import Image

PATCH = 256

# Basenames of photographic texture assets (montage-reviewed by hand).
WHITELIST = [
    "OutdoorGrassFloorD.png",   # grass
    "OutdoorSkybox2048.png",    # sky/clouds (cube-map cross; black corners rejected below)
    "skin_texture.png",         # fur
    "darkwood.png",
    "foil.png",                 # crinkled foil
    "marble.png",
    "silverRaw.png",            # hammered metal
    "skin.png",                 # sand-like
    "wood.png",
    "marble1.png",
    "metal1.png",               # concrete
    "tile1.png",                # blue mosaic
    "white_marble_tile.png",
    "white_marble_tile2.png",
    "wood1.png",
]
# Round-5 HOLDOUT library (ADVICE r4 medium: the synth3 eval shared its
# texture sources with the training corpus). These sources are fully
# DISJOINT from WHITELIST above, so an eval set built from them shares no
# texture content with anything the synth3 models trained on. They are
# mostly game-art rather than photographic (the photographic well in
# site-packages is dry after the 15 above); difficulty is recalibrated by
# the JPEG anchor + subset curation, and the residual realism difference
# is exactly the generalization axis the synth4 experiment probes.
# china/flower/grace_hopper stay excluded (the real-photo eval set).
HOLDOUT_WHITELIST = [
    "tennis_ball.png",            # real macro photo: ball fuzz
    "fist.png",                   # real photo: skin/arm (pygame examples)
    "arraydemo.bmp",              # marbled water-like texture
    "pitch_l.png",                # soccer pitch: striped grass
    "floor_purple_d.png",         # labmaze game floor (dot pattern)
    "floor_orange_d.png",
    "floor_blue_d.png",           # woven pattern
    "floor_red_d.png",
    "wall_yellow_bright_d.png",   # brick pattern
    "up.png",                     # labmaze sky_01 cube face (clouds)
]

# Crop scales: a `scale`-sized square crop resized to PATCH. >1 zooms out
# (finer apparent detail), <1 zooms in (coarser).
SCALES = [128, 256, 384, 512]


def find_whitelisted(names):
    found = {}
    for root in site.getsitepackages():
        for ext in ("*.png", "*.bmp"):
            for p in glob.glob(os.path.join(root, "**", ext), recursive=True):
                b = os.path.basename(p)
                # sky_01/up.png specifically (sky_02 is near-empty).
                if b == "up.png" and "sky_01" not in p:
                    continue
                if b in names and b not in found:
                    found[b] = p
    return found


def usable(crop: np.ndarray) -> bool:
    """Reject cube-map padding / black borders / flat regions. The skybox
    is a cross-layout cube map; crops straddling a face edge contain
    near-black padding bands, so any nontrivial near-black fraction
    disqualifies the crop."""
    g = crop.mean(axis=-1)
    # Chroma-key rejection: pygame's fist.png photographs an arm on a
    # saturated solid-blue screen; crops should be the skin, not the key.
    c = crop.astype(np.float32)
    bluescreen = ((c[..., 2] > 180) & (c[..., 0] < 90)).mean()
    return (
        g.mean() > 18.0 and g.std() > 6.0 and (g < 10.0).mean() < 0.01
        and bluescreen < 0.10
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data_synth3/textures.npz")
    ap.add_argument("--per_source", type=int, default=12)
    ap.add_argument(
        "--holdout", action="store_true",
        help="Harvest the HOLDOUT_WHITELIST (sources disjoint from the "
        "synth3 training library) instead of WHITELIST.",
    )
    args = ap.parse_args()

    wl = HOLDOUT_WHITELIST if args.holdout else WHITELIST
    rng = np.random.default_rng(0)
    found = find_whitelisted(wl)
    missing = sorted(set(wl) - set(found))
    if missing:
        print(f"note: not found on this host: {missing}")

    patches, sources = [], []
    for name, path in sorted(found.items()):
        img = np.asarray(Image.open(path).convert("RGB"))
        h, w = img.shape[:2]
        kept, tries = 0, 0
        while kept < args.per_source and tries < args.per_source * 12:
            tries += 1
            scale = int(rng.choice([s for s in SCALES if s <= min(h, w)]))
            top = int(rng.integers(0, h - scale + 1))
            left = int(rng.integers(0, w - scale + 1))
            crop = img[top:top + scale, left:left + scale]
            if not usable(crop):
                continue
            if scale != PATCH:
                crop = np.asarray(
                    Image.fromarray(crop).resize(
                        (PATCH, PATCH), Image.Resampling.LANCZOS
                    )
                )
            patches.append(crop.astype(np.uint8))
            sources.append(name)
            kept += 1
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(
        args.out,
        patches=np.stack(patches).astype(np.uint8),
        sources=np.asarray(sources),
    )
    from collections import Counter

    print(f"wrote {args.out}: {len(patches)} patches from "
          f"{len(set(sources))} sources")
    for name, cnt in Counter(sources).most_common():
        print(f"  {cnt:3d}  {name}")


if __name__ == "__main__":
    main()
