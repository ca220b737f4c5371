"""Build a small REAL-PHOTOGRAPH eval batch from images bundled with the
installed packages (no network egress exists in this environment, so
Kodak/Tecnick can't be fetched; these are the only real photos on disk):

  - sklearn/datasets/images/china.jpg   (427x640, architecture/sky)
  - sklearn/datasets/images/flower.jpg  (427x640, natural macro)
  - matplotlib grace_hopper.jpg         (600x512, portrait)

Center-cropped to a common 384x512 and stacked into data_real/eval_photos.npy
(uint8, [3,384,512,3]). Caveat recorded here once: the sources are JPEGs, so
the RD points include JPEG-artifact energy — fine for relative comparisons
(amortized vs SGA vs golden-curve deltas), not a clean-capture benchmark.
"""

import os

import numpy as np
from PIL import Image


def center_crop(img: np.ndarray, h: int, w: int) -> np.ndarray:
    H, W = img.shape[:2]
    top, left = (H - h) // 2, (W - w) // 2
    return img[top:top + h, left:left + w]


def main(out="data_real/eval_photos.npy", h=384, w=512):
    import matplotlib
    import sklearn.datasets

    mpl_sample = os.path.join(
        os.path.dirname(matplotlib.__file__), "mpl-data", "sample_data"
    )
    paths = [
        os.path.join(os.path.dirname(sklearn.datasets.__file__), "images", f)
        for f in ("china.jpg", "flower.jpg")
    ] + [os.path.join(mpl_sample, "grace_hopper.jpg")]

    imgs = []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        imgs.append(center_crop(img, h, w))
        print(p, "->", imgs[-1].shape)
    batch = np.stack(imgs).astype(np.uint8)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.save(out, batch)
    print("wrote", out, batch.shape, batch.dtype)


if __name__ == "__main__":
    main()
