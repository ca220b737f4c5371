"""End-to-end demo on synthetic data (no external datasets needed).

Trains a small hyperprior, then runs: amortized compression with a real
bitstream, decompression, and SGA iterative inference — printing the RD
numbers side by side. Runs on CPU or TPU.

    PYTHONPATH=. python scripts/demo.py [--steps 1500] [--num_filters 16]
"""

import argparse
import sys
import tempfile

import numpy as np


def synthetic_images(rng, n, size=64):
    imgs = []
    for _ in range(n):
        xx, yy = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size))
        img = np.zeros((size, size, 3), np.float32)
        for c in range(3):
            a, b, ph = rng.uniform(0.5, 3, 3)
            img[..., c] = 0.5 + 0.4 * np.sin(a * xx * 3 + ph) * np.cos(b * yy * 3)
        imgs.append(np.clip(img, 0, 1))
    return np.stack(imgs)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--num_filters", type=int, default=16)
    parser.add_argument("--lmbda", type=float, default=0.03)
    parser.add_argument("--sga_its", type=int, default=500)
    args = parser.parse_args()

    from nic_tpu.coding.codec import HyperpriorCodec
    from nic_tpu.infer import SGA, LatentOptimizer
    from nic_tpu.train.trainer import TrainConfig, Trainer

    rng = np.random.default_rng(0)
    train_imgs = synthetic_images(rng, 64)
    test_imgs = synthetic_images(np.random.default_rng(99), 2)

    print(f"== training mbt2018 (nf={args.num_filters}, {args.steps} steps) ==")
    cfg = TrainConfig(
        model="mbt2018",
        num_filters=args.num_filters,
        lmbda=args.lmbda,
        batchsize=8,
        patchsize=64,
        last_step=args.steps,
        main_lr=4e-4,
        checkpoint_dir=tempfile.mkdtemp(prefix="nic_tpu_demo_"),
        log_every=200,
        save_checkpoint_secs=10_000,
    )
    trainer = Trainer(cfg)

    def batches():
        while True:
            yield train_imgs[rng.integers(0, len(train_imgs), cfg.batchsize)]

    state = trainer.fit(batches(), verbose=True)
    params = state.params

    print("\n== amortized compression with real entropy coding ==")
    codec = HyperpriorCodec(trainer.model, params)
    blob, out = codec.compress(test_imgs)
    x_hat = codec.decompress(blob)
    num_pixels = test_imgs.shape[0] * test_imgs.shape[1] * test_imgs.shape[2]
    actual_bpp = len(blob) * 8 / num_pixels
    mse = np.mean((test_imgs - x_hat) ** 2) * 255 ** 2
    psnr = 10 * np.log10(255 ** 2 / mse)
    print(f"bitstream: {len(blob)} bytes -> {actual_bpp:.4f} bpp, decode PSNR {psnr:.2f} dB")

    print(f"\n== SGA iterative inference ({args.sga_its} its) ==")
    opt = LatentOptimizer(trainer.model, params)
    base = opt.eval_amortized(test_imgs)
    res = opt.optimize(test_imgs, args.lmbda, method=SGA.replace(iterations=args.sga_its))
    print(f"{'':>12} {'bpp':>8} {'PSNR':>8} {'RD loss':>9}")
    rd_b = args.lmbda * base["mse"].mean() + base["est_bpp"].mean()
    rd_o = args.lmbda * res["mse"].mean() + res["est_bpp"].mean()
    print(f"{'amortized':>12} {base['est_bpp'].mean():8.4f} {base['psnr'].mean():8.2f} {rd_b:9.4f}")
    print(f"{'SGA':>12} {res['est_bpp'].mean():8.4f} {res['psnr'].mean():8.2f} {rd_o:9.4f}")
    improvement = (rd_b - rd_o) / rd_b * 100
    print(f"SGA improves the RD objective by {improvement:.1f}%")

    print("\n== real bitstream for the SGA latents (beyond the reference) ==")
    blob2 = codec.compress_optimized(res["y"], res["z"], test_imgs.shape[1:3])
    x_hat2 = codec.decompress_optimized(blob2)
    mse2 = np.mean((test_imgs - x_hat2) ** 2) * 255 ** 2
    print(
        f"bitstream: {len(blob2)} bytes -> {len(blob2)*8/num_pixels:.4f} bpp, "
        f"decode PSNR {10*np.log10(255**2/mse2):.2f} dB"
    )


if __name__ == "__main__":
    sys.exit(main())
