"""Tests for the difficulty-calibration and checkpoint-repair utilities.

Round-4 tooling: scripts/jpeg_anchor.py (model-free eval-set difficulty
probe), scripts/select_eval_subset.py (curated subset selection), and
scripts/converge_aux.py (post-hoc quantile convergence). These gate the
BD-vs-golden comparison's validity, so they get the same coverage as the
library.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")
sys.path.insert(0, SCRIPTS)


class TestJpegAnchor:
    def test_jpeg_rd_monotone_in_quality(self):
        from jpeg_anchor import jpeg_rd

        # Smooth structured image (noise saturates JPEG's rate ceiling).
        yy, xx = np.mgrid[0:128, 0:192].astype(np.float64)
        lum = 96 + 64 * np.sin(yy / 9.0) * np.cos(xx / 13.0) + xx / 4.0
        x = np.clip(np.stack([lum, lum * 0.8, lum * 1.1], -1), 0, 255).astype(
            np.uint8
        )
        pts = [jpeg_rd(x[None], q) for q in (10, 50, 90)]
        bpps = [p[0] for p in pts]
        psnrs = [p[1] for p in pts]
        assert bpps == sorted(bpps)
        assert psnrs == sorted(psnrs)
        assert all(p > 15 for p in psnrs)

    def test_psnr_at_bpp_interpolates_and_bounds(self):
        from jpeg_anchor import psnr_at_bpp

        curve = [(10, 0.2, 25.0), (50, 0.6, 30.0), (90, 1.0, 35.0)]
        assert psnr_at_bpp(curve, 0.4) == pytest.approx(27.5)
        assert psnr_at_bpp(curve, 0.6) == pytest.approx(30.0)
        assert psnr_at_bpp(curve, 0.1) is None  # out of measured range
        assert psnr_at_bpp(curve, 1.5) is None

    def test_anchor_cli_reports_band(self, tmp_path):
        rng = np.random.default_rng(1)
        base = rng.integers(0, 256, (2, 8, 8, 3), np.uint8)
        imgs = np.repeat(np.repeat(base, 16, axis=1), 16, axis=2)
        p = tmp_path / "eval.npy"
        np.save(p, imgs)
        out = subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, "jpeg_anchor.py"), str(p),
             "--qualities", "10,50,90"],
            capture_output=True, text=True, check=True,
        ).stdout
        assert "vs Kodak JPEG band" in out
        assert "q= 50" in out


class TestSubsetSelection:
    def test_subset_score_prefers_matching_mean(self):
        from select_eval_subset import subset_score

        # Image 0: easy curve; image 1: hard curve; target in between.
        bpps = np.array([[0.2, 0.6, 1.0], [0.2, 0.6, 1.0], [0.2, 0.6, 1.0]])
        psnrs = np.array([[30.0, 35.0, 40.0],
                          [20.0, 25.0, 30.0],
                          [25.0, 30.0, 35.0]])
        targets = [(0.6, 30.0)]
        mixed = subset_score(bpps, psnrs, np.array([0, 1]), targets)
        mid = subset_score(bpps, psnrs, np.array([2]), targets)
        easy = subset_score(bpps, psnrs, np.array([0]), targets)
        assert mixed == pytest.approx(0.0)
        assert mid == pytest.approx(0.0)
        assert easy == pytest.approx(25.0)

    def test_out_of_range_penalized(self):
        from select_eval_subset import subset_score

        bpps = np.array([[0.8, 0.9, 1.0]])
        psnrs = np.array([[30.0, 31.0, 32.0]])
        # Target bpp below the curve's measured range -> fixed penalty.
        s = subset_score(bpps, psnrs, np.array([0]), [(0.5, 30.0)])
        assert s == pytest.approx(25.0)


class TestConvergeAux:
    @pytest.mark.slow
    def test_converges_and_rewrites_quantiles_only(self, tmp_path):
        """Train 2 steps at nf=8, then converge_aux drops the aux loss and
        touches only quantile leaves."""
        import json

        from PIL import Image

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 256, (256, 256, 3), np.uint8)
            ).save(img_dir / f"im{i}.png")
        ckdir = tmp_path / "ck"
        env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, "-m", "nic_tpu", "--num_filters", "8",
             "--checkpoint_dir", str(ckdir), "mbt2018", "train",
             "--train_glob", str(img_dir / "*.png"), "--patchsize", "192",
             "--batchsize", "2", "--last_step", "2"],
            env=env, check=True, capture_output=True, text=True, cwd=REPO,
        )
        run_dir = ckdir / "mbt2018-num_filters=8-lmbda=0.01"
        # Ensure an npz exists (the trainer may only write orbax at step 2).
        npzs = list(run_dir.glob("params-*.npz"))
        assert npzs, f"no params npz in {run_dir}: {list(run_dir.iterdir())}"

        import nic_tpu.train.checkpoint as ck

        _, before_params = ck.load_params_npz(str(npzs[0]))
        out = subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, "converge_aux.py"),
             str(run_dir), "--threshold", "1.0", "--steps", "3000"],
            env=env, check=True, capture_output=True, text=True, cwd=REPO,
        ).stdout
        assert "aux_loss before" in out
        _, after_params = ck.load_params_npz(str(npzs[0]))

        from flax import traverse_util

        fb = traverse_util.flatten_dict(before_params, sep="/")
        fa = traverse_util.flatten_dict(after_params, sep="/")
        assert set(fb) == set(fa)
        for k in fb:
            if "quantiles" in k:
                continue
            np.testing.assert_array_equal(fb[k], fa[k], err_msg=k)
        # And the loss reported after <= before (best-iterate guarantee).
        lines = [l for l in out.splitlines() if "aux_loss" in l]
        before_v = float(lines[0].split("=")[-1].split("(")[0])
        after_v = float(lines[-1].split("=")[-1].split("(")[0])
        assert after_v <= before_v + 1e-6


class TestBenchCalibration:
    def test_calibration_times_host_fetch(self):
        # The tunnel ACKs block_until_ready before compute finishes, so
        # _calibration_ms must time until a host fetch of the result
        # lands, and must return a positive wall time on CPU (where no
        # caching layer exists) at a dim small enough to be instant.
        sys.path.insert(0, REPO)
        import bench

        ms = bench._calibration_ms(n=2, dim=64)
        assert ms is not None and ms > 0.0
