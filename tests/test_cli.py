"""CLI integration: train a tiny model, compress/decompress through main()."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from nic_tpu.cli.main import main


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = root / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.random((80, 80, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(data / f"img{i}.png")
    test_img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(test_img).save(root / "test.png")
    return root


def _common(workspace, script, cmd, *extra):
    return [
        script,
        "--num_filters",
        "4",
        "--checkpoint_dir",
        str(workspace / "ckpt"),
        cmd,
        *extra,
    ]


class TestCLI:
    @pytest.mark.slow  # ~49s: full train->compress->decompress; the sga
    # CLI round-trip tests below keep compress/decompress in the fast gate.
    def test_train_compress_decompress(self, workspace):
        runname = "mbt2018-num_filters=4-lmbda=0.01"
        main(
            _common(
                workspace,
                "mbt2018",
                "train",
                "--train_glob",
                str(workspace / "data" / "*.png"),
                "--patchsize",
                "64",
                "--batchsize",
                "2",
                "--last_step",
                "3",
                "--lambda",
                "0.01",
                "--preprocess_threads",
                "2",
            )
        )
        assert os.path.isdir(workspace / "ckpt" / runname)

        out_bin = str(workspace / "out.ntc")
        main(
            _common(
                workspace,
                "mbt2018",
                "compress",
                "--results_dir",
                str(workspace / "results"),
                runname,
                str(workspace / "test.png"),
                out_bin,
            )
        )
        assert os.path.exists(out_bin)
        results = glob.glob(str(workspace / "results" / "rd-*.npz"))
        assert results, "RD results npz must be written"
        bundle = np.load(results[0])
        for field in ("psnr", "est_bpp", "est_y_bpp", "est_z_bpp", "avg_batch_actual_bpp"):
            assert field in bundle

        out_png = str(workspace / "recon.png")
        main(_common(workspace, "mbt2018", "decompress", runname, out_bin, out_png))
        recon = np.asarray(Image.open(out_png))
        assert recon.shape == (64, 64, 3)

    def test_sga_compress_cli(self, workspace):
        runname = "mbt2018-num_filters=4-lmbda=0.01"
        main(
            _common(
                workspace,
                "sga",
                "compress",
                "--results_dir",
                str(workspace / "results_sga"),
                "--sga_its",
                "12",
                runname,
                str(workspace / "test.png"),
            )
        )
        results = glob.glob(str(workspace / "results_sga" / "rd-sga-*.npz"))
        assert results
        bundle = np.load(results[0])
        assert np.isfinite(bundle["est_bpp"]).all()

    @pytest.mark.slow
    def test_quant_int8_compress_decompress_roundtrip(self, workspace):
        """--quant int8 on both sides: the decoder recomputes mu/sigma
        through the same int8 h_s, so the stream must round-trip."""
        runname = "mbt2018-num_filters=4-lmbda=0.01"
        out = str(workspace / "q.ntc")
        main(
            _common(
                workspace, "mbt2018", "compress", "--quant", "int8",
                runname, str(workspace / "test.png"), out,
            )
        )
        png = str(workspace / "q_out.png")
        main(
            _common(
                workspace, "mbt2018", "decompress", "--quant", "int8",
                runname, out, png,
            )
        )
        img = np.asarray(Image.open(png))
        assert img.shape == (64, 64, 3)

    @pytest.mark.slow
    def test_sga_compress_spatial_cli(self, workspace):
        """--spatial shards a single image's rows across the mesh and must
        produce the same results-bundle surface as the batch path."""
        runname = "mbt2018-num_filters=4-lmbda=0.01"
        big = (np.random.default_rng(1).random((256, 320, 3)) * 255).astype(
            np.uint8
        )
        Image.fromarray(big).save(workspace / "big.png")
        out = str(workspace / "sga_spatial.ntc")
        main(
            _common(
                workspace,
                "sga",
                "compress",
                "--results_dir",
                str(workspace / "results_spatial"),
                "--sga_its",
                "5",
                "--spatial",
                runname,
                str(workspace / "big.png"),
                out,
            )
        )
        results = glob.glob(str(workspace / "results_spatial" / "rd-sga-*.npz"))
        assert results
        bundle = np.load(results[0])
        assert np.isfinite(bundle["est_bpp"]).all()
        assert os.path.getsize(out) > 0

    @pytest.mark.slow
    def test_sga_writes_optimized_bitstream(self, workspace):
        runname = "mbt2018-num_filters=4-lmbda=0.01"
        out = str(workspace / "sga_out.ntc")
        main(
            _common(
                workspace,
                "sga",
                "compress",
                "--results_dir",
                str(workspace / "results_sga2"),
                "--sga_its",
                "10",
                runname,
                str(workspace / "test.png"),
                out,
            )
        )
        assert os.path.getsize(out) > 0

    def test_sga_decompress_cli_roundtrip(self, workspace):
        """sga compress -> sga decompress (mode=1 bitstream): the CLI decode
        path must match decompress_optimized bit-for-bit, and feeding the
        optimized stream to the amortized decoder must NOT silently
        mis-decode (codec.py mode dispatch)."""
        from nic_tpu.cli.main import _load_params
        from nic_tpu.coding.codec import HyperpriorCodec

        runname = "mbt2018-num_filters=4-lmbda=0.01"
        out = str(workspace / "sga_rt.ntc")
        main(
            _common(
                workspace,
                "sga",
                "compress",
                "--results_dir",
                str(workspace / "results_sga_rt"),
                "--sga_its",
                "8",
                runname,
                str(workspace / "test.png"),
                out,
            )
        )
        out_png = str(workspace / "sga_rt.png")
        main(_common(workspace, "sga", "decompress", runname, out, out_png))
        recon = np.asarray(Image.open(out_png))
        assert recon.shape == (64, 64, 3)

        class _A:
            num_filters, checkpoint_dir = 4, str(workspace / "ckpt")
            runname = "mbt2018-num_filters=4-lmbda=0.01"

        model, params = _load_params(_A, "mbt2018")
        codec = HyperpriorCodec(model, params)
        with open(out, "rb") as f:
            blob = f.read()
        ref = codec.decompress_optimized(blob)
        ref_png = np.round(np.clip(ref[0], 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal(recon, ref_png)
        # decompress() dispatches on the mode marker -> identical result.
        np.testing.assert_array_equal(codec.decompress(blob), ref)
        # And an amortized (mode=0) stream is rejected by the optimized
        # decoder instead of mis-decoding.
        x = np.asarray(Image.open(workspace / "test.png"), np.float32) / 255.0
        blob0, _ = codec.compress(x[None])
        with pytest.raises(ValueError, match="mode"):
            codec.decompress_optimized(blob0)

    @pytest.mark.slow
    def test_bb_compress_decompress_roundtrip(self, workspace):
        """bb_sga compress writes a real optimized-posterior bitstream;
        decompress recovers the image and the borrowed initial bits."""
        runname = "mbt2018_bb-num_filters=4-lmbda=0.01"
        out_bin = str(workspace / "bb_out.ntc")
        main(
            _common(
                workspace,
                "bb_sga",
                "compress",
                "--results_dir",
                str(workspace / "results_bb"),
                "--sga_its",
                "8",
                "--lambda",
                "0.01",
                runname,
                str(workspace / "test.png"),
                out_bin,
            )
        )
        assert os.path.getsize(out_bin) > 0
        out_png = str(workspace / "bb_recon.png")
        main(_common(workspace, "bb_sga", "decompress", runname, out_bin, out_png))
        recon = np.asarray(Image.open(out_png))
        assert recon.shape == (64, 64, 3)

    @pytest.mark.slow
    def test_bb_decompress_rejects_corrupt_stream(self, workspace):
        runname = "mbt2018_bb-num_filters=4-lmbda=0.01"
        src = str(workspace / "bb_out.ntc")
        bad = str(workspace / "bb_bad.ntc")
        blob = open(src, "rb").read()
        with open(bad, "wb") as f:
            f.write(blob[:-16] + bytes(16))
        with pytest.raises(SystemExit, match="integrity"):
            main(_common(workspace, "bb_sga", "decompress", runname, bad,
                         str(workspace / "bb_bad.png")))
