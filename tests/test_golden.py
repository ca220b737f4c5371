"""Golden RD data module: interpolation and regression-check semantics."""

import numpy as np

from nic_tpu.evaluation.golden import (
    GOLDEN_RD,
    bd_psnr_gap,
    check_rd_point,
    interp_psnr_at_bpp,
)


class TestGolden:
    def test_tables_complete(self):
        for dataset in ("kodak", "tecnick"):
            for method in ("mbt2018", "sga", "bb_sga"):
                curve = GOLDEN_RD[dataset][method]
                assert len(curve) == 7
                bpps = [p[0] for p in curve]
                assert bpps == sorted(bpps), "curves must be rate-ascending"

    def test_interp_hits_anchor_points(self):
        # BASELINE.md anchors: Kodak SGA mid-rate 0.432355 bpp -> 33.417 dB.
        assert abs(interp_psnr_at_bpp("kodak", "sga", 0.432355) - 33.417) < 1e-6
        assert abs(interp_psnr_at_bpp("kodak", "mbt2018", 0.404964) - 32.327) < 1e-6

    def test_check_rd_point(self):
        assert check_rd_point("kodak", "sga", 0.432355, 33.417)
        assert check_rd_point("kodak", "sga", 0.432355, 33.35)  # within 0.1 dB
        assert not check_rd_point("kodak", "sga", 0.432355, 32.0)
        assert check_rd_point("kodak", "sga", 0.432355, 34.0)  # beats it

    def test_bd_psnr_gap_sign(self):
        better = [(0.432355, 34.0)]
        worse = [(0.432355, 32.0)]
        assert bd_psnr_gap("kodak", "sga", better) > 0
        assert bd_psnr_gap("kodak", "sga", worse) < 0
