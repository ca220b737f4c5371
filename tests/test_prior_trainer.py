"""The standalone prior trainer should fit a known distribution."""

import json
import os

import numpy as np
import pytest

from nic_tpu.cli.main import main
from nic_tpu.train.prior_trainer import PriorTrainConfig, fit_factorized_prior


class TestPriorFit:
    def test_fits_gaussian_mixture(self):
        rng = np.random.default_rng(0)
        n = 4000
        # Channel 0: N(0,1); channel 1: wider N(0,3).
        data = np.stack(
            [rng.normal(0, 1, n), rng.normal(0, 3, n)], axis=1
        ).astype(np.float32)
        cfg = PriorTrainConfig(num_channels=2, init_scale=5.0, its=400, tol=0.0, lr=0.05)
        params, record = fit_factorized_prior(data, cfg, verbose=False)
        final_nll = record[-1]["loss"]
        # Differential entropy: N(0,1) -> 1.419 nats, N(0,3) -> 2.518 nats;
        # average 1.97. A good fit lands within ~0.15 nats.
        assert final_nll < 2.15, f"NLL {final_nll} too far from entropy bound"
        assert record[0]["loss"] > final_nll

    @pytest.mark.slow
    def test_cli_saves_weights_and_record(self, tmp_path):
        rng = np.random.default_rng(1)
        data_path = str(tmp_path / "data.npy")
        np.save(data_path, rng.normal(0, 1, (500, 3)).astype(np.float32))
        main(
            [
                "learned_prior",
                "--num_channels",
                "3",
                "--data_path",
                data_path,
                "--its",
                "20",
                "--checkpoint_dir",
                str(tmp_path / "ckpt"),
                "--plot",
            ]
        )
        runs = os.listdir(tmp_path / "ckpt")
        assert len(runs) == 1
        run_dir = tmp_path / "ckpt" / runs[0]
        assert (run_dir / "prior_model.npz").exists()
        assert (run_dir / "record.json").exists()
        assert (run_dir / "fitted_density.png").exists()
        record = json.loads((run_dir / "record.json").read_text())
        assert len(record) >= 1
