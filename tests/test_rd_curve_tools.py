"""Tests for scripts/rd_curve.py run discovery and the --lmbda filter.

The follow-up method sweep (scripts/round4_followup.sh) relies on
--lmbda to evaluate exactly one checkpoint instead of re-running the
whole curve; a silent mismatch (float formatting of the runname lambda)
would make it evaluate nothing or everything.
"""

import os
import sys

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, SCRIPTS)


def _mk_run(tmp_path, name):
    d = tmp_path / name
    d.mkdir()
    (d / "params-100.npz").write_bytes(b"x")


class TestFindRuns:
    def test_discovers_runs_with_npz_only(self, tmp_path):
        from rd_curve import find_runs

        _mk_run(tmp_path, "mbt2018-num_filters=192-lmbda=0.01")
        _mk_run(tmp_path, "mbt2018-num_filters=192-lmbda=0.003")
        # Different model / nf must not match.
        _mk_run(tmp_path, "mbt2018_bb-num_filters=192-lmbda=0.01")
        _mk_run(tmp_path, "mbt2018-num_filters=128-lmbda=0.01")
        # No checkpoint files -> skipped.
        (tmp_path / "mbt2018-num_filters=192-lmbda=0.08").mkdir()

        runs = find_runs(str(tmp_path), 192, "mbt2018")
        assert [(r[0], r[1]) for r in runs] == [
            ("mbt2018-num_filters=192-lmbda=0.003", 0.003),
            ("mbt2018-num_filters=192-lmbda=0.01", 0.01),
        ]

        bb = find_runs(str(tmp_path), 192, "mbt2018_bb")
        assert [r[0] for r in bb] == ["mbt2018_bb-num_filters=192-lmbda=0.01"]

    def test_merge_refuses_foreign_eval_set(self, tmp_path):
        """ADVICE r4 low: a partial re-eval with a different --eval_npy must
        not silently mix points from two eval sets into one curve."""
        import json

        import pytest

        from rd_curve import _merge_detail

        row_a = {"runname": "r1", "lmbda": 0.01, "eval": "a.npy",
                 "methods": {"sga": {"bpp": 0.4, "psnr": 33.0}}}
        (tmp_path / "rd_curve.json").write_text(json.dumps([row_a]))
        row_b = dict(row_a, eval="b.npy")
        with pytest.raises(SystemExit, match="refusing to merge"):
            _merge_detail(str(tmp_path), [row_b])
        # Same eval set merges fine; rows keyed by runname.
        merged = _merge_detail(str(tmp_path), [dict(row_a, lmbda=0.02)])
        assert len(merged) == 1 and merged[0]["lmbda"] == 0.02
        # Legacy rows without an eval key do not block.
        (tmp_path / "rd_curve.json").write_text(
            json.dumps([{k: v for k, v in row_a.items() if k != "eval"}])
        )
        merged = _merge_detail(str(tmp_path), [row_b])
        assert len(merged) == 1

    def test_lmbda_filter_selects_exactly_one(self, tmp_path):
        from rd_curve import find_runs

        for lm in ("0.001", "0.003", "0.01", "0.04"):
            _mk_run(tmp_path, f"mbt2018-num_filters=192-lmbda={lm}")
        runs = find_runs(str(tmp_path), 192, "mbt2018")
        # Same predicate main() applies for --lmbda.
        picked = [r for r in runs if abs(r[1] - 0.01) < 1e-12]
        assert [r[0] for r in picked] == [
            "mbt2018-num_filters=192-lmbda=0.01"
        ]
        none = [r for r in runs if abs(r[1] - 0.02) < 1e-12]
        assert none == []


class TestPixelBudgetChunking:
    def test_eval_chunks_by_pixel_budget(self, tmp_path, monkeypatch):
        """Regression: a 16x1200x1200 eval set passed to the engine as ONE
        batch exhausted single-chip HBM (round-5 tecnick eval); rd_curve must
        chunk by the same pixel budget the CLI compress path uses."""
        import json

        import numpy as np

        import nic_tpu.config
        import rd_curve
        from nic_tpu.train.trainer import TrainConfig, Trainer

        cfg = TrainConfig(
            model="mbt2018", num_filters=4, lmbda=0.01, batchsize=2,
            patchsize=64, last_step=1, checkpoint_dir=str(tmp_path / "ckpt"),
            log_every=1, save_checkpoint_secs=10_000,
        )
        trainer = Trainer(cfg)
        rng = np.random.default_rng(0)
        trainer.fit(
            iter([rng.random((2, 64, 64, 3), dtype=np.float32)]), verbose=False
        )

        X = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
        eval_npy = tmp_path / "eval.npy"
        np.save(eval_npy, X)

        # Budget of 2 images' pixels -> chunks of 2 + 1.
        monkeypatch.setattr(nic_tpu.config, "EVAL_BATCH_NUM_PIXELS", 2 * 64 * 64)
        calls = []
        import nic_tpu.infer.engine as engine

        real_eval = engine.LatentOptimizer.eval_amortized

        def spy(self, x):
            calls.append(len(x))
            return real_eval(self, x)

        monkeypatch.setattr(engine.LatentOptimizer, "eval_amortized", spy)
        out = tmp_path / "out"
        monkeypatch.setattr(
            "sys.argv",
            ["rd_curve.py", str(eval_npy), "--checkpoint_dir", str(tmp_path / "ckpt"),
             "--out", str(out), "--methods", "amortized,sga", "--its", "4",
             "--num_filters", "4"],
        )
        rd_curve.main()

        assert calls == [2, 1], calls
        rows = json.loads((out / "rd_curve.json").read_text())
        assert len(rows) == 1
        m = rows[0]["methods"]
        # Chunked means are finite and recorded for both methods.
        assert np.isfinite(m["amortized"]["bpp"]) and np.isfinite(m["sga"]["psnr"])
