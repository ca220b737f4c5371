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
