"""Committed BD reports must match their sibling CSVs (VERDICT r4 next #8).

A results/<set>/bd_report.md is a derived artifact of <set>/*-psnr.csv and
the embedded golden curves. Round 3 shipped a stale report (regenerated
before the last eval landed); this gate re-derives every committed report
from its inputs and fails on any drift — point counts, per-point bpps, and
the average gap. Reports are parsed self-containedly (dataset from the
header, method pairs from the table rows), so new results dirs are covered
automatically.
"""

import glob
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REPORTS = sorted(glob.glob(os.path.join(REPO, "results", "*", "bd_report.md")))

ROW_RE = re.compile(
    r"^\|\s*(?P<csv>[\w.+-]+)\s*\|\s*(?P<golden>[\w.+-]+)\s*\|\s*"
    r"(?P<points>\d+|—)\s*\|\s*(?P<deltas>[^|]*)\|\s*(?P<gap>[+-][\d.]+|—)\s*\|\s*$"
)


def load_csv(path):
    pts = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                b, p = line.split(",")
                pts.append((float(b), float(p)))
    return sorted(pts)


@pytest.mark.parametrize(
    "report", REPORTS, ids=[os.path.basename(os.path.dirname(r)) for r in REPORTS]
)
def test_bd_report_matches_csvs(report):
    from nic_tpu.evaluation.golden import bd_psnr_gap

    text = open(report).read()
    m = re.search(r"vs golden (\w+)", text)
    assert m, f"{report}: no golden dataset in header"
    dataset = m.group(1)

    rows = [ROW_RE.match(l) for l in text.splitlines()]
    rows = [r for r in rows if r and r.group("csv") not in ("curve", "---")]
    assert rows, f"{report}: no parseable table rows"

    rdir = os.path.dirname(report)
    for r in rows:
        csv_path = os.path.join(rdir, f"{r.group('csv')}-psnr.csv")
        if r.group("points") == "—":
            assert not os.path.exists(csv_path), (
                f"{report}: row {r.group('csv')} says 'no csv' but "
                f"{csv_path} exists — regenerate the report"
            )
            continue
        assert os.path.exists(csv_path), (
            f"{report}: row {r.group('csv')} references a missing CSV"
        )
        pts = load_csv(csv_path)
        assert len(pts) == int(r.group("points")), (
            f"{report}: {r.group('csv')} reports {r.group('points')} points "
            f"but {csv_path} has {len(pts)} — regenerate the report"
        )
        # Per-point bpps in the report must be the CSV's bpps (3 decimals).
        reported_bpps = [
            float(b) for b in re.findall(r"@([\d.]+)bpp", r.group("deltas"))
        ]
        csv_bpps = [round(b, 3) for b, _ in pts]
        assert reported_bpps == pytest.approx(csv_bpps, abs=5e-4), (
            f"{report}: {r.group('csv')} per-point bpps {reported_bpps} "
            f"!= CSV bpps {csv_bpps} — regenerate the report"
        )
        gap_now = bd_psnr_gap(dataset, r.group("golden"), pts)
        assert float(r.group("gap")) == pytest.approx(gap_now, abs=5e-3), (
            f"{report}: {r.group('csv')} avg gap {r.group('gap')} != "
            f"recomputed {gap_now:+.3f} — regenerate the report"
        )


def test_decode_rule_matches_artifacts():
    """results/decode_rule.md is derived from results/bench_decode_*.json;
    regenerating it must reproduce the committed file byte-for-byte (same
    gate philosophy as the bd_report test: derived artifacts can't drift
    from their inputs silently)."""
    rule = os.path.join(REPO, "results", "decode_rule.md")
    if not os.path.exists(rule):
        pytest.skip("no decode_rule.md committed yet")
    import importlib.util
    import io
    import contextlib

    spec = importlib.util.spec_from_file_location(
        "decode_rule", os.path.join(REPO, "scripts", "decode_rule.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    committed = open(rule).read()
    cwd = os.getcwd()
    try:
        os.chdir(REPO)
        with contextlib.redirect_stdout(io.StringIO()):
            assert mod.main() == 0
        regenerated = open(rule).read()
    finally:
        os.chdir(cwd)
        with open(rule, "w") as f:
            f.write(committed)
    assert regenerated == committed, (
        "decode_rule.md is stale — rerun scripts/decode_rule.py after "
        "adding/removing bench_decode artifacts"
    )


def test_decode_rule_matches_default():
    """codec.DECODE_DEFAULT must equal the committed decode_rule.md verdict
    (the cross-window-median decision). Together with
    test_decode_rule_matches_artifacts this closes the loop: artifacts ->
    rule -> code default, none can drift from the others silently."""
    rule = os.path.join(REPO, "results", "decode_rule.md")
    if not os.path.exists(rule):
        pytest.skip("no decode_rule.md committed yet")
    m = re.search(r"\*\*Verdict[^`]*`(single_stream\w*)`", open(rule).read())
    assert m, "decode_rule.md has no parsable verdict line"
    from nic_tpu.coding import codec

    assert codec.DECODE_DEFAULT == m.group(1), (
        f"codec.DECODE_DEFAULT={codec.DECODE_DEFAULT!r} but decode_rule.md's "
        f"cross-window verdict is {m.group(1)!r} — update the constant (and "
        "its tests) together with the rule"
    )


def test_decode_env_flag_tristate():
    """Env overrides: unset follows DECODE_DEFAULT; '0'/'' force off; other
    values force on (bench.py pins variants with '0', which must NOT read as
    truthy — it did when the flags were plain bool(os.environ.get(...)))."""
    from nic_tpu.coding import codec

    for name, fn, selected in (
        ("NIC_TPU_DECODE_UNFUSED", codec._decode_unfused, "single_stream_unfused"),
        ("NIC_TPU_DECODE_SLIM", codec._decode_slim, "single_stream_slim"),
    ):
        old = os.environ.pop(name, None)
        try:
            assert fn() == (codec.DECODE_DEFAULT == selected)
            os.environ[name] = "0"
            assert fn() is False
            os.environ[name] = ""
            assert fn() is False
            os.environ[name] = "1"
            assert fn() is True
        finally:
            if old is None:
                os.environ.pop(name, None)
            else:
                os.environ[name] = old
