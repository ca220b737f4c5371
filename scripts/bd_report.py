"""Standing BD-PSNR report: measured RD points vs the reference's golden
curves (results/kodak/*.csv, embedded in nic_tpu/evaluation/golden.py).

For each method curve produced by scripts/rd_curve.py this prints the
per-lambda PSNR delta at equal rate against the golden Kodak curve plus the
average (BD-PSNR-style) gap — the artifact VERDICT r1 item 1 asks to stand
behind VALIDATION.md. Negative deltas mean the reference is still ahead
(expected: the paper's models trained 1-3M steps on CLIC photos; ours train
on the synthetic corpus for far fewer steps in this environment); the
deltas should trend toward 0 as steps grow.

Usage:
  python scripts/bd_report.py RESULTS_DIR [--dataset kodak]
      [--methods amortized:mbt2018,sga:sga]

RESULTS_DIR must hold <name>-psnr.csv files from rd_curve.py. The mapping
"csvname:goldenmethod" pairs our curve files with golden curve keys
(amortized inference corresponds to the reference's mbt2018 curve).
Also emits a markdown table on stdout for pasting into VALIDATION.md.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nic_tpu.evaluation.golden import GOLDEN_RD, bd_psnr_gap, interp_psnr_at_bpp


def load_csv(path):
    pts = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                b, p = line.split(",")
                pts.append((float(b), float(p)))
    return sorted(pts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results_dir")
    ap.add_argument("--dataset", default="kodak", choices=sorted(GOLDEN_RD))
    ap.add_argument(
        "--methods",
        default="amortized:mbt2018,sga:sga",
        help="comma list of <csvname>:<golden-method> pairs",
    )
    args = ap.parse_args()

    # Header names BOTH sides of the comparison: which results dir (and its
    # recorded eval set, if the rd_curve.json carries one) vs which golden
    # dataset — r3's report had two identically-headed sections that could
    # not be told apart (VERDICT r3 weak #1).
    eval_name = ""
    try:
        import json

        with open(os.path.join(args.results_dir, "rd_curve.json")) as f:
            evals = {r.get("eval") for r in json.load(f)} - {None}
        if evals:
            eval_name = f", eval set: {'+'.join(sorted(evals))}"
    except (OSError, ValueError):
        pass
    print(
        f"## BD-PSNR: {args.results_dir}{eval_name} "
        f"vs golden {args.dataset}\n"
    )
    print("| curve | golden ref | points | per-point dPSNR @ equal bpp (dB) | avg gap (dB) |")
    print("|---|---|---|---|---|")
    for pair in args.methods.split(","):
        csvname, gmethod = pair.split(":")
        path = os.path.join(args.results_dir, f"{csvname}-psnr.csv")
        if not os.path.exists(path):
            print(f"| {csvname} | {gmethod} | — | (no {path}) | — |")
            continue
        pts = load_csv(path)
        deltas = [
            p - interp_psnr_at_bpp(args.dataset, gmethod, b) for b, p in pts
        ]
        gap = bd_psnr_gap(args.dataset, gmethod, pts)
        dstr = ", ".join(
            f"{d:+.2f}@{b:.3f}bpp" for (b, _), d in zip(pts, deltas)
        )
        print(f"| {csvname} | {gmethod} | {len(pts)} | {dstr} | {gap:+.3f} |")
    print(
        "\nNegative = reference ahead at that rate (expected until parity);"
        " gaps should shrink toward 0 as training lengthens."
    )


if __name__ == "__main__":
    main()
