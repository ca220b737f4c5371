"""Decode-default decision rule (VERDICT r4 weak #5 / next #7).

The per-dispatch tunnel latency swings ~4x by time of day, so a decode-path
default chosen from one measurement window can invert in the next (the r3
"fusion win" did exactly that in r4). This script aggregates every committed
bench --decode artifact (results/bench_decode_*.json), tabulates
images/sec per variant per window, and recommends the default by
cross-window MEDIAN — a variant must win the median, not one lucky window.

Prints a markdown table + verdict; writes results/decode_rule.md. The chosen
default is asserted by tests/test_reports.py::test_decode_rule_matches_default
against the codec's actual behavior flags, so a stale decision can't sit in
the tree silently.
"""

import glob
import json
import os
import sys

import numpy as np

VARIANTS = [
    "single_stream",
    "per_image_streams",
    "single_stream_unfused",
    "single_stream_slim",
    "per_image_streams_slim",
]


def load_windows(pattern="results/bench_decode_*.json"):
    windows = []
    for path in sorted(glob.glob(pattern)):
        with open(path) as f:
            data = json.load(f)
        row = {"window": os.path.basename(path), "utc": data.get("utc", "?")}
        for v in VARIANTS:
            if v in data and isinstance(data[v], dict):
                row[v] = data[v].get("images_per_sec")
        windows.append(row)
    return windows


def main():
    windows = load_windows()
    if not windows:
        print("no bench_decode artifacts found", file=sys.stderr)
        return 1

    lines = ["# Decode-path decision rule", ""]
    lines.append(
        "Per-variant decompress throughput (images/sec/chip, batch 4, "
        "768x512, nf=192) across time-separated measurement windows. The "
        "default is chosen by cross-window median, never a single window "
        "(dispatch latency swings ~4x by time of day)."
    )
    lines.append("")
    hdr = "| window (utc) | " + " | ".join(VARIANTS) + " |"
    lines.append(hdr)
    lines.append("|" + "---|" * (len(VARIANTS) + 1))
    for w in windows:
        cells = [f"{w[v]:.2f}" if w.get(v) is not None else "—" for v in VARIANTS]
        lines.append(f"| {w['window']} ({w['utc']}) | " + " | ".join(cells) + " |")

    medians = {}
    for v in VARIANTS:
        vals = [w[v] for w in windows if w.get(v) is not None]
        if vals:
            medians[v] = float(np.median(vals))
    cells = [f"{medians[v]:.2f}" if v in medians else "—" for v in VARIANTS]
    lines.append("| **median** | " + " | ".join(cells) + " |")
    lines.append("")

    # Two independent decisions:
    #  (a) decode TRANSFER mode for the reference-parity single-stream
    #      format (fused-wide vs unfused-wide vs slim) — format-neutral,
    #      purely decoder-side, so the winner becomes the code default;
    #  (b) stream LAYOUT is an encode-time format choice: the CLI keeps the
    #      reference's most-compact single stream (mbt2018.py:219-221), and
    #      per-image streams stay opt-in (compress(parallel=True)) — we
    #      report their speed for users who choose them.
    def nwin(v):
        return sum(1 for w in windows if w.get(v) is not None)

    single = {
        v: m
        for v, m in medians.items()
        if v.startswith("single_stream") and (nwin(v) >= 2 or
                                              all(nwin(u) < 2 for u in medians))
    }
    best = max(single, key=single.get) if single else None
    lines.append(
        f"**Verdict (decode transfer mode, sets the code default):** "
        f"`{best}` — median {single[best]:.2f} img/s over {nwin(best)} "
        f"window(s); variants seen in <2 windows are only eligible while "
        f"nothing has 2+ windows." if best else
        "**Verdict:** no single-stream variants measured yet."
    )
    if "per_image_streams" in medians or "per_image_streams_slim" in medians:
        pv = max(
            (v for v in medians if v.startswith("per_image")),
            key=lambda v: medians[v],
        )
        lines.append("")
        lines.append(
            f"Stream layout (encode-time, opt-in `parallel=True`): best "
            f"per-image variant `{pv}` at median {medians[pv]:.2f} img/s; "
            f"the CLI default stays the reference's single compact stream."
        )
    out = "\n".join(lines) + "\n"
    with open("results/decode_rule.md", "w") as f:
        f.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
