#!/usr/bin/env python
"""Render training loss curves from one or more metrics.jsonl files.

Produces the convergence figure committed at docs/convergence/loss_curves.png
(see docs/CONVERGENCE.md). Small multiples, one series per panel (so identity
never rides on color); palette and mark specs follow the repo's dataviz
conventions: series blue #2a78d6 on light surface #fcfcfb, 2px lines,
recessive grid, text in near-black/secondary ink.

Usage:
  python examples/plot_convergence.py run1/metrics.jsonl [label1] \
      [run2/metrics.jsonl label2 ...] --out loss_curves.png
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

SURFACE = "#fcfcfb"
SERIES = "#2a78d6"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e7e6e2"


def load(path: Path):
    recs = [json.loads(l) for l in path.read_text().splitlines() if l.strip()]
    steps = [r for r in recs if "loss_mel" in r]
    vals = [r for r in recs if "val_mel_l1" in r]
    return steps, vals


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+",
                    help="metrics.jsonl [label] pairs; label optional")
    ap.add_argument("--out", type=Path, default=Path("loss_curves.png"))
    args = ap.parse_args(argv)

    # parse alternating path [label] arguments
    runs = []
    i = 0
    while i < len(args.inputs):
        p = Path(args.inputs[i])
        label = None
        if i + 1 < len(args.inputs) and not args.inputs[i + 1].endswith(".jsonl"):
            label = args.inputs[i + 1]
            i += 2
        else:
            label = p.parent.name
            i += 1
        runs.append((label, *load(p)))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [
        ("loss_gen_all", "total generator loss", True),
        ("loss_mel", "mel L1 (train)", False),
        ("loss_kl", "KL (prior | posterior)", True),
        ("loss_dur", "duration NLL", False),
    ]
    # Extra panel for the duration-accuracy ratio when any run logged
    # it (validation writes val_dur_ratio since round 3).
    have_dur = any(
        any("val_dur_ratio" in v for v in vals) for _, _, vals in runs
    )
    ncols = len(panels) + 1 + (1 if have_dur else 0)
    nrows = len(runs)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(3.1 * ncols, 2.5 * nrows),
        facecolor=SURFACE, squeeze=False,
    )
    for r, (label, steps, vals) in enumerate(runs):
        x = [s["step"] for s in steps]
        for c, (key, title, logy) in enumerate(panels):
            ax = axes[r][c]
            y = [s[key] for s in steps]
            ax.plot(x, y, color=SERIES, linewidth=2)
            if logy:
                # symlog: the single-sample KL estimate can go slightly
                # negative once converged; plain log would drop points
                ax.set_yscale("symlog", linthresh=0.1)
            ax.set_title(f"{label}: {title}", fontsize=9, color=TEXT, loc="left")
            style(ax)
        ax = axes[r][len(panels)]
        if vals:
            vx = [v["step"] for v in vals]
            vy = [v["val_mel_l1"] for v in vals]
            ax.plot(vx, vy, color=SERIES, linewidth=2, marker="o", markersize=4)
            lab = vals[::max(len(vals) // 4, 1)]
            for v in lab:
                ax.annotate(f"{v['val_mel_l1']:.2f}", (v["step"], v["val_mel_l1"]),
                            textcoords="offset points",
                            xytext=(0, 6), fontsize=8, color=TEXT2, ha="center")
        ax.set_title(f"{label}: val mel L1 (held out)", fontsize=9,
                     color=TEXT, loc="left")
        style(ax)
        if have_dur:
            ax = axes[r][len(panels) + 1]
            dv = [v for v in vals if "val_dur_ratio" in v]
            if dv:
                ax.plot([v["step"] for v in dv],
                        [v["val_dur_ratio"] for v in dv],
                        color=SERIES, linewidth=2, marker="o", markersize=4)
                ax.axhline(1.0, color=GRID, linewidth=1.2)
                ax.set_ylim(0, 1.3)
            ax.set_title(f"{label}: val duration ratio (1 = teacher)",
                         fontsize=9, color=TEXT, loc="left")
            style(ax)
    for ax in axes[-1]:
        ax.set_xlabel("step", fontsize=8, color=TEXT2)
    fig.tight_layout()
    args.out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.out, dpi=130, facecolor=SURFACE)
    print(f"wrote {args.out}")


def style(ax) -> None:
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.grid(True, color=GRID, linewidth=0.7)
    ax.set_axisbelow(True)
    ax.tick_params(colors=TEXT2, labelsize=8)


if __name__ == "__main__":
    main()
