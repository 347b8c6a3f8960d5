"""Forest plot of the phrases directionality results (paired mean delta in
shift probability vs each sample's own regular rendition, 95% bootstrap
CI), predictive region beside reactive region, full corpus vs held-out
voices.

    python analyzes/plot_directionality.py \
        [--dir analyzes/results_phrases_r4] [--out .../directionality_forest.png]
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# single-series-hue + ink/surface tokens (dataviz reference palette)
BLUE = "#2a78d6"
INK = "#0b0b0b"
INK2 = "#52514e"
SURFACE = "#fcfcfb"
GRID = "#d9d8d4"

PERMS = [
    ("flat_f0", "flat F0"),
    ("flat_intensity", "flat intensity"),
    ("duration_avg", "duration avg"),
    ("shift_f0_up", "shift F0 ×1.1"),
    ("shift_f0_down", "shift F0 ×0.9"),
    ("only_f0", "only F0 (low-pass)"),
]
REGIONS = [("now_pred", "predictive region (pre-EOT)"),
           ("now_react", "reactive region (post-EOT)")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="analyzes/results_phrases_r4")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    full = json.load(open(os.path.join(args.dir, "directionality.json")))["regions"]
    held = json.load(
        open(os.path.join(args.dir, "directionality_heldout.json"))
    )["regions"]

    fig, axes = plt.subplots(
        1, 2, figsize=(9.2, 3.6), sharey=True, facecolor=SURFACE
    )
    ys = range(len(PERMS), 0, -1)
    for ax, (region, rtitle) in zip(axes, REGIONS):
        ax.set_facecolor(SURFACE)
        ax.axvline(0, color=INK2, lw=1, zorder=1)
        for y, (perm, label) in zip(ys, PERMS):
            for src, dy, filled in ((full, 0.16, True), (held, -0.16, False)):
                r = src[perm][region]
                lo, hi = r["ci95"]
                ax.plot([lo, hi], [y + dy] * 2, color=BLUE, lw=2,
                        solid_capstyle="round", zorder=2)
                ax.plot(
                    [r["mean"]], [y + dy], marker="o", ms=7, zorder=3,
                    markerfacecolor=BLUE if filled else SURFACE,
                    markeredgecolor=BLUE, markeredgewidth=1.6,
                )
        ax.set_title(rtitle, fontsize=10, color=INK, pad=8)
        ax.set_xlabel("paired Δ shift probability vs regular", fontsize=8.5,
                      color=INK2)
        ax.grid(axis="x", color=GRID, lw=0.6, zorder=0)
        for s in ("top", "right", "left"):
            ax.spines[s].set_visible(False)
        ax.spines["bottom"].set_color(GRID)
        ax.tick_params(colors=INK2, labelsize=8.5)
    axes[0].set_yticks(list(ys))
    axes[0].set_yticklabels([l for _, l in PERMS], fontsize=9, color=INK)
    fig.suptitle(
        "Flattening turn-final prosody depresses shift probability — "
        "before the end of turn too",
        fontsize=11, color=INK, x=0.02, ha="left",
    )
    from matplotlib.lines import Line2D

    fig.legend(
        handles=[
            Line2D([], [], marker="o", color=BLUE, ls="-", lw=2, ms=7,
                   markerfacecolor=BLUE, label="all voices (n=180)"),
            Line2D([], [], marker="o", color=BLUE, ls="-", lw=2, ms=7,
                   markerfacecolor=SURFACE, markeredgewidth=1.6,
                   label="held-out voices (n=36)"),
        ],
        loc="upper right", frameon=False, fontsize=8.5,
        labelcolor=INK2, bbox_to_anchor=(0.99, 1.0),
    )
    fig.tight_layout(rect=(0, 0, 1, 0.90))
    out = args.out or os.path.join(args.dir, "directionality_forest.png")
    fig.savefig(out, dpi=150, facecolor=SURFACE)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
