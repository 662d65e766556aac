"""Result plotting — the equivalent of the reference's paper-figure scripts
(tests/ablation_n_made.py, tests/plot_dcca_size_graphs.py,
analysis/plot_prds_*): renders metric curves from run-dir metrics.json files
instead of hard-coded arrays.

Usage:
  python -m mmvae_tpu.cli.plot_results --runs runA runB --metric acc_0_1 \
      --labels "1 made" "2 made" --out ablation.png
  python -m mmvae_tpu.cli.plot_results --runs runA runB --prd-curves \
      --direction 0 --out prds.png     # overlay stored PRD curves
      (analysis/plot_prds_from_utils.py: each run's prd_curve_<dir>.npz,
      written by `validate --prd`, drawn on one precision/recall figure)
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--runs", nargs="+", required=True,
                        help="run dirs containing metrics.json")
    parser.add_argument("--metric", type=str, default="acc_0_1")
    parser.add_argument("--labels", nargs="*", default=None)
    parser.add_argument("--out", type=str, default="plot.png")
    parser.add_argument("--losses", action="store_true",
                        help="plot losses.json training curves instead")
    parser.add_argument("--prd-curves", action="store_true",
                        help="overlay the runs' stored PRD curves "
                        "(prd_curve_<direction>.npz from validate --prd; "
                        "analysis/plot_prds_from_utils.py figure)")
    parser.add_argument("--direction", type=str, default="0",
                        help="PRD direction suffix: the <dir> in "
                        "prd_curve_<dir>.npz (fid-key naming: bimodal "
                        "'0'/'1', trimodal 'src_tgt')")
    info = parser.parse_args(argv)

    if info.labels and len(info.labels) != len(info.runs):
        # zip() would silently drop the unlabeled tail runs from the figure
        parser.error(f"--labels got {len(info.labels)} labels for "
                     f"{len(info.runs)} runs (must match, or omit --labels "
                     "to use run-dir basenames)")

    if info.prd_curves:
        import numpy as np

        from ..eval.prd import plot_prd_curves

        labels = info.labels or [os.path.basename(r.rstrip("/"))
                                 for r in info.runs]
        curves = []
        for run, lab in zip(info.runs, labels):
            d = np.load(os.path.join(run,
                                     f"prd_curve_{info.direction}.npz"))
            curves.append((lab, d["precision"], d["recall"]))
        plot_prd_curves(curves, info.out)
        print("wrote", info.out)
        return

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = info.labels or [os.path.basename(r.rstrip("/")) for r in info.runs]
    fig, ax = plt.subplots(figsize=(6, 4))
    if info.losses:
        for run, lab in zip(info.runs, labels):
            with open(os.path.join(run, "losses.json")) as f:
                hist = json.load(f)
            ax.plot(hist["train_loss"], label=f"{lab} train")
            ax.plot(hist["test_loss"], "--", label=f"{lab} val")
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
    else:
        xs, ys, errs = [], [], []
        for i, run in enumerate(info.runs):
            with open(os.path.join(run, "metrics.json")) as f:
                m = json.load(f)
            entry = m[info.metric]
            xs.append(i)
            ys.append(entry["mean"] if isinstance(entry, dict) else entry)
            errs.append(entry.get("std", 0.0) if isinstance(entry, dict) else 0.0)
        ax.errorbar(xs, ys, yerr=errs, marker="o")
        ax.set_xticks(xs)
        ax.set_xticklabels(labels, rotation=30, ha="right")
        ax.set_ylabel(info.metric)
    ax.legend() if info.losses else None
    fig.tight_layout()
    fig.savefig(info.out, dpi=120)
    print("wrote", info.out)


if __name__ == "__main__":
    main()
