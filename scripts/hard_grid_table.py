"""Collect the hard-synthetic ablation-grid results into the QUALITY.md
markdown tables (VERDICT r3 next#1): reads each grid point's latest run
metrics.json + losses.json under the experiments dir and prints the
n_made and dim_dcca tables in the reference's published-curve form
(tests/ablation_n_made.py:8-13, tests/plot_dcca_size_graphs.py:8-12).

    python scripts/hard_grid_table.py [--experiments-dir /root/exp_r4_hard]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, ".")

POINTS = {
    "n_made": [("0", "jmvae_nf_dcca_nmade0/mnist_svhn_hard"),
               ("1", "jmvae_nf_dcca_nmade1/mnist_svhn_hard"),
               ("2 (flagship)", "jmvae_nf_dcca/mnist_svhn_hard"),
               ("3", "jmvae_nf_dcca_nmade3/mnist_svhn_hard"),
               ("5", "jmvae_nf_dcca_nmade5/mnist_svhn_hard")],
    "dim_dcca": [("2", "jmvae_nf_dcca_dim2/mnist_svhn_hard"),
                 ("5", "jmvae_nf_dcca_dim5/mnist_svhn_hard"),
                 ("9 (== flagship)", "jmvae_nf_dcca/mnist_svhn_hard"),
                 ("16", "jmvae_nf_dcca_dim16/mnist_svhn_hard")],
}


def latest_run(exp_dir, experiment):
    runs = sorted(glob.glob(os.path.join(exp_dir, experiment, "*", "*")))
    return runs[-1] if runs else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments-dir", default="/root/exp_r4_hard")
    info = ap.parse_args()
    for grid, rows in POINTS.items():
        print(f"\n| {grid} | final test loss | acc_0_1 (m->s) | "
              "acc_1_0 (s->m) | joint coherence |")
        print("|---|---|---|---|---|")
        for label, experiment in rows:
            run = latest_run(info.experiments_dir, experiment)
            if run is None or not os.path.exists(
                    os.path.join(run, "metrics.json")):
                print(f"| {label} | (pending) | | | |")
                continue
            with open(os.path.join(run, "metrics.json")) as f:
                m = json.load(f)
            with open(os.path.join(run, "losses.json")) as f:
                losses = json.load(f)

            def cell(k):
                return (f"{m[k]['mean']:.4f} ± {m[k]['std']:.4f}"
                        if isinstance(m[k], dict) else f"{m[k]:.4f}")

            print(f"| {label} | {losses['test_loss'][-1]:.4f} | "
                  f"{cell('acc_0_1')} | {cell('acc_1_0')} | "
                  f"{cell('joint_coherence')} |")


if __name__ == "__main__":
    main()
