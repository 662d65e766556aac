"""Collect the hard-synthetic ablation-grid results into the QUALITY.md
markdown tables (VERDICT r3 next#1): reads each grid point's latest run
metrics.json + losses.json under the experiments dir and prints the
n_made and dim_dcca tables in the reference's published-curve form
(tests/ablation_n_made.py:8-13, tests/plot_dcca_size_graphs.py:8-12).

    python scripts/hard_grid_table.py [--experiments-dir /root/exp_r4_hard]
    python scripts/hard_grid_table.py --suffix mnist_svhn_hard2 \
        --experiments-dir /root/exp_r5_hard2          # r5 fold=2.0 grid
    python scripts/hard_grid_table.py --cross-model \
        --experiments-dir /root/exp_r5_hard2          # 7-family hard table
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


XM_ROWS = [
    ("MMVAE (dreg-looser K=30)", "mmvae/mnist_svhn_hard"),
    ("JNF-DCCA (r4 flagship)", "jmvae_nf_dcca/mnist_svhn_hard"),
    ("MVAE (self_built)", "mvae/mnist_svhn_hard"),
    ("MoE-PoE (beta_kl=20)", "moepoe/mnist_svhn_hard"),
    ("MoE-PoE (beta_kl=1)", "moepoe/mnist_svhn_b1_hard"),
    ("MMVAE-NF (elbo_nf)", "mmvae_nf/mnist_svhn_hard"),
    ("TELBO-NF", "telbo/mnist_svhn_hard"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments-dir", default="/root/exp_r4_hard")
    ap.add_argument("--suffix", default="mnist_svhn_hard",
                    help="experiment suffix: mnist_svhn_hard (r4, fold=0) "
                    "or mnist_svhn_hard2 (r5, fold=2.0)")
    ap.add_argument("--cross-model", action="store_true",
                    help="print the 7-family hard cross-model table "
                    "(VERDICT r4 missing#3) instead of the ablation grids")
    ap.add_argument("--extra-dirs", nargs="*", default=[],
                    help="additional experiments dirs searched (e.g. the "
                    "r4 dir for the JNF-DCCA flagship row)")
    info = ap.parse_args()
    if info.cross_model:
        points = {"model (config)": XM_ROWS}
    else:
        points = {g: [(lab, e.replace("mnist_svhn_hard", info.suffix))
                      for lab, e in rows]
                  for g, rows in POINTS.items()}
    for grid, rows in points.items():
        print(f"\n| {grid} | final test loss | acc_0_1 (m->s) | "
              "acc_1_0 (s->m) | joint coherence |")
        print("|---|---|---|---|---|")
        for label, experiment in rows:
            run = None
            for d in [info.experiments_dir] + list(info.extra_dirs):
                run = latest_run(d, experiment)
                if run:
                    break
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
