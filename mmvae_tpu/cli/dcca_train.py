"""DCCA pretraining entry point — dcca/trainings/main_*.py equivalent.

Trains the per-dataset DCCA encoder pair, fits linear CCA, exports
artifacts consumed by the *_dcca model builders, and runs an SVM probe on
the embeddings (main_mnist_svhn.py:149-226).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="mnist_svhn",
                        help="any key of dcca.nets.DCCA_BUILDERS "
                        "(mnist_svhn, circles_squares, celeba, medmnist, "
                        "chest_svhn, mnist_contour, mnist_svhn_fashion)")
    parser.add_argument("--outdim", type=int, default=0,
                        help="trunk embedding dim (0 = per-dataset default)")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=800)
    parser.add_argument("--data-path", type=str, default="../data")
    parser.add_argument("--synthetic-n", type=int, default=0,
                        help="synthetic stand-in scale (0 = dataset default); "
                        "match the downstream model's synthetic_n")
    parser.add_argument("--difficulty", type=float, default=0.0,
                        help="synthetic stand-in difficulty knob (0 = easy "
                        "legacy generator); match the downstream model's "
                        "`difficulty` config key")
    parser.add_argument("--confound-max", type=float, default=None,
                        help="override the difficulty-derived cross-class "
                        "confound ceiling (hard-grid calibration knob, "
                        "docs/QUALITY.md); match the downstream model's "
                        "`confound_max` config key")
    parser.add_argument("--fold", type=float, default=0.0,
                        help="non-convex sin-fold of the synthetic stand-in "
                        "manifold (data/synthetic.py); match the downstream "
                        "model's `fold` config key")
    parser.add_argument("--out", type=str, default="../experiments/dcca")
    parser.add_argument("--platform", type=str, default="cpu",
                        help="cpu = reference-parity float64 eigh loss; any "
                        "other platform uses the TPU-native Cholesky loss")
    parser.add_argument("--x64", action="store_true", default=True)
    parser.add_argument("--backend", type=str, default="",
                        choices=["", "eigh", "chol"],
                        help="CCA loss backend (default: eigh on cpu, chol "
                        "elsewhere)")
    info = parser.parse_args(argv)
    if info.platform:
        jax.config.update("jax_platforms", info.platform)
    if info.x64 and info.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    from ..core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from ..data import get_dataloaders
    from ..dcca.nets import DCCA_BUILDERS
    from ..dcca.train import Solver

    builders, default_dim = DCCA_BUILDERS[info.dataset]
    outdim = info.outdim or default_dim
    extra = {"synthetic_n": info.synthetic_n} if info.synthetic_n else {}
    if info.difficulty:
        extra["difficulty"] = info.difficulty
    if info.confound_max is not None:
        extra["confound_max"] = info.confound_max
    if info.fold:
        extra["fold"] = info.fold
    train_l, test_l, val_l = get_dataloaders(
        info.dataset, batch_size=info.batch_size, data_path=info.data_path,
        **extra)

    backend = info.backend or ("eigh" if info.platform == "cpu" else "chol")
    solver = Solver(builders(outdim), outdim, backend=backend)
    solver.fit(train_l, val_l, epochs=info.epochs)
    out_path = os.path.join(info.out, info.dataset, "dcca.npz")
    solver.save(out_path)
    print("saved", out_path)

    # SVM probe on the linear-CCA projections (dcca/utils.py:33;
    # dcca/validate/main_{celeba,msf}.py protocol)
    from sklearn.svm import LinearSVC

    @jax.jit
    def infer(xs):
        return solver.model.apply(solver.variables, xs)

    n_views = len(solver.model.encoders)
    feats, labels = [[] for _ in range(n_views)], []
    for xs, labs in test_l:
        outs = infer([jnp.asarray(x) for x in xs])
        for v in range(n_views):
            feats[v].append(np.asarray(outs[v]))
        # celeba: the probe targets are the 40 attribute bits themselves
        # (main_celeba.py / main_msf.py:46-52 fit one SVC per attribute);
        # class-labelled datasets probe the class label
        labels.append(np.asarray(xs[1]).reshape(len(xs[1]), -1)
                      if info.dataset == "celeba" else labs[0])
    labels = np.concatenate(labels)
    # celeba: one linear SVC PER attribute column, as in the validate
    # probes (dcca/validate/main_celeba.py, main_msf.py:46-52); class-label
    # datasets probe the single label
    label_cols = (labels.reshape(len(labels), -1).T if labels.ndim > 1
                  else labels[None])
    for v in range(n_views):
        h = np.concatenate(feats[v])
        if v < 2:  # LCCA is fit on the first two views (trimodal keeps raw
            # trunks, main_mnist_svhn_fashion.py:99,180)
            h = solver.lcca.transform(h, v)
        n = len(h) // 2
        accs = []
        for ci, col in enumerate(label_cols):
            if len(np.unique(col[:n])) < 2:
                continue  # degenerate attribute in this split
            clf = LinearSVC().fit(h[:n], col[:n])
            accs.append(clf.score(h[n:], col[n:]))
            if len(label_cols) > 1:
                print(f"SVM probe view {v} attribute {ci}: "
                      f"acc {accs[-1]:.4f}")
        print(f"SVM probe view {v}: acc {float(np.mean(accs)):.4f}")

    # embedding scatter per view, as the reference mains save next to the
    # encoders (main_mnist_svhn.py:219-221 visualize_umap -> embedding_*.png)
    from ..vis import visualize_umap

    plot_classes = (None if labels.ndim > 1 else labels)
    n_plot = 300  # scatter needs no more; bounds TSNE cost on the 1-core host
    for v in range(n_views):
        h = np.concatenate(feats[v])
        if v < 2:
            # the reference plots solver.test(use_linear_cca=True) outputs
            # (main_mnist_svhn.py:218-221): LCCA-projected, not raw trunks
            h = solver.lcca.transform(h, v)
        # seeded random subsample — a class-ordered test loader would
        # otherwise show only the head classes
        sel = np.random.default_rng(0).permutation(len(h))[:n_plot]
        visualize_umap(h[sel],
                       None if plot_classes is None else plot_classes[sel],
                       save_file=os.path.join(info.out, info.dataset,
                                              f"embedding_{v}.png"))
    return out_path


if __name__ == "__main__":
    main()
