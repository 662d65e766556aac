"""Precision-Recall-for-Distributions (analysis/prd/prd_score.py, the
compare_gan algorithm). Numpy + sklearn MiniBatchKMeans, same defaults."""

from __future__ import annotations

import numpy as np


def compute_prd(eval_dist, ref_dist, num_angles: int = 1001, epsilon: float = 1e-10):
    """PRD curve for discrete distributions (prd_score.py:48-106)."""
    assert 0 < epsilon <= 0.1
    assert 3 <= num_angles <= 1e6
    angles = np.linspace(epsilon, np.pi / 2 - epsilon, num=num_angles)
    slopes = np.tan(angles)
    slopes_2d = slopes[:, None]
    ref_2d = np.asarray(ref_dist)[None, :]
    eval_2d = np.asarray(eval_dist)[None, :]
    precision = np.minimum(ref_2d * slopes_2d, eval_2d).sum(axis=1)
    recall = precision / slopes
    if max(np.max(precision), np.max(recall)) > 1.001:
        raise ValueError("Detected value > 1.001, this should not happen.")
    return np.clip(precision, 0, 1), np.clip(recall, 0, 1)


def _cluster_into_bins(eval_data, ref_data, num_clusters: int):
    """Cluster the union with minibatch k-means, histogram per side
    (prd_score.py:109-139)."""
    from sklearn.cluster import MiniBatchKMeans

    cluster_data = np.vstack([eval_data, ref_data])
    kmeans = MiniBatchKMeans(n_clusters=num_clusters, n_init=10)
    labels = kmeans.fit(cluster_data).labels_
    eval_labels = labels[: len(eval_data)]
    ref_labels = labels[len(eval_data):]
    eval_bins = np.histogram(eval_labels, bins=num_clusters,
                             range=[0, num_clusters], density=True)[0]
    ref_bins = np.histogram(ref_labels, bins=num_clusters,
                            range=[0, num_clusters], density=True)[0]
    return eval_bins, ref_bins


def compute_prd_from_embedding(eval_data, ref_data, num_clusters: int = 20,
                               num_angles: int = 1001, num_runs: int = 10,
                               enforce_balance: bool = True):
    """PRD from embeddings, averaged over clustering runs
    (prd_score.py:139-175)."""
    eval_data = np.asarray(eval_data, dtype=np.float64)
    ref_data = np.asarray(ref_data, dtype=np.float64)
    if enforce_balance and len(eval_data) != len(ref_data):
        raise ValueError(
            "The number of points in eval_data %d is not equal to the number "
            "of points in ref_data %d." % (len(eval_data), len(ref_data)))
    precisions, recalls = [], []
    for _ in range(num_runs):
        eval_dist, ref_dist = _cluster_into_bins(eval_data, ref_data, num_clusters)
        p, r = compute_prd(eval_dist, ref_dist, num_angles)
        precisions.append(p)
        recalls.append(r)
    return np.mean(precisions, axis=0), np.mean(recalls, axis=0)


def _prd_to_f_beta(precision, recall, beta: float = 1, epsilon: float = 1e-10):
    return (1 + beta ** 2) * (precision * recall) / (
        (beta ** 2 * precision) + recall + epsilon)


def prd_to_max_f_beta_pair(precision, recall, beta: float = 8):
    """(max F_beta, max F_{1/beta}) summary pair (prd_score.py:230-264)."""
    precision, recall = np.asarray(precision), np.asarray(recall)
    f_beta = np.max(_prd_to_f_beta(precision, recall, beta))
    f_beta_inv = np.max(_prd_to_f_beta(precision, recall, 1.0 / beta))
    return f_beta, f_beta_inv


def plot_prd_curves(curves, out_path: str = None):
    """Render PRD curves (prd_score.py:177-228 `plot` helper): recall on x,
    precision on y, square [0,1] axes. `curves` is a dict label ->
    (precision, recall) or a list of (label, precision, recall) tuples.
    Returns the matplotlib figure (saved to out_path when given)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if isinstance(curves, dict):
        curves = [(lab, p, r) for lab, (p, r) in curves.items()]
    fig = plt.figure(figsize=(3.5, 3.5), dpi=150)
    plot_handle = fig.add_subplot(111)
    plot_handle.tick_params(axis="both", which="major", labelsize=12)
    for label, precision, recall in curves:
        plt.plot(recall, precision, label=label, alpha=0.5, linewidth=3)
    if len(curves) > 1 or (curves and curves[0][0]):
        plt.legend(loc="lower left", fontsize=9)
    plt.xlim([0, 1])
    plt.ylim([0, 1])
    plt.xlabel("Recall", fontsize=12)
    plt.ylabel("Precision", fontsize=12)
    plt.tight_layout()
    if out_path:
        plt.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
    return fig
