"""Latent-space analysis — rebuild of Multi_VAES.analyse /
analyse_uni_posterior / classify_latent (multi_vaes.py:128-181) and the
circles radius analytics (jmvae_nf_circles.py:82-132).

The reference reduces with UMAP and probes with sklearn's SGDClassifier
(multi_vaes.py:143-164); umap-learn is not in the TPU image, so reduction
uses PCA (documented deviation) while the hinge-loss SGD probe matches.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def classify_latent(z_train, t_train, z_test, t_test) -> float:
    """Hinge-loss SGD probe accuracy (multi_vaes.py:160-164)."""
    from sklearn.linear_model import SGDClassifier
    from sklearn.metrics import accuracy_score

    cl = SGDClassifier(loss="hinge", penalty="l2")
    cl.fit(np.asarray(z_train), np.asarray(t_train))
    return float(accuracy_score(cl.predict(np.asarray(z_test)), np.asarray(t_test)))


def analyse_joint_posterior(model, variables, data, key, n_samples: int = 10):
    """Joint posterior stats + samples (per-family
    analyse_joint_posterior; jmvae_nf.py:181-186, mmvae.py:88-96)."""
    bdata = [d[:n_samples] for d in data]
    if hasattr(model, "joint_encoder"):
        out = model.apply(variables, bdata, rngs={"sample": key})
        mu, std = out["qz_xy"]
        z = out["z_xy"]
        return np.asarray(mu), np.asarray(std), np.asarray(z).reshape(-1, z.shape[-1])
    out = model.apply(variables, bdata, K=1, rngs={"sample": key})
    if "zss" in out:  # MMVAE: average the experts (mmvae.py:88-96)
        zss = out["zss"]
        z = 0.5 * (zss[0] + zss[1])
        mus = out["qz_params"]
        m = sum(mu for mu, _ in mus) / len(mus)
        return np.asarray(m), None, np.asarray(z).reshape(-1, z.shape[-1])
    z = out["z_joint"]
    return None, None, np.asarray(z)


def analyse_uni_posterior(model, variables, data, key, n_samples: int):
    """Unimodal posterior samples per modality (multi_vaes.py:167-170)."""
    bdata = [d[:n_samples] for d in data]
    out = []
    for m in range(len(bdata)):
        z = model.apply(variables, m, bdata[m], method="infer_latent_from_mod",
                        rngs={"sample": jax.random.fold_in(key, m)})
        out.append(np.asarray(z))
    return out


def analyse(model, variables, data, classes, key, run_path: str, epoch: int,
            train_latents=None) -> Dict:
    """Latent scatter plots + optional probe accuracy (multi_vaes.py:133-158)."""
    from ..vis import plot_embeddings_colorbars, reduce_latents

    m, s, zxy = analyse_joint_posterior(model, variables, data, key,
                                        n_samples=len(data[0]))
    zx = analyse_uni_posterior(model, variables, data, key, len(data[0]))
    metrics = {}
    if train_latents is not None:
        metrics["latent_acc"] = classify_latent(
            train_latents[0], train_latents[1], zxy, classes[0])
    plot_embeddings_colorbars(
        reduce_latents(zxy), reduce_latents(zx[0]),
        classes[0], classes[1],
        f"{run_path}/joint_embedding_{epoch:03d}.png")
    return metrics


def negative_entropy(rayons, rng, bins) -> float:
    """Approximate per-datapoint negative entropy of the conditional radius
    distribution vs uniform (utils.py:301-312). rayons: (n_data, n_samples)."""
    rayons = np.asarray(rayons)
    entropy = 0.0
    for row in rayons:
        p = np.histogram(row, range=rng, bins=bins, density=False)[0] + 1e-5
        p = p / len(row)
        entropy += np.sum(np.log(p) * p)
    return float(entropy / len(rayons))


def conditional_rdist_metrics(model, variables, data, key, run_path=None,
                              epoch: int = 0, n: int = 100, n_data: int = 100):
    """Circles conditional radius distribution: histogram of radii extracted
    from cross-modal samples + the neg_entropy metric
    (jmvae_nf_circles.py:94-129, range (0,1), 10 bins)."""
    from .generation import sample_from_conditional
    from ..vis import extract_rayon, plot_hist

    bdata = [jnp.asarray(d[:n_data]) for d in data]
    samples = sample_from_conditional(model, variables, bdata, key, n=n)
    # (n, B) radii per direction, rows = datapoints
    r01 = extract_rayon(np.asarray(samples[0][1])).T
    r10 = extract_rayon(np.asarray(samples[1][0])).T
    r = np.concatenate([r01, r10], axis=0)
    if run_path is not None:
        plot_hist(r.ravel(), f"{run_path}/hist_{epoch:03d}.png")
    return {"neg_entropy": negative_entropy(r, (0, 1), 10)}


def visualize_poe(model, variables, data, run_path: str, key,
                  n_data: int = 4, N: int = 30, divide_prior: bool = False,
                  mcmc_steps: int = 100):
    """Scatter unimodal posteriors vs the joint posterior (top row) and vs
    HMC samples from the product of experts (bottom row)
    (jmvae_nf_circles.py:138-214)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .hmc import sample_from_poe_subset

    bdata = [jnp.asarray(np.concatenate([np.asarray(d[:n_data])] * N))
             for d in data]
    u_z = [np.asarray(model.apply(
        variables, m, bdata[m], method="infer_latent_from_mod",
        rngs={"sample": jax.random.fold_in(key, m)})).reshape(N, n_data, -1)
        for m in range(len(bdata))]
    out = model.apply(variables, bdata, rngs={"sample": key})
    j_z = np.asarray(out["z_xy"]).reshape(N, n_data, -1)
    poe_z = np.asarray(sample_from_poe_subset(
        model, variables, list(range(len(data))), [d[:n_data] for d in bdata],
        jax.random.fold_in(key, 99), mcmc_steps=mcmc_steps, n_lf=10,
        eps_lf=0.01, K=N, divide_prior=divide_prior))  # (N, n_data, D)

    fig, axs = plt.subplots(2, n_data, sharex=True, sharey=True,
                            figsize=(4 * n_data, 8))
    for i in range(n_data):
        for row, extra in [(0, j_z), (1, poe_z)]:
            ax = axs[row][i] if n_data > 1 else axs[row]
            ax.scatter(u_z[0][:, i, 0], u_z[0][:, i, 1], s=6, label="q(z|x)")
            ax.scatter(u_z[1][:, i, 0], u_z[1][:, i, 1], s=6, label="q(z|y)")
            ax.scatter(extra[:, i, 0], extra[:, i, 1], s=6,
                       label="q(z|x,y)" if row == 0 else "PoE")
    path = f"{run_path}/product_of_posteriors.png"
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path


def analyse_rayons(model, variables, data, r_squares, r_circles, key,
                   run_path: str, epoch: int):
    """Circles radius analytics: correlate true radii with radii extracted
    from cross reconstructions (jmvae_nf_circles.py:82-132)."""
    from ..eval.generation import sample_from_conditional
    from ..vis import extract_rayon, plot_hist

    samples = sample_from_conditional(model, variables,
                                      [jnp.asarray(d) for d in data], key, n=1)
    metrics = {}
    for i, j, r_true in [(0, 1, r_circles), (1, 0, r_squares)]:
        recon = np.asarray(samples[i][j][0])  # (B, C, H, W)
        r_est = extract_rayon(recon)
        r_true = np.asarray(r_true)[: len(r_est)]
        if np.std(r_est) > 0 and np.std(r_true) > 0:
            metrics[f"rayon_corr_{i}{j}"] = float(np.corrcoef(r_true, r_est)[0, 1])
        plot_hist(r_est, f"{run_path}/hist_rayon_{i}{j}_{epoch:03d}.png")
    return metrics
