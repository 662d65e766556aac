"""Gaussian-mixture latent sampler (models/samplers/gaussian_mixture/
gaussian_mixture_sampler.py): fit a full-covariance GMM on train latents,
sample for prior-replacement generation (multi_vaes.py:92-93,
generate_joint.py:107-114)."""

from __future__ import annotations

import numpy as np


class GaussianMixtureSampler:
    """sklearn full-covariance GMM with n_components=10 (the reference's
    default)."""

    def __init__(self, n_components: int = 10, random_state: int = 0):
        self.n_components = n_components
        self.random_state = random_state
        self.gmm = None

    def fit(self, latents: np.ndarray):
        from sklearn.mixture import GaussianMixture

        self.gmm = GaussianMixture(
            n_components=self.n_components, covariance_type="full",
            random_state=self.random_state,
        )
        self.gmm.fit(np.asarray(latents))
        return self

    def sample(self, num_samples: int, key=None) -> np.ndarray:
        assert self.gmm is not None, "fit() first"
        x, _ = self.gmm.sample(num_samples)
        return x.astype(np.float32)


def fit_sampler_on_train_latents(model, variables, loader, infer_fn,
                                 n_components: int = 10):
    """compute_all_train_latents + fit (multi_vaes/jmvae_nf
    compute_all_train_latents; generate_joint.py:107-114).

    infer_fn(xs_batch) -> latents (the per-family latent extraction rule)."""
    lat, labs = [], []
    for xs, ls in loader:
        lat.append(np.asarray(infer_fn(xs)))
        labs.append(ls[0])
    latents = np.concatenate(lat)
    labels = np.concatenate(labs)
    return GaussianMixtureSampler(n_components).fit(latents), latents, labels
