"""MVAE — product-of-experts multimodal VAE (Wu & Goodman).

Rebuild of models/mvae/mvae.py: numerically-stable log-space PoE including
the prior expert, unimodal + joint ELBOs, optional subset subsampling.
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import distributions as D
from ..core.distributions import LocScale
from .poe import poe
from .vae import UnimodalVAE


def all_subsets(n_mod: int):
    """All modality subsets of size in [2, n_mod) used by subsampling
    (set in trimodal subclasses, e.g. mvae/msf.py)."""
    subs = []
    for k in range(2, n_mod):
        subs.extend(list(t) for t in combinations(range(n_mod), k))
    return subs


class MVAE(nn.Module):
    vaes: Sequence[UnimodalVAE]
    lik_scaling: Sequence[float]
    subsampling: bool = False
    k_subsample: int = 0

    @property
    def n_mod(self):
        return len(self.vaes)

    def _kl(self, mu, std):
        """KL(N(mu, std) || N(0, 1)) summed over everything (mvae.py:60-61)."""
        return jnp.sum(D.normal_kl(LocScale(mu, std), LocScale(jnp.zeros_like(mu), jnp.ones_like(std))))

    def __call__(self, x, K: int = 1, train: bool = False):
        """ELBO-building forward (mvae.py:73-139). Returns
        dict(elbo, z_joint, joint_mu, joint_std)."""
        mus, log_vars = [], []
        elbo = 0.0
        for m, vae in enumerate(self.vaes):
            mu_m, lv_m = vae.encode(x[m], train=train)
            mus.append(mu_m)
            log_vars.append(lv_m)
            # unimodal elbo: PoE of the single expert with the prior
            mu, std = poe([mu_m], [lv_m])
            z = D.normal_sample(LocScale(mu, std), self.make_rng("sample"))
            recon = vae.decode(z, train=train)
            elbo += -0.5 * jnp.sum((x[m] - recon) ** 2) * self.lik_scaling[m] - self._kl(mu, std)

        joint_mu, joint_std = poe(mus, log_vars)
        z_joint = D.normal_sample(LocScale(joint_mu, joint_std), self.make_rng("sample"))
        for m, vae in enumerate(self.vaes):
            recon = vae.decode(z_joint, train=train)
            elbo += -0.5 * jnp.sum((x[m] - recon) ** 2) * self.lik_scaling[m]
        elbo -= self._kl(joint_mu, joint_std)

        if self.subsampling:
            # Reference picks k random subsets per step (mvae.py:114-130);
            # we branchlessly compute all subsets and apply a random 0/1 mask
            # with exactly k ones — same expectation, static shapes for XLA.
            subsets = all_subsets(self.n_mod)
            sel = jax.random.permutation(self.make_rng("sample"), len(subsets))
            mask = jnp.where(jnp.arange(len(subsets)) < self.k_subsample, 1.0, 0.0)
            mask = jnp.zeros(len(subsets)).at[sel].set(mask)
            for si, s in enumerate(subsets):
                mu, std = poe([mus[i] for i in s], [log_vars[i] for i in s])
                sub_z = D.normal_sample(LocScale(mu, std), self.make_rng("sample"))
                term = -self._kl(mu, std)
                for m in s:
                    recon = self.vaes[m].decode(sub_z, train=train)
                    term += -0.5 * jnp.sum((recon - x[m]) ** 2) * self.lik_scaling[m]
                elbo += mask[si] * term

        return {"elbo": elbo, "z_joint": z_joint, "joint_mu": joint_mu, "joint_std": joint_std}

    def encode_all(self, x, train: bool = False):
        """Per-modality raw encoder posterior params [(mu, std)] — the
        proposal for joint_ll_from_uni (mvae.py:174-179, which deliberately
        skips the PoE-with-prior, see the mvae.py:171-172 warning)."""
        params = []
        for m, vae in enumerate(self.vaes):
            mu_m, lv_m = vae.encode(x[m], train=train)
            params.append((mu_m, vae.posterior_std(lv_m)))
        return params

    def infer_latent_from_mod(self, cond_mod: int, x, train: bool = False):
        """PoE of the single expert with the prior, then sample (mvae.py:64-70)."""
        mu_m, lv_m = self.vaes[cond_mod].encode(x, train=train)
        mu, std = poe([mu_m], [lv_m])
        return D.normal_sample(LocScale(mu, std), self.make_rng("sample"))

    def decode_all(self, z, train: bool = False):
        return [vae.decode(z, train=train) for vae in self.vaes]

    def poe_subset_params(self, subset, x, train: bool = False):
        """PoE posterior params over a modality subset (mvae.py:268-301)."""
        mus, lvs = [], []
        for m in subset:
            mu_m, lv_m = self.vaes[m].encode(x[m], train=train)
            mus.append(mu_m)
            lvs.append(lv_m)
        return poe(mus, lvs)
