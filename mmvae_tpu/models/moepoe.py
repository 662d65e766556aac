"""MoE-PoE — generalized multimodal ELBO (Sutter et al. 2021).

Rebuild of models/moepoe/moepoe.py: PoE over all modality subsets (prior
expert only joins the full subset), stratified mixture-component selection,
ELBO = recon under the mixture draw + mean KL over all mixture components.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..core import distributions as D
from ..core.distributions import LocScale
from .poe import mixture_component_selection, poe_for_all_subsets
from .vae import UnimodalVAE


class MOEPOE(nn.Module):
    vaes: Sequence[UnimodalVAE]
    lik_scaling: Sequence[float]
    recon_dists: Sequence[str]
    beta_kl: float = 1.0

    @property
    def n_mod(self):
        return len(self.vaes)

    def __call__(self, x, K: int = 1, train: bool = False):
        """ELBO-building forward (moepoe.py:85-139). Returns
        dict(elbo, z_joint, mus, log_vars)."""
        mus, log_vars = [], []
        for m, vae in enumerate(self.vaes):
            mu_m, lv_m = vae.encode(x[m], train=train)
            mus.append(mu_m)
            log_vars.append(lv_m)

        poe_mus, poe_lvs = poe_for_all_subsets(mus, log_vars)
        mus = mus + poe_mus
        log_vars = log_vars + poe_lvs

        mu_sel, lv_sel = mixture_component_selection(mus, log_vars)
        z = D.normal_sample(
            LocScale(mu_sel, jnp.exp(0.5 * lv_sel)), self.make_rng("sample")
        )

        elbo = 0.0
        for m, vae in enumerate(self.vaes):
            recon = vae.decode(z, train=train)
            lpx_z = jnp.sum(
                D.log_prob(self.recon_dists[m], LocScale(recon, jnp.ones_like(recon)), x[m])
            ) * self.lik_scaling[m]
            elbo += lpx_z

        prior = LocScale(jnp.zeros(1), jnp.ones(1))
        for mu_i, lv_i in zip(mus, log_vars):
            kld = D.normal_kl(LocScale(mu_i, jnp.exp(0.5 * lv_i)), prior)
            elbo -= jnp.sum(kld) * self.beta_kl / len(mus)

        return {
            "elbo": elbo,
            "z_joint": z,
            "mus": jnp.stack(mus),
            "log_vars": jnp.stack(log_vars),
        }

    def encode_all(self, x, train: bool = False):
        """Per-modality posterior params [(mu, std)] — the unimodal
        proposals the IS likelihood protocol conditions on
        (moepoe.py:160-215 uses q(z|x_cond) exactly like mmvae.py:180-234)."""
        params = []
        for m, vae in enumerate(self.vaes):
            mu, log_var = vae.encode(x[m], train=train)
            params.append((mu, vae.posterior_std(log_var)))
        return params

    def infer_latent_from_mod(self, cond_mod: int, x, train: bool = False):
        out = self.vaes[cond_mod](x, train=train)
        return out["z"]

    def decode_all(self, z, train: bool = False):
        return [vae.decode(z, train=train) for vae in self.vaes]
