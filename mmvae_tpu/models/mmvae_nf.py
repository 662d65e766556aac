"""MMVAE-NF — MMVAE with flow-transformed unimodal posteriors.

Rebuild of models/mmvae_nf/mmvae_nf.py: per-modality flow VAEs; forward
returns the cross-reconstruction matrix plus the flow posterior log-densities
ln q(z|x_m) = log N(z0; mu, var) - log|det J| consumed by m_elbo_nf
(mmvae_nf.py:29-61, objectives.py:463-479).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .vae import UnimodalVAE, gaussian_log_q_z0


class MMVAE_NF(nn.Module):
    vaes: Sequence[UnimodalVAE]

    @property
    def n_mod(self):
        return len(self.vaes)

    def __call__(self, x, K: int = 1, train: bool = False):
        """Returns dict(ln_qz_xs, zs, recons) with recons[e][d] the
        cross matrix (mmvae_nf.py:29-61). ln_qz_xs[e][?] — the reference only
        uses the diagonal ln q(z_e|x_e); we return the per-modality vector."""
        n = self.n_mod
        recons = [[None] * n for _ in range(n)]
        zs, ln_qz_xs = [], []
        for m, vae in enumerate(self.vaes):
            o = vae(x[m], train=train)
            recons[m][m] = o["recon"]
            zs.append(o["z"])
            ln_qz_xs.append(
                gaussian_log_q_z0_noconst(o["mu"], o["log_var"], o["z0"]) - o["log_abs_det_jac"]
            )
        for e, z in enumerate(zs):
            for d, vae in enumerate(self.vaes):
                if e != d:
                    recons[e][d] = vae.decode(z, train=train)
        return {"ln_qz_xs": ln_qz_xs, "zs": zs, "recons": recons}

    def infer_latent_from_mod(self, cond_mod: int, x, train: bool = False):
        return self.vaes[cond_mod](x, train=train)["z"]

    def decode_all(self, z, train: bool = False):
        return [vae.decode(z, train=train) for vae in self.vaes]


def gaussian_log_q_z0_noconst(mu, log_var, z0):
    """log N(z0; mu, var) WITHOUT the 2*pi constant — the reference drops it
    in MMVAE-NF (mmvae_nf.py:46-48) and pairs it with a constant-free prior
    term in m_elbo_nf (objectives.py:471)."""
    return jnp.sum(-0.5 * (log_var + (z0 - mu) ** 2 / jnp.exp(log_var)), axis=-1)
