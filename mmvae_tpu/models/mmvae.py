"""MMVAE — mixture-of-experts multimodal VAE (Shi et al. 2019).

Rebuild of models/mmvae/mmvae.py. The joint posterior is the uniform mixture
of unimodal posteriors; objectives take log_mean_exp over experts
(objectives.py:123). The K-sample forward encodes each modality ONCE and
draws K posterior samples instead of replicating inputs K-fold through the
encoder (mmvae.py:41) — identical math, K x less encoder work, and the K axis
is a pure vmap dimension that pjit can shard.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import distributions as D
from ..core.distributions import LocScale
from .vae import UnimodalVAE


class MMVAE(nn.Module):
    vaes: Sequence[UnimodalVAE]
    posterior: str = "normal"  # params.dist — posterior AND prior family
    # optional NamedSharding for the (M, K, B, D) sample tensor: shards the
    # IWAE K axis over the mesh 'k' axis and the batch over 'data' —
    # the workload's two parallel dimensions (SURVEY §5)
    zss_sharding: Optional[object] = None

    @property
    def n_mod(self):
        return len(self.vaes)

    def encode_all(self, x, train: bool = False):
        """Per-modality posterior params [(mu, std)] (mmvae.py:38-49)."""
        params = []
        for m, vae in enumerate(self.vaes):
            mu, log_var = vae.encode(x[m], train=train)
            params.append((mu, vae.posterior_std(log_var)))
        return params

    def encode_and_sample(self, x, K: int = 1, train: bool = False):
        """Posterior params + (M, K, B, D) samples. Split out from the full
        forward so the DReG objective can insert its z-gradient reweighting
        between sampling and decoding (objectives.py:398-401 hook)."""
        qz_params = self.encode_all(x, train=train)
        zss = []
        for m, (mu, std) in enumerate(qz_params):
            key = self.make_rng("sample")
            z = D.sample(self.posterior, LocScale(mu, std), key, (K,))
            zss.append(z)
        zss = jnp.stack(zss)
        if self.zss_sharding is not None:
            # only constrain when the K axis is divisible (init passes K=1,
            # which must stay unconstrained)
            k_size = self.zss_sharding.mesh.shape.get("k", 1)
            if zss.shape[1] % k_size == 0:
                zss = jax.lax.with_sharding_constraint(zss, self.zss_sharding)
        return qz_params, zss

    def decode_cross(self, zss, train: bool = False):
        """M x M cross-reconstruction matrix: recons[e][d] = decoder_d(z_e)
        (mmvae.py:63-76)."""
        recons = [[None] * self.n_mod for _ in range(self.n_mod)]
        for e in range(self.n_mod):
            for d, vae in enumerate(self.vaes):
                recons[e][d] = vae.decode(zss[e], train=train)
        return recons

    def __call__(self, x, K: int = 1, train: bool = False):
        """Full MMVAE forward (mmvae.py:31-80).

        Returns dict:
          qz_params: [(mu, std)] per modality, shapes (B, D)
          zss:       (M, K, B, D) posterior samples
          recons:    M x M list-of-lists, recons[e][d] = decoder_d(z_e),
                     shape (K, B, *event_d) — the cross-modal matrix.
        """
        qz_params, zss = self.encode_and_sample(x, K=K, train=train)
        recons = self.decode_cross(zss, train=train)
        return {"qz_params": qz_params, "zss": zss, "recons": recons}

    def infer_latent_from_mod(self, cond_mod: int, x, train: bool = False):
        """q(z|x_m) sample (multi_vaes.py:71-79)."""
        out = self.vaes[cond_mod](x, train=train)
        return out["z"]

    def decode_all(self, z, train: bool = False):
        """Decode one latent in every modality (multi_vaes.py:94-95)."""
        return [vae.decode(z, train=train) for vae in self.vaes]
