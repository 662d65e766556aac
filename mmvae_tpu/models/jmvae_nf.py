"""JMVAE-NF — joint encoder + normalizing-flow unimodal posteriors (the
reference paper's contribution). Rebuild of models/jmvae_nf/jmvae_nf.py.

Design notes (TPU-first):
- forward / compute_kld are pure module methods; the epoch-phase freezing
  (requires_grad_ toggles in objectives.py:180-183) becomes an optimizer
  param-mask (train/freezing.py) — gradients still flow, updates don't,
  matching torch requires_grad semantics exactly for Adam.
- the beta_kl decay `step` hook (jmvae_nf.py:189-193) is a host-side
  schedule fed as a scalar argument.
- DCCA-filtered reconstruction (jmvae_nf.py:147-162) uses the frozen DCCA
  encoders through stop_gradient.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import distributions as D
from ..core.distributions import LocScale
from .vae import UnimodalVAE, gaussian_log_q_z0


class JMVAE_NF(nn.Module):
    joint_encoder: nn.Module
    vaes: Sequence[UnimodalVAE]
    posterior: str = "normal"  # qz_xy family (params.dist)
    dcca_encoders: Optional[Sequence[nn.Module]] = None  # frozen DCCA trunks

    @property
    def n_mod(self):
        return len(self.vaes)

    def encode_joint(self, x, train: bool = False):
        """q(z|x,y) params (mu, std) from the joint encoder."""
        return self.joint_encoder(x, train=train)

    def __call__(self, x, K: int = 1, train: bool = False):
        """Joint forward (jmvae_nf.py:41-52): encode jointly, sample once,
        decode every modality. Returns dict(qz_xy=(mu,std), z_xy, recons)."""
        mu, std = self.encode_joint(x, train=train)
        key = self.make_rng("sample")
        shape = (K,) if K > 1 else ()
        z_xy = D.sample(self.posterior, LocScale(mu, std), key, shape)
        recons = [vae.decode(z_xy, train=train) for vae in self.vaes]
        return {"qz_xy": (mu, std), "z_xy": z_xy, "recons": recons}

    def unimodal_log_q(self, m: int, x_m, z, train: bool = False):
        """ln q_flow(z | x_m) for modality m: flow density direction plus the
        base-gaussian density at z0 (jmvae_nf.py:64-71)."""
        z0, ldj = self.vaes[m].flow_forward(z, train=train)
        mu, log_var = self.vaes[m].encode(x_m, train=train)
        return gaussian_log_q_z0(mu, log_var, z0) + ldj

    def compute_kld(self, x, train: bool = False, no_recon: bool = False,
                    beta_kl: float = 1.0, stop_joint_grad: bool = False):
        """KL(q(z|x,y) || q_flow(z|x_m)) regularizer, plus optional unimodal
        reconstruction terms (jmvae_nf.py:56-85).

        Returns (reg, details). details keys mirror the reference:
        kld_{m}, recon_loss_{m}.

        Unlike the reference (whose compute_kld re-runs the full forward,
        jmvae_nf.py:57), only the joint ENCODER is run here: the joint
        reconstructions of that second forward are unused by every caller
        (the recon term below is the *unimodal* VAE forward, and the joint
        recon loss comes from the objective's own forward). Skipping the
        dead decode halves the decoder cost of the post-warmup step. The
        only observable deviation: decoder BatchNorm running stats (ResNet
        decoders only) update once per step instead of twice on the same
        batch — same fixed point, half the effective momentum.

        `stop_joint_grad=True` (set by the objective when the joint encoder
        and decoders are BOTH optimizer-frozen, the published post-warmup
        phase) detaches (mu, std, z): their gradients are masked to zero by
        the optimizer anyway (train/freezing.py), so the trainable-param
        gradients are bit-identical while the joint-encoder backward pass
        is eliminated.
        """
        mu, std = self.encode_joint(x, train=train)
        key = self.make_rng("sample")
        z_xy = D.sample(self.posterior, LocScale(mu, std), key)
        if stop_joint_grad:
            mu, std, z_xy = jax.lax.stop_gradient((mu, std, z_xy))
        lq_xy = jnp.sum(D.log_prob(self.posterior, LocScale(mu, std), z_xy))
        reg = 0.0
        details = {}
        for m, vae in enumerate(self.vaes):
            lq_m = self.unimodal_log_q(m, x[m], z_xy, train=train)
            kld_m = lq_xy - jnp.sum(lq_m)
            details[f"kld_{m}"] = kld_m
            if no_recon:
                reg = reg + beta_kl * kld_m
            else:
                vout = vae(x[m], train=train)
                rl = self.compute_recon_loss(m, x[m], vout["recon"], train=train)
                details[f"recon_loss_{m}"] = rl
                reg = reg + beta_kl * kld_m + rl
        return reg, details

    def compute_recon_loss(self, m: int, x_m, recon, train: bool = False):
        """MSE in pixel space, or in DCCA-embedding space when DCCA encoders
        are attached (jmvae_nf.py:147-162)."""
        if self.dcca_encoders is not None:
            enc = self.dcca_encoders[m]
            t = jax.lax.stop_gradient(_embedding(enc, x_m, train))
            recon_t = _embedding(enc, recon, train)
            return jnp.sum((t - recon_t) ** 2)
        return jnp.sum(
            (x_m.reshape(x_m.shape[0], -1) - recon.reshape(x_m.shape[0], -1)) ** 2
        )

    def dcca_embeddings(self, x, train: bool = False):
        """LCCA-projected DCCA trunk outputs per modality (the frozen first
        stage of every TwoStepsEncoder; dcca/models/mnist_svhn.py:50-95).
        Exposed for graft verification and DCCA-space analytics."""
        return [
            _embedding(enc, x[m], train)
            for m, enc in enumerate(self.dcca_encoders)
        ]

    def init_all(self, x, K: int = 1, train: bool = False):
        """Touch every parameterized path so a single init() creates the full
        variable tree (the joint forward alone never reaches the unimodal
        encoders/flows used post-warmup)."""
        out = self(x, K=K, train=train)
        reg, _ = self.compute_kld(x, train=train)
        return out, reg

    def vae_forward(self, x_m, m: int, train: bool = False):
        """Full forward of unimodal VAE m (used by TELBO/SVAE/VAEVAE
        objectives)."""
        return self.vaes[m](x_m, train=train)

    def vae_forward_by_mod(self, x_m, m: int, train: bool = False):
        """Alias with positional mod arg for the likelihood estimators."""
        return self.vaes[m](x_m, train=train)

    def encode_all_unimodal(self, x, train: bool = False):
        """Per-modality posterior params [(mu, std)] (m_jmvae KL terms,
        objectives.py:171-172)."""
        params = []
        for m, vae in enumerate(self.vaes):
            mu, log_var = vae.encode(x[m], train=train)
            params.append((mu, vae.posterior_std(log_var)))
        return params

    def unimodal_cross_forward(self, x, train: bool = False):
        """MMVAE-style cross matrix from the unimodal posteriors, used by
        the legacy TELBO / multi-elbos losses (objectives.py:268, 314)."""
        qz_params, zs = [], []
        for m, vae in enumerate(self.vaes):
            o = vae(x[m], train=train)
            qz_params.append((o["mu"], o["std"]))
            zs.append(o["z"])
        recons = [[vae.decode(z, train=train) for vae in self.vaes] for z in zs]
        return {"qz_params": qz_params, "zs": zs, "recons": recons}

    def infer_latent_from_mod(self, cond_mod: int, x, train: bool = False):
        out = self.vaes[cond_mod](x, train=train)
        return out["z"]

    def decode_all(self, z, train: bool = False):
        return [vae.decode(z, train=train) for vae in self.vaes]

    def poe_log_density(self, subset, z, x, divide_prior: bool = True,
                        train: bool = False):
        """log density of the product of flow-posterior experts, for
        Hamiltonian sampling (jmvae_nf.py:294-329). Gradients come from
        jax.grad instead of torch.autograd.grad."""
        from ..core.constants import LOG2PI

        lnqzs = jnp.zeros(z.shape[:-1], dtype=z.dtype)
        if divide_prior:
            lnqzs = lnqzs + jnp.sum(0.5 * (z ** 2 + LOG2PI), axis=-1)
        for m in subset:
            lnqzs = lnqzs + self.unimodal_log_q(m, x[m], z, train=train)
        return lnqzs


def _embedding(enc, x, train):
    out = enc(x, train=train) if hasattr(enc, "__call__") else enc(x)
    return out[0] if isinstance(out, tuple) else out
