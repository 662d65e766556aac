"""Unimodal VAE wrappers (rebuilds of my_pythae my_VAE / laplace_VAE /
my_VAE_IAF / my_VAE_MAF).

A single `UnimodalVAE` covers all four: `flow=None` reproduces my_VAE
(identity inverse_flow, vae_model_adapted.py:126-131), `posterior="laplace"`
reproduces laplace_VAE's softmax-std sampling (laplace_vae.py:69), and
`flow=IAF(...)/MAF(...)` reproduce my_VAE_IAF/my_VAE_MAF's flow-augmented
sampling path (vae_iaf_model_adapted.py:60-103).

RNG: sampling draws from the linen 'sample' rng stream.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import distributions as D
from ..core.constants import LOG2PI
from ..core.distributions import LocScale


def gaussian_log_q_z0(mu, log_var, z0):
    """log N(z0; mu, exp(log_var)) summed over the latent dim, with the
    2*pi constant (jmvae_nf.py:68)."""
    return jnp.sum(
        -0.5 * (log_var + LOG2PI + (z0 - mu) ** 2 / jnp.exp(log_var)), axis=-1
    )


class UnimodalVAE(nn.Module):
    encoder: nn.Module
    decoder: nn.Module
    latent_dim: int
    flow: Optional[nn.Module] = None
    posterior: str = "normal"
    model_name: str = "vae"

    def posterior_std(self, log_var):
        if self.posterior == "laplace":
            return D.std_softmax_trick(log_var)
        return D.std_from_logvar(log_var)

    def encode(self, x, train: bool = False):
        """-> (mu, log_var)."""
        return self.encoder(x, train=train)

    def decode(self, z, train: bool = False):
        return self.decoder(z, train=train)

    def flow_forward(self, z, train: bool = False):
        """Density direction z -> z0 with log|det J| (vae.flow(z) /
        vae.inverse_flow(z) dispatch at jmvae_nf.py:65)."""
        if self.flow is None:
            return z, jnp.zeros(z.shape[:-1], dtype=z.dtype)
        return self.flow.forward(z, train=train)

    def flow_inverse(self, z0, train: bool = False):
        """Sampling direction z0 -> z with log|det J|."""
        if self.flow is None:
            return z0, jnp.zeros(z0.shape[:-1], dtype=z0.dtype)
        return self.flow.inverse(z0, train=train)

    def encode_and_sample(self, x, K: int = 1, train: bool = False):
        """Posterior params + K samples, split from decoding so the unimodal
        DReG objective can reweight z-gradients (objectives.py:46-69)."""
        mu, log_var = self.encode(x, train=train)
        std = self.posterior_std(log_var)
        key = self.make_rng("sample")
        z0 = D.sample(self.posterior, LocScale(mu, std), key, (K,))
        z, ldj = self.flow_inverse(z0, train=train)
        return (mu, std), z, ldj

    def __call__(self, x, K: int = 1, train: bool = False):
        """Full forward pass, the equivalent of my_VAE.forward /
        my_VAE_IAF.forward. Encoding runs once; K samples are drawn from the
        posterior instead of K-replicating the input through the encoder
        (mathematically identical, K-fold cheaper — mmvae.py:41).

        Returns a dict with keys mirroring the reference ModelOutput:
        recon, mu, log_var, std, z0, z, log_abs_det_jac. Leading sample axis
        K is present only when K > 1.
        """
        mu, log_var = self.encode(x, train=train)
        std = self.posterior_std(log_var)
        key = self.make_rng("sample")
        shape = (K,) if K > 1 else ()
        z0 = D.sample(self.posterior, LocScale(mu, std), key, shape)
        z, ldj = self.flow_inverse(z0, train=train)
        recon = self.decode(z, train=train)
        return {
            "recon": recon,
            "mu": mu,
            "log_var": log_var,
            "std": std,
            "z0": z0,
            "z": z,
            "log_abs_det_jac": ldj,
        }
