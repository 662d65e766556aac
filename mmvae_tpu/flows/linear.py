"""Planar / radial linear flows — rebuild of the my_VAE_LinNF stack
(my_pythae/models/vae_lin_nf/vae_lin_nf_model_adapted.py; flows from the
standard Rezende & Mohamed formulations the vendored pythae uses).

Only the sampling direction (z0 -> zK with log|det J|) is well-defined for
these non-invertible-in-closed-form flows, matching the reference usage
(the LinNF VAE only transforms posterior samples; density evaluation at
arbitrary points is not exposed).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class PlanarFlow(nn.Module):
    """z' = z + u * tanh(w.z + b); log|det| = log|1 + u.h'(w.z+b) w|."""

    features: int

    @nn.compact
    def __call__(self, z):
        w = self.param("w", nn.initializers.normal(0.1), (self.features,))
        u = self.param("u", nn.initializers.normal(0.1), (self.features,))
        b = self.param("b", nn.initializers.zeros, ())
        # enforce invertibility: u_hat = u + (m(w.u) - w.u) w/|w|^2,
        # m(x) = -1 + softplus(x)
        wu = jnp.dot(w, u)
        m_wu = -1.0 + jax.nn.softplus(wu)
        u_hat = u + (m_wu - wu) * w / (jnp.dot(w, w) + 1e-8)
        lin = z @ w + b  # (...,)
        f = z + u_hat * jnp.tanh(lin)[..., None]
        psi = (1 - jnp.tanh(lin) ** 2)[..., None] * w
        logdet = jnp.log(jnp.abs(1.0 + psi @ u_hat) + 1e-8)
        return f, logdet


class RadialFlow(nn.Module):
    """z' = z + beta h(alpha, r)(z - z0), r = |z - z0|."""

    features: int

    @nn.compact
    def __call__(self, z):
        z0 = self.param("z0", nn.initializers.normal(0.1), (self.features,))
        log_alpha = self.param("log_alpha", nn.initializers.zeros, ())
        beta_raw = self.param("beta", nn.initializers.zeros, ())
        alpha = jnp.exp(log_alpha)
        # invertibility: beta_hat = -alpha + softplus(beta)
        beta = -alpha + jax.nn.softplus(beta_raw)
        diff = z - z0
        r = jnp.linalg.norm(diff, axis=-1, keepdims=True)
        h = 1.0 / (alpha + r)
        f = z + beta * h * diff
        d = self.features
        logdet = (d - 1) * jnp.log1p(beta * h[..., 0]) + jnp.log1p(
            beta * h[..., 0] + beta * (-r[..., 0] / (alpha + r[..., 0]) ** 2)
        )
        return f, logdet


class LinearNF(nn.Module):
    """Stack of planar/radial flows (VAE_LinNF_Config flows list, default
    ['Planar', 'Radial', 'Planar'])."""

    features: int
    flows: Tuple[str, ...] = ("Planar", "Radial", "Planar")

    def setup(self):
        layers = []
        for i, kind in enumerate(self.flows):
            cls = PlanarFlow if kind.lower() == "planar" else RadialFlow
            layers.append(cls(features=self.features, name=f"{kind.lower()}_{i}"))
        self.layers = layers

    def __call__(self, z, train: bool = False):
        return self.forward(z, train=train)

    def forward(self, z, train: bool = False):
        """Density-direction stand-in: LinNF exposes only the transform of
        posterior samples; forward == the z0 -> zK map."""
        return self.inverse(z, train=train)

    def inverse(self, z0, train: bool = False):
        """Sampling direction z0 -> zK with accumulated log|det J|."""
        ld = jnp.zeros(z0.shape[:-1], dtype=z0.dtype)
        z = z0
        for layer in self.layers:
            z, d = layer(z)
            ld = ld + d
        return z, ld
