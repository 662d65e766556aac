"""Joint encoders q(z|x,y) for JMVAE(-NF) models.

Rebuilds of models/nn/joint_encoders.py. All return (mu, std) — note these
emit STD directly (with the parameterization quirks of the reference), not
log-variance.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..core.constants import ETA
from .conv import Linear


class JointMLPEncoder(nn.Module):
    """Concat-flatten MLP joint encoder with softmax-std (joint_encoders.py:14-30)."""

    latent_dim: int
    hidden_dim: int
    num_hidden_layers: int = 1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        h = jnp.concatenate([x.reshape(x.shape[0], -1) for x in xs], axis=1)
        for _ in range(self.num_hidden_layers):
            h = nn.relu(Linear(self.hidden_dim)(h))
        mu = Linear(self.latent_dim, name="fc21")(h)
        lv = Linear(self.latent_dim, name="fc22")(h)
        std = nn.softmax(lv, axis=-1) * lv.shape[-1] + ETA
        return mu, std


class DoubleHeadMLP(nn.Module):
    """Per-modality linear head -> shared MLP (joint_encoders.py:34-54)."""

    latent_dim: int
    hidden_dim: int
    num_hidden_layers: int = 1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        h0 = nn.relu(Linear(self.hidden_dim, name="input1")(xs[0].reshape(xs[0].shape[0], -1)))
        h1 = nn.relu(Linear(self.hidden_dim, name="input2")(xs[1].reshape(xs[1].shape[0], -1)))
        h = jnp.concatenate([h0, h1], axis=1)
        for _ in range(self.num_hidden_layers):
            h = nn.relu(Linear(self.hidden_dim)(h))
        mu = Linear(self.latent_dim, name="fc21")(h)
        std = jnp.exp(0.5 * Linear(self.latent_dim, name="fc22")(h)) + ETA
        return mu, std


class MultipleHeadJoint(nn.Module):
    """N-modality conv/MLP heads -> shared MLP (joint_encoders.py:56-108).

    Covers both DoubleHeadJoint (N=2) and MultipleHeadJoint (N>=3): each
    per-modality encoder's mu output feeds the shared trunk.
    """

    encoders: Sequence[nn.Module]
    latent_dim: int
    hidden_dim: int
    num_hidden_layers: int = 1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        heads = []
        for enc, x in zip(self.encoders, xs):
            out = enc(x, train=train) if _accepts_train(enc) else enc(x)
            heads.append(out[0] if isinstance(out, tuple) else out)
        h = jnp.concatenate(heads, axis=1)
        for _ in range(self.num_hidden_layers):
            h = nn.relu(Linear(self.hidden_dim)(h))
        mu = Linear(self.latent_dim, name="fc21")(h)
        std = jnp.exp(0.5 * Linear(self.latent_dim, name="fc22")(h)) + ETA
        return mu, std


# DoubleHeadJoint (joint_encoders.py:56-82) is MultipleHeadJoint with 2 heads.
DoubleHeadJoint = MultipleHeadJoint


def _accepts_train(module: nn.Module) -> bool:
    import inspect

    try:
        return "train" in inspect.signature(module.__call__).parameters
    except (TypeError, ValueError):
        return False
