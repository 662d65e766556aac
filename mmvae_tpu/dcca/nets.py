"""DCCA encoder pairs + linear-CCA-wrapped inference encoders.

Rebuilds dcca/models/*.py: per-dataset deep encoder pairs trained with the
CCA loss, then wrapped with the fitted linear-CCA projection
h -> (h - m) @ w[:, :dim] for use inside TwoStepsEncoder
(dcca/models/mnist_svhn.py:50-104).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nets import EncoderMNIST, EncoderSVHN, MLPEncoder


class LCCAWrappedEncoder(nn.Module):
    """Frozen DCCA trunk + baked-in linear CCA projection.

    Emits a single embedding (the reference ModelOutput.embedding). The m/w
    arrays are compile-time constants (they are never trained — the
    reference keeps them as buffers loaded from .npy)."""

    encoder: nn.Module
    m: np.ndarray  # (outdim,)
    w: np.ndarray  # (outdim, outdim)
    latent_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = self.encoder(x, train=train)
        h = out[0] if isinstance(out, tuple) else out
        proj = (h - jnp.asarray(self.m)[None, :]) @ jnp.asarray(self.w)
        return proj[:, : self.latent_dim]


def identity_lcca(outdim: int):
    """Untrained stand-in projection (used when no DCCA artifacts exist yet)."""
    return np.zeros(outdim, np.float32), np.eye(outdim, dtype=np.float32)


class DeepCCA(nn.Module):
    """Pair (or triple) of encoders producing correlated embeddings
    (dcca/models/mnist_svhn.py:13-35)."""

    encoders: Sequence[nn.Module]

    def __call__(self, xs, train: bool = False):
        outs = []
        for enc, x in zip(self.encoders, xs):
            o = enc(x, train=train)
            outs.append(o[0] if isinstance(o, tuple) else o)
        return outs


def dcca_encoders_mnist_svhn(outdim: int = 16):
    """DeepCCA_MNIST_SVHN trunk pair (dcca/models/mnist_svhn.py:13-18):
    MLP for MNIST, conv for SVHN."""
    return [
        MLPEncoder(latent_dim=outdim, name="dcca_mnist"),
        EncoderSVHN(latent_dim=outdim, name="dcca_svhn"),
    ]


def dcca_encoders_circles(outdim: int = 16):
    """dcca/models/circles.py analog: conv encoders for 1x32x32."""
    return [
        EncoderSVHN(latent_dim=outdim, n_channels=1, name="dcca_squares"),
        EncoderSVHN(latent_dim=outdim, n_channels=1, name="dcca_circles"),
    ]
