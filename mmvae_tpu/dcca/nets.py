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
        MLPEncoder(latent_dim=outdim),
        EncoderSVHN(latent_dim=outdim),
    ]


def dcca_encoders_circles(outdim: int = 16):
    """dcca/models/circles.py analog: conv encoders for 1x32x32."""
    return [
        EncoderSVHN(latent_dim=outdim, n_channels=1),
        EncoderSVHN(latent_dim=outdim, n_channels=1),
    ]


def dcca_encoders_celeba(outdim: int = 40):
    """DeepCCA_celeba (dcca/models/celeba.py:15-21): CelebA ResNet encoder
    for the image, MLP for the 1x1x40 attribute tensor."""
    from ..nets.resnets import celeba_encoder

    return [
        celeba_encoder(outdim),
        MLPEncoder(latent_dim=outdim),
    ]


def dcca_encoders_medmnist(outdim: int = 16):
    """DeepCCA_MedMNIST (dcca/models/medmnist.py:16-21): medmnist ResNet
    encoders for both (1,28,28) pneumonia and (3,28,28) blood."""
    from ..nets.resnets import medmnist_encoder

    return [medmnist_encoder(outdim, 1), medmnist_encoder(outdim, 3)]


def dcca_encoders_chest_svhn(outdim: int = 16):
    """DeepCCA chest-SVHN (dcca/models/chest_svhn.py:16-21): medmnist ResNet
    for the chest X-ray, conv for SVHN."""
    from ..nets.resnets import medmnist_encoder

    return [medmnist_encoder(outdim, 1), EncoderSVHN(latent_dim=outdim)]


def dcca_encoders_mnist_contour(outdim: int = 15):
    """DeepCCA_MNIST_CONTOUR (dcca/models/mnist_contour.py:12-15): MLP x2."""
    return [
        MLPEncoder(latent_dim=outdim),
        MLPEncoder(latent_dim=outdim),
    ]


def dcca_encoders_msf(outdim: int = 16):
    """Trimodal DeepCCA_MNIST_SVHN_FASHION (dcca/models/
    mnist_svhn_fashion.py:13-17): MLP + SVHN conv + MLP, trained with the
    pairwise mcca loss."""
    return [
        MLPEncoder(latent_dim=outdim),
        EncoderSVHN(latent_dim=outdim),
        MLPEncoder(latent_dim=outdim),
    ]


# dataset key -> (builder, default trunk outdim) — the load_dcca_* factory
# table (dcca/models/__init__.py:1-18 + chest_svhn/msf modules)
DCCA_BUILDERS = {
    "mnist_svhn": (dcca_encoders_mnist_svhn, 16),
    "circles_squares": (dcca_encoders_circles, 16),
    "celeba": (dcca_encoders_celeba, 40),
    "medmnist": (dcca_encoders_medmnist, 16),
    "chest_svhn": (dcca_encoders_chest_svhn, 16),
    "mnist_contour": (dcca_encoders_mnist_contour, 15),
    "mnist_svhn_fashion": (dcca_encoders_msf, 16),
}
