"""Per-modality encoder/decoder architectures.

Exact rebuilds of the reference nets (models/nn/encoders.py); layer shapes,
activations, and head structure are part of the public behavior (the paper's
numbers depend on them). Encoders return (embedding, log_covariance) like the
reference ModelOutput contract; decoders return the reconstruction mean.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import BatchNorm2d, Conv2d, ConvTranspose2d, Linear


class EncoderMNIST(nn.Module):
    """3x conv(BN,ReLU) -> 2 linear heads (encoders.py:8-41). Input (B,1,28,28)."""

    latent_dim: int
    f_base: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.f_base
        h = nn.relu(BatchNorm2d(f)(Conv2d(f, 4, 2, padding=1)(x), train))        # 14x14
        h = nn.relu(BatchNorm2d(2 * f)(Conv2d(2 * f, 4, 2, padding=1)(h), train))  # 7x7
        h = nn.relu(BatchNorm2d(4 * f)(Conv2d(4 * f, 5, 2, padding=1)(h), train))  # 3x3
        h = h.reshape(h.shape[0], -1)
        return Linear(self.latent_dim, name="embedding")(h), Linear(
            self.latent_dim, name="log_var"
        )(h)


class DecoderMNIST(nn.Module):
    """fc -> 3 deconv(BN,ReLU) -> Sigmoid (encoders.py:44-68). Output (B,1,28,28)."""

    latent_dim: int
    f_base: int = 32
    n_channels: int = 1

    @nn.compact
    def __call__(self, z, train: bool = False):
        f = self.f_base
        lead = z.shape[:-1]
        z = z.reshape(-1, z.shape[-1])
        h = Linear(f * 4 * 4 * 4, name="fc")(z).reshape(-1, f * 4, 4, 4)
        h = nn.relu(BatchNorm2d(2 * f)(ConvTranspose2d(2 * f, 3, 2, padding=1)(h), train))
        h = nn.relu(
            BatchNorm2d(f)(
                ConvTranspose2d(f, 3, 2, padding=1, output_padding=1)(h), train
            )
        )
        # head=True: the sigmoid output IS the reconstruction
        # distribution's parameter — precision.py's 'distribution params
        # stay f32' contract applies to likelihood heads too (ADVICE r4)
        h = nn.sigmoid(ConvTranspose2d(self.n_channels, 3, 2, padding=1, output_padding=1, head=True)(h))
        return h.reshape(*lead, *h.shape[1:])


class EncoderSVHN(nn.Module):
    """3 conv(ReLU) + 2 conv heads (encoders.py:72-105). Input (B,C,32,32)."""

    latent_dim: int
    n_channels: int = 3
    f_base: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.f_base
        h = nn.relu(Conv2d(f, 4, 2, padding=1)(x))          # 16x16
        h = nn.relu(Conv2d(f * 2, 4, 2, padding=1)(h))      # 8x8
        h = nn.relu(Conv2d(f * 4, 4, 2, padding=1)(h))      # 4x4
        mu = Conv2d(self.latent_dim, 4, 2, padding=0, name="c1", head=True)(h)
        lv = Conv2d(self.latent_dim, 4, 2, padding=0, name="c2", head=True)(h)
        return mu.reshape(-1, self.latent_dim), lv.reshape(-1, self.latent_dim)


class DecoderSVHN(nn.Module):
    """4 deconv(ReLU) -> Sigmoid (encoders.py:108-136). Output (B,C,32,32)."""

    latent_dim: int
    n_channels: int = 3
    f_base: int = 32

    @nn.compact
    def __call__(self, z, train: bool = False):
        f = self.f_base
        lead = z.shape[:-1]
        h = z.reshape(-1, z.shape[-1], 1, 1)
        h = nn.relu(ConvTranspose2d(f * 4, 4, 1, padding=0)(h))   # 4x4
        h = nn.relu(ConvTranspose2d(f * 2, 4, 2, padding=1)(h))   # 8x8
        h = nn.relu(ConvTranspose2d(f, 4, 2, padding=1)(h))       # 16x16
        # head=True: likelihood-parameter layer stays f32 (ADVICE r4)
        h = nn.sigmoid(ConvTranspose2d(self.n_channels, 4, 2, padding=1, head=True)(h))  # 32x32
        return h.reshape(*lead, *h.shape[1:])


class MLPEncoder(nn.Module):
    """pythae default Encoder_VAE_MLP: flatten -> Linear(512) ReLU -> heads."""

    latent_dim: int
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.reshape(x.shape[0], -1)
        h = nn.relu(Linear(self.hidden_dim)(h))
        return Linear(self.latent_dim, name="embedding")(h), Linear(
            self.latent_dim, name="log_var"
        )(h)


class MLPDecoder(nn.Module):
    """pythae default Decoder_AE_MLP: Linear(512) ReLU -> Linear(prod) Sigmoid."""

    latent_dim: int
    output_shape: Sequence[int]
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, z, train: bool = False):
        import numpy as np

        lead = z.shape[:-1]
        h = z.reshape(-1, z.shape[-1])
        h = nn.relu(Linear(self.hidden_dim)(h))
        out = nn.sigmoid(Linear(int(np.prod(self.output_shape)))(h))
        return out.reshape(*lead, *self.output_shape)


class EncoderOASIS(nn.Module):
    """MLP encoder for flat inputs (encoders.py:217-234)."""

    latent_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.reshape(x.shape[0], -1)
        h = nn.relu(Linear(1000)(h))
        h = nn.relu(Linear(400)(h))
        return Linear(self.latent_dim, name="mu")(h), Linear(
            self.latent_dim, name="lcov"
        )(h)


class DecoderOASIS(nn.Module):
    """MLP decoder (encoders.py:237-250)."""

    latent_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, z, train: bool = False):
        h = nn.relu(Linear(400)(z))
        h = nn.relu(Linear(1000)(h))
        return nn.sigmoid(Linear(self.output_dim)(h))


class TwoStepsEncoder(nn.Module):
    """Frozen pretrained trunk -> trainable MLP -> heads (encoders.py:176-210).

    The reference freezes the trunk with requires_grad_(False)+no_grad; here
    the trunk output goes through stop_gradient, and the trunk's params are
    additionally excluded from the optimizer by the freezing mask
    (train/freezing.py), matching both the gradient and update semantics.
    """

    first_encoder: nn.Module
    latent_dim: int
    hidden_dim: int = 512
    num_hidden: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.first_encoder(x)
        if isinstance(h, tuple):
            h = h[0]  # embedding
        h = jax.lax.stop_gradient(h)
        for _ in range(self.num_hidden):
            h = nn.relu(Linear(self.hidden_dim)(h))
        return Linear(self.latent_dim, name="embedding")(h), Linear(
            self.latent_dim, name="log_var"
        )(h)


class TwoStepsDecoder(nn.Module):
    """MLP -> frozen pretrained decoder (encoders.py:140-173)."""

    pretrained_decoder: nn.Module
    pretrained_latent_dim: int
    latent_dim: int
    hidden_dim: int = 512
    num_hidden: int = 1

    @nn.compact
    def __call__(self, z, train: bool = False):
        h = z
        h = nn.relu(Linear(self.hidden_dim)(h))
        for _ in range(self.num_hidden - 1):
            h = nn.relu(Linear(self.hidden_dim)(h))
        h = nn.relu(Linear(self.pretrained_latent_dim)(h))
        return self.pretrained_decoder(h)
