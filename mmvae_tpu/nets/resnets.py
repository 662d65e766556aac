"""ResNet encoders/decoders for MedMNIST (28x28) and CelebA (64x64).

Rebuilds models/nn/medmnist.py:100-430 and the pythae celeba benchmark nets
the reference imports (models/jmvae_nf/celeba.py:23). Structure: 3 strided
convs to a small feature map, pythae-style ResBlocks
(ReLU-conv3x3-ReLU-conv1x1 with additive skip), then linear heads; decoders
mirror with ConvTranspose stages and a Sigmoid output.
"""

from __future__ import annotations

from flax import linen as nn

from .conv import Conv2d, ConvTranspose2d, Linear


class ResBlock(nn.Module):
    """pythae benchmarks ResBlock: x + conv1x1(relu(conv3x3(relu(x))))."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[1]
        h = nn.relu(x)
        h = Conv2d(self.out_channels, 3, 1, padding=1)(h)
        h = nn.relu(h)
        h = Conv2d(in_ch, 1, 1, padding=0)(h)
        return x + h


class EncoderResNetVAE(nn.Module):
    """Shared ResNet VAE encoder. feature_map: final spatial size
    (4 for 28x28 MedMNIST, 8 for 64x64 CelebA)."""

    latent_dim: int
    n_channels: int = 1
    feature_map: int = 4
    n_res_blocks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv2d(64, 4, 2, padding=1)(x)
        h = Conv2d(128, 4, 2, padding=1)(h)
        h = Conv2d(128, 3, 2, padding=1)(h)
        for _ in range(self.n_res_blocks):
            h = ResBlock(out_channels=32)(h)
        h = h.reshape(h.shape[0], -1)
        return Linear(self.latent_dim, name="embedding")(h), Linear(
            self.latent_dim, name="log_var"
        )(h)


class DecoderResNetAE(nn.Module):
    """Shared ResNet decoder (medmnist.py:386-425 / pythae celeba)."""

    latent_dim: int
    n_channels: int = 1
    feature_map: int = 4
    n_res_blocks: int = 3
    first_output_padding: int = 0  # 0: 4->7 (medmnist); 1: 8->16 (celeba)

    @nn.compact
    def __call__(self, z, train: bool = False):
        lead = z.shape[:-1]
        h = Linear(128 * self.feature_map ** 2)(z.reshape(-1, z.shape[-1]))
        h = h.reshape(-1, 128, self.feature_map, self.feature_map)
        h = ConvTranspose2d(128, 3, 2, padding=1,
                            output_padding=self.first_output_padding)(h)
        for _ in range(self.n_res_blocks):
            h = ResBlock(out_channels=32)(h)
        h = nn.relu(h)
        h = nn.relu(ConvTranspose2d(64, 3, 2, padding=1, output_padding=1)(h))
        h = nn.sigmoid(
            # head=True: likelihood-parameter layer stays f32 (ADVICE r4)
            ConvTranspose2d(self.n_channels, 3, 2, padding=1, output_padding=1,
                            head=True)(h)
        )
        return h.reshape(*lead, *h.shape[1:])


def medmnist_encoder(latent_dim: int, n_channels: int = 1):
    """Encoder_ResNet_VAE_medmnist (medmnist.py:173-316): 28x28 -> 4x4."""
    return EncoderResNetVAE(latent_dim=latent_dim, n_channels=n_channels, feature_map=4)


def medmnist_decoder(latent_dim: int, n_channels: int = 1):
    """Decoder_ResNet_AE_medmnist (medmnist.py:318-430): 4x4 -> 28x28."""
    return DecoderResNetAE(latent_dim=latent_dim, n_channels=n_channels, feature_map=4)


def celeba_encoder(latent_dim: int):
    """pythae Encoder_ResNet_VAE_CELEBA shape-equivalent: 64x64 -> 8x8."""
    return EncoderResNetVAE(latent_dim=latent_dim, n_channels=3, feature_map=8,
                            n_res_blocks=2)


def celeba_decoder(latent_dim: int):
    return DecoderResNetAE(latent_dim=latent_dim, n_channels=3, feature_map=8,
                           n_res_blocks=2, first_output_padding=1)
