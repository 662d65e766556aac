"""MADE — masked autoregressive MLP (TPU-native rebuild).

Mirrors the mask construction and (mu, log_var) two-head output of the
reference MADE (my_pythae/models/normalizing_flows/made/made_model.py:49-111):
sequential degree ordering, hidden masks m_i >= m_{i-1}, strict output mask
m_hidden < d, output layer emitting [mu, log_var] with the mask repeated.

Masks are static numpy arrays baked into the compiled graph, so XLA sees
ordinary dense matmuls with constant sparsity — it fuses mask*weight at
compile time (no runtime masking cost on the MXU).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sequential_degrees(features: int, hidden_sizes: Sequence[int]):
    """Degrees for sequential ordering (made_model.py:72-75)."""
    degrees = [np.arange(features)]
    for h in hidden_sizes:
        degrees.append(np.arange(h) % (features - 1))
    return degrees


def build_masks(features: int, hidden_sizes: Sequence[int]):
    """Masks in (in, out) layout for `x @ kernel` Dense convention."""
    degs = sequential_degrees(features, hidden_sizes)
    masks = []
    for prev, cur in zip(degs[:-1], degs[1:]):
        masks.append((cur[None, :] >= prev[:, None]).astype(np.float32))
    # strict output mask: hidden degree < output dim (made_model.py:88-93)
    out_mask = (degs[-1][:, None] < np.arange(features)[None, :]).astype(np.float32)
    return masks, out_mask


class MaskedDense(nn.Module):
    """Dense layer with a constant binary mask on the kernel (layers.py:14-25).

    setup-style so parents can read `kernel`/`bias` directly (the fused
    Pallas autoregressive solve premultiplies masks and takes raw weights).
    """

    features: int
    in_features: int
    mask: np.ndarray  # (in, out)

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def masked_kernel(self):
        return jnp.asarray(self.mask) * self.kernel

    def __call__(self, x):
        return x @ self.masked_kernel() + self.bias


class MADE(nn.Module):
    """Masked autoencoder emitting (mu, log_var) heads (made_model.py:97-111)."""

    features: int
    hidden_sizes: Sequence[int]

    def setup(self):
        masks, out_mask = build_masks(self.features, tuple(self.hidden_sizes))
        layers = []
        in_f = self.features
        for i, (h, m) in enumerate(zip(self.hidden_sizes, masks)):
            layers.append(MaskedDense(features=h, in_features=in_f, mask=m,
                                      name=f"hidden_{i}"))
            in_f = h
        self.hidden_layers = layers
        # [mu, log_var] heads share the strict mask (made_model.py:58-64)
        self.out_layer = MaskedDense(
            features=2 * self.features,
            in_features=in_f,
            mask=np.concatenate([out_mask, out_mask], axis=1),
            name="out",
        )

    def masked_layer_params(self):
        """[(masked_kernel, bias)] for hidden layers + output layer, for the
        fused Pallas solve."""
        ws = [l.masked_kernel() for l in self.hidden_layers] + [self.out_layer.masked_kernel()]
        bs = [l.bias for l in self.hidden_layers] + [self.out_layer.bias]
        return ws, bs

    def __call__(self, x):
        h = x
        for layer in self.hidden_layers:
            h = nn.relu(layer(h))
        out = self.out_layer(h)
        mu = out[..., : self.features]
        log_var = out[..., self.features :]
        return mu, log_var
