"""IAF / MAF normalizing flows (TPU-native rebuild).

Reference behavior:
- IAF: my_pythae/models/normalizing_flows/iaf/iaf_model.py
  * forward (data -> prior, density direction) is sequential in the latent
    dim (iaf_model.py:60-72) — the single most kernel-unfriendly construct
    in the reference; here it is an unrolled autoregressive solve (static
    latent_dim, so XLA sees a fixed chain of small masked matmuls).
  * inverse (prior -> data, sampling) is a single parallel MADE pass per
    block (iaf_model.py:94-100).
- MAF: external pythae MAF (mirrored structure, directions swapped):
  forward/density is the parallel direction, inverse/sampling sequential.
  The live configs default to flow="maf" so the training path only ever
  needs the parallel direction (SURVEY §7 "hard parts").

Both flows flip the feature axis after each block (iaf_model.py:78).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNormFlow
from .made import MADE


class _ARFlowBase(nn.Module):
    """Shared stack-of-MADE machinery for IAF/MAF."""

    features: int
    n_made_blocks: int = 2
    n_hidden_in_made: int = 3
    hidden_size: int = 128
    include_batch_norm: bool = False
    use_fused: bool = True  # Pallas fused solve for the sequential direction
    # Opt-in bounded log-scale: s -> s_bound * tanh(s / s_bound) before the
    # exp (0 = off, reference-exact). Why (VERDICT r4 weak#1): the MADE `s`
    # head is unbounded (made_model.py:97-111); late in training a single
    # large-|s| excursion overflows (v - mu) * exp(-s) and the run NaNs —
    # the MedMNIST JNF recipe died at epoch 92/100 this way (both here and
    # in the reference). tanh-bounding is a smooth no-op in the healthy
    # regime (relative error (s/s_bound)^2/3 ~ 1e-4 at s_bound=8) and caps
    # |logdet| per dim at s_bound, keeping exp() finite in f32.
    s_bound: float = 0.0

    def setup(self):
        self.mades = [
            MADE(
                features=self.features,
                hidden_sizes=(self.hidden_size,) * self.n_hidden_in_made,
                name=f"made_{i}",
            )
            for i in range(self.n_made_blocks)
        ]
        if self.include_batch_norm:
            self.bns = [
                BatchNormFlow(features=self.features, name=f"bn_{i}")
                for i in range(self.n_made_blocks)
            ]

    # -- block primitives ---------------------------------------------------

    def _parallel_shift_scale(self, made, v, sign: int):
        """One parallel MADE pass.

        sign=-1: v -> (v - mu) * exp(-s), logdet -sum(s)   (MAF density dir)
        sign=+1: v -> v * exp(s) + mu,    logdet +sum(s)   (IAF sampling dir)
        """
        mu, s = made(v)
        if self.s_bound > 0.0:
            s = self.s_bound * jnp.tanh(s / self.s_bound)
        if sign < 0:
            out = (v - mu) * jnp.exp(-s)
        else:
            out = v * jnp.exp(s) + mu
        return out, sign * jnp.sum(s, axis=-1)

    def _sequential_shift_scale(self, made, v, sign: int):
        """Autoregressive solve building the output one dim at a time.

        sign=-1: y_i = (v_i - mu_i(y)) * exp(-s_i(y))  (IAF density dir,
                 iaf_model.py:62-71)
        sign=+1: y_i = v_i * exp(s_i(y)) + mu_i(y)     (MAF sampling dir)

        MADE outputs at dim i depend only on inputs < i, so feeding the
        partially-built y is exact. Runs as ONE fused Pallas kernel
        (ops/ar_flow.py) keeping the whole D-step solve in VMEM; falls back
        to the unrolled form when use_fused=False.
        """
        if self.use_fused:
            from ..ops.ar_flow import ar_solve

            ws, bs = made.masked_layer_params()
            return ar_solve(v, ws, bs, sign, self.s_bound)
        y = jnp.zeros_like(v)
        logdet = jnp.zeros(v.shape[:-1], dtype=v.dtype)
        for i in range(self.features):
            mu, s = made(y)
            if self.s_bound > 0.0:
                s = self.s_bound * jnp.tanh(s / self.s_bound)
            if sign < 0:
                yi = (v[..., i] - mu[..., i]) * jnp.exp(-s[..., i])
            else:
                yi = v[..., i] * jnp.exp(s[..., i]) + mu[..., i]
            y = y.at[..., i].set(yi)
            logdet = logdet + sign * s[..., i]
        return y, logdet


def _run_blocks(flow: _ARFlowBase, x, *, reverse: bool, made_fn, bn_inverse: bool, train: bool):
    """Apply MADE (+BN) blocks in order, flipping after each block layer.

    Forward order: [made_0, bn_0?, made_1, bn_1?, ...], each followed by a
    feature flip. Reverse order: flip first, layers reversed (iaf_model.py:91-107).
    """
    logdet = jnp.zeros(x.shape[:-1], dtype=x.dtype)
    layers = []
    for i in range(flow.n_made_blocks):
        layers.append(("made", i))
        if flow.include_batch_norm:
            layers.append(("bn", i))
    if reverse:
        layers = layers[::-1]
    for kind, i in layers:
        if reverse:
            x = jnp.flip(x, axis=-1)
        if kind == "made":
            x, ld = made_fn(flow.mades[i], x)
        else:
            x, ld = flow.bns[i](x, train=train, inverse=bn_inverse)
        logdet = logdet + ld
        if not reverse:
            x = jnp.flip(x, axis=-1)
    return x, logdet


class IAF(_ARFlowBase):
    """Inverse Autoregressive Flow (iaf_model.py)."""

    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        return self.forward(x, train=train)

    def forward(self, x, train: bool = False):
        """Data -> prior (density direction); sequential per block."""
        return _run_blocks(
            self, x, reverse=False,
            made_fn=lambda m, v: self._sequential_shift_scale(m, v, sign=-1),
            bn_inverse=False, train=train,
        )

    def inverse(self, y, train: bool = False):
        """Prior -> data (sampling direction); parallel per block."""
        return _run_blocks(
            self, y, reverse=True,
            made_fn=lambda m, v: self._parallel_shift_scale(m, v, sign=+1),
            bn_inverse=True, train=train,
        )


class MAF(_ARFlowBase):
    """Masked Autoregressive Flow (external pythae MAF, mirrored directions)."""

    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        return self.forward(x, train=train)

    def forward(self, x, train: bool = False):
        """Data -> prior (density direction); parallel per block."""
        return _run_blocks(
            self, x, reverse=False,
            made_fn=lambda m, v: self._parallel_shift_scale(m, v, sign=-1),
            bn_inverse=False, train=train,
        )

    def inverse(self, y, train: bool = False):
        """Prior -> data (sampling direction); sequential per block."""
        return _run_blocks(
            self, y, reverse=True,
            made_fn=lambda m, v: self._sequential_shift_scale(m, v, sign=+1),
            bn_inverse=True, train=train,
        )
