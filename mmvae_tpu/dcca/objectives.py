"""DCCA objectives — eigendecomposition CCA loss (dcca/objectives.py:4-108).

The reference trains DCCA in float64 (dcca/trainings/main_mnist_svhn.py:20);
jnp.linalg.eigh on TPU runs in float32, so we keep the reference's r=1e-3
ridge and add an eps floor — on the CPU backend (tests / pretraining) enable
jax_enable_x64 for exact parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cca_corr(h1: jax.Array, h2: jax.Array, outdim_size: int,
             use_all_singular_values: bool = False,
             r1: float = 1e-3, r2: float = 1e-3, eps: float = 1e-9) -> jax.Array:
    """Sum of the top-k canonical correlations (the loss is its negation).

    h1, h2: (batch, features) network outputs.
    """
    H1, H2 = h1.T, h2.T
    o1, o2 = H1.shape[0], H2.shape[0]
    m = H1.shape[1]

    H1bar = H1 - H1.mean(axis=1, keepdims=True)
    H2bar = H2 - H2.mean(axis=1, keepdims=True)

    S12 = (1.0 / (m - 1)) * (H1bar @ H2bar.T)
    S11 = (1.0 / (m - 1)) * (H1bar @ H1bar.T) + r1 * jnp.eye(o1, dtype=h1.dtype)
    S22 = (1.0 / (m - 1)) * (H2bar @ H2bar.T) + r2 * jnp.eye(o2, dtype=h1.dtype)

    def root_inv(S):
        d, v = jnp.linalg.eigh(S)
        d = jnp.clip(d, min=eps)  # stability floor (objectives.py:55-61)
        return (v * (d ** -0.5)) @ v.T

    Tval = root_inv(S11) @ S12 @ root_inv(S22)

    if use_all_singular_values:
        tt = Tval.T @ Tval
        d, _ = jnp.linalg.eigh(tt)
        return jnp.sum(jnp.sqrt(jnp.clip(d, min=eps)))
    tt = Tval.T @ Tval + r1 * jnp.eye(Tval.shape[1], dtype=h1.dtype)
    d, _ = jnp.linalg.eigh(tt)
    d = jnp.clip(d, min=eps)
    top = jax.lax.top_k(d, outdim_size)[0]
    return jnp.sum(jnp.sqrt(top))


def cca_loss(h1, h2, outdim_size, use_all_singular_values=False):
    """Negative correlation, the training loss (objectives.py:85)."""
    return -cca_corr(h1, h2, outdim_size, use_all_singular_values)


def mcca_loss(h_list, outdim_size, use_all_singular_values=False):
    """Pairwise sum for >= 3 modalities (objectives.py:89-108)."""
    loss = 0.0
    for i in range(len(h_list)):
        for j in range(i + 1, len(h_list)):
            loss = loss + cca_loss(h_list[i], h_list[j], outdim_size,
                                   use_all_singular_values)
    return loss
