"""DCCA objectives — eigendecomposition CCA loss (dcca/objectives.py:4-108).

The reference trains DCCA in float64 (dcca/trainings/main_mnist_svhn.py:20);
jnp.linalg.eigh on TPU runs in float32, so we keep the reference's r=1e-3
ridge and add an eps floor — on the CPU backend (tests / pretraining) enable
jax_enable_x64 for exact parity.
"""

from __future__ import annotations

import functools

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


# ---------------------------------------------------------------------------
# TPU-native formulation: Cholesky whitening + custom singular-value VJP
# ---------------------------------------------------------------------------
#
# The eigh-based cca_corr above is the float64-CPU parity oracle (matching
# dcca/objectives.py:46-66 exactly), but jax.grad through eigh stalls the TPU
# compiler and is ill-conditioned in float32. Here the whitening runs through
# Cholesky factors and triangular solves (both TPU-friendly and cheaply
# differentiable), and the only spectral op — singular values of the small
# (outdim x outdim) T matrix — carries a custom VJP, so XLA never has to
# differentiate through a decomposition:
#
#   corr = sum_k sqrt(sigma_k(T)^2 + r),  dcorr/dT = sum_k c_k u_k v_k^T
#   with c_k = sigma_k / sqrt(sigma_k^2 + r)  (exact for distinct sigma).
#
# The +r inside the sqrt mirrors the reference's trace_TT + r*I
# regularization (dcca/objectives.py:81-84) so values match the oracle.

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _sum_topk_sv(T, k: int, r: float):
    s = jnp.linalg.svd(T, compute_uv=False)
    return jnp.sum(jnp.sqrt(jax.lax.top_k(s ** 2 + r, k)[0]))


def _sum_topk_sv_fwd(T, k: int, r: float):
    u, s, vt = jnp.linalg.svd(T, full_matrices=False)
    corr = jnp.sum(jnp.sqrt(jax.lax.top_k(s ** 2 + r, k)[0]))
    return corr, (u, s, vt)


def _sum_topk_sv_bwd(k: int, r: float, res, g):
    u, s, vt = res
    coef = s / jnp.sqrt(s ** 2 + r)
    # zero out singular directions beyond the top-k (s is sorted descending)
    coef = jnp.where(jnp.arange(s.shape[0]) < k, coef, 0.0)
    return (g * (u * coef[None, :]) @ vt,)


_sum_topk_sv.defvjp(_sum_topk_sv_fwd, _sum_topk_sv_bwd)


def cca_corr_chol(h1: jax.Array, h2: jax.Array, outdim_size: int,
                  use_all_singular_values: bool = False,
                  r1: float = 1e-3, r2: float = 1e-3) -> jax.Array:
    """Sum of top-k canonical correlations via Cholesky whitening — value
    parity with cca_corr (CPU/x64 oracle) to ~1e-3 in float32, but compiles
    cleanly for the TPU (no eigh gradient)."""
    m = h1.shape[0]
    h1b = h1 - h1.mean(axis=0, keepdims=True)
    h2b = h2 - h2.mean(axis=0, keepdims=True)
    S12 = (h1b.T @ h2b) / (m - 1)
    S11 = (h1b.T @ h1b) / (m - 1) + r1 * jnp.eye(h1.shape[1], dtype=h1.dtype)
    S22 = (h2b.T @ h2b) / (m - 1) + r2 * jnp.eye(h2.shape[1], dtype=h2.dtype)
    L1 = jnp.linalg.cholesky(S11)
    L2 = jnp.linalg.cholesky(S22)
    # T = L1^{-1} S12 L2^{-T}  (same singular values as S11^{-1/2} S12
    # S22^{-1/2}: both whiten the two covariances)
    T = jax.scipy.linalg.solve_triangular(L1, S12, lower=True)
    T = jax.scipy.linalg.solve_triangular(L2, T.T, lower=True).T
    k = min(T.shape) if use_all_singular_values else outdim_size
    r = 0.0 if use_all_singular_values else r1
    return _sum_topk_sv(T, k, r)


def cca_loss_chol(h1, h2, outdim_size, use_all_singular_values=False):
    return -cca_corr_chol(h1, h2, outdim_size, use_all_singular_values)


def mcca_loss_chol(h_list, outdim_size, use_all_singular_values=False):
    loss = 0.0
    for i in range(len(h_list)):
        for j in range(i + 1, len(h_list)):
            loss = loss + cca_loss_chol(h_list[i], h_list[j], outdim_size,
                                        use_all_singular_values)
    return loss
