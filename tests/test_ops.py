"""Pallas kernel correctness: the fused autoregressive solve must match the
unrolled reference bit-for-bit (interpret mode on CPU), in both directions,
with matching gradients through the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.flows import IAF, MAF
from mmvae_tpu.ops.ar_flow import ar_solve, unrolled_solve

D = 6


def _weights(key, n_hidden=2, hidden=16):
    ks = jax.random.split(key, 2 * (n_hidden + 1))
    sizes = [D] + [hidden] * n_hidden + [2 * D]
    ws, bs = [], []
    for i in range(n_hidden + 1):
        w = jax.random.normal(ks[2 * i], (sizes[i], sizes[i + 1])) * 0.3
        # emulate autoregressive masking: zero a random triangular-ish set
        ws.append(w)
        bs.append(jax.random.normal(ks[2 * i + 1], (sizes[i + 1],)) * 0.1)
    return ws, bs


@pytest.mark.parametrize("sign", [-1, 1])
def test_ar_solve_matches_unrolled(sign):
    ws, bs = _weights(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, D))
    y1, ld1 = ar_solve(x, ws, bs, sign)
    y2, ld2 = unrolled_solve(x, ws, bs, sign)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), rtol=1e-5, atol=1e-5)


def test_ar_solve_gradients_match():
    ws, bs = _weights(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (4, D))

    def loss_fused(x, ws, bs):
        y, ld = ar_solve(x, ws, bs, -1)
        return jnp.sum(y ** 2) + jnp.sum(ld)

    def loss_ref(x, ws, bs):
        y, ld = unrolled_solve(x, ws, bs, -1)
        return jnp.sum(y ** 2) + jnp.sum(ld)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("flow_cls", [IAF, MAF])
def test_flow_fused_matches_unrolled(flow_cls):
    """End-to-end: the flow module with use_fused=True must reproduce the
    unrolled module exactly (same params)."""
    f_fast = flow_cls(features=D, n_made_blocks=2, n_hidden_in_made=2,
                      hidden_size=16, use_fused=True)
    f_ref = flow_cls(features=D, n_made_blocks=2, n_hidden_in_made=2,
                     hidden_size=16, use_fused=False)
    key = jax.random.PRNGKey(4)
    v = f_ref.init(key, jnp.zeros((2, D)))
    x = jax.random.normal(jax.random.PRNGKey(5), (3, D))
    for method in ["forward", "inverse"]:
        y1, ld1 = f_fast.apply(v, x, method=method)
        y2, ld2 = f_ref.apply(v, x, method=method)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=1e-5, atol=1e-5, err_msg=method)
        np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2),
                                   rtol=1e-5, atol=1e-5, err_msg=method)
