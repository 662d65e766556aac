"""Pallas TPU kernel: fused autoregressive-flow solve.

The sequential direction of IAF/MAF (iaf_model.py:60-72) runs D full MADE
passes, one per latent dim. Naively that is D x n_layers kernel launches
with HBM round-trips for every activation. This kernel keeps the batch
tile, the (mask-premultiplied) weights, and the evolving output y entirely
in VMEM and runs the whole D-step solve in ONE kernel launch — the masked
matmuls hit the MXU back-to-back with no HBM traffic in between.

Layout: everything is kept feature-major (features x batch) inside the
kernel so the per-dim reads/writes are dynamic SUBLANE indexing (cheap on
TPU) while the batch rides the 128-wide lanes.

Gradients: wrapped in jax.custom_vjp; the backward re-runs the
differentiable unrolled solve and autodiffs through it, so training paths
that hit the sequential direction still work while inference/sampling paths
get the fused kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(n_hidden: int, features: int, sign: int, s_bound: float):
    def kernel(*refs):
        # refs: xT, wT_0, bT_0, ..., wT_n, bT_n, yT_out, ld_out
        x_ref = refs[0]
        ws = refs[1: 1 + 2 * (n_hidden + 1): 2]
        bs = refs[2: 2 + 2 * (n_hidden + 1): 2]
        y_ref = refs[1 + 2 * (n_hidden + 1)]
        ld_ref = refs[2 + 2 * (n_hidden + 1)]

        x = x_ref[:]
        wlist = [w[:] for w in ws]
        blist = [b[:] for b in bs]
        ld = jnp.zeros((1, x.shape[1]), dtype=x.dtype)
        y_ref[:] = jnp.zeros_like(y_ref)
        # static unroll over the latent dim: all row indexing is static; the
        # evolving y lives in the VMEM output ref (row stores, no scatter)
        for i in range(features):
            h = y_ref[:]
            for li in range(n_hidden):
                h = jnp.maximum(
                    jnp.dot(wlist[li], h, preferred_element_type=jnp.float32)
                    + blist[li],
                    0.0,
                )
            o = jnp.dot(wlist[n_hidden], h, preferred_element_type=jnp.float32) \
                + blist[n_hidden]  # (2D, tile)
            mu_i = o[i, :]
            s_i = o[i + features, :]
            if s_bound > 0.0:  # bounded log-scale (flows/autoregressive.py)
                s_i = s_bound * jnp.tanh(s_i / s_bound)
            x_i = x[i, :]
            if sign < 0:  # IAF density dir: y_i = (x_i - mu_i) * exp(-s_i)
                y_i = (x_i - mu_i) * jnp.exp(-s_i)
            else:         # MAF sampling dir: y_i = x_i * exp(s_i) + mu_i
                y_i = x_i * jnp.exp(s_i) + mu_i
            y_ref[i, :] = y_i
            ld = ld + (sign * s_i)[None, :]
        ld_ref[:] = ld

    return kernel


def _pallas_solve(x, masked_weights, biases, sign: int, interpret: bool,
                  s_bound: float = 0.0):
    """x: (B, D). weights[li]: (in, out) as used by `h @ W`; transposed to
    (out, in) feature-major inside. Returns (y (B, D), ld (B,))."""
    from jax.experimental import pallas as pl

    b, d = x.shape
    n_hidden = len(masked_weights) - 1
    tile_b = min(_round_up(max(b, 128), 128), 2048)
    b_pad = _round_up(b, tile_b)
    xt = jnp.pad(x, ((0, b_pad - b), (0, 0))).T  # (D, b_pad)

    args = [xt]
    in_specs = [pl.BlockSpec((d, tile_b), lambda i: (0, i))]
    for w, bia in zip(masked_weights, biases):
        wt = w.T  # (out, in)
        args.extend([wt, bia.reshape(-1, 1)])
        in_specs.append(pl.BlockSpec(wt.shape, lambda i: (0, 0)))
        in_specs.append(pl.BlockSpec((bia.shape[-1], 1), lambda i: (0, 0)))

    yt, ld = pl.pallas_call(
        _make_kernel(n_hidden, d, sign, s_bound),
        grid=(b_pad // tile_b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((d, tile_b), lambda i: (0, i)),
            pl.BlockSpec((1, tile_b), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, b_pad), x.dtype),
            jax.ShapeDtypeStruct((1, b_pad), x.dtype),
        ],
        interpret=interpret,
    )(*args)
    return yt.T[:b], ld[0, :b]


def unrolled_solve(x, masked_weights, biases, sign: int, s_bound: float = 0.0):
    """Differentiable reference implementation (identical math to
    flows/autoregressive._sequential_shift_scale); used for the VJP and as
    the numerical oracle in tests."""
    d = x.shape[-1]
    n_hidden = len(masked_weights) - 1
    y = jnp.zeros_like(x)
    ld = jnp.zeros(x.shape[:-1], dtype=x.dtype)
    for i in range(d):
        h = y
        for li in range(n_hidden):
            h = jnp.maximum(h @ masked_weights[li] + biases[li], 0.0)
        o = h @ masked_weights[n_hidden] + biases[n_hidden]
        mu_i, s_i = o[..., i], o[..., i + d]
        if s_bound > 0.0:
            s_i = s_bound * jnp.tanh(s_i / s_bound)
        if sign < 0:
            y_i = (x[..., i] - mu_i) * jnp.exp(-s_i)
        else:
            y_i = x[..., i] * jnp.exp(s_i) + mu_i
        y = y.at[..., i].set(y_i)
        ld = ld + sign * s_i
    return y, ld


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ar_solve(x, masked_weights, biases, sign: int, s_bound: float = 0.0):
    """Fused autoregressive solve: sign=-1 IAF density dir, sign=+1 MAF
    sampling dir. x: (..., D). Returns (y, logdet). s_bound > 0 enables the
    bounded log-scale variant (flows/autoregressive._ARFlowBase.s_bound)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    interpret = jax.default_backend() != "tpu"
    y, ld = _pallas_solve(x2, list(masked_weights), list(biases), sign,
                          interpret, s_bound)
    return y.reshape(*lead, -1), ld.reshape(lead)


def _ar_solve_fwd(x, masked_weights, biases, sign, s_bound):
    out = ar_solve(x, masked_weights, biases, sign, s_bound)
    return out, (x, tuple(masked_weights), tuple(biases))


def _ar_solve_bwd(sign, s_bound, res, cts):
    x, masked_weights, biases = res
    _, vjp = jax.vjp(
        lambda xx, ww, bb: unrolled_solve(xx, list(ww), list(bb), sign, s_bound),
        x, masked_weights, biases,
    )
    gx, gw, gb = vjp(cts)
    return gx, list(gw), list(gb)


ar_solve.defvjp(_ar_solve_fwd, _ar_solve_bwd)
