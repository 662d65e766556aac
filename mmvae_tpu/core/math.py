"""Small math helpers mirroring bivae/utils.py on the compute path."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def log_mean_exp(value: jax.Array, axis: int = 0, keepdims: bool = False) -> jax.Array:
    """logsumexp - log(N) (utils.py:143)."""
    n = value.shape[axis]
    return jax.scipy.special.logsumexp(value, axis=axis, keepdims=keepdims) - math.log(n)


def chunked_logsumexp_mean(log_terms_fn, num_chunks: int, chunk_size: int):
    """IS estimators accumulate per-chunk logsumexps then combine with a final
    logsumexp - log(K) (multi_vaes.py:242-248). Expressed with lax.map so the
    chunk loop compiles to a single fused while-loop on device.

    log_terms_fn: int32 chunk index -> (chunk_size,) log-weights.
    Returns scalar log( (1/K) sum_k exp(term_k) ) with K = num_chunks*chunk_size,
    preserving the reference's per-chunk reduction order.
    """
    per_chunk = jax.lax.map(
        lambda i: jax.scipy.special.logsumexp(log_terms_fn(i)),
        jnp.arange(num_chunks),
    )
    k = num_chunks * chunk_size
    return jax.scipy.special.logsumexp(per_chunk) - math.log(k)


def compute_microbatch_split(shapes, batch: int, K: int) -> int:
    """Reference heuristic (objectives.py:10-17) retained for API parity.

    shapes: per-modality event shapes (without batch dim).
    On TPU we rely on rematerialization instead, but the splitter is exposed
    so host-side loops can bound K*numel identically to the reference.
    """
    s = sum(1.0 / (K * math.prod(shape)) for shape in shapes)
    s = int(1e8 * s)
    assert s > 0, "Cannot fit individual data in memory, consider smaller K"
    return min(batch, s)
