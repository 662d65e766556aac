"""Pure-function probability distributions (loc/scale parameterization).

Replaces `torch.distributions.{Normal,Laplace,Bernoulli}` as used throughout
the reference (models/multi_vaes.py:25 dist_dict). Everything is a pure
function of arrays so it vmaps/jits/shards freely.

Scale conventions (part of the spec — see reference file:line in each fn):
- posterior std from encoders:      std = exp(0.5 * log_var)            (vae_model_adapted.py:84)
- Laplace softmax-std trick:        std = softmax(lv) * D + 1e-6        (laplace_vae.py:69)
- joint-encoder std:                std = exp(0.5 * fc22(e)) + eta      (joint_encoders.py:52-54)
- BaseEncoder joint std:            std = softmax(lv) * D + eta         (joint_encoders.py:30)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .constants import BERNOULLI_EPS, ETA, LOG2PI


class LocScale(NamedTuple):
    """Parameters of a loc/scale family distribution."""

    loc: jax.Array
    scale: jax.Array


# --------------------------------------------------------------------------
# std parameterizations
# --------------------------------------------------------------------------

def std_from_logvar(log_var: jax.Array) -> jax.Array:
    return jnp.exp(0.5 * log_var)


def std_softmax_trick(log_var: jax.Array) -> jax.Array:
    """MMVAE softmax-std trick (laplace_vae.py:69)."""
    d = log_var.shape[-1]
    return jax.nn.softmax(log_var, axis=-1) * d + ETA


def std_joint_encoder(raw: jax.Array) -> jax.Array:
    """Joint-encoder std head (joint_encoders.py:52,81)."""
    return jnp.exp(0.5 * raw) + ETA


# --------------------------------------------------------------------------
# Normal
# --------------------------------------------------------------------------

def normal_log_prob(p: LocScale, x: jax.Array) -> jax.Array:
    var = p.scale ** 2
    return -((x - p.loc) ** 2) / (2 * var) - jnp.log(p.scale) - 0.5 * LOG2PI


def normal_sample(p: LocScale, key: jax.Array, sample_shape=()) -> jax.Array:
    shape = tuple(sample_shape) + jnp.broadcast_shapes(p.loc.shape, p.scale.shape)
    eps = jax.random.normal(key, shape, dtype=jnp.result_type(p.loc))
    return p.loc + eps * p.scale


def normal_kl(p: LocScale, q: LocScale) -> jax.Array:
    """KL(p || q) for diagonal normals (matches torch closed form)."""
    var_ratio = (p.scale / q.scale) ** 2
    t1 = ((p.loc - q.loc) / q.scale) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def normal_entropy(p: LocScale) -> jax.Array:
    return 0.5 + 0.5 * LOG2PI + jnp.log(p.scale)


# --------------------------------------------------------------------------
# Laplace
# --------------------------------------------------------------------------

def laplace_log_prob(p: LocScale, x: jax.Array) -> jax.Array:
    return -jnp.abs(x - p.loc) / p.scale - jnp.log(2 * p.scale)


def laplace_sample(p: LocScale, key: jax.Array, sample_shape=()) -> jax.Array:
    """Reparameterized Laplace sampling (same construction as torch)."""
    shape = tuple(sample_shape) + jnp.broadcast_shapes(p.loc.shape, p.scale.shape)
    dtype = jnp.result_type(p.loc)
    tiny = jnp.finfo(dtype).tiny
    u = jax.random.uniform(key, shape, dtype=dtype, minval=-1.0 + 1e-7, maxval=1.0)
    return p.loc - p.scale * jnp.sign(u) * jnp.log1p(-jnp.clip(jnp.abs(u), min=tiny))


def laplace_kl(p: LocScale, q: LocScale) -> jax.Array:
    """KL(p || q) for Laplace (matches torch closed form)."""
    scale_ratio = p.scale / q.scale
    loc_abs_diff = jnp.abs(p.loc - q.loc)
    t1 = -jnp.log(scale_ratio)
    t2 = loc_abs_diff / q.scale
    t3 = scale_ratio * jnp.exp(-loc_abs_diff / p.scale)
    return t1 + t2 + t3 - 1.0


# --------------------------------------------------------------------------
# Bernoulli (probs parameterization, as used for binary decoders)
# --------------------------------------------------------------------------

def bernoulli_log_prob(probs: jax.Array, x: jax.Array) -> jax.Array:
    p = jnp.clip(probs, BERNOULLI_EPS, 1.0 - BERNOULLI_EPS)
    return x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p)


def bernoulli_sample(probs: jax.Array, key: jax.Array, sample_shape=()) -> jax.Array:
    shape = tuple(sample_shape) + probs.shape
    return jax.random.bernoulli(key, probs, shape).astype(probs.dtype)


# --------------------------------------------------------------------------
# Generic dispatch (mirrors dist_dict usage, multi_vaes.py:25)
# --------------------------------------------------------------------------

_LOG_PROB = {"normal": normal_log_prob, "laplace": laplace_log_prob}
_SAMPLE = {"normal": normal_sample, "laplace": laplace_sample}
_KL = {"normal": normal_kl, "laplace": laplace_kl}


def log_prob(dist: str, p: LocScale, x: jax.Array) -> jax.Array:
    if dist == "bernoulli":
        return bernoulli_log_prob(p.loc, x)
    return _LOG_PROB[dist](p, x)


def sample(dist: str, p: LocScale, key: jax.Array, sample_shape=()) -> jax.Array:
    if dist == "bernoulli":
        return bernoulli_sample(p.loc, key, sample_shape)
    return _SAMPLE[dist](p, key, sample_shape)


def kl(dist: str, p: LocScale, q: LocScale, key: jax.Array | None = None, K: int = 100) -> jax.Array:
    """Closed-form KL when available, MC estimate otherwise (utils.py:147-153)."""
    if dist in _KL:
        return _KL[dist](p, q)
    assert key is not None, "MC KL fallback requires a PRNG key"
    zs = sample(dist, p, key, (K,))
    return jnp.mean(log_prob(dist, p, zs) - log_prob(dist, q, zs), axis=0)


def wasserstein_2(p: LocScale, q: LocScale) -> jax.Array:
    """W2 distance between diagonal normals (utils.py:155-162).

    NOTE: reproduces the reference formula exactly, including its use of
    stddev (not variance) in the trace term.
    """
    return (p.loc - q.loc) ** 2 + p.scale + q.scale - 2 * jnp.sqrt(p.scale * q.scale)
