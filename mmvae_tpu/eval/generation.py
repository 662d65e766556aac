"""Generation utilities — functional rebuilds of Multi_VAES.generate /
_sample_from_conditional / generate_from_conditional (multi_vaes.py:83-195).

The reference's per-sample Python loops become vmaps over PRNG keys; the
M x M x ns conditional-generation matrix is produced by a single jitted call.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from ..core import distributions as D
from ..core.distributions import LocScale


# Jitted program cache, keyed per model instance. Two dispatch rules for
# everything in here (docs/BENCH_NOTES.md):
#   1. nothing runs eagerly — each eager op is a round-trip through the
#      dispatch tunnel, and an eager decode_all is dozens of them;
#   2. the jit wrapper is built ONCE per (model, mode) — a fresh jax.jit
#      per call has an empty trace cache and re-traces every time.
# Weights stay jit ARGUMENTS (constants would bloat/overflow compilation).
_JIT_CACHE: dict = {}


def _cached_jit(kind: str, model, extra, build):
    k = (kind, id(model), extra)
    hit = _JIT_CACHE.get(k)
    if hit is None:
        # hold the model ref so its id() can't be recycled
        hit = (build(), model)
        _JIT_CACHE[k] = hit
    return hit[0]


def generate(model, variables, key, spec, N: int, sampler=None, train: bool = False):
    """Prior (or fitted-sampler) samples decoded in every modality
    (multi_vaes.py:83-103). Returns list of (N, *event_m)."""
    if sampler is None:
        def build():
            @functools.partial(jax.jit, static_argnums=(2,))
            def run(variables, key, n):
                pz = LocScale(jnp.zeros((n, spec.latent_dim)),
                              jnp.ones((n, spec.latent_dim)))
                latents = D.sample(spec.posterior, pz, key)
                return model.apply(variables, latents, method="decode_all",
                                   train=train)
            return run

        fn = _cached_jit("prior_gen", model,
                         (spec.posterior, spec.latent_dim, train), build)
        return fn(variables, key, N)
    latents = jnp.asarray(sampler.sample(N, key))
    return decode_all(model, variables, latents, train=train)


def decode_all(model, variables, latents, train: bool = False):
    """Jitted decode of given latents in every modality."""
    def build():
        @jax.jit
        def run(variables, latents):
            return model.apply(variables, latents, method="decode_all",
                               train=train)
        return run

    return _cached_jit("decode_all", model, train, build)(variables, latents)


def sample_latents_from_mod(model, variables, cond_mod: int, x, key,
                            train: bool = False):
    """One posterior sample per input row via the model's own conditional
    inference rule (multi_vaes.py:71-79; MVAE overrides with PoE-with-prior,
    mvae.py:64-70)."""
    def build():
        @jax.jit
        def run(variables, x, key):
            return model.apply(variables, cond_mod, x,
                               method="infer_latent_from_mod",
                               rngs={"sample": key}, train=train)
        return run

    return _cached_jit("latents_from_mod", model, (cond_mod, train),
                       build)(variables, x, key)


def sample_from_conditional(model, variables, bdata, key, n: int = 10,
                            train: bool = False):
    """M x M cross-generation matrix with n samples per datapoint
    (multi_vaes.py:184-195). Returns samples[i][j] of shape
    (n, B, *event_j)."""
    n_mod = len(bdata)

    def build():
        @functools.partial(jax.jit, static_argnums=(3,))
        def run(variables, bdata, key, n):
            def one(key_one):
                keys = jax.random.split(key_one, n_mod)
                out = []
                for i in range(n_mod):
                    z = model.apply(variables, i, bdata[i],
                                    method="infer_latent_from_mod",
                                    rngs={"sample": keys[i]}, train=train)
                    out.append(model.apply(variables, z, method="decode_all",
                                           train=train))
                return out

            return jax.vmap(one)(jax.random.split(key, n))
        return run

    fn = _cached_jit("cond_matrix", model, (n_mod, train), build)
    return fn(variables, list(bdata), key, n)


def generate_from_conditional(model, variables, key, spec, N: int = 10,
                              sampler=None, train: bool = False):
    """p(x, y) = p(x) p(y|x) generation (multi_vaes.py:105-126)."""
    k1, k2 = jax.random.split(key)
    data = generate(model, variables, k1, spec, N, sampler=sampler, train=train)
    cond = sample_from_conditional(model, variables, data, k2, n=1, train=train)
    return data, cond
