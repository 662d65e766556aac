"""Compute-dtype policy for the matmul/conv primitives (mixed precision).

The reference trains everything in float32 (torch default). On TPU the MXU
runs bf16 multiplies at 2x the f32 (bf16x3-pass) rate and halves the
weight-side HBM traffic, so we expose an opt-in mixed-precision policy:
parameters and optimizer state stay float32; the inputs of every matmul /
convolution are cast to the compute dtype and the contraction accumulates
in float32 (`preferred_element_type`). Elementwise math, BatchNorm
statistics, distribution log-probs and reductions all stay float32 — only
the MXU operands change.

Enable per run with the config key `"compute_dtype": "bfloat16"` (any
extra JSON key is forwarded; `core/config.py`). The policy is pinned into
the jitted train/eval steps at trace time via `use()` so later builds in
the same process cannot leak their policy into cached programs.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

_POLICY = contextvars.ContextVar("mmvae_tpu_compute_dtype", default=None)


def parse(name) -> jnp.dtype:
    if name is None or name == "":
        return jnp.float32
    if not isinstance(name, str):
        return jnp.dtype(name)
    return {
        "float32": jnp.float32, "f32": jnp.float32,
        "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
        "float64": jnp.float64, "f64": jnp.float64,
    }[name]


def compute_dtype():
    """Dtype the matmul/conv primitives should cast their operands to."""
    d = _POLICY.get()
    return jnp.float32 if d is None else d


def accum_dtype():
    """Dtype contraction results are returned in: f32 under the default and
    bf16 policies (TPU MXU partials accumulate in f32 regardless of the
    operand dtype), f64 under the float64 policy — used by the strict
    CPU multichip-parity tests (tests/test_multichip_parity.py), where
    reduction-order noise must vanish so no gradient leaf needs a noise
    filter."""
    d = compute_dtype()
    return jnp.float64 if d == jnp.float64 else jnp.float32


@contextlib.contextmanager
def use(dtype):
    """Pin the compute dtype for code traced inside this context."""
    token = _POLICY.set(parse(dtype))
    try:
        yield
    finally:
        _POLICY.reset(token)


def cast_operand(x):
    """Cast one contraction operand to the active compute dtype (no-op
    under the default float32 policy)."""
    d = compute_dtype()
    return x if x.dtype == d else x.astype(d)
