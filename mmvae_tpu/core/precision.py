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
# separate opt-in: dtype conv ACTIVATIONS are stored in between layers.
# None (default) keeps the f32-activation contract above; "bfloat16" halves
# the HBM traffic of the K-expanded decoder/encoder feature maps — the
# dominant byte term of the flagship step's roofline (docs/BENCH_NOTES.md
# round-4: byte floor 2.31 ms vs FLOP floor 1.07 ms at f32 activations).
# Scope is deliberately conv-only (nets/conv.py Conv2d/ConvTranspose2d):
# Linear heads, flows, BatchNorm stats, distribution params and all
# log-prob/reduction math stay f32 — a bf16 conv activation meeting any
# f32 operand promotes back to f32 by JAX type-promotion, so objective
# math never silently runs in bf16.
_ACT_POLICY = contextvars.ContextVar("mmvae_tpu_activation_dtype",
                                     default=None)


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


def activation_dtype():
    """Dtype conv activations are STORED in between layers, or None to keep
    the accumulation dtype (the default f32-activation contract)."""
    return _ACT_POLICY.get()


@contextlib.contextmanager
def use(dtype, act_dtype=None):
    """Pin the compute (and optionally conv-activation) dtype for code
    traced inside this context."""
    token = _POLICY.set(parse(dtype))
    atoken = _ACT_POLICY.set(None if act_dtype in (None, "")
                             else parse(act_dtype))
    try:
        yield
    finally:
        _POLICY.reset(token)
        _ACT_POLICY.reset(atoken)


def cast_operand(x):
    """Cast one contraction operand to the active compute dtype (no-op
    under the default float32 policy)."""
    d = compute_dtype()
    return x if x.dtype == d else x.astype(d)


def cast_activation(y):
    """Downcast one conv-layer output to the activation-storage dtype
    (no-op unless the opt-in activation policy is active)."""
    d = activation_dtype()
    return y if d is None or y.dtype == d else y.astype(d)
