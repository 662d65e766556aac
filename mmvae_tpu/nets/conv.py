"""Torch-semantics conv/deconv primitives on NCHW tensors.

The reference architectures are specified in torch Conv2d/ConvTranspose2d
terms (models/nn/encoders.py); output spatial sizes are part of the public
behavior (latent heads are sized from them), so we reproduce torch's exact
shape arithmetic and init distributions. Data layout is NCHW at the API to
match the reference's tensor contracts; XLA re-lays-out for the MXU on TPU,
so the logical layout choice costs nothing.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import accum_dtype, cast_activation, cast_operand

_DN = ("NCHW", "OIHW", "NCHW")


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2d(nn.Module):
    """torch.nn.Conv2d equivalent (cross-correlation, NCHW, kaiming-uniform init)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    # distribution-parameter heads (posterior mu/logvar convs) opt out of
    # the activation-storage downcast: latent params stay f32 so sampling,
    # KL and flow math keep full precision under the activation policy
    head: bool = False

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        in_ch = x.shape[1]
        fan_in = in_ch * k[0] * k[1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel", _uniform(math.sqrt(3.0) * bound),
            (self.features, in_ch, k[0], k[1]), jnp.float32,
        )
        p = _pair(self.padding)
        # mixed precision: operands in the policy dtype. XLA:TPU bf16 convs
        # accumulate partial sums in f32 on the MXU; only the FINAL value is
        # rounded to bf16 before our upcast (one rounding, not per-partial).
        # preferred_element_type=f32 would avoid even that, but the conv
        # transpose (grad) rule rejects the mixed-dtype conv it produces —
        # Linear uses it (dot_general grads allow it), convs upcast instead.
        y = jax.lax.conv_general_dilated(
            cast_operand(x), cast_operand(kernel),
            window_strides=_pair(self.stride),
            padding=((p[0], p[0]), (p[1], p[1])),
            dimension_numbers=_DN,
        ).astype(accum_dtype())
        if self.use_bias:
            bias = self.param("bias", _uniform(bound), (self.features,), jnp.float32)
            y = y + bias[None, :, None, None]
        # opt-in activation-storage downcast (core/precision.py): halves
        # the HBM traffic of the stored feature map; any downstream mix
        # with an f32 operand promotes back to f32
        return y if self.head else cast_activation(y)


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d equivalent.

    out = (in - 1)*stride - 2*padding + kernel + output_padding, implemented
    as an input-dilated convolution with a spatially-flipped kernel.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    head: bool = False  # see Conv2d.head

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        in_ch = x.shape[1]
        # torch convT weight (in, out, kh, kw): fan_in = out * kh * kw
        fan_in = self.features * k[0] * k[1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel", _uniform(math.sqrt(3.0) * bound),
            (in_ch, self.features, k[0], k[1]), jnp.float32,
        )
        s = _pair(self.stride)
        p = _pair(self.padding)
        op = _pair(self.output_padding)
        pad = tuple((k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(2))
        oihw = jnp.flip(kernel, axis=(-2, -1)).swapaxes(0, 1)
        y = jax.lax.conv_general_dilated(
            cast_operand(x), cast_operand(oihw),
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=s,
            dimension_numbers=_DN,
        ).astype(accum_dtype())
        if self.use_bias:
            bias = self.param("bias", _uniform(bound), (self.features,), jnp.float32)
            y = y + bias[None, :, None, None]
        return y if self.head else cast_activation(y)


class BatchNorm2d(nn.Module):
    """torch.nn.BatchNorm2d equivalent on NCHW (momentum 0.1, eps 1e-5)."""

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        # BN statistics must not run in a reduced activation dtype: promote
        # bf16 inputs back to f32 (f64 stays f64 — strict parity tests)
        x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            axis=1,
            name="bn",
        )
        return bn(x)


class Linear(nn.Module):
    """torch.nn.Linear equivalent (kaiming-uniform init)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel", _uniform(math.sqrt(3.0) * bound),
            (fan_in, self.features), jnp.float32,
        )
        y = jnp.matmul(cast_operand(x), cast_operand(kernel),
                       preferred_element_type=accum_dtype())
        if self.use_bias:
            bias = self.param("bias", _uniform(bound), (self.features,), jnp.float32)
            y = y + bias
        return y
