"""Invertible BatchNorm flow layer (reference: normalizing_flows/layers.py:28-95)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class BatchNormFlow(nn.Module):
    """BatchNorm with log-det, usable in both flow directions.

    Running stats live in the 'batch_stats' collection; during training the
    forward pass uses batch statistics and updates the running buffers
    (layers.py:43-70).
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False, inverse: bool = False):
        log_gamma = self.param("log_gamma", nn.initializers.zeros, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features))

        if train and not inverse:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0, ddof=1)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value

        if inverse:
            y = (x - beta) * jnp.exp(-log_gamma) * jnp.sqrt(var + self.eps) + mean
            log_det = (-log_gamma + 0.5 * jnp.log(var + self.eps)) * jnp.ones_like(x)
        else:
            y = (x - mean) / jnp.sqrt(var + self.eps) * jnp.exp(log_gamma) + beta
            log_det = (log_gamma - 0.5 * jnp.log(var + self.eps)) * jnp.ones_like(x)
        return y, jnp.sum(log_det, axis=-1)
