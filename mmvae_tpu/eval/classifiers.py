"""Evaluation classifiers — rebuilds of analysis/classifiers/*.

Architectures mirror the reference nets exactly (valid-padding 4x4 convs,
BN, dropout MLP heads): MnistClassifier (classifier_mnist.py:19-48, also
used for Fashion), SVHNClassifier (classifier_SVHN.py:21-58),
CirclesClassifier (classifier_empty_full.py:65-89, binary empty/full),
CelebA attribute heads (CelebA_classifier.py). Includes a generic optax
training loop replacing the per-file __main__ blocks, and msgpack save/load
to a shared classifiers dir (the reference's ../experiments/classifier_*/).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..nets.conv import BatchNorm2d, Conv2d, Linear
from ..train.checkpoints import load_bytes, save_bytes


class MnistClassifier(nn.Module):
    """2 conv(BN,ReLU) + dropout MLP head (classifier_mnist.py:19-48)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False):
        h = nn.relu(BatchNorm2d(32)(Conv2d(32, 4, 1)(x), train))
        h = nn.relu(BatchNorm2d(64)(Conv2d(64, 4, 1)(h), train))
        h = h.reshape(h.shape[0], -1)  # 64*22*22 = 30976
        h = Linear(512)(h)
        if features:  # penultimate embedding (custom-encoder FID/PRD,
            return h  # Quality_assess.py:21-170 custom `model` pattern)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return Linear(self.num_classes)(h)


class SVHNClassifier(nn.Module):
    """3 conv(BN,ReLU) + BN/dropout MLP head (classifier_SVHN.py:21-58)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False):
        h = nn.relu(BatchNorm2d(32)(Conv2d(32, 4, 1)(x), train))
        h = nn.relu(BatchNorm2d(64)(Conv2d(64, 4, 1)(h), train))
        h = nn.relu(BatchNorm2d(128)(Conv2d(128, 4, 1)(h), train))
        h = h.reshape(h.shape[0], -1)  # 128*23*23 = 67712
        h = Linear(1024)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = Linear(512)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        if features:
            return h
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return Linear(self.num_classes)(h)


class CirclesClassifier(nn.Module):
    """Flatten -> MLP (classifier_empty_full.py:65-89); trained to predict
    full(1)/empty(0) but with a 10-way head like the reference."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False):
        h = x.reshape(x.shape[0], -1)
        h = nn.relu(Linear(512)(h))
        if features:
            return h
        return Linear(self.num_classes)(h)


class AttributesClassifier(nn.Module):
    """CelebA attribute-vector head: identity logits over the 40 attrs
    (CelebA_classifier.py attribute MLP)."""

    num_attrs: int = 40

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False):
        h = x.reshape(x.shape[0], -1)
        h = nn.relu(Linear(512)(h))
        if features:
            return h
        return Linear(self.num_attrs)(h)


class CelebAImgClassifier(nn.Module):
    """Conv attribute classifier for 64x64 CelebA images (stand-in for the
    reference's finetuned ResNet, CelebA_classifier.py:16-47)."""

    num_attrs: int = 40

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False):
        h = nn.relu(BatchNorm2d(32)(Conv2d(32, 4, 2, padding=1)(x), train))
        h = nn.relu(BatchNorm2d(64)(Conv2d(64, 4, 2, padding=1)(h), train))
        h = nn.relu(BatchNorm2d(128)(Conv2d(128, 4, 2, padding=1)(h), train))
        h = jnp.mean(h, axis=(2, 3))
        if features:
            return h
        return Linear(self.num_attrs)(h)


ARCHS = {
    "mnist": MnistClassifier,
    "fashion": MnistClassifier,
    "svhn": SVHNClassifier,
    "empty_full": CirclesClassifier,
    "pneumonia": MnistClassifier,   # medmnist classifiers are small CNNs too
    "blood": SVHNClassifier,
    "celeba_img": CelebAImgClassifier,
    "celeba_attr": AttributesClassifier,
}


def train_classifier(arch: nn.Module, images: np.ndarray, labels: np.ndarray,
                     key, epochs: int = 3, batch_size: int = 256,
                     lr: float = 1e-3, binary_attrs: bool = False):
    """Generic classifier fit (replaces the __main__ training blocks)."""
    variables = jax.jit(lambda k: arch.init(
        {"params": k, "dropout": k},
        jnp.zeros((2,) + images.shape[1:]), train=True))(key)
    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    if binary_attrs:
        def loss_fn(logits, y):
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))
    else:
        def loss_fn(logits, y):
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)
            )

    n = len(images)
    batch_size = min(batch_size, n)

    @jax.jit
    def step(variables, opt_state, data, labs, offset, k):
        # batch = device-side dynamic slice of the resident dataset; the
        # per-batch images[idx] + jnp.asarray upload pattern serializes a
        # synchronous host->device transfer into every step (~8x slower
        # through the dispatch tunnel, docs/BENCH_NOTES.md)
        xb = jax.lax.dynamic_slice_in_dim(data, offset, batch_size)
        yb = jax.lax.dynamic_slice_in_dim(labs, offset, batch_size)

        def lf(p):
            v = {**variables, "params": p}
            logits, st = arch.apply(v, xb, train=True, rngs={"dropout": k},
                                    mutable=["batch_stats"])
            return loss_fn(logits, yb), st

        (loss, st), grads = jax.value_and_grad(lf, has_aux=True)(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return {**variables, "params": params, **st}, opt_state, loss

    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    data = jnp.asarray(images[perm])  # one-time upload, shuffled once
    labs = jnp.asarray(labels[perm])
    steps_per_epoch = max(1, n // batch_size)
    max_off = n - batch_size
    for e in range(epochs):
        # stride the epoch start so batch boundaries differ across epochs
        base = (e * (batch_size // 2)) % (max_off + 1) if max_off else 0
        for s in range(steps_per_epoch):
            offset = jnp.int32((base + s * batch_size) % (max_off + 1) if max_off else 0)
            variables, opt_state, loss = step(
                variables, opt_state, data, labs, offset,
                jax.random.fold_in(key, e * 10000 + s),
            )
    return variables


def make_apply(arch: nn.Module, variables) -> Callable:
    """Inference-mode logits fn (classifier.eval() equivalent).

    The variables are passed as jit ARGUMENTS, not closure constants —
    baking several-hundred-MB weight constants into the HLO both bloats
    compilation and overflows remote-compile payload limits."""

    @jax.jit
    def apply(v, x):
        return arch.apply(v, x, train=False)

    fn = lambda x: apply(variables, x)  # noqa: E731
    # expose the pieces so fused eval programs (eval/coherence.py) can pass
    # the weights as jit ARGUMENTS instead of baked HLO constants
    fn.arch = arch
    fn.variables = variables
    return fn


def make_feature_fn(arch: nn.Module, variables) -> Callable:
    """Penultimate-embedding encoder for classifier-featurized FID/PRD —
    the reference's Quality_assess.py custom-`model` pattern
    (Quality_assess.py:21-170): on a zero-egress box the Inception weights
    are unreachable, so the trained eval classifier's features provide the
    meaningful generation-quality embedding instead."""

    @jax.jit
    def apply(v, x):
        return arch.apply(v, x, train=False, features=True)

    def fn(x):
        return np.asarray(apply(variables, jnp.asarray(x)))

    fn.arch = arch
    fn.variables = variables
    return fn


def save_classifier(variables, path: str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_bytes(variables, path)


def load_classifier(arch: nn.Module, sample_shape, path: str):
    key = jax.random.PRNGKey(0)
    template = jax.jit(lambda k: arch.init(
        {"params": k, "dropout": k},
        jnp.zeros((1,) + tuple(sample_shape)), train=False))(key)
    # device-resident weights: from_bytes restores numpy leaves, which jit
    # re-uploads per call (the SVHN classifier alone is 277MB — reshipping
    # it every eval batch dominated full-test-set validation)
    return jax.device_put(load_bytes(template, path))
