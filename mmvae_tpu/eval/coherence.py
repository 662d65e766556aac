"""Classifier-based coherence metrics (analysis/accuracies.py:12-68).

Cross-coherence: sample ns cross-modal generations per datapoint, classify
with the pretrained nets, compare to the true class. Joint coherence: all
modality classifiers agree on prior samples.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .generation import generate, sample_from_conditional


def conditional_labels(model, variables, classifiers: Sequence[Callable],
                       data, key, n_data: int = 8, ns: int = 30):
    """labels[i][j]: predicted class of modality-j generations conditioned on
    modality i, shape (n_data, ns) (accuracies.py:12-29)."""
    n_mod = len(data)
    bdata = [d[:n_data] for d in data]
    samples = sample_from_conditional(model, variables, bdata, key, n=ns)
    labels = [[None] * n_mod for _ in range(n_mod)]
    for i in range(n_mod):
        for j in range(n_mod):
            if i == j:
                continue
            recon = samples[i][j]  # (ns, n_data, *event_j)
            flat = recon.reshape(ns * n_data, *recon.shape[2:])
            preds = classifiers[j](flat)
            labels[i][j] = jnp.argmax(preds, axis=1).reshape(ns, n_data).T
    return labels


def compute_accuracies(model, variables, classifiers, data, classes, key, spec,
                       n_data: int = 20, ns: int = 100,
                       sampler=None) -> Dict[str, float]:
    """Cross-coherence matrix acc_i_j + joint coherence
    (accuracies.py:31-62)."""
    if n_data == "all" or n_data > len(data[0]):
        n_data = len(data[0])
    k1, k2 = jax.random.split(key)
    labels = conditional_labels(model, variables, classifiers, data, k1, n_data, ns)
    true = jnp.asarray(classes[0][:n_data])[:, None]  # (n_data, 1)
    metrics = {}
    n_mod = len(data)
    for i in range(n_mod):
        for j in range(n_mod):
            if i != j:
                metrics[f"acc_{i}_{j}"] = float(jnp.mean(labels[i][j] == true))
    gen = generate(model, variables, k2, spec, N=ns * n_data, sampler=sampler)
    metrics["joint_coherence"] = compute_joint_accuracy(classifiers, gen)
    return metrics


def compute_joint_accuracy(classifiers, data) -> float:
    """All pairwise classifier agreements on generated samples
    (accuracies.py:64-68)."""
    labels = [jnp.argmax(classifiers[i](data[i]), axis=1) for i in range(len(data))]
    n_mod = len(data)
    pairs = jnp.stack([
        labels[i] == labels[j] for i in range(n_mod) for j in range(n_mod)
    ])
    return float(jnp.sum(jnp.all(pairs, axis=0)) / data[0].shape[0])


def attribute_accuracies(classifiers, recon_attrs, true_attrs) -> float:
    """CelebA 40-attribute bitwise accuracy (modalities/celeba.py:43-53)."""
    preds = (recon_attrs.reshape(recon_attrs.shape[0], -1) > 0.5).astype(jnp.float32)
    return float(jnp.mean(preds == true_attrs.reshape(true_attrs.shape[0], -1)))
