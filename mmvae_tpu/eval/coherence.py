"""Classifier-based coherence metrics (analysis/accuracies.py:12-68).

Cross-coherence: sample ns cross-modal generations per datapoint, classify
with the pretrained nets, compare to the true class. Joint coherence: all
modality classifiers agree on prior samples.
"""

from __future__ import annotations

import functools
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


# cache of fused per-batch metric programs, keyed per (model, classifiers)
# instance set — refs held so ids can't be recycled. Bounded: long-lived
# processes scoring many models (sweeps, test suites) must not accumulate
# executables/staged datasets forever.
_ACC_CACHE: dict = {}
_ACC_CACHE_CAP = 8
_DS_CACHE_CAP = 2


def _cache_put(cache: dict, key, val, cap: int):
    """Insert with FIFO eviction (dicts preserve insertion order); evicted
    staged datasets release their device buffers with the last reference."""
    cache[key] = val
    while len(cache) > cap:
        cache.pop(next(iter(cache)))


def compute_accuracies(model, variables, classifiers, data, classes, key, spec,
                       n_data: int = 20, ns: int = 100,
                       sampler=None) -> Dict[str, float]:
    """Cross-coherence matrix acc_i_j + joint coherence
    (accuracies.py:31-62).

    The whole batch metric — conditional generation, classification,
    accuracy reductions, joint coherence — is ONE jitted program: the
    eager version's ~dozen small ops each cost a full dispatch round-trip
    through the remote tunnel (~1-2s apiece, docs/BENCH_NOTES.md), which
    made full-test-set validation minutes-per-batch."""
    if n_data == "all" or n_data > len(data[0]):
        n_data = len(data[0])
    n_mod = len(data)
    bdata = [jnp.asarray(d[:n_data]) for d in data]
    true = jnp.asarray(classes[0][:n_data])

    if sampler is not None:
        # fitted-sampler path (GMM): latents come from the host-side
        # sampler, so only the downstream metric is fused
        k1, k2 = jax.random.split(key)
        labels = conditional_labels(model, variables, classifiers, data, k1,
                                    n_data, ns)
        metrics = {}
        for i in range(n_mod):
            for j in range(n_mod):
                if i != j:
                    metrics[f"acc_{i}_{j}"] = float(
                        jnp.mean(labels[i][j] == true[:, None]))
        gen = generate(model, variables, k2, spec, N=ns * n_data,
                       sampler=sampler)
        metrics["joint_coherence"] = compute_joint_accuracy(classifiers, gen)
        return metrics

    run, clf_vars = _batch_metrics_fn(model, classifiers, spec, n_mod)
    ck = ("acc_jit", id(model), tuple(id(c) for c in classifiers), n_mod,
          spec.posterior, spec.latent_dim)
    hit = _ACC_CACHE.get(ck)
    if hit is None:
        hit = (jax.jit(run, static_argnums=(5,)), model, tuple(classifiers))
        _cache_put(_ACC_CACHE, ck, hit, _ACC_CACHE_CAP)
    out = jax.device_get(hit[0](variables, clf_vars, bdata, true, key, ns))
    return {k: float(v) for k, v in out.items()}


def _batch_metrics_fn(model, classifiers, spec, n_mod):
    """-> (traceable fn(variables, clf_vars, bdata, true, key, ns) -> dict
    of scalar metrics, clf_vars). Classifier weights travel as jit
    ARGUMENTS: baked as constants they overflow the remote-compile payload
    (observed HTTP 413)."""
    archs = [getattr(c, "arch", None) for c in classifiers]
    fused_clf = all(a is not None for a in archs)

    def classify(j, clf_vars, x):
        if fused_clf:
            return archs[j].apply(clf_vars[j], x, train=False)
        return classifiers[j](x)

    def run(variables, clf_vars, bdata, true, key, ns):
        k1, k2 = jax.random.split(key)
        samples = sample_from_conditional(model, variables, bdata, k1, n=ns)
        out = {}
        for i in range(n_mod):
            for j in range(n_mod):
                if i == j:
                    continue
                recon = samples[i][j]  # (ns, n, *event_j)
                flat = recon.reshape((-1,) + recon.shape[2:])
                pred = jnp.argmax(classify(j, clf_vars, flat), axis=1)
                out[f"acc_{i}_{j}"] = jnp.mean(
                    pred.reshape(ns, -1) == true[None, :])
        gen = generate(model, variables, k2, spec, N=ns * true.shape[0])
        preds = [jnp.argmax(classify(m, clf_vars, gen[m]), axis=1)
                 for m in range(n_mod)]
        agree = jnp.stack([preds[i] == preds[j] for i in range(n_mod)
                           for j in range(n_mod)])
        out["joint_coherence"] = jnp.mean(jnp.all(agree, axis=0))
        return out

    clf_vars = tuple(getattr(c, "variables", None) for c in classifiers) \
        if fused_clf else ()
    return run, clf_vars


# device-resident (nb, batch, *event) test-set stacks, keyed by dataset
# instance — uploaded once and reused across the 5 validate repeats
_DS_CACHE: dict = {}


def _staged_dataset(ds, batch):
    """Pad + reshape every modality to (nb, batch, *event) and upload once.

    Returns (data_stacks, true_stack, w_stack, nb) as device arrays. The
    ragged tail batch is padded with repeats of its first row at weight 0,
    so one compiled program serves every batch and every test pair counts
    exactly once (validate.py:111-116 protocol)."""
    n = len(ds)
    nb = -(-n // batch)
    ck = (id(ds), batch)
    hit = _DS_CACHE.get(ck)
    if hit is not None:
        return hit[:4]
    labels0 = np.asarray(ds.labels[0])
    stacks = []
    for m in ds.modalities:
        ev = tuple(m.shape[1:])
        stack = np.zeros((nb, batch) + ev, dtype=np.float32)
        for bi, s in enumerate(range(0, n, batch)):
            e = min(s + batch, n)
            rows = np.asarray(m[s:e], dtype=np.float32)
            stack[bi, : e - s] = rows
            if e - s < batch:
                stack[bi, e - s:] = rows[:1]
        stacks.append(jnp.asarray(stack))
    true = np.zeros((nb, batch), dtype=labels0.dtype)
    w = np.zeros((nb, batch), dtype=np.float32)
    for bi, s in enumerate(range(0, n, batch)):
        e = min(s + batch, n)
        true[bi, : e - s] = labels0[s:e]
        true[bi, e - s:] = labels0[s]
        w[bi, : e - s] = 1.0
    out = (stacks, jnp.asarray(true), jnp.asarray(w), nb, ds)
    _cache_put(_DS_CACHE, ck, out, _DS_CACHE_CAP)
    return out[:4]


def compute_accuracies_dataset(model, variables, classifiers, loader, key,
                               spec, ns: int = 1) -> Dict[str, float]:
    """Full-test-set coherence with zero per-batch host involvement.

    Per-batch `jnp.asarray` uploads serialize async dispatch through the
    remote tunnel (~10s/batch measured — the same antipattern
    docs/BENCH_NOTES.md documents for training). Like the train loop's
    device_counter_step, the whole padded test set is staged on device
    ONCE (`_staged_dataset`, reused across repeats); each batch step is
    then the identical compiled program on a device-resident
    `dynamic_index` slice, the metric accumulator stays on device, and a
    single device_get syncs per dataset pass.

    (A base-array + pairing-table gather inside the step — training's
    native form — compiled into a program the axon backend's host-side
    HLO passes ground on for >20 min, so eval stages the materialized
    batches instead.)"""
    ds = loader.dataset
    n = len(ds)
    n_mod = len(ds.modalities)
    batch = min(loader.batch_size, n)
    archs = [getattr(c, "arch", None) for c in classifiers]
    fused_clf = all(a is not None for a in archs)
    clf_vars = tuple(getattr(c, "variables", None) for c in classifiers) \
        if fused_clf else ()

    ck = ("acc_ds", id(model), tuple(id(c) for c in classifiers), n_mod,
          spec.posterior, spec.latent_dim)
    hit = _ACC_CACHE.get(ck)
    if hit is None:
        def classify(j, cv, x):
            return archs[j].apply(cv[j], x, train=False) if fused_clf \
                else classifiers[j](x)

        @functools.partial(jax.jit, static_argnums=(6,))
        def step(variables, cv, stacks, true_all, w_all, key, ns, bi, acc):
            bdata = [jax.lax.dynamic_index_in_dim(d, bi, 0, keepdims=False)
                     for d in stacks]
            true = jax.lax.dynamic_index_in_dim(true_all, bi, 0,
                                                keepdims=False)
            w = jax.lax.dynamic_index_in_dim(w_all, bi, 0, keepdims=False)
            k1, k2 = jax.random.split(jax.random.fold_in(key, bi))
            samples = sample_from_conditional(model, variables, bdata, k1,
                                              n=ns)
            out = {}
            for i in range(n_mod):
                for j in range(n_mod):
                    if i == j:
                        continue
                    recon = samples[i][j]  # (ns, B, *event_j)
                    flat = recon.reshape((-1,) + recon.shape[2:])
                    pred = jnp.argmax(classify(j, cv, flat), axis=1)
                    correct = jnp.mean(pred.reshape(ns, -1) == true[None, :],
                                       axis=0)  # (B,)
                    out[f"acc_{i}_{j}"] = jnp.sum(w * correct)
            gen = generate(model, variables, k2, spec,
                           N=ns * true.shape[0])
            preds = [jnp.argmax(classify(m, cv, gen[m]), axis=1)
                     for m in range(n_mod)]
            agree = jnp.stack([preds[i] == preds[j] for i in range(n_mod)
                               for j in range(n_mod)])
            out["joint_s"] = jnp.sum(jnp.all(agree, axis=0))
            out["joint_n"] = jnp.float32(agree.shape[1])
            out["w"] = jnp.sum(w)
            return jax.tree.map(jnp.add, acc, out)

        hit = (step, model, tuple(classifiers))
        _cache_put(_ACC_CACHE, ck, hit, _ACC_CACHE_CAP)
    step = hit[0]

    stacks, true_all, w_all, nb = _staged_dataset(ds, batch)
    names = [f"acc_{i}_{j}" for i in range(n_mod) for j in range(n_mod)
             if i != j] + ["joint_s", "joint_n", "w"]
    acc = {k: jnp.float32(0.0) for k in names}
    for bi in range(nb):
        acc = step(variables, clf_vars, stacks, true_all, w_all, key, ns,
                   jnp.int32(bi), acc)
    acc = jax.device_get(acc)
    w_sum = float(acc["w"])
    out = {k: float(v) / w_sum for k, v in acc.items()
           if k.startswith("acc_")}
    out["joint_coherence"] = float(acc["joint_s"]) / float(acc["joint_n"])
    return out


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
