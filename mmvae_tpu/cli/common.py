"""Shared reload logic for the eval entry points (validate.py:26-63
pattern: locate latest run dir by mtime, reload args.json, rebuild the
model, load the checkpoint)."""

from __future__ import annotations

import glob
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ExperimentConfig
from ..data import get_dataloaders
from ..models import registry
from ..train import checkpoints


def find_latest_run(experiments_dir: str, experiment: str) -> str:
    """Latest run dir by mtime (validate.py:26-27)."""
    pattern = os.path.join(experiments_dir, experiment, "*", "*")
    runs = [d for d in glob.glob(pattern) if os.path.isdir(d)]
    if not runs:
        raise FileNotFoundError(f"no runs under {pattern}")
    return max(runs, key=os.path.getmtime)


def reload_model(run_path: str, batch_size: Optional[int] = None):
    """-> (cfg, bundle, variables, loaders). batch_size overrides the
    training batch size for eval (validate.py:79 reloads at 500)."""
    with open(os.path.join(run_path, "args.json")) as f:
        cfg = ExperimentConfig.from_dict(json.load(f))
    bundle = registry.build(cfg)
    import inspect

    from ..data.loaders import DATASETS

    sig = inspect.signature(DATASETS[bundle.dataset]).parameters
    extra = {k: v for k, v in cfg.extra.items() if k in sig}
    # len_train is a first-class config field; the reference re-reads it
    # from the run's params on reload (jmvae_nf_mnist_svhn_dcca.py:104-106)
    # so eval/GMM stages see the SAME train subset the model trained on
    if cfg.len_train and "len_train" in sig:
        extra["len_train"] = cfg.len_train
    bs = batch_size or cfg.batch_size
    loaders = get_dataloaders(bundle.dataset, batch_size=bs,
                              data_path=cfg.data_path, **extra)
    # loaders drop ragged tails; clamp the eval batch size to the smallest
    # split so tiny (smoke) datasets still yield at least one batch each
    n_min = min(l.num_examples for l in loaders)
    if 0 < n_min < bs:
        loaders = get_dataloaders(bundle.dataset, batch_size=n_min,
                                  data_path=cfg.data_path, **extra)
    train_loader = loaders[0]
    xs, _ = next(iter(train_loader))
    key = jax.random.PRNGKey(cfg.seed)
    method = "init_all" if hasattr(bundle.model, "init_all") else None
    # tiny batch + jit: the checkpoint template only needs the tree
    # structure, and an eager init dispatches per-op over the tunnel
    init = jax.jit(lambda k, xs_: bundle.model.init(
        {"params": k, "sample": k}, xs_, K=1, method=method))
    template = init(key, [jnp.asarray(x[:2]) for x in xs])
    variables = checkpoints.load_bytes(
        template, os.path.join(run_path, "model.msgpack"))
    # from_bytes restores NUMPY leaves; as jit arguments those are
    # re-uploaded on EVERY call (~20GB of page-faulting serialization over
    # a full-test-set validate through the remote tunnel, BENCH_NOTES).
    # One device_put here makes every downstream eval program take
    # device-resident weights.
    variables = jax.device_put(variables)
    return cfg, bundle, variables, loaders


def classifier_pool_dir(experiments_dir: str = "../experiments") -> str:
    return os.path.join(experiments_dir, "classifiers")


def distribution_variant(cfg) -> str:
    """Filename suffix identifying the SYNTHETIC data distribution the
    eval classifiers were trained on.

    The reference pretrains classifiers once per real dataset, so a
    name-keyed pool is safe there. With the synthetic hardness knobs
    (difficulty / confound_max / fold) the distribution varies per config;
    a name-only pool silently reuses classifiers across distributions —
    found in r5 when the hard2 (fold=2) grid's classifiers leaked into the
    fold=0 cross-model and easy-MSF validates and scored them with a
    systematically wrong class mapping. Real-data / easy-synthetic runs
    keep the unsuffixed reference behavior."""
    if cfg is None:
        return ""
    parts = []
    vals = dict(getattr(cfg, "extra", {}) or {})
    for k, tag in (("difficulty", "d"), ("confound_max", "c"), ("fold", "f")):
        v = vals.get(k, getattr(cfg, k, None))
        # difficulty=0 / fold=0 ARE the legacy distribution (bit-identical
        # generator paths), but confound_max=0.0 is NOT equivalent to an
        # absent confound_max: the generator derives 0.9*difficulty when
        # the key is missing, so an explicit 0.0 must key separately.
        if v is not None and (v or k == "confound_max"):
            parts.append(f"{tag}{float(v):g}")
    return ("_" + "_".join(parts)) if parts else ""


def get_or_train_classifiers(bundle, loaders, experiments_dir: str,
                             key, epochs: int = 2, cfg=None):
    """Load pretrained eval classifiers from the shared pool, training and
    publishing them on first use (the reference pretrains via
    analysis/classifiers __main__ blocks and loads with load_pretrained_*,
    e.g. classifier_mnist.py:51-64). Pool entries are keyed by classifier
    name PLUS the synthetic-distribution variant of `cfg` (see
    distribution_variant)."""
    import numpy as np

    from ..eval import classifiers as C

    pool = classifier_pool_dir(experiments_dir)
    variant = distribution_variant(cfg)
    train_loader = loaders[0]
    ds = train_loader.dataset
    fns = []
    for m, ck in enumerate(bundle.classifier_keys):
        arch = C.ARCHS[ck](num_attrs=40) if ck == "celeba_attr" else C.ARCHS[ck]()
        path = os.path.join(pool, f"{ck}{variant}.msgpack")
        sample_shape = ds.modalities[m].shape[1:]
        try:
            variables = C.load_classifier(arch, sample_shape, path)
        except (FileNotFoundError, OSError, KeyError, ValueError):
            from ..data.loaders import LazyGather

            mod = ds.modalities[m]
            if isinstance(mod, LazyGather) and mod.base_labels is not None:
                # train on the deduplicated base rows — the pairing only
                # duplicates them (dm-fold), so this is the same data 4-30x
                # cheaper and without materializing the paired gather
                imgs, labs = mod.base, mod.base_labels
            else:
                imgs, labs = mod, ds.labels[m]
            variables = C.train_classifier(arch, np.asarray(imgs), labs,
                                           jax.random.fold_in(key, m),
                                           epochs=epochs)
            C.save_classifier(variables, path)
        fns.append(C.make_apply(arch, variables))
    return fns
