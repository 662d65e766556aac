"""Likelihood entry point — compute_likelihoods.py equivalent.

Per-batch conditional likelihoods + family-specific joint likelihood with
K=1000 importance samples, 5 repeats (compute_likelihoods.py:95-122).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="")
    parser.add_argument("--run-path", type=str, default="")
    parser.add_argument("--experiments-dir", type=str, default="../experiments")
    parser.add_argument("--k", type=int, default=1000)
    parser.add_argument("--batch-size-k", type=int, default=100)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--n-data", type=int, default=64)
    parser.add_argument("--platform", type=str, default=None)
    info = parser.parse_args(argv)
    if info.platform:
        jax.config.update("jax_platforms", info.platform)

    from ..core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from ..eval import likelihoods as L
    from ..models.jmvae_nf import JMVAE_NF
    from ..models.mmvae import MMVAE
    from ..models.mvae import MVAE
    from .common import find_latest_run, reload_model

    run_path = info.run_path or find_latest_run(info.experiments_dir, info.model)
    print("Computing likelihoods for", run_path)
    cfg, bundle, variables, (train_l, test_l, val_l) = reload_model(run_path)
    key = jax.random.PRNGKey(cfg.seed)

    if isinstance(bundle.model, JMVAE_NF):
        joint_fn = L.joint_likelihood_jmvae_nf
    elif isinstance(bundle.model, MVAE):
        joint_fn = L.joint_likelihood_mvae
    elif isinstance(bundle.model, MMVAE):
        joint_fn = L.joint_likelihood_mmvae
    else:
        joint_fn = None

    all_metrics = []
    for r in range(info.repeats):
        kr = jax.random.fold_in(key, r)
        xs, _ = next(iter(test_l))
        xs = [jnp.asarray(x[: info.n_data]) for x in xs]
        metrics = L.compute_conditional_likelihoods(
            bundle.model, variables, xs, bundle.spec, kr,
            K=info.k, batch_size_K=info.batch_size_k)
        if joint_fn is not None:
            metrics.update(joint_fn(bundle.model, variables, xs, bundle.spec,
                                    jax.random.fold_in(kr, 999),
                                    K=info.k, batch_size_K=info.batch_size_k))
        all_metrics.append(metrics)
        print(f"repeat {r}: {metrics}")

    summary = {
        k: {"mean": float(np.mean([m[k] for m in all_metrics])),
            "std": float(np.std([m[k] for m in all_metrics]))}
        for k in all_metrics[0]
    }
    print(json.dumps(summary, indent=2))
    with open(os.path.join(run_path, "likelihoods.json"), "w") as f:
        json.dump(summary, f)
    return summary


if __name__ == "__main__":
    main()
