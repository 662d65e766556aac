"""Joint-generation entry point — generate_joint.py equivalent.

Loads a trained run (or the joint-encoder pool), fits a GaussianMixture
sampler on the train latents, generates N joint samples per modality,
scores joint coherence, and saves generated_modality_{i}.npy for the
use_gen warm-start path (generate_joint.py:50-114; consumed at
main.py:123-127).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="")
    parser.add_argument("--run-path", type=str, default="")
    parser.add_argument("--experiments-dir", type=str, default="../experiments")
    parser.add_argument("--n", type=int, default=1000)
    parser.add_argument("--platform", type=str, default=None)
    info = parser.parse_args(argv)
    if info.platform:
        jax.config.update("jax_platforms", info.platform)

    from ..core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from ..eval import compute_joint_accuracy, generate
    from ..eval.gmm import fit_sampler_on_train_latents
    from .common import find_latest_run, get_or_train_classifiers, reload_model

    run_path = info.run_path or find_latest_run(info.experiments_dir, info.model)
    cfg, bundle, variables, loaders = reload_model(run_path)
    train_l = loaders[0]
    key = jax.random.PRNGKey(cfg.seed)

    model = bundle.model
    # jitted: the latent sweep walks EVERY train batch — eager apply would
    # dispatch per-op over the tunnel (docs/BENCH_NOTES.md round-2 rules)
    if hasattr(model, "joint_encoder"):
        @jax.jit
        def _infer(v, xs):
            mu, std = model.apply(v, xs, method="encode_joint")
            return mu
    else:
        @jax.jit
        def _infer(v, xs):
            out = model.apply(v, xs, method="encode_all")
            return out[0][0]  # first-modality posterior mean

    def infer_fn(xs):
        return _infer(variables, [jnp.asarray(x) for x in xs])

    sampler, latents, labels = fit_sampler_on_train_latents(
        model, variables, train_l, infer_fn)
    print(f"GMM fitted on {len(latents)} train latents")

    gen = generate(model, variables, key, bundle.spec, N=info.n, sampler=sampler)
    # save into the run dir AND the joint-encoder pool: the reference reads
    # generated_modality_i from pretrained_joint_path (main.py:123-127),
    # which for us is the pool dir the use_gen/skip_warmup retrain loads.
    pool = os.path.join(info.experiments_dir, "joint_encoders",
                        (cfg.experiment or "default").split("/")[-1])
    os.makedirs(pool, exist_ok=True)
    for i, g in enumerate(gen):
        arr = np.asarray(g)
        np.save(os.path.join(run_path, f"generated_modality_{i}.npy"), arr)
        np.save(os.path.join(pool, f"generated_modality_{i}.npy"), arr)

    classifiers = get_or_train_classifiers(bundle, loaders, info.experiments_dir,
                                           key, cfg=cfg)
    joint_acc = compute_joint_accuracy(classifiers, gen)
    print(f"joint coherence of GMM samples: {joint_acc:.4f}")
    return joint_acc


if __name__ == "__main__":
    main()
