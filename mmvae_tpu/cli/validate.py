"""Metrics entry point — the validate.py equivalent.

Reloads the latest (or given) run, computes classifier coherence + sample
grids + cross-modal FID on the full test set, repeated 5x for mean/std
(validate.py:98-154).
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
    parser.add_argument("--model", type=str, default="",
                        help="experiment subdir, e.g. mmvae/mnist_svhn")
    parser.add_argument("--run-path", type=str, default="")
    parser.add_argument("--experiments-dir", type=str, default="../experiments")
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--n-data", type=str, default="all",
                        help="datapoints per batch to score; 'all' = every "
                        "pair in the batch (validate.py:116)")
    parser.add_argument("--ns", type=int, default=1,
                        help="conditional samples per datapoint "
                        "(validate.py:116 uses ns=1 over the full test set)")
    parser.add_argument("--batch-size", type=int, default=500,
                        help="eval batch size (validate.py:79 uses 500)")
    parser.add_argument("--skip-fid", action="store_true")
    parser.add_argument("--fid-batches", type=int, default=0,
                        help="cap FID on the first N test batches; 0 = the "
                        "full test loader (the reference protocol, "
                        "modalities/mnist_svhn.py:26-33)")
    parser.add_argument("--fid-weights", type=str, default="",
                        help="path to the pytorch-fid inception weights "
                        "(pt_inception-2015-12-05-6726825d.pth); verified "
                        "against the published sha256 before use")
    parser.add_argument("--prd", action="store_true",
                        help="also emit per-direction PRD f8/f1_8 from the "
                        "FID activations (prd_score.py:139)")
    parser.add_argument("--fid-encoder", type=str, default="inception",
                        choices=["inception", "classifier"],
                        help="activation network for FID/PRD: the Inception "
                        "FID net, or the trained eval classifiers' "
                        "penultimate features (Quality_assess.py:21-170 "
                        "custom-encoder pattern — the meaningful choice on "
                        "a zero-egress box where Inception weights are "
                        "unreachable)")
    parser.add_argument("--mcmc-steps", type=int, default=100,
                        help="HMC chain length for trimodal PoE-subset "
                        "metrics (reference default 100, jmvae_nf.py:332)")
    parser.add_argument("--platform", type=str, default=None)
    info = parser.parse_args(argv)
    if info.platform:
        jax.config.update("jax_platforms", info.platform)

    # live diagnosis hook for tunnel stalls: `kill -USR1 <pid>` dumps stacks
    import faulthandler
    import signal
    import time
    faulthandler.register(signal.SIGUSR1)
    t_start = time.time()

    def _mark(msg):
        print(f"[{time.time() - t_start:7.1f}s] {msg}", flush=True)

    from ..core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from ..eval import compute_accuracies, cross_modal_fid, make_inception_fn
    from ..vis import save_samples
    from .common import find_latest_run, get_or_train_classifiers, reload_model

    run_path = info.run_path or find_latest_run(info.experiments_dir, info.model)
    print("Validating", run_path)
    cfg, bundle, variables, (train_l, test_l, val_l) = reload_model(
        run_path, batch_size=info.batch_size)
    _mark("model reloaded")
    key = jax.random.PRNGKey(cfg.seed)
    classifiers = get_or_train_classifiers(bundle, (train_l, test_l, val_l),
                                           info.experiments_dir, key, cfg=cfg)
    _mark("classifiers ready")

    if not info.skip_fid:
        if info.fid_encoder == "classifier":
            from ..eval.classifiers import make_feature_fn

            encoder_fn = [make_feature_fn(c.arch, c.variables)
                          for c in classifiers]
            _mark("classifier feature encoders ready")
        else:
            weights = info.fid_weights or None
            encoder_fn = make_inception_fn(weights_path=weights)
            _mark("inception initialized")

    has_poe = hasattr(bundle.model, "poe_log_density") or \
        hasattr(bundle.model, "poe_subset_params")

    # the device-resident scorer handles the standard protocol (every test
    # pair, ns per pair); the per-batch loop remains for celeba's bitwise
    # metrics and explicit --n-data subsets
    fast_path = bundle.dataset != "celeba" and info.n_data == "all"

    all_metrics = []
    for r in range(info.repeats):
        kr = jax.random.fold_in(key, r)
        if fast_path:
            from ..eval import compute_accuracies_dataset

            metrics = compute_accuracies_dataset(
                bundle.model, variables, classifiers, test_l, kr,
                bundle.spec, ns=info.ns)
            _mark(f"repeat {r}: accuracies done")
            n_mod = len(test_l.dataset.modalities)
            needs_batch = (n_mod == 3 and has_poe) or \
                bundle.dataset == "circles_squares"
            xs0 = labs0 = None
            if needs_batch:
                xs0, labs0 = next(iter(test_l))
                xs0 = [jnp.asarray(x) for x in xs0]
            if xs0 is not None and len(xs0) == 3 and has_poe:
                from ..eval.modalities import poe_subset_accuracy

                try:
                    metrics.update(poe_subset_accuracy(
                        bundle.model, variables, classifiers, xs0,
                        [np.asarray(l) for l in labs0], kr, bundle.spec,
                        n_data=min(32, len(xs0[0])), ns=8,
                        mcmc_steps=info.mcmc_steps))
                except Exception as e:
                    print(f"[poe_subset_accuracy] skipped: {e}")
            if bundle.dataset == "circles_squares":
                from ..eval.latent_analysis import conditional_rdist_metrics

                metrics.update(conditional_rdist_metrics(
                    bundle.model, variables, xs0,
                    jax.random.fold_in(kr, 41),
                    run_path=run_path if r == 0 else None,
                    n=min(100, info.ns * 10), n_data=min(100, len(xs0[0]))))
            if not info.skip_fid:
                metrics.update(cross_modal_fid(
                    bundle.model, variables, test_l, bundle.spec, kr,
                    encoder_fn, n_batches=info.fid_batches or None,
                    verbose=(r == 0), compute_prd=info.prd,
                    prd_curve_dir=run_path if r == 0 else None))
            all_metrics.append(metrics)
            print(f"repeat {r}: {metrics}")
            continue
        # per-batch loop: accumulate metric dicts, then mean within the
        # repeat (validate.py:111-116 + get_mean_std).
        batch_metrics: dict = {}
        for bi, (xs, labs) in enumerate(test_l):
            kb = jax.random.fold_in(kr, bi)
            xs = [jnp.asarray(x) for x in xs]
            if info.n_data == "all":
                n_data = len(xs[0])
            else:
                n_data = min(int(info.n_data), len(xs[0]))
            if bundle.dataset == "celeba":
                # 40-attribute bitwise metrics (modalities/celeba.py:17-63)
                from ..eval.modalities import celeba_attribute_metrics

                attrs = np.asarray(xs[1]).reshape(len(xs[1]), -1)
                metrics = celeba_attribute_metrics(
                    bundle.model, variables, classifiers, xs, attrs, kb,
                    bundle.spec, n_data=n_data, ns=info.ns)
            else:
                metrics = compute_accuracies(
                    bundle.model, variables, classifiers, xs,
                    [jnp.asarray(l) for l in labs], kb, bundle.spec,
                    n_data=n_data, ns=info.ns,
                )
            if len(xs) == 3 and has_poe and bi == 0:
                # trimodal PoE-subset conditional accuracy
                # (trimodal.py:115-154) — HMC, first batch per repeat
                from ..eval.modalities import poe_subset_accuracy

                try:
                    metrics.update(poe_subset_accuracy(
                        bundle.model, variables, classifiers, xs,
                        [np.asarray(l) for l in labs], kb, bundle.spec,
                        n_data=min(32, len(xs[0])), ns=8,
                        mcmc_steps=info.mcmc_steps))
                except Exception as e:
                    print(f"[poe_subset_accuracy] skipped: {e}")
            if bundle.dataset == "circles_squares" and bi == 0:
                # circles conditional radius distribution metric
                # (jmvae_nf_circles.py:107-129)
                from ..eval.latent_analysis import conditional_rdist_metrics

                metrics.update(conditional_rdist_metrics(
                    bundle.model, variables, xs, jax.random.fold_in(kb, 41),
                    run_path=run_path if r == 0 else None,
                    n=min(100, info.ns * 10), n_data=min(100, len(xs[0]))))
            for k, v in metrics.items():
                batch_metrics.setdefault(k, []).append((v, n_data))
        # weight per-batch means by the number of scored datapoints so a
        # ragged final batch doesn't count as much as a full one
        # (validate.py:111-116 scores every datapoint equally)
        metrics = {
            k: float(sum(v * w for v, w in vw) / sum(w for _, w in vw))
            for k, vw in batch_metrics.items()
        }
        if not info.skip_fid:
            metrics.update(cross_modal_fid(
                bundle.model, variables, test_l, bundle.spec, kr,
                encoder_fn, n_batches=info.fid_batches or None,
                verbose=(r == 0), compute_prd=info.prd,
                prd_curve_dir=run_path if r == 0 else None))
        all_metrics.append(metrics)
        print(f"repeat {r}: {metrics}")

    # per-repeat tracking (validate.py:153-154 wandb.log semantics)
    from ..utils import Tracker

    tracker = Tracker(project=cfg.wandb_experiment or cfg.experiment,
                      run_path=run_path)
    for r, m in enumerate(all_metrics):
        tracker.log({f"val/{k}": v for k, v in m.items()}, step=r)
    tracker.close()

    summary = {}
    for k in all_metrics[0]:
        vals = [m[k] for m in all_metrics]
        summary[k] = {"mean": float(np.mean(vals)), "std": float(np.std(vals))}
    print(json.dumps(summary, indent=2))
    with open(os.path.join(run_path, "metrics.json"), "w") as f:
        json.dump(summary, f)

    # sample grids (validate.py:118-128)
    from ..eval import generate, sample_from_conditional

    gen = generate(bundle.model, variables, key, bundle.spec, N=32)
    if len(gen) == 2:
        save_samples([np.asarray(g) for g in gen[:2]],
                     os.path.join(run_path, "generate_val.png"))
        # Bayes-chained generation p(x)p(y|x) grids (validate.py:128,
        # multi_vaes.py:105-126 gen_from_cond_{0,1})
        from ..eval import generate_from_conditional

        data, cond = generate_from_conditional(
            bundle.model, variables, jax.random.fold_in(key, 7),
            bundle.spec, N=32)
        save_samples([np.asarray(data[0]), np.asarray(cond[0][1][0])],
                     os.path.join(run_path, "gen_from_cond_0.png"))
        save_samples([np.asarray(cond[1][0][0]), np.asarray(data[1])],
                     os.path.join(run_path, "gen_from_cond_1.png"))
    if bundle.dataset == "circles_squares" and hasattr(bundle.model,
                                                       "joint_encoder"):
        # PoE visualisation (jmvae_nf_circles.py:138-214)
        from ..eval.latent_analysis import visualize_poe

        try:
            xs0, _ = next(iter(test_l))
            visualize_poe(bundle.model, variables,
                          [jnp.asarray(x) for x in xs0], run_path, key)
        except Exception as e:
            print(f"[visualize_poe] skipped: {e}")
    return summary


if __name__ == "__main__":
    main()
