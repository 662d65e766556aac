"""HMC chain-length convergence on a trained trimodal model (VERDICT r3
next#3): sweep `mcmc_steps` for the PoE-subset conditional metrics
(eval/modalities.poe_subset_accuracy — trimodal.py:115-154 protocol,
jmvae_nf.py:332,435 chain semantics) and print a steps-vs-accuracy /
acceptance-rate table, justifying (or indicting) any fast default against
the reference's 100-step chain.

    python -u scripts/hmc_convergence.py --model jmvae_nf/msf_synth \
        --experiments-dir /root/experiments [--steps 2 5 10 30 100 200]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--experiments-dir", default="/root/experiments")
    ap.add_argument("--steps", type=int, nargs="+",
                    default=[2, 5, 10, 30, 100, 200])
    ap.add_argument("--n-data", type=int, default=64)
    ap.add_argument("--ns", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    info = ap.parse_args()

    from mmvae_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from mmvae_tpu.cli.common import (find_latest_run,
                                      get_or_train_classifiers, reload_model)
    from mmvae_tpu.eval.modalities import poe_subset_accuracy

    run_path = find_latest_run(info.experiments_dir, info.model)
    print("run:", run_path)
    cfg, bundle, variables, loaders = reload_model(run_path, batch_size=500)
    key = jax.random.PRNGKey(cfg.seed)
    classifiers = get_or_train_classifiers(bundle, loaders,
                                           info.experiments_dir, key, cfg=cfg)
    xs, labs = next(iter(loaders[1]))
    xs = [jax.numpy.asarray(x) for x in xs]
    labs = [np.asarray(l) for l in labs]

    rows = {}
    for steps in info.steps:
        t0 = time.time()
        per = []
        for r in range(info.repeats):
            per.append(poe_subset_accuracy(
                bundle.model, variables, classifiers, xs, labs,
                jax.random.fold_in(key, 1000 * r), bundle.spec,
                n_data=info.n_data, ns=info.ns, mcmc_steps=steps))
        rows[steps] = ({k: float(np.mean([m[k] for m in per]))
                        for k in per[0]},
                       {k: float(np.std([m[k] for m in per]))
                        for k in per[0]},
                       time.time() - t0)
        print(f"steps={steps:4d} done in {rows[steps][2]:.1f}s", flush=True)

    keys = sorted(rows[info.steps[0]][0])
    print("\n| mcmc_steps | " + " | ".join(keys) + " | sec |")
    print("|" + "---|" * (len(keys) + 2))
    for steps in info.steps:
        mean, std, dt = rows[steps]
        cells = [f"{mean[k]:.4f} ± {std[k]:.4f}" for k in keys]
        print(f"| {steps} | " + " | ".join(cells) + f" | {dt:.0f} |")


if __name__ == "__main__":
    main()
