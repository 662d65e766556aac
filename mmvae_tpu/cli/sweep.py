"""Hyperparameter sweep driver — the wandb bayes-sweep equivalent
(src/bivae/sweeps/sweep_mnist.yaml, consumed by wandb agent in the
reference). wandb is unavailable here, so the sweep runs in-process:

- spec: the same YAML shape (method / metric / parameters with value or
  min/max or values);
- method 'random' or 'grid' supported natively; 'bayes' falls back to a
  simple expected-improvement-free strategy: random exploration followed by
  Gaussian perturbation around the incumbent (good enough for the 1-3
  continuous dims the reference sweeps over);
- each trial trains via cli.train machinery on a merged config and scores
  the sweep metric from the run's metrics (validate) or final val loss.

Usage:
    python -m mmvae_tpu.cli.sweep --spec sweeps/sweep_mnist.yaml \
        --base-config configs/circles/mmvae.json --trials 10
"""

from __future__ import annotations

import argparse
import itertools
import json
import os

import numpy as np


def _sample_params(spec_params, rng, incumbent=None, explore=True):
    """Draw one trial's overrides from the spec's parameter table."""
    out = {}
    for name, p in spec_params.items():
        key = name.replace("-", "_")
        if "value" in p:
            out[key] = p["value"]
        elif "values" in p:
            out[key] = p["values"][int(rng.integers(len(p["values"])))]
        elif "min" in p and "max" in p:
            lo, hi = float(p["min"]), float(p["max"])
            if incumbent is not None and not explore and key in incumbent:
                # bayes-lite: local Gaussian perturbation of the incumbent
                v = incumbent[key] + rng.normal(0, 0.15 * (hi - lo))
                out[key] = float(np.clip(v, lo, hi))
            else:
                out[key] = float(rng.uniform(lo, hi))
        else:
            raise ValueError(f"unsupported parameter spec for {name}: {p}")
    return out


def _grid(spec_params):
    keys, choices = [], []
    for name, p in spec_params.items():
        key = name.replace("-", "_")
        if "value" in p:
            keys.append(key)
            choices.append([p["value"]])
        elif "values" in p:
            keys.append(key)
            choices.append(list(p["values"]))
        else:
            raise ValueError(
                f"grid sweeps need discrete 'value(s)' for {name}")
    for combo in itertools.product(*choices):
        yield dict(zip(keys, combo))


def run_trial(base_cfg: dict, overrides: dict, experiments_dir: str,
              metric_name: str, trial_id: int, sign: float = 1.0) -> float:
    """Train one config; return a MAXIMIZATION score for the sweep metric.

    The declared metric gets `sign` applied (+1 maximize / -1 minimize);
    validate metrics (acc_*, joint_coherence — the reference sweep's
    targets, sweep_mnist.yaml:3-5) are computed with a 1-repeat validate
    when training alone didn't produce them. With no metric at all the
    score falls back to -min(val loss), which is already
    maximization-oriented and must NOT get `sign` applied again."""
    import tempfile

    from .train import main as train_main

    cfg = dict(base_cfg)
    cfg.update(overrides)
    cfg["experiment"] = os.path.join(
        cfg.get("experiment") or cfg["model"], f"sweep_{trial_id}")
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(cfg, f)
        cfg_path = f.name
    run_path = train_main(["--config-path", cfg_path,
                           "--experiments-dir", experiments_dir])
    # metric: from metrics.json if a prior validate wrote it, else run a
    # cheap validate for it, else fall back to the training val loss
    score = None
    mpath = os.path.join(run_path, "metrics.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            metrics = json.load(f)
        if metric_name in metrics:
            v = metrics[metric_name]
            score = v["mean"] if isinstance(v, dict) else float(v)
    if score is None and metric_name:
        try:
            from .validate import main as validate_main

            summary = validate_main(["--run-path", run_path,
                                     "--experiments-dir", experiments_dir,
                                     "--repeats", "1", "--skip-fid"])
            if metric_name in summary:
                score = summary[metric_name]["mean"]
        except Exception as e:  # sweep must survive a broken trial eval
            print(f"sweep: validate for metric '{metric_name}' failed: {e}")
    if score is None:
        with open(os.path.join(run_path, "losses.json")) as f:
            hist = json.load(f)
        return -float(min(hist["test_loss"]))  # maximize -val_loss
    return sign * float(score)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--spec", type=str, required=True,
                        help="sweep YAML (sweep_mnist.yaml schema)")
    parser.add_argument("--base-config", type=str, required=True,
                        help="base JSON config; sweep parameters override it")
    parser.add_argument("--trials", type=int, default=10)
    parser.add_argument("--experiments-dir", type=str, default="../experiments")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None)
    info = parser.parse_args(argv)
    if info.platform:
        import jax

        jax.config.update("jax_platforms", info.platform)

    import yaml

    with open(info.spec) as f:
        spec = yaml.safe_load(f)
    with open(info.base_config) as f:
        base_cfg = json.load(f)
    method = spec.get("method", "random")
    metric = spec.get("metric", {})
    metric_name = metric.get("name", "")
    sign = 1.0 if metric.get("goal", "maximize") == "maximize" else -1.0

    rng = np.random.default_rng(info.seed)
    trials = []
    best = None
    if method == "grid":
        candidates = list(_grid(spec["parameters"]))[: info.trials]
        gen = iter(candidates)
    else:
        gen = None

    for i in range(info.trials):
        if gen is not None:
            try:
                overrides = next(gen)
            except StopIteration:
                break
        else:
            explore = method != "bayes" or i < max(3, info.trials // 3) or best is None
            overrides = _sample_params(spec["parameters"], rng,
                                       incumbent=best and best["overrides"],
                                       explore=explore)
        score = run_trial(base_cfg, overrides, info.experiments_dir,
                          metric_name, i, sign)
        trials.append({"overrides": overrides, "score": score})
        if best is None or score > best["score"]:
            best = trials[-1]
        print(f"trial {i}: score {score:.4f} overrides "
              f"{ {k: v for k, v in overrides.items() if 'min' not in str(v)} }")

    out = {"method": method, "metric": metric, "best": best, "trials": trials}
    out_path = os.path.join(info.experiments_dir, "sweep_results.json")
    os.makedirs(info.experiments_dir, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print("best:", json.dumps(best))
    return out


if __name__ == "__main__":
    main()
