"""Sweep CLI smoke: two random trials over beta_kl on the circles smoke
config; results ranked and persisted (the wandb-sweep replacement)."""

import json
import os

import yaml


def test_sweep_random_two_trials(tmp_path):
    from mmvae_tpu.cli.sweep import main as sweep_main

    base = {
        "llik_scaling": 0.0, "batch_size": 16, "learning_rate": 1e-3,
        "num_hidden_layers": 1, "use_pretrain": "", "seed": 1,
        "data_path": "", "skip_warmup": False, "warmup": 0, "beta_prior": 1,
        "beta_kl": 1, "decrease_beta_kl": 1, "fix_decoders": True,
        "fix_jencoder": True, "no_recon": False, "freq_analytics": 100,
        "dcca": False, "experiment": "", "model": "circles_squares",
        "obj": "elbo", "K": 1, "recon_losses": ["normal", "normal"],
        "looser": False, "epochs": 1, "latent_dim": 2, "dist": "normal",
        "no_nf": True, "dataset_size": 40, "n_repeat": 2,
        "no_analytics": True,
    }
    spec = {
        "method": "random",
        "metric": {"name": "", "goal": "maximize"},
        "parameters": {
            "beta-kl": {"min": 0.1, "max": 1.0},
            "model": {"value": "circles_squares"},
        },
    }
    base_path = tmp_path / "base.json"
    base_path.write_text(json.dumps(base))
    spec_path = tmp_path / "spec.yaml"
    spec_path.write_text(yaml.safe_dump(spec))
    exp_dir = str(tmp_path / "exp")

    out = sweep_main(["--spec", str(spec_path), "--base-config",
                      str(base_path), "--trials", "2",
                      "--experiments-dir", exp_dir])
    assert len(out["trials"]) == 2
    assert out["best"]["score"] >= max(t["score"] for t in out["trials"]) - 1e-9
    assert 0.1 <= out["best"]["overrides"]["beta_kl"] <= 1.0
    assert os.path.exists(os.path.join(exp_dir, "sweep_results.json"))


def test_fallback_score_is_sign_invariant(tmp_path):
    """With no sweep metric the score is -min(val loss) (already
    maximization-oriented) and must NOT be negated again for
    goal=minimize — the double negation would rank the WORST trial best."""
    from mmvae_tpu.cli.sweep import run_trial

    base = {
        "llik_scaling": 0.0, "batch_size": 16, "learning_rate": 1e-3,
        "num_hidden_layers": 1, "use_pretrain": "", "seed": 1,
        "data_path": "", "skip_warmup": False, "warmup": 0, "beta_prior": 1,
        "beta_kl": 1, "decrease_beta_kl": 1, "fix_decoders": True,
        "fix_jencoder": True, "no_recon": False, "freq_analytics": 100,
        "dcca": False, "experiment": "", "model": "circles_squares",
        "obj": "elbo", "K": 1, "recon_losses": ["normal", "normal"],
        "looser": False, "epochs": 1, "latent_dim": 2, "dist": "normal",
        "no_nf": True, "dataset_size": 40, "n_repeat": 2,
        "no_analytics": True,
    }
    s_min = run_trial(base, {}, str(tmp_path / "exp"), "", 0, sign=-1.0)
    # circles ELBO losses are large and positive -> -min(val loss) < 0
    assert s_min < 0
