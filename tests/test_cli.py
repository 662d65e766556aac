"""CLI-level e2e: train via cli.train, then validate via cli.validate with
a multi-batch test loader — pins the full-test-set evaluation protocol
(validate.py:111-116: every test batch scored, per-batch metrics averaged
within a repeat, mean/std across repeats)."""

import json
import os

import pytest

SMOKE_CFG = {
    "llik_scaling": 0.0, "batch_size": 16, "learning_rate": 1e-3,
    "num_hidden_layers": 1, "use_pretrain": "", "seed": 1, "data_path": "",
    "skip_warmup": False, "warmup": 0, "beta_prior": 1, "beta_kl": 1,
    "decrease_beta_kl": 1, "fix_decoders": True, "fix_jencoder": True,
    "no_recon": False, "freq_analytics": 100, "dcca": False,
    "experiment": "mmvae/circles", "model": "circles_squares", "obj": "elbo",
    "K": 1, "recon_losses": ["normal", "normal"], "looser": False,
    "epochs": 2, "latent_dim": 2, "dist": "normal", "no_nf": True,
    # synthetic circles: 240 pairs -> test split 36 -> 3 test batches @16
    "dataset_size": 60, "n_repeat": 4, "no_analytics": True,
}


def test_train_then_validate_full_test_set(tmp_path):
    from mmvae_tpu.cli.train import main as train_main
    from mmvae_tpu.cli.validate import main as validate_main

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(SMOKE_CFG))
    exp_dir = str(tmp_path / "exp")
    run_path = train_main(["--config-path", str(cfg_path),
                           "--experiments-dir", exp_dir])
    assert os.path.exists(os.path.join(run_path, "model.msgpack"))

    # the test loader must yield >1 batch so the full-set loop is exercised
    from mmvae_tpu.data import get_dataloaders

    _, test_l, _ = get_dataloaders("circles_squares", batch_size=16,
                                   dataset_size=60, n_repeat=4)
    assert len(test_l) > 1

    summary = validate_main(["--run-path", run_path,
                             "--experiments-dir", exp_dir,
                             "--repeats", "2", "--skip-fid",
                             "--batch-size", "16"])
    for k in ("acc_0_1", "acc_1_0", "joint_coherence"):
        assert k in summary
        assert 0.0 <= summary[k]["mean"] <= 1.0
    assert os.path.exists(os.path.join(run_path, "metrics.json"))


def test_generate_joint_cli(tmp_path):
    """GMM joint generation end to end (generate_joint.py:50-114): fit on
    train latents through the jitted infer path, save
    generated_modality_i.npy, score joint coherence."""
    from mmvae_tpu.cli.generate_joint import main as gen_main
    from mmvae_tpu.cli.train import main as train_main

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(SMOKE_CFG))
    exp_dir = str(tmp_path / "exp")
    run_path = train_main(["--config-path", str(cfg_path),
                           "--experiments-dir", exp_dir])

    joint_acc = gen_main(["--run-path", run_path,
                          "--experiments-dir", exp_dir, "--n", "64"])
    assert 0.0 <= joint_acc <= 1.0
    for i in range(2):
        p = os.path.join(run_path, f"generated_modality_{i}.npy")
        assert os.path.exists(p)
