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

    # per-epoch tracking (main.py:166,212 wandb.log semantics -> metrics.jsonl)
    with open(os.path.join(run_path, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert len(rows) == SMOKE_CFG["epochs"]
    for r in rows:
        assert "train_loss" in r and "val_loss" in r and "epoch" in r

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


def test_skip_warmup_use_gen_pool(tmp_path, capsys):
    """The joint-encoder pool chain (main.py:79-86,123-127): a warmup run
    publishes the pool at <experiments_dir>/joint_encoders/<exp>; a second
    run with skip_warmup+use_gen reloads it from the SAME location and
    appends generated pairs to the train set."""
    import numpy as np

    from mmvae_tpu.cli.train import main as train_main

    cfg = dict(SMOKE_CFG, model="jnf_circles_squares", obj="jmvae_nf",
               experiment="jmvae_nf/circles", warmup=2, epochs=2,
               save_joint=True, no_nf=False, flow="maf")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    exp_dir = str(tmp_path / "exp")
    train_main(["--config-path", str(cfg_path), "--experiments-dir", exp_dir])

    pool = os.path.join(exp_dir, "joint_encoders", "circles")
    assert os.path.exists(os.path.join(pool, "model_joint_encoder.msgpack"))

    # drop generated samples into the pool (generate_joint.py:104 artifacts)
    rng = np.random.default_rng(0)
    for i in range(2):
        np.save(os.path.join(pool, f"generated_modality_{i}.npy"),
                rng.uniform(size=(24, 1, 32, 32)).astype(np.float32))

    cfg2 = dict(cfg, skip_warmup=True, use_gen=True, len_gen=24, epochs=1)
    cfg2_path = tmp_path / "cfg2.json"
    cfg2_path.write_text(json.dumps(cfg2))
    train_main(["--config-path", str(cfg2_path), "--experiments-dir", exp_dir])
    out = capsys.readouterr().out
    assert "use_gen: appended 24 generated pairs" in out
    assert "no pool" not in out  # the pool WAS found and reloaded


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
