"""CLI-level e2e: train via cli.train, then drive every analysis CLI
against the same run — validate with a multi-batch test loader (pins the
full-test-set protocol, validate.py:111-116), GMM joint generation
(generate_joint.py:50-114), IS likelihoods (compute_likelihoods.py:102-107),
and results plotting."""

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


@pytest.fixture(scope="module")
def smoke_run(tmp_path_factory):
    """One smoke-trained MMVAE run shared by every analysis-CLI test."""
    from mmvae_tpu.cli.train import main as train_main

    tmp = tmp_path_factory.mktemp("cli_smoke")
    cfg_path = tmp / "cfg.json"
    cfg_path.write_text(json.dumps(SMOKE_CFG))
    exp_dir = str(tmp / "exp")
    run_path = train_main(["--config-path", str(cfg_path),
                           "--experiments-dir", exp_dir])
    return run_path, exp_dir


def test_train_then_validate_full_test_set(smoke_run):
    from mmvae_tpu.cli.validate import main as validate_main

    run_path, exp_dir = smoke_run
    assert os.path.exists(os.path.join(run_path, "model.msgpack"))

    # per-epoch tracking (main.py:166,212 wandb.log semantics -> metrics.jsonl)
    with open(os.path.join(run_path, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    train_rows = [r for r in rows if "train_loss" in r]
    assert len(train_rows) == SMOKE_CFG["epochs"]
    for r in train_rows:
        assert "val_loss" in r and "epoch" in r

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
    # Bayes-chained generation grids (validate.py:128 gen_from_cond_{0,1})
    assert os.path.exists(os.path.join(run_path, "gen_from_cond_0.png"))
    assert os.path.exists(os.path.join(run_path, "gen_from_cond_1.png"))

    # validate appends one tracking row per repeat (validate.py:153-154)
    with open(os.path.join(run_path, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert sum(1 for r in rows if "val/acc_0_1" in r) == 2


def test_validate_classifier_fid_prd(smoke_run):
    """--fid-encoder classifier + --prd: FID/PRD from the trained eval
    classifiers' penultimate features (Quality_assess.py:21-170
    custom-encoder pattern) — the meaningful generation-quality metric on
    a zero-egress box. Pins: per-modality encoder dispatch in
    cross_modal_fid, make_feature_fn, and the prd_f8_* emission."""
    from mmvae_tpu.cli.validate import main as validate_main

    run_path, exp_dir = smoke_run
    summary = validate_main(["--run-path", run_path,
                             "--experiments-dir", exp_dir,
                             "--repeats", "1", "--batch-size", "16",
                             "--fid-encoder", "classifier", "--prd"])
    import numpy as np
    for k in ("fid_0", "fid_1", "prd_f8_0", "prd_f8_1",
              "prd_f1_8_0", "prd_f1_8_1"):
        assert k in summary, k
        assert np.isfinite(summary[k]["mean"]), k
    # classifier features are class-discriminative, so real-vs-generated
    # FID must be strictly positive (a constant/input-insensitive encoder
    # would emit ~0 — the failure mode this option exists to avoid)
    assert summary["fid_0"]["mean"] > 0
    for k in ("prd_f8_0", "prd_f8_1"):
        assert 0.0 <= summary[k]["mean"] <= 1.0 + 1e-3
    # full PRD curves persisted + rendered (VERDICT r4 weak#4;
    # prd_score.py:177-228 plot, analysis/plot_prds_from_utils.py)
    import numpy as np
    for d in ("0", "1"):
        npz = os.path.join(run_path, f"prd_curve_{d}.npz")
        assert os.path.exists(npz), npz
        arrs = np.load(npz)
        assert arrs["precision"].shape == arrs["recall"].shape
        assert len(arrs["precision"]) > 100  # full curve, not the summary pair
        assert os.path.exists(os.path.join(run_path, f"prd_curve_{d}.png"))
    # multi-run overlay figure through the plotting CLI
    from mmvae_tpu.cli.plot_results import main as plot_main
    out = os.path.join(run_path, "prds_compare.png")
    plot_main(["--runs", run_path, run_path, "--labels", "a", "b",
               "--prd-curves", "--direction", "0", "--out", out])
    assert os.path.exists(out)


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


def test_generate_joint_cli(smoke_run):
    """GMM joint generation end to end (generate_joint.py:50-114): fit on
    train latents through the jitted infer path, save
    generated_modality_i.npy, score joint coherence."""
    from mmvae_tpu.cli.generate_joint import main as gen_main

    run_path, exp_dir = smoke_run
    joint_acc = gen_main(["--run-path", run_path,
                          "--experiments-dir", exp_dir, "--n", "64"])
    assert 0.0 <= joint_acc <= 1.0
    import json
    with open(os.path.join(run_path, "args.json")) as f:
        exp_tail = json.load(f)["experiment"].split("/")[-1]
    pool = os.path.join(exp_dir, "joint_encoders", exp_tail)
    for i in range(2):
        p = os.path.join(run_path, f"generated_modality_{i}.npy")
        assert os.path.exists(p)
        # published into the joint pool too — where the use_gen retrain
        # reads them (main.py:123-127 pretrained_joint_path semantics)
        assert os.path.exists(
            os.path.join(pool, f"generated_modality_{i}.npy"))


def test_compute_likelihoods_cli(smoke_run):
    """IS likelihood protocol through the CLI (compute_likelihoods.py:96-117
    semantics): conditional + joint + bis estimates over test batches,
    summary persisted to likelihoods.json."""
    from mmvae_tpu.cli.compute_likelihoods import main as ll_main

    run_path, exp_dir = smoke_run
    summary = ll_main(["--run-path", run_path, "--experiments-dir", exp_dir,
                       "--k", "10", "--batch-size-k", "5", "--repeats", "2",
                       "--batch-size", "16", "--max-batches", "1", "--bis"])
    for k in ("cond_likelihood_0_1", "cond_likelihood_1_0"):
        assert k in summary and summary[k]["mean"] < 0.0
    # bis protocol = joint_ll_from_uni - uni_from_prior (multi_vaes.py:253-268)
    assert "conditional_likelihood_bis_0_1" in summary
    assert "conditional_likelihood_bis_1_0" in summary
    assert os.path.exists(os.path.join(run_path, "likelihoods.json"))


def test_likelihood_chunk_matches_per_batch(smoke_run):
    """--steps-per-dispatch chunking (VERDICT r4 weak#3) is key-identical to
    the per-batch path: same per-batch fold_in keys inside the lax.map, same
    accumulation order — protocol values agree to f32 round-off (the lax.map
    program may fuse differently than the standalone per-batch programs, so
    last-ulp differences remain). Mirrors test_eval_chunk_matches_per_batch
    for the train/val epoch scan."""
    from mmvae_tpu.cli.compute_likelihoods import main as ll_main

    run_path, exp_dir = smoke_run
    # circles smoke test split = 36 pairs @ bs 16 -> [16, 16, 4]: one
    # 2-batch chunk + the ragged tail through the per-batch fallback
    common = ["--run-path", run_path, "--experiments-dir", exp_dir,
              "--k", "10", "--batch-size-k", "5", "--repeats", "2",
              "--batch-size", "16", "--bis"]
    per_batch = ll_main(common + ["--steps-per-dispatch", "1"])
    chunked = ll_main(common + ["--steps-per-dispatch", "2"])
    assert set(per_batch) == set(chunked)
    for k in per_batch:
        assert per_batch[k]["mean"] == pytest.approx(
            chunked[k]["mean"], rel=1e-6, abs=1e-6), k
        # std across repeats subtracts near-equal per-repeat means, so
        # fusion-order ulps on |mean| ~ 1e3 surface as ~1e-4 absolute here
        assert per_batch[k]["std"] == pytest.approx(
            chunked[k]["std"], rel=1e-2, abs=5e-4), k


def test_dcca_train_cli(tmp_path, capsys):
    """DCCA pretrain entry (dcca/main_mnist_svhn.py protocol): Solver fit,
    artifact export to <out>/<dataset>/dcca.npz, SVM probe on the LCCA
    projections."""
    import jax

    from mmvae_tpu.cli.dcca_train import main as dcca_main

    try:
        out = dcca_main(["--dataset", "mnist_svhn", "--synthetic-n", "128",
                         "--epochs", "1", "--batch-size", "64", "--outdim",
                         "4", "--out", str(tmp_path / "dcca"),
                         "--platform", "cpu"])
    finally:
        # the CLI enables x64 for the CPU eigh path; undo the global toggle
        jax.config.update("jax_enable_x64", False)
    assert os.path.exists(out) and out.endswith("dcca.npz")
    assert "SVM probe view 1" in capsys.readouterr().out


def test_plot_results_cli(smoke_run, tmp_path):
    """plot_results renders metric comparisons and loss curves to PNG."""
    from mmvae_tpu.cli.plot_results import main as plot_main

    run_path, _ = smoke_run
    # order-independent: ensure a metrics.json exists (validate writes one)
    mpath = os.path.join(run_path, "metrics.json")
    if not os.path.exists(mpath):
        with open(mpath, "w") as f:
            json.dump({"acc_0_1": {"mean": 0.5, "std": 0.1}}, f)
    out1 = str(tmp_path / "metric.png")
    plot_main(["--runs", run_path, run_path, "--metric", "acc_0_1",
               "--out", out1])
    assert os.path.getsize(out1) > 0

    out2 = str(tmp_path / "losses.png")
    plot_main(["--runs", run_path, "--losses", "--out", out2])
    assert os.path.getsize(out2) > 0


def test_use_gen_pipeline_len_train_reload(tmp_path):
    """The ms_small data-augmentation pipeline (ms_small/jmvae_nf_gen.json):
    stage-1 train on a len_train subset, generate_joint fits its GMM on the
    SAME subset on reload (jmvae_nf_mnist_svhn_dcca.py:104-106 re-reads
    params.len_train), stage-2 use_gen appends len_gen generated pairs."""
    from mmvae_tpu.cli.common import reload_model
    from mmvae_tpu.cli.generate_joint import main as gen_main
    from mmvae_tpu.cli.train import main as train_main

    cfg = dict(SMOKE_CFG)
    cfg.pop("dataset_size"); cfg.pop("n_repeat")
    cfg.update({
        "experiment": "mmvae/ms_small_smoke", "model": "mnist_svhn",
        "obj": "elbo", "dist": "laplace",
        "recon_losses": ["laplace", "laplace"], "llik_scaling": 0.0,
        "epochs": 1, "latent_dim": 4, "synthetic_n": 256,
        "len_train": 100, "use_gen": True, "len_gen": 24,
    })
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    exp_dir = str(tmp_path / "exp")
    run_path = train_main(["--config-path", str(cfg_path),
                           "--experiments-dir", exp_dir])

    # reload_model forwards the first-class len_train field to the loader:
    # the val split carves 1/10, so the reloaded train subset is 90 pairs
    _, _, _, loaders = reload_model(run_path)
    assert len(loaders[0].dataset) == 90

    gen_main(["--run-path", run_path, "--experiments-dir", exp_dir,
              "--n", "24", "--platform", "cpu"])

    # stage 2: skip_warmup + use_gen appends len_gen pairs to the subset
    cfg["skip_warmup"] = True
    cfg_path.write_text(json.dumps(cfg))
    run2 = train_main(["--config-path", str(cfg_path),
                       "--experiments-dir", exp_dir])
    with open(os.path.join(run2, "args.json")) as f:
        assert json.load(f)["use_gen"] is True


def test_classifier_pool_keyed_by_distribution():
    """r5 bug fix: eval classifiers trained on one synthetic distribution
    must not be silently reused for another. The pool filename carries the
    difficulty/confound_max/fold variant of the run's config; real-data /
    easy-synthetic configs keep the reference's unsuffixed pool name."""
    from mmvae_tpu.cli.common import distribution_variant
    from mmvae_tpu.core.config import ExperimentConfig

    easy = ExperimentConfig()
    assert distribution_variant(easy) == ""
    assert distribution_variant(None) == ""
    hard = ExperimentConfig()
    hard.extra = {"difficulty": 0.55, "confound_max": 0.7}
    assert distribution_variant(hard) == "_d0.55_c0.7"
    hard2 = ExperimentConfig()
    hard2.extra = {"difficulty": 0.55, "confound_max": 0.7, "fold": 2.0}
    assert distribution_variant(hard2) == "_d0.55_c0.7_f2"
    # distinct distributions -> distinct pool entries
    assert distribution_variant(hard) != distribution_variant(hard2)
    # explicit confound_max=0.0 is NOT the absent-key distribution (the
    # generator derives 0.9*difficulty when the key is missing) — it must
    # key separately; fold=0.0 / difficulty=0.0 ARE bit-identical legacy
    c0 = ExperimentConfig()
    c0.extra = {"difficulty": 0.55, "confound_max": 0.0}
    assert distribution_variant(c0) == "_d0.55_c0"
    legacy = ExperimentConfig()
    legacy.extra = {"difficulty": 0.0, "fold": 0.0}
    assert distribution_variant(legacy) == ""
