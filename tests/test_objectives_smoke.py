"""Every objective must run through a real Trainer step with a suitable
model and produce finite losses and updated params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.core.config import ExperimentConfig
from mmvae_tpu.data import get_dataloaders
from mmvae_tpu.models import registry
from mmvae_tpu.train import Trainer
from mmvae_tpu.train.loop import TrainerState

CASES = [
    # (model, obj, looser, extra cfg)
    ("circles_squares", "elbo_naive", False, {}),
    ("circles_squares", "iwae", False, dict(K=3)),
    ("circles_squares", "iwae", True, dict(K=3)),
    ("circles_squares", "dreg", False, dict(K=3)),
    ("jnf_circles_squares", "jmvae", False, dict(warmup=0, no_nf=True)),
    ("jnf_circles_squares", "telbo_nf", False, dict(warmup=0, no_nf=True)),
    ("jnf_circles_squares", "telbo", False, dict(warmup=0, no_nf=True)),
    ("jnf_circles_squares", "svae", False, dict(no_nf=True)),
    ("jnf_circles_squares", "multi_elbos", False, dict(no_nf=True)),
    ("jnf_circles_squares", "vaevae_kl", False, dict(warmup=0, no_nf=True)),
    ("jnf_circles_squares", "vaevae_w2", False, dict(warmup=0, no_nf=True)),
    ("mmvae_nf_mnist_svhn", "elbo_nf", False, dict(no_nf=False)),
    ("mvae_mnist_svhn", "self_built", False, {}),
    ("moepoe_mnist_svhn", "self_built", False, {}),
]


@pytest.mark.parametrize("model,obj,looser,extra", CASES,
                         ids=[f"{m}-{o}{'-looser' if l else ''}"
                              for m, o, l, extra in CASES])
def test_objective_one_step(model, obj, looser, extra):
    cfg = ExperimentConfig(
        model=model, obj=obj, looser=looser, K=extra.pop("K", 1),
        dist="normal", recon_losses=("normal", "normal"),
        latent_dim=3, batch_size=8, **extra,
    )
    bundle = registry.build(cfg)
    if "mnist_svhn" in model:
        xs = [np.random.rand(8, 1, 28, 28).astype(np.float32),
              np.random.rand(8, 3, 32, 32).astype(np.float32)]
    else:
        train, _, _ = get_dataloaders("circles_squares", batch_size=8,
                                      dataset_size=10, n_repeat=2)
        xs, _ = next(iter(train))
        xs = [np.asarray(x) for x in xs]

    trainer = Trainer(bundle.model, bundle.spec, cfg)
    key = jax.random.PRNGKey(0)
    variables = trainer.init_variables(xs, key)
    opt_state = trainer.init_opt_state(variables)
    step = trainer.train_step(past_warmup=True)
    before = jax.device_get(jax.tree.leaves(variables["params"]))
    variables, opt_state, loss, details = step(
        variables, opt_state, [jnp.asarray(x) for x in xs], key,
        jnp.float32(1e-3), jnp.float32(1.0), jnp.float32(1.0))
    assert np.isfinite(float(loss)), (model, obj, float(loss))
    after = jax.device_get(jax.tree.leaves(variables["params"]))
    # some leaves legitimately stay fixed (e.g. the joint encoder under the
    # vaevae losses); at least one leaf must have moved
    assert any(not np.array_equal(a, b) for a, b in zip(before, after)), \
        "no params updated"


def test_dreg_updates_encoder_batch_stats():
    """Regression: the two-stage DReG VJP must carry BOTH stages'
    batch_stats updates (stage 2 builds on stage 1's state)."""
    from mmvae_tpu.models import MMVAE, UnimodalVAE
    from mmvae_tpu.nets import DecoderMNIST, EncoderMNIST
    from mmvae_tpu.objectives import ModelSpec
    from mmvae_tpu.objectives.objectives import m_dreg_looser

    D = 3
    vaes = [
        UnimodalVAE(encoder=EncoderMNIST(latent_dim=D),
                    decoder=DecoderMNIST(latent_dim=D), latent_dim=D,
                    model_name=f"m{i}")
        for i in range(2)
    ]
    model = MMVAE(vaes=vaes)
    key = jax.random.PRNGKey(0)
    xs = [jnp.asarray(np.random.rand(4, 1, 28, 28).astype(np.float32))
          for _ in range(2)]
    variables = model.init({"params": key, "sample": key}, xs, K=1)
    spec = ModelSpec(latent_dim=D)
    _, _, state, _ = m_dreg_looser(model, variables, xs, key, spec, K=2,
                                   train=True)
    bs = state["batch_stats"]
    # both encoder AND decoder BN means must have moved off init
    enc_means = jax.tree.leaves(
        {k: v for k, v in bs["vaes_0"]["encoder"].items()})
    dec_means = jax.tree.leaves(
        {k: v for k, v in bs["vaes_0"]["decoder"].items()})
    assert any(float(jnp.abs(m).max()) > 0 for m in enc_means), "encoder stats lost"
    assert any(float(jnp.abs(m).max()) > 0 for m in dec_means), "decoder stats lost"


@pytest.mark.parametrize("obj", ["vaevae_kl", "telbo", "multi_elbos", "jmvae"])
def test_multipass_objectives_update_batch_stats(obj):
    """Regression: multi-pass objectives (joint forward + auxiliary
    vae_forward/unimodal_cross_forward calls) must thread BN running stats
    from EVERY pass — the torch reference updates them on each train-mode
    forward. jnf_mnist_fashion's VAEs use BatchNorm conv nets."""
    from mmvae_tpu.objectives import objectives as O

    cfg = ExperimentConfig(
        model="jnf_mnist_fashion", obj=obj, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=3, batch_size=4,
        warmup=0, no_nf=True,
    )
    bundle = registry.build(cfg)
    key = jax.random.PRNGKey(0)
    xs = [jnp.asarray(np.random.rand(4, 1, 28, 28).astype(np.float32))
          for _ in range(2)]
    variables = bundle.model.init({"params": key, "sample": key}, xs, K=1,
                                  method="init_all")
    fn = O.OBJECTIVES["m_" + obj]
    out = fn(bundle.model, variables, xs, key, bundle.spec, K=1, train=True,
             past_warmup=True, epoch=1, warmup=0)
    state = out[2]
    assert "batch_stats" in state, f"{obj} returned no mutable state"
    bs = state["batch_stats"]
    for v in ("vaes_0", "vaes_1"):
        means = jax.tree.leaves(bs[v]["encoder"])
        assert any(float(jnp.abs(m).max()) > 0 for m in means), \
            f"{obj}: {v} encoder BN stats not updated"
