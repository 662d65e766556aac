"""Device-resident input pipeline: the in-jit gather+decode must produce the
same batches as the host path, and the device train step must match the
host train step numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.core.config import ExperimentConfig
from mmvae_tpu.data.device_pipeline import DeviceDataPipeline
from mmvae_tpu.models import registry
from mmvae_tpu.train import Trainer
from mmvae_tpu.train.loop import TrainerState


def _pipeline(batch=8):
    rng = np.random.default_rng(0)
    base = [
        (rng.uniform(size=(64, 1, 32, 32)) * 255).astype(np.uint8),
        (rng.uniform(size=(48, 1, 32, 32)) * 255).astype(np.uint8),
    ]
    idx = [rng.integers(0, len(b), 128).astype(np.int32) for b in base]
    return DeviceDataPipeline(base, idx, batch, shuffle=False), base, idx


def test_gather_matches_host():
    pipeline, base, idx = _pipeline()
    gather = pipeline.gather_fn()
    rows = jnp.arange(8, dtype=jnp.int32)
    xs = jax.jit(gather)(rows, pipeline.data_state)
    for m in range(2):
        expect = base[m][idx[m][:8]].astype(np.float32) / 255.0
        np.testing.assert_allclose(np.asarray(xs[m]), expect, atol=1e-6)


def test_device_step_matches_host_step():
    cfg = ExperimentConfig(
        model="circles_squares", obj="elbo", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=8,
        warmup=0,
    )
    bundle = registry.build(cfg)
    trainer = Trainer(bundle.model, bundle.spec, cfg)
    pipeline, base, idx = _pipeline()
    gather = pipeline.gather_fn()
    rows = jnp.arange(8, dtype=jnp.int32)
    xs = jax.jit(gather)(rows, pipeline.data_state)

    key = jax.random.PRNGKey(0)
    variables = trainer.init_variables([np.asarray(x) for x in xs], key)
    opt_state = trainer.init_opt_state(variables)

    lr = jnp.float32(1e-3)
    one = jnp.float32(1.0)
    # host step on the gathered batch
    host_step = trainer.train_step(past_warmup=True)
    v1, o1, loss1, _ = host_step(
        jax.tree.map(jnp.copy, variables), jax.tree.map(jnp.copy, opt_state),
        xs, key, lr, one, one)
    # device step from raw indices
    dev_step = trainer.device_train_step(past_warmup=True, pipeline=pipeline)
    v2, o2, loss2, _ = dev_step(
        jax.tree.map(jnp.copy, variables), jax.tree.map(jnp.copy, opt_state),
        pipeline.data_state, rows, key, lr, one, one)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(v1["params"]), jax.tree.leaves(v2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
