"""Mixed-precision policy (core/precision.py).

The bf16 policy must change only the matmul/conv operand dtypes: params
stay float32, outputs stay float32 (f32 accumulation), and values stay
close to the f32 oracle. The default policy must be a bit-exact no-op.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.core import precision
from mmvae_tpu.nets.encoders import DecoderSVHN, EncoderSVHN


def _run(dtype_name, x, key):
    enc = EncoderSVHN(latent_dim=8)
    with precision.use(dtype_name):
        variables = enc.init(key, x)
        mu, lv = jax.jit(enc.apply)(variables, x)
    return variables, mu, lv


def test_default_policy_is_noop():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 3, 32, 32))
    v1, mu1, _ = _run(None, x, key)
    v2, mu2, _ = _run("float32", x, key)
    np.testing.assert_array_equal(np.asarray(mu1), np.asarray(mu2))


def test_bf16_policy_params_stay_f32_and_values_close():
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (4, 3, 32, 32))
    v32, mu32, _ = _run("float32", x, key)
    vbf, mubf, _ = _run("bfloat16", x, key)
    # identical init (params are created f32 under both policies)
    for a, b in zip(jax.tree.leaves(v32), jax.tree.leaves(vbf)):
        assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # outputs f32 and close to the f32 oracle (bf16 has ~3 decimal digits)
    assert mubf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(mubf), np.asarray(mu32),
                               rtol=0.05, atol=0.05)
    assert not np.array_equal(np.asarray(mubf), np.asarray(mu32))


def test_bf16_decoder_grads_finite():
    key = jax.random.PRNGKey(2)
    dec = DecoderSVHN(latent_dim=8)
    z = jax.random.normal(key, (4, 8))
    with precision.use("bfloat16"):
        variables = dec.init(key, z)

        def loss(p):
            return jnp.sum(dec.apply(p, z) ** 2)

        g = jax.jit(jax.grad(loss))(variables)
    for leaf in jax.tree.leaves(g):
        assert leaf.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(leaf)))


# ---------------------------------------------------------------------------
# activation-storage policy (opt-in "activation_dtype": conv outputs stored
# bf16 between layers; Linear heads / BN stats / log-prob math stay f32)
# ---------------------------------------------------------------------------

def test_activation_policy_dtypes():
    from mmvae_tpu.nets.conv import BatchNorm2d, Conv2d, Linear

    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (2, 3, 8, 8))
    conv = Conv2d(features=4, kernel_size=3)
    with precision.use("bfloat16", "bfloat16"):
        cv = conv.init(key, x)
        y = jax.jit(conv.apply)(cv, x)
        assert y.dtype == jnp.bfloat16
        # params still created/stored f32
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(cv))
        # Linear head on a bf16 activation returns f32 (accum contract)
        lin = Linear(features=5)
        lv = lin.init(key, y.reshape(2, -1))
        out = jax.jit(lin.apply)(lv, y.reshape(2, -1))
        assert out.dtype == jnp.float32
        # BN promotes bf16 inputs back to f32 before computing statistics
        bn = BatchNorm2d(features=4)
        bv = bn.init(key, y)
        z = jax.jit(lambda v, a: bn.apply(v, a, train=False))(bv, y)
        assert z.dtype == jnp.float32
    # policy off: conv output keeps the f32 contract
    with precision.use("bfloat16"):
        y2 = jax.jit(conv.apply)(cv, x)
        assert y2.dtype == jnp.float32


def test_activation_policy_encoder_close_to_f32():
    key = jax.random.PRNGKey(4)
    x = jax.random.uniform(key, (4, 3, 32, 32))
    enc = EncoderSVHN(latent_dim=8)
    with precision.use(None):
        v = enc.init(key, x)
        mu32, _ = jax.jit(enc.apply)(v, x)
    with precision.use("bfloat16", "bfloat16"):
        mubf, _ = jax.jit(enc.apply)(v, x)
    # heads are Linear -> f32 outputs, values close to the f32 oracle
    assert mubf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(mubf), np.asarray(mu32),
                               rtol=0.08, atol=0.08)


def test_activation_policy_train_step_parity():
    """One flagship-style DReG train step under activation-bf16 stays close
    to the f32 oracle (loss within bf16 tolerance, grads finite/f32)."""
    from mmvae_tpu.core.config import ExperimentConfig
    from mmvae_tpu.models import registry
    from mmvae_tpu.train import Trainer

    def run(extra):
        cfg = ExperimentConfig.from_dict(dict(
            model="mnist_svhn", obj="dreg", looser=True, K=3, epochs=1,
            batch_size=8, latent_dim=4, dist="laplace", warmup=0,
            experiment="t", wandb_experiment="t",
            recon_losses=["laplace", "laplace"], llik_scaling=0.0,
            seed=1, data_path="", **extra))
        bundle = registry.build(cfg)
        trainer = Trainer(bundle.model, bundle.spec, cfg)
        key = jax.random.PRNGKey(0)
        xs = [jax.random.uniform(key, (8,) + s) for s in bundle.shape_mods]
        variables = trainer.init_variables(xs, key)
        opt_state = trainer.init_opt_state(variables, past_warmup=True)
        step = trainer.train_step(past_warmup=True)
        variables, opt_state, loss, _ = step(
            variables, opt_state, xs, key, jnp.float32(1e-3),
            jnp.float32(1.0), jnp.float32(1.0))
        return float(loss), variables

    loss32, v32 = run({})
    lossbf, vbf = run({"compute_dtype": "bfloat16",
                       "activation_dtype": "bfloat16"})
    assert np.isfinite(lossbf)
    # bf16 activations: ~2-3 significant digits on a sum over pixels
    np.testing.assert_allclose(lossbf, loss32, rtol=0.05)
    for leaf in jax.tree.leaves(vbf):
        assert leaf.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(leaf)))
