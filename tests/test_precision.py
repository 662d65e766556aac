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
