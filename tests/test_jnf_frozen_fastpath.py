"""The post-warmup frozen-joint fast path (objectives.m_jmvae_nf
`frozen_joint`) must be an exact optimization: with the joint encoder and
decoders optimizer-frozen (fix_jencoder/fix_decoders, the published
post-warmup recipe, objectives.py:180-183), detaching the joint forward
changes NO observable quantity — loss values are bit-identical and the
gradients of every TRAINABLE leaf match, while the frozen leaves' gradients
(which the masked optimizer zeroes anyway, train/freezing.py) become zero
at the source."""

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.core.config import ExperimentConfig
from mmvae_tpu.models import registry
from mmvae_tpu.objectives import m_jmvae_nf
from mmvae_tpu.train import freezing


def _build(no_recon, no_nf=False):
    cfg = ExperimentConfig(
        model="jnf_circles_squares", obj="jmvae_nf", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=3, batch_size=6,
        no_nf=no_nf, flow="maf", n_made_blocks=2, no_recon=no_recon,
    )
    bundle = registry.build(cfg)
    key = jax.random.PRNGKey(0)
    x = [jax.random.uniform(jax.random.PRNGKey(10 + i), (6, 1, 32, 32))
         for i in range(2)]
    variables = bundle.model.init({"params": key, "sample": key}, x, K=1,
                                  method="init_all")
    return bundle, variables, x


def _value_and_grads(bundle, variables, x, frozen_joint):
    key = jax.random.PRNGKey(7)

    def loss_fn(p):
        v = {**variables, "params": p}
        obj, details, _ = m_jmvae_nf(
            bundle.model, v, x, key, bundle.spec, epoch=20, warmup=10,
            beta_prior=1.0, beta_kl=0.7, past_warmup=True, train=False,
            frozen_joint=frozen_joint)
        return -obj, details

    (neg, det), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    return float(neg), det, grads


def _check(no_recon):
    bundle, variables, x = _build(no_recon=no_recon)
    loss_slow, det_slow, g_slow = _value_and_grads(bundle, variables, x, False)
    loss_fast, det_fast, g_fast = _value_and_grads(bundle, variables, x, True)

    assert loss_slow == loss_fast  # stop_gradient is identity in the forward
    for k in det_slow:
        np.testing.assert_array_equal(np.asarray(det_slow[k]),
                                      np.asarray(det_fast[k]), err_msg=k)

    frozen = freezing.frozen_prefixes_for_phase(
        "m_jmvae_nf", True, fix_jencoder=True, fix_decoders=True)
    trainable = freezing.path_mask(variables["params"], frozen)

    checked_trainable, checked_frozen = 0, 0
    flat_t = jax.tree_util.tree_leaves_with_path(trainable)
    flat_s = jax.tree_util.tree_leaves(g_slow)
    flat_f = jax.tree_util.tree_leaves(g_fast)
    for (path, is_train), gs, gf in zip(flat_t, flat_s, flat_f):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if is_train:
            np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                                       rtol=0, atol=0, err_msg=name)
            checked_trainable += 1
        else:
            # fast path kills the dead backward at the source. With the
            # DCCA-recon term active (no_recon=False) the frozen decoders
            # still receive (masked-to-zero) gradients through the unimodal
            # recon path — that path also carries LIVE unimodal-encoder
            # gradients, so it cannot be detached; only the joint encoder
            # is provably dead there.
            if no_recon or "joint_encoder" in name:
                assert not np.any(np.asarray(gf)), name
            checked_frozen += 1
    # the gate must actually split the tree (joint encoder + decoders
    # frozen; unimodal encoders + flows trainable)
    assert checked_trainable > 0 and checked_frozen > 0


def test_frozen_fastpath_no_recon():
    _check(no_recon=True)


def test_frozen_fastpath_with_dcca_recon():
    _check(no_recon=False)


# every JMVAE-NF family model in the registry: the fast path's exactness
# proof depends on the substring freeze mask (train/freezing.py) covering
# EVERY parameter reachable through the joint forward. A future submodule
# reachable from the joint forward whose path lacks 'joint_encoder' /
# 'decoder' / 'first_encoder' would get silently zeroed gradients on the
# fast path only — this sweep makes that impossible to land unnoticed
# (advisor r3).
JNF_CASES = {
    "jnf_circles_squares": ([(1, 32, 32), (1, 32, 32)], {}),
    "jnf_mnist_fashion": ([(1, 28, 28), (1, 28, 28)], {}),
    "jnf_mnist_contour": ([(1, 28, 28), (1, 28, 28)], {}),
    "jnf_mnist_svhn_dcca": ([(1, 28, 28), (3, 32, 32)],
                            dict(dcca=True, dim_dcca=4)),
    "jnf_celeba": ([(3, 64, 64), (1, 1, 40)],
                   dict(recon_losses=("normal", "bernoulli"))),
    "jnf_msf": ([(1, 28, 28), (3, 32, 32), (1, 28, 28)],
                dict(recon_losses=("normal",) * 3)),
    "jnf_medmnist": ([(1, 28, 28), (3, 28, 28)], {}),
    "jnf_chest_svhn": ([(1, 28, 28), (3, 32, 32)], {}),
}


import pytest  # noqa: E402


@pytest.mark.parametrize("model", list(JNF_CASES))
def test_frozen_mask_covers_joint_forward_all_jnf_models(model):
    shapes, extra = JNF_CASES[model]
    cfg = ExperimentConfig(
        model=model, obj="jmvae_nf", K=1, dist="normal",
        recon_losses=extra.pop("recon_losses", ("normal", "normal")),
        latent_dim=3, batch_size=4, no_nf=False, flow="maf",
        n_made_blocks=2, no_recon=True, **extra)
    bundle = registry.build(cfg)
    key = jax.random.PRNGKey(0)
    x = [jax.random.uniform(jax.random.PRNGKey(10 + i), (4,) + tuple(s))
         for i, s in enumerate(shapes)]
    variables = bundle.model.init({"params": key, "sample": key}, x, K=1,
                                  method="init_all")

    loss_slow, _, g_slow = _value_and_grads(bundle, variables, x, False)
    loss_fast, _, g_fast = _value_and_grads(bundle, variables, x, True)
    assert loss_slow == loss_fast, model

    frozen = freezing.frozen_prefixes_for_phase(
        "m_jmvae_nf", True, fix_jencoder=True, fix_decoders=True)
    trainable = freezing.path_mask(variables["params"], frozen)
    flat_t = jax.tree_util.tree_leaves_with_path(trainable)
    flat_s = jax.tree_util.tree_leaves(g_slow)
    flat_f = jax.tree_util.tree_leaves(g_fast)
    assert len(flat_t) == len(flat_s) == len(flat_f)
    zeroed_not_frozen = []
    for (path, is_train), gs, gf in zip(flat_t, flat_s, flat_f):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        gs, gf = np.asarray(gs), np.asarray(gf)
        if is_train:
            # a trainable leaf whose gradient the fast path changed (e.g.
            # zeroed) is exactly the silent-divergence bug
            np.testing.assert_array_equal(gs, gf, err_msg=f"{model}:{name}")
            if np.any(gs) and not np.any(gf):
                zeroed_not_frozen.append(name)
    assert not zeroed_not_frozen, zeroed_not_frozen
