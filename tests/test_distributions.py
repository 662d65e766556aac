"""Parity tests: core distributions vs torch.distributions (the reference's
L0 runtime)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.distributions as td

from mmvae_tpu.core import distributions as D
from mmvae_tpu.core.distributions import LocScale
from mmvae_tpu.core.math import log_mean_exp

RTOL = 1e-5
ATOL = 1e-5


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_normal_log_prob(rng):
    mu = rng.normal(size=(4, 7)).astype(np.float32)
    std = rng.uniform(0.3, 2.0, size=(4, 7)).astype(np.float32)
    x = rng.normal(size=(4, 7)).astype(np.float32)
    got = D.normal_log_prob(LocScale(jnp.array(mu), jnp.array(std)), jnp.array(x))
    ref = td.Normal(torch.tensor(mu), torch.tensor(std)).log_prob(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_laplace_log_prob(rng):
    mu = rng.normal(size=(4, 7)).astype(np.float32)
    b = rng.uniform(0.3, 2.0, size=(4, 7)).astype(np.float32)
    x = rng.normal(size=(4, 7)).astype(np.float32)
    got = D.laplace_log_prob(LocScale(jnp.array(mu), jnp.array(b)), jnp.array(x))
    ref = td.Laplace(torch.tensor(mu), torch.tensor(b)).log_prob(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_bernoulli_log_prob(rng):
    p = rng.uniform(0.05, 0.95, size=(4, 7)).astype(np.float32)
    x = (rng.uniform(size=(4, 7)) > 0.5).astype(np.float32)
    got = D.bernoulli_log_prob(jnp.array(p), jnp.array(x))
    ref = td.Bernoulli(probs=torch.tensor(p)).log_prob(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_normal_kl(rng):
    m1 = rng.normal(size=(4, 7)).astype(np.float32)
    s1 = rng.uniform(0.3, 2.0, size=(4, 7)).astype(np.float32)
    m2 = rng.normal(size=(4, 7)).astype(np.float32)
    s2 = rng.uniform(0.3, 2.0, size=(4, 7)).astype(np.float32)
    got = D.normal_kl(LocScale(jnp.array(m1), jnp.array(s1)), LocScale(jnp.array(m2), jnp.array(s2)))
    ref = td.kl_divergence(
        td.Normal(torch.tensor(m1), torch.tensor(s1)),
        td.Normal(torch.tensor(m2), torch.tensor(s2)),
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_laplace_kl(rng):
    m1 = rng.normal(size=(4, 7)).astype(np.float32)
    s1 = rng.uniform(0.3, 2.0, size=(4, 7)).astype(np.float32)
    m2 = rng.normal(size=(4, 7)).astype(np.float32)
    s2 = rng.uniform(0.3, 2.0, size=(4, 7)).astype(np.float32)
    got = D.laplace_kl(LocScale(jnp.array(m1), jnp.array(s1)), LocScale(jnp.array(m2), jnp.array(s2)))
    ref = td.kl_divergence(
        td.Laplace(torch.tensor(m1), torch.tensor(s1)),
        td.Laplace(torch.tensor(m2), torch.tensor(s2)),
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_wasserstein_2_matches_reference_formula(rng):
    m1 = rng.normal(size=(4, 7)).astype(np.float32)
    s1 = rng.uniform(0.3, 2.0, size=(4, 7)).astype(np.float32)
    m2 = rng.normal(size=(4, 7)).astype(np.float32)
    s2 = rng.uniform(0.3, 2.0, size=(4, 7)).astype(np.float32)
    got = D.wasserstein_2(LocScale(jnp.array(m1), jnp.array(s1)), LocScale(jnp.array(m2), jnp.array(s2)))
    # utils.py:155-162
    ref = (m1 - m2) ** 2 + s1 + s2 - 2 * np.sqrt(s1 * s2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=RTOL, atol=ATOL)


def test_std_parameterizations(rng):
    lv = rng.normal(size=(4, 7)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(D.std_from_logvar(jnp.array(lv))), np.exp(0.5 * lv), rtol=RTOL
    )
    # laplace_vae.py:69 softmax trick
    ref = torch.softmax(torch.tensor(lv), dim=-1).numpy() * 7 + 1e-6
    np.testing.assert_allclose(
        np.asarray(D.std_softmax_trick(jnp.array(lv))), ref, rtol=RTOL
    )


def test_sampling_moments():
    key = jax.random.PRNGKey(0)
    p = LocScale(jnp.full((2,), 1.5), jnp.full((2,), 0.7))
    zs = D.normal_sample(p, key, (20000,))
    assert abs(float(zs.mean()) - 1.5) < 0.02
    assert abs(float(zs.std()) - 0.7) < 0.02
    zl = D.laplace_sample(p, key, (20000,))
    assert abs(float(zl.mean()) - 1.5) < 0.03
    # laplace variance = 2 b^2
    assert abs(float(zl.var()) - 2 * 0.7 ** 2) < 0.05


def test_log_mean_exp(rng):
    v = rng.normal(size=(5, 3)).astype(np.float32)
    got = log_mean_exp(jnp.array(v), axis=0)
    ref = torch.logsumexp(torch.tensor(v), 0) - np.log(5)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_mc_kl_fallback_close_to_closed_form():
    key = jax.random.PRNGKey(0)
    p = LocScale(jnp.zeros((1, 4)) + 0.3, jnp.ones((1, 4)) * 0.8)
    q = LocScale(jnp.zeros((1, 4)), jnp.ones((1, 4)))
    mc = D.kl("normal", p, q)  # closed form path
    analytic = D.normal_kl(p, q)
    np.testing.assert_allclose(np.asarray(mc), np.asarray(analytic), rtol=1e-6)
