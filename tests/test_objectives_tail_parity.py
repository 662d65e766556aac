"""Torch-parity pins for the objective tail: m_telbo, m_telbo_nf, m_svae,
m_multi_elbos, m_vaevae_kl, m_vaevae_w2 (reference objectives.py:133-155,
223-329).

Technique (same as test_objectives_parity): replicate each objective's
internal RNG choreography to export the exact intermediates it consumes,
then evaluate the REFERENCE formula with torch.distributions on those
intermediates. Known reference quirks asserted here:
- m_telbo's requires_grad_ toggling is a value-level no-op (we pin values);
- m_svae reconstruction terms are .mean() over ALL elements while its KL
  terms are .mean(0).sum() — reproduced as-is;
- wasserstein_2 uses stddevs un-squared (utils.py:155-162) — reproduced.
"""

import numpy as np
import pytest
import torch
import torch.distributions as td

import jax
import jax.numpy as jnp

from mmvae_tpu.models.jmvae_nf import JMVAE_NF
from mmvae_tpu.models.vae import UnimodalVAE
from mmvae_tpu.nets import DoubleHeadMLP, MLPDecoder, MLPEncoder
from mmvae_tpu.objectives import ModelSpec
from mmvae_tpu.objectives.objectives import (
    _apply, m_multi_elbos, m_svae, m_telbo, m_telbo_nf, m_vaevae_kl,
    m_vaevae_w2,
)

D = 4
B = 3
SHAPES = [(1, 8, 8), (2, 6, 6)]
LIK = (2.0, 1.0)
LLIK = 1.5


def t(a):
    return torch.tensor(np.asarray(a))


@pytest.fixture(scope="module")
def setup():
    vaes = [
        UnimodalVAE(
            encoder=MLPEncoder(latent_dim=D, hidden_dim=16),
            decoder=MLPDecoder(latent_dim=D, output_shape=s, hidden_dim=16),
            latent_dim=D, posterior="normal", model_name=f"m{i}",
        )
        for i, s in enumerate(SHAPES)
    ]
    joint = DoubleHeadMLP(latent_dim=D, hidden_dim=16, num_hidden_layers=1,
                          name="joint_encoder")
    model = JMVAE_NF(joint_encoder=joint, vaes=vaes, posterior="normal")
    key = jax.random.PRNGKey(0)
    x = [jax.random.uniform(jax.random.PRNGKey(10 + i), (B,) + s)
         for i, s in enumerate(SHAPES)]
    variables = model.init({"params": key, "sample": key}, x, K=1,
                           method="init_all")
    spec = ModelSpec(latent_dim=D, posterior="normal",
                     recon_dists=("normal", "normal"), lik_scaling=LIK,
                     llik_scaling=LLIK)
    return model, variables, x, spec


def _pz():
    return td.Normal(torch.zeros(1, D), torch.ones(1, D))


def _joint_and_cross(model, variables, x, key):
    """Mirror the k1/k2 split used by m_telbo / m_multi_elbos / m_svae-style
    objectives, exporting (joint out, cross out)."""
    k1, k2 = jax.random.split(key)
    out, _ = _apply(model, variables, k1, None, x, train=True)
    return out, k2


def test_m_multi_elbos_matches_torch(setup):
    model, variables, x, spec = setup
    key = jax.random.PRNGKey(7)
    out, k2 = _joint_and_cross(model, variables, x, key)
    uniout, _ = _apply(model, variables, k2, "unimodal_cross_forward", x,
                       train=True)
    # reference objectives.py:261-281
    q_xy = td.Normal(t(out["qz_xy"][0]), t(out["qz_xy"][1]))
    loss = torch.tensor(0.0)
    for m in range(2):
        q_m = td.Normal(t(uniout["qz_params"][m][0]), t(uniout["qz_params"][m][1]))
        lp = td.Normal(t(out["recons"][m]), 1.0).log_prob(t(x[m]))
        loss = loss + lp.reshape(B, -1).sum(-1).mean(0)
        for r in range(2):
            lpr = td.Normal(t(uniout["recons"][r][m]), 1.0).log_prob(t(x[m]))
            loss = loss + lpr.reshape(B, -1).sum(-1).mean(0)
        loss = loss - td.kl_divergence(q_m, _pz()).mean(0).sum()
    loss = loss - td.kl_divergence(q_xy, _pz()).mean(0).sum()
    ref = loss / 3.0
    got, _, _ = m_multi_elbos(model, variables, x, key, spec)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_m_telbo_matches_torch(setup):
    model, variables, x, spec = setup
    key = jax.random.PRNGKey(8)
    beta, beta_prior = 2.0, 1.3
    out, k2 = _joint_and_cross(model, variables, x, key)
    uniout, _ = _apply(model, variables, k2, "unimodal_cross_forward", x,
                       train=True)
    # reference objectives.py:306-329
    q_xy = td.Normal(t(out["qz_xy"][0]), t(out["qz_xy"][1]))
    mloss, loss_m = torch.tensor(0.0), []
    for m in range(2):
        q_m = td.Normal(t(uniout["qz_params"][m][0]), t(uniout["qz_params"][m][1]))
        lp = td.Normal(t(uniout["recons"][m][m]), 1.0).log_prob(t(x[m]))
        lm = lp.reshape(B, -1).sum(-1).mean(0)
        lm = lm - beta_prior * td.kl_divergence(q_m, _pz()).mean(0).sum()
        loss_m.append(lm)
        lpj = td.Normal(t(out["recons"][m]), 1.0).log_prob(t(x[m]))
        mloss = mloss + lpj.reshape(B, -1).sum(-1).mean(0)
    reg = beta_prior * td.kl_divergence(q_xy, _pz()).mean(0).sum()
    ref = mloss - reg + beta * (loss_m[0] + loss_m[1])
    got, _, _ = m_telbo(model, variables, x, key, spec, beta=beta,
                        beta_prior=beta_prior)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_m_svae_matches_torch(setup):
    model, variables, x, spec = setup
    key = jax.random.PRNGKey(9)
    beta = 1.7
    k1, k2 = jax.random.split(key)
    out, _ = _apply(model, variables, k1, None, x, train=True)
    keys = jax.random.split(k2, 2)
    vouts = [_apply(model, variables, keys[m], "vae_forward", x[m], m=m,
                    train=True)[0] for m in range(2)]
    # reference objectives.py:284-303
    q_xy = td.Normal(t(out["qz_xy"][0]), t(out["qz_xy"][1]))
    loss, reg = torch.tensor(0.0), torch.tensor(0.0)
    for m in range(2):
        q_m = td.Normal(t(vouts[m]["mu"]), t(vouts[m]["std"]))
        loss = loss + td.Normal(t(vouts[m]["recon"]), 1.0).log_prob(t(x[m])).mean()
        reg = reg + td.kl_divergence(q_m, _pz()).mean(0).sum()
        loss = loss + td.Normal(t(out["recons"][m]), 1.0).log_prob(t(x[m])).mean()
        reg = reg + td.kl_divergence(q_xy, q_m).mean(0).sum()
    ref = 0.5 * (loss - beta * reg)
    got, _, _ = m_svae(model, variables, x, key, spec, beta=beta)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_m_telbo_nf_matches_torch(setup):
    model, variables, x, spec = setup
    key = jax.random.PRNGKey(11)
    beta_prior = 0.7
    keys = jax.random.split(key, 3)
    out, _ = _apply(model, variables, keys[0], None, x, train=True)
    vouts = [_apply(model, variables, keys[m + 1], "vae_forward", x[m], m=m,
                    train=True)[0] for m in range(2)]
    # reference objectives.py:223-259 (past-warmup branch)
    mu, std = t(out["qz_xy"][0]), t(out["qz_xy"][1])
    loss = torch.tensor(0.0)
    for m in range(2):
        r = t(out["recons"][m]).reshape(B, -1)
        xt = t(x[m]).reshape(B, -1)
        loss = loss - ((r - xt) ** 2).sum() * LIK[m]  # mse recon_loss_dict
    log_var = 2 * torch.log(std)
    kld_prior = (-0.5 * (1 + log_var - mu.pow(2) - log_var.exp()).sum(-1)).sum()
    for m in range(2):
        # my_VAE.neg_elbo (vae_model_adapted.py:104-124): 0.5*mse + KLD,
        # summed over batch
        r = t(vouts[m]["recon"]).reshape(B, -1)
        xt = t(x[m]).reshape(B, -1)
        recon_l = 0.5 * ((r - xt) ** 2).sum(-1)
        lv = t(vouts[m]["log_var"])
        kld = -0.5 * (1 + lv - t(vouts[m]["mu"]) ** 2 - lv.exp()).sum(-1)
        loss = loss - (recon_l + kld).sum() * LIK[m]
    ref = loss - beta_prior * kld_prior
    got, _, _ = m_telbo_nf(model, variables, x, key, spec, epoch=20, warmup=10,
                           beta_prior=beta_prior, past_warmup=True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


@pytest.mark.parametrize("which", ["kl", "w2"])
def test_m_vaevae_matches_torch(setup, which):
    model, variables, x, spec = setup
    key = jax.random.PRNGKey(12)
    beta, beta_prior = 10.0, 1.2
    keys = jax.random.split(key, 4)
    vouts = [_apply(model, variables, keys[m], "vae_forward", x[m], m=m,
                    train=True)[0] for m in range(2)]
    # reference objectives.py:133-155: elbo (objectives.py:20-25, SUM over
    # batch) + symmetric posterior-alignment reg (MEAN over batch)
    losses = []
    qs = []
    for m in range(2):
        q_m = td.Normal(t(vouts[m]["mu"]), t(vouts[m]["std"]))
        qs.append(q_m)
        lpx = td.Normal(t(vouts[m]["recon"]), 1.0).log_prob(t(x[m]))
        lpx = lpx.reshape(B, -1).sum(-1) * LLIK
        kld = td.kl_divergence(q_m, _pz()).sum(-1)
        losses.append((lpx - beta_prior * kld).sum())  # .mean(0).sum() at K=1
    if which == "kl":
        dist_fn = td.kl_divergence
        fn = m_vaevae_kl
    else:
        def dist_fn(a, b):
            return (a.mean - b.mean) ** 2 + a.stddev + b.stddev \
                - 2 * torch.sqrt(a.stddev * b.stddev)
        fn = m_vaevae_w2
    reg = 0.5 * (dist_fn(qs[0], qs[1]).mean(0).sum()
                 + dist_fn(qs[1], qs[0]).mean(0).sum())
    ref = losses[0] + losses[1] - beta * reg
    got, _, _ = fn(model, variables, x, key, spec, beta=beta,
                   beta_prior=beta_prior, epoch=20, warmup=10,
                   past_warmup=True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
