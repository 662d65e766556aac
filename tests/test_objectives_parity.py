"""Numerical parity of multimodal objectives vs the reference formulas.

Strategy: run the JAX model forward once, export the intermediates
(posterior params, samples, reconstructions) to torch, and evaluate the
reference's loss formulas (objectives.py) with torch.distributions on the
SAME intermediates. Values must agree to float32 tolerance. This pins the
objective math independently of network/initialization differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.distributions as td

from mmvae_tpu.models import MMVAE, UnimodalVAE
from mmvae_tpu.nets import MLPDecoder, MLPEncoder
from mmvae_tpu.objectives import (
    ModelSpec, m_dreg, m_dreg_looser, m_elbo, m_iwae, m_iwae_looser,
)

D = 5
B = 4
K = 3
SHAPES = [(1, 8, 8), (2, 6, 6)]
LIK = (2.0, 1.0)


def t(a):
    return torch.tensor(np.asarray(a))


@pytest.fixture(scope="module", params=["normal", "laplace"])
def setup(request):
    posterior = request.param
    vaes = [
        UnimodalVAE(
            encoder=MLPEncoder(latent_dim=D, hidden_dim=32),
            decoder=MLPDecoder(latent_dim=D, output_shape=s, hidden_dim=32),
            latent_dim=D,
            posterior=posterior,
            model_name=f"m{i}",
        )
        for i, s in enumerate(SHAPES)
    ]
    model = MMVAE(vaes=vaes, posterior=posterior)
    key = jax.random.PRNGKey(0)
    x = [
        jax.random.uniform(jax.random.PRNGKey(10 + i), (B,) + s)
        for i, s in enumerate(SHAPES)
    ]
    variables = model.init({"params": key, "sample": key}, x, K=1)
    spec = ModelSpec(
        latent_dim=D, posterior=posterior,
        recon_dists=("normal", "normal"), lik_scaling=LIK,
    )
    out = model.apply(variables, x, K=K, rngs={"sample": jax.random.PRNGKey(1)})
    return model, variables, x, spec, out, posterior


def torch_dist(name, loc, scale):
    return {"normal": td.Normal, "laplace": td.Laplace}[name](loc, scale)


def torch_lws(out, x, posterior):
    """Reference _m_iwae / _m_dreg log-weights (objectives.py:117-131)."""
    qz = [torch_dist(posterior, t(mu), t(std)) for mu, std in out["qz_params"]]
    zss = [t(out["zss"][m]) for m in range(2)]
    pz = torch_dist(posterior, torch.zeros(1, D), torch.ones(1, D))
    lws = []
    for r in range(2):
        lpz = pz.log_prob(zss[r]).sum(-1)
        lqz = torch.logsumexp(
            torch.stack([q.log_prob(zss[r]).sum(-1) for q in qz]), 0
        ) - np.log(2)
        lpx = 0
        for d in range(2):
            px = td.Normal(t(out["recons"][r][d]), torch.ones(1))
            lpx = lpx + px.log_prob(t(x[d])).reshape(K, B, -1).sum(-1) * LIK[d]
        lws.append(lpz + lpx - lqz)
    return lws


def test_m_iwae_matches_torch(setup):
    model, variables, x, spec, out, posterior = setup
    lws = torch.cat(torch_lws(out, x, posterior))  # (M*K, B)
    ref = (torch.logsumexp(lws, 0) - np.log(lws.shape[0])).sum()
    got, _, _ = m_iwae(model, variables, x, jax.random.PRNGKey(1), spec, K=K)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_m_iwae_looser_matches_torch(setup):
    model, variables, x, spec, out, posterior = setup
    lws = torch.stack(torch_lws(out, x, posterior))  # (M, K, B)
    ref = (torch.logsumexp(lws, 1) - np.log(K)).mean(0).sum()
    got, _, _ = m_iwae_looser(model, variables, x, jax.random.PRNGKey(1), spec, K=K)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_m_elbo_matches_torch(setup):
    model, variables, x, spec, out, posterior = setup
    qz_params = out["qz_params"]
    qz = [torch_dist(posterior, t(mu), t(std)) for mu, std in qz_params]
    zss = [t(out["zss"][m]) for m in range(2)]
    pz = torch_dist(posterior, torch.zeros(1, D), torch.ones(1, D))
    lpx_zs, klds = [], []
    for r in range(2):
        klds.append(td.kl_divergence(qz[r], pz).sum(-1))
        for d in range(2):
            px = td.Normal(t(out["recons"][d][d]), torch.ones(1))
            lp = px.log_prob(t(x[d])).reshape(K, B, -1).sum(-1) * LIK[d]
            if d == r:
                lwt = torch.tensor(0.0)
            else:
                lwt = (qz[r].log_prob(zss[d]) - qz[d].log_prob(zss[d])).sum(-1)
            lpx_zs.append(lwt.exp() * lp)
    ref = ((1 / 2) * (torch.stack(lpx_zs).sum(0) - torch.stack(klds).sum(0))).mean(0).sum()
    got, _, _ = m_elbo(model, variables, x, jax.random.PRNGKey(1), spec, K=K)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_m_dreg_value_matches_torch(setup):
    model, variables, x, spec, out, posterior = setup
    lws = torch.cat(torch_lws(out, x, posterior))
    w = (lws - torch.logsumexp(lws, 0, keepdim=True)).exp()
    ref = (w * lws).sum()
    got, _, _, _ = m_dreg(model, variables, x, jax.random.PRNGKey(1), spec, K=K)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_m_dreg_looser_value_matches_torch(setup):
    model, variables, x, spec, out, posterior = setup
    lws = torch.stack(torch_lws(out, x, posterior))
    w = (lws - torch.logsumexp(lws, 1, keepdim=True)).exp()
    ref = (w * lws).mean(0).sum()
    got, _, _, _ = m_dreg_looser(model, variables, x, jax.random.PRNGKey(1), spec, K=K)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_dreg_grads_match_scale_grad_implementation(setup):
    """Cross-check the hand-assembled DReG VJP against an independent
    implementation using a custom-vjp scale_grad hook (the literal
    translation of the torch z-hook, objectives.py:398-401)."""
    model, variables, x, spec, out, posterior = setup
    from mmvae_tpu.objectives.objectives import _m_lws

    key = jax.random.PRNGKey(1)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    @jax.custom_vjp
    def scale_grad(z, w):
        return z

    def _fwd(z, w):
        return z, w

    def _bwd(w, g):
        return (g * w[..., None], None)

    scale_grad.defvjp(_fwd, _bwd)

    def alt_loss(p):
        (qz_params, zss), _ = model.apply(
            {"params": p, **rest}, x, K=K, method="encode_and_sample",
            rngs={"sample": key}, mutable=["batch_stats"],
        )
        # weights from a stop-grad pass
        recons0 = model.apply(
            jax.lax.stop_gradient({"params": p, **rest}),
            jax.lax.stop_gradient(zss), method="decode_cross",
        )
        lws0 = _m_lws(x, spec, jax.lax.stop_gradient(qz_params),
                      jax.lax.stop_gradient(zss), recons0, True)
        w = jax.nn.softmax(lws0, axis=1)
        zss_h = scale_grad(zss, w)
        recons = model.apply({"params": p, **rest}, zss_h, method="decode_cross")
        lws = _m_lws(x, spec, qz_params, zss_h, recons, detach_post=True)
        return jnp.sum(jnp.mean(w * lws, axis=0))

    from jax.flatten_util import ravel_pytree

    alt_grads = jax.grad(alt_loss)(params)
    _, _, _, grads = m_dreg_looser(model, variables, x, key, spec, K=K)
    flat_a, _ = ravel_pytree(alt_grads)
    flat_g, _ = ravel_pytree(grads)
    np.testing.assert_allclose(np.asarray(flat_g), np.asarray(flat_a), rtol=2e-4, atol=1e-5)
