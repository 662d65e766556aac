"""Eval-layer tests: generation shapes, coherence metrics, IS likelihoods,
GMM sampler, PRD, FID math, HMC PoE sampling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.core.config import ExperimentConfig
from mmvae_tpu.data import get_dataloaders
from mmvae_tpu.eval import (
    GaussianMixtureSampler, calculate_frechet_distance, compute_accuracies,
    generate, sample_from_conditional,
)
from mmvae_tpu.eval import likelihoods as ll
from mmvae_tpu.eval import prd
from mmvae_tpu.models import registry


@pytest.fixture(scope="module")
def circles_model():
    cfg = ExperimentConfig(
        model="circles_squares", obj="elbo", dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, batch_size=16,
    )
    bundle = registry.build(cfg)
    train, test, val = get_dataloaders("circles_squares", batch_size=16,
                                       dataset_size=20, n_repeat=2)
    xs, labs = next(iter(train))
    key = jax.random.PRNGKey(0)
    variables = bundle.model.init({"params": key, "sample": key},
                                  [jnp.asarray(x) for x in xs], K=1)
    return bundle, variables, [jnp.asarray(x) for x in xs], labs


def test_generate_shapes(circles_model):
    bundle, variables, xs, _ = circles_model
    out = generate(bundle.model, variables, jax.random.PRNGKey(1), bundle.spec, N=6)
    assert len(out) == 2 and out[0].shape == (6, 1, 32, 32)


def test_sample_from_conditional_shapes(circles_model):
    bundle, variables, xs, _ = circles_model
    bdata = [x[:4] for x in xs]
    samples = sample_from_conditional(bundle.model, variables, bdata,
                                      jax.random.PRNGKey(2), n=3)
    assert samples[0][1].shape == (3, 4, 1, 32, 32)
    assert samples[1][0].shape == (3, 4, 1, 32, 32)


def test_compute_accuracies(circles_model):
    bundle, variables, xs, labs = circles_model

    def dummy_classifier(x):
        # classify by mean intensity (full shapes are brighter) -> 10 logits
        score = jnp.mean(x.reshape(x.shape[0], -1), axis=1)
        return jnp.stack([1 - score, score] + [jnp.zeros_like(score)] * 8, axis=1)

    metrics = compute_accuracies(
        bundle.model, variables, [dummy_classifier, dummy_classifier],
        xs, [jnp.asarray(l) for l in labs], jax.random.PRNGKey(3), bundle.spec,
        n_data=4, ns=5,
    )
    assert set(metrics) == {"acc_0_1", "acc_1_0", "joint_coherence"}
    for v in metrics.values():
        assert 0.0 <= v <= 1.0


def test_conditional_likelihood_runs(circles_model):
    bundle, variables, xs, _ = circles_model
    data = [x[:3] for x in xs]
    metrics, lls = ll.compute_conditional_likelihood(
        bundle.model, variables, data, 0, 1, bundle.spec,
        jax.random.PRNGKey(4), K=20, batch_size_K=10)
    assert lls.shape == (3,)
    assert np.isfinite(float(metrics["cond_likelihood_0_1"]))


def test_joint_likelihood_mmvae(circles_model):
    bundle, variables, xs, _ = circles_model
    data = [x[:3] for x in xs]
    out = ll.joint_likelihood_mmvae(bundle.model, variables, data, bundle.spec,
                                    jax.random.PRNGKey(5), K=20, batch_size_K=10)
    assert np.isfinite(out["likelihood"])


def test_conditional_likelihood_bis_mmvae(circles_model):
    """joint_ll_from_uni for the Gaussian families (mmvae.py:180-234) +
    the bis protocol ln p(x|y) = joint_ll_from_uni - uni_from_prior."""
    bundle, variables, xs, _ = circles_model
    data = [x[:2] for x in xs]
    m = ll.compute_conditional_likelihoods_bis(
        bundle.model, variables, data, bundle.spec, jax.random.PRNGKey(6),
        K=20, batch_size_K=10)
    assert set(m) == {"conditional_likelihood_bis_0_1",
                      "conditional_likelihood_bis_1_0"}
    assert all(np.isfinite(v) for v in m.values())


def test_conditional_likelihood_bis_mvae():
    """The MVAE variant (mvae.py:160-217): raw encoder posterior proposal."""
    cfg = ExperimentConfig(
        model="mvae_mnist_svhn", obj="self_built", dist="normal",
        recon_losses=("normal", "normal"), latent_dim=4, batch_size=4,
    )
    bundle = registry.build(cfg)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.uniform(size=(2,) + s).astype(np.float32))
          for s in bundle.shape_mods]
    key = jax.random.PRNGKey(0)
    variables = bundle.model.init({"params": key, "sample": key}, xs, K=1)
    m = ll.compute_conditional_likelihood_bis(
        bundle.model, variables, xs, 0, 1, bundle.spec, key,
        K=20, batch_size_K=10)
    assert np.isfinite(m["conditional_likelihood_bis_0_1"])


def test_conditional_likelihood_bis_moepoe():
    """The MoE-PoE variant (moepoe.py:160-215): unimodal encoder posterior
    proposal, same IS structure as MMVAE — enabled by MOEPOE.encode_all."""
    cfg = ExperimentConfig(
        model="moepoe_mnist_svhn", obj="self_built", dist="normal",
        recon_losses=("normal", "normal"), latent_dim=4, batch_size=4,
    )
    bundle = registry.build(cfg)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.uniform(size=(2,) + s).astype(np.float32))
          for s in bundle.shape_mods]
    key = jax.random.PRNGKey(0)
    variables = bundle.model.init({"params": key, "sample": key}, xs, K=1)
    m = ll.compute_conditional_likelihood_bis(
        bundle.model, variables, xs, 0, 1, bundle.spec, key,
        K=20, batch_size_K=10)
    assert np.isfinite(m["conditional_likelihood_bis_0_1"])
    # joint likelihood via the MoE-proposal estimator (the reference's own
    # MOEPOE estimator is broken — moepoe.py:217-249 `1/0`)
    j = ll.joint_likelihood_mmvae(bundle.model, variables, xs, bundle.spec,
                                  key, K=20, batch_size_K=10)
    assert np.isfinite(j["likelihood"])


def test_conditional_likelihood_bis_jmvae_nf():
    """JMVAE-NF dispatches to the flow-posterior variant
    (jmvae_nf.py:87-143)."""
    cfg = ExperimentConfig(
        model="jnf_circles_squares", obj="jmvae_nf", dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, no_nf=False,
        flow="maf",
    )
    bundle = registry.build(cfg)
    train, _, _ = get_dataloaders("circles_squares", batch_size=4,
                                  dataset_size=10, n_repeat=2)
    xs, _ = next(iter(train))
    xs = [jnp.asarray(x[:2]) for x in xs]
    key = jax.random.PRNGKey(0)
    variables = bundle.model.init({"params": key, "sample": key}, xs, K=1,
                                  method="init_all")
    assert ll.joint_ll_from_uni_for(bundle.model) is ll.joint_ll_from_uni_jmvae_nf
    m = ll.compute_conditional_likelihood_bis(
        bundle.model, variables, xs, 1, 0, bundle.spec, key,
        K=20, batch_size_K=10)
    assert np.isfinite(m["conditional_likelihood_bis_1_0"])


def test_chunked_is_matches_direct():
    """The chunk-then-combine logsumexp (multi_vaes.py:242-248 reduction
    order) must equal the flat logmeanexp."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (100,))
    chunks = w.reshape(10, 10)
    per_chunk = jax.scipy.special.logsumexp(chunks, axis=1)
    combined = jax.scipy.special.logsumexp(per_chunk) - np.log(100)
    direct = jax.scipy.special.logsumexp(w) - np.log(100)
    np.testing.assert_allclose(float(combined), float(direct), rtol=1e-6)


def test_gmm_sampler():
    rng = np.random.default_rng(0)
    lat = np.concatenate([rng.normal(-2, 0.1, (200, 2)), rng.normal(2, 0.1, (200, 2))])
    s = GaussianMixtureSampler(n_components=2).fit(lat)
    out = s.sample(100)
    assert out.shape == (100, 2)
    assert np.abs(np.abs(out[:, 0]).mean() - 2) < 0.5


def test_prd_identical_distributions():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(200, 8))
    p, r = prd.compute_prd_from_embedding(a, a.copy(), num_clusters=5, num_runs=2)
    f8, f18 = prd.prd_to_max_f_beta_pair(p, r)
    assert f8 > 0.9 and f18 > 0.9


def test_frechet_distance_zero_and_positive():
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert calculate_frechet_distance(mu, sigma, mu, sigma) < 1e-6
    d = calculate_frechet_distance(mu, sigma, mu + 1.0, sigma)
    np.testing.assert_allclose(d, 4.0, rtol=1e-5)


def test_fid_inception_shapes():
    from mmvae_tpu.eval.fid import make_inception_fn

    acts_fn = make_inception_fn()
    acts = acts_fn(np.random.default_rng(0).uniform(size=(2, 1, 28, 28)).astype(np.float32))
    assert acts.shape == (2, 2048)


def test_hmc_poe_sampling():
    from mmvae_tpu.eval.hmc import sample_from_poe_subset

    cfg = ExperimentConfig(
        model="jnf_circles_squares", obj="jmvae_nf", dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, no_nf=False, flow="maf",
    )
    bundle = registry.build(cfg)
    train, _, _ = get_dataloaders("circles_squares", batch_size=8,
                                  dataset_size=10, n_repeat=2)
    xs, _ = next(iter(train))
    xs = [jnp.asarray(x[:4]) for x in xs]
    key = jax.random.PRNGKey(0)
    variables = bundle.model.init({"params": key, "sample": key}, xs, K=1,
                                  method="init_all")
    z = sample_from_poe_subset(bundle.model, variables, [0, 1], xs, key,
                               mcmc_steps=3, n_lf=2, K=2)
    assert z.shape == (2, 4, 2)
    assert np.isfinite(np.asarray(z)).all()


def test_hmc_poe_statistical():
    """Statistical validation of the HMC PoE sampler (jmvae_nf.py:332-437):
    with no flows the product of Gaussian experts divided by the prior is a
    Gaussian with precision P = sum_m 1/std_m^2 - 1 and mean
    P^-1 sum_m mu_m/std_m^2 — the chain's sample moments must match.
    Catches sign, step-size, and acceptance regressions the smoke test
    can't."""
    from mmvae_tpu.eval.hmc import sample_from_poe_subset

    cfg = ExperimentConfig(
        model="jnf_circles_squares", obj="jmvae_nf", dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, no_nf=True,
    )
    bundle = registry.build(cfg)
    train, _, _ = get_dataloaders("circles_squares", batch_size=8,
                                  dataset_size=10, n_repeat=2)
    xs, _ = next(iter(train))
    xs = [jnp.asarray(x[:3]) for x in xs]
    key = jax.random.PRNGKey(0)
    variables = bundle.model.init({"params": key, "sample": key}, xs, K=1,
                                  method="init_all")

    # analytic product posterior from the actual encoder outputs
    params = bundle.model.apply(variables, xs, method="encode_all_unimodal")
    prec = -jnp.ones_like(params[0][0])  # divide_prior subtracts N(0,1)
    mean_num = jnp.zeros_like(params[0][0])
    for mu, std in params:
        prec = prec + 1.0 / std ** 2
        mean_num = mean_num + mu / std ** 2
    assert np.all(np.asarray(prec) > 0.1), "product must be proper"
    expected_mean = np.asarray(mean_num / prec)
    expected_std = np.asarray(1.0 / jnp.sqrt(prec))

    z = sample_from_poe_subset(bundle.model, variables, [0, 1], xs, key,
                               mcmc_steps=80, n_lf=5, eps_lf=0.3, K=400)
    z = np.asarray(z)  # (400, 3, 2)
    got_mean = z.mean(axis=0)
    got_std = z.std(axis=0)
    # MC error of the mean ~ std/sqrt(400); allow generous slack for
    # autocorrelation
    np.testing.assert_allclose(got_mean, expected_mean,
                               atol=5 * expected_std.max() / np.sqrt(400) + 0.05)
    np.testing.assert_allclose(got_std, expected_std, rtol=0.25)


def test_extract_rayon_and_negative_entropy():
    from mmvae_tpu.eval.latent_analysis import negative_entropy
    from mmvae_tpu.vis import extract_rayon

    xs = np.linspace(-1, 1, 32)
    X, Y = np.meshgrid(xs, xs)
    imgs = np.stack([
        ((X ** 2 + Y ** 2) <= 0.5 ** 2).astype(np.float32)[None],
        ((X ** 2 + Y ** 2) <= 0.8 ** 2).astype(np.float32)[None],
    ])
    r = extract_rayon(imgs)
    assert r.shape == (2,)
    np.testing.assert_allclose(r, [0.5, 0.8], atol=0.08)
    # 5-d input keeps the (K, B) lead shape for per-datapoint entropies
    r5 = extract_rayon(np.stack([imgs, imgs]))
    assert r5.shape == (2, 2)
    # concentrated radii -> higher (less negative) entropy than spread ones
    tight = np.full((4, 50), 0.5) + 1e-3 * np.random.default_rng(0).normal(size=(4, 50))
    spread = np.random.default_rng(0).uniform(0, 1, (4, 50))
    assert negative_entropy(tight, (0, 1), 10) > negative_entropy(spread, (0, 1), 10)


def test_circles_rdist_and_poe_visualisation(tmp_path):
    """Circles analytics callbacks (jmvae_nf_circles.py:94-214): the
    conditional radius metric and the PoE scatter figure."""
    from mmvae_tpu.eval.latent_analysis import (
        conditional_rdist_metrics, visualize_poe,
    )

    cfg = ExperimentConfig(
        model="jnf_circles_squares", obj="jmvae_nf", dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, no_nf=True,
    )
    bundle = registry.build(cfg)
    train, _, _ = get_dataloaders("circles_squares", batch_size=8,
                                  dataset_size=10, n_repeat=2)
    xs, _ = next(iter(train))
    xs = [jnp.asarray(x) for x in xs]
    key = jax.random.PRNGKey(0)
    variables = bundle.model.init({"params": key, "sample": key}, xs, K=1,
                                  method="init_all")
    m = conditional_rdist_metrics(bundle.model, variables, xs, key,
                                  run_path=str(tmp_path), n=5, n_data=4)
    assert np.isfinite(m["neg_entropy"])
    assert (tmp_path / "hist_000.png").exists()
    path = visualize_poe(bundle.model, variables, xs, str(tmp_path), key,
                         n_data=2, N=5, mcmc_steps=2)
    assert os.path.exists(path)


def test_quality_assess_harness():
    """QualityAssess (Quality_assess.py rebuild): identical distributions
    score near-zero FID and high PRD f-scores."""
    from mmvae_tpu.eval.quality import QualityAssess

    rng = np.random.default_rng(0)

    def enc(x):
        return x.reshape(len(x), -1)[:, :16]

    data = [rng.normal(size=(100, 4, 8)).astype(np.float32) for _ in range(2)]
    qa = QualityAssess(enc).fit_reference(data)
    m = qa.score(data, num_clusters=5, num_runs=2)
    assert m["fid"] < 1e-3
    assert m["prd_f8"] > 0.9
