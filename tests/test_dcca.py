"""DCCA subsystem tests: eigh-vs-Cholesky loss parity (value AND gradient),
the trimodal mcca path, and the graft round-trip — pretrained Solver trunk
params landed into a built jnf model must reproduce the Solver's projected
embeddings exactly (the cross-run coupling of dcca/models/mnist_svhn.py:
97-104 + jmvae_nf_mnist_svhn_dcca.py:65-75)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvae_tpu.core.config import ExperimentConfig
from mmvae_tpu.data import get_dataloaders
from mmvae_tpu.dcca import objectives as O
from mmvae_tpu.dcca.nets import dcca_encoders_circles, dcca_encoders_msf
from mmvae_tpu.dcca.train import Solver
from mmvae_tpu.models import registry


def _correlated_views(n=200, d=8, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(n, 3))
    h1 = z @ rng.normal(size=(3, d)) + 0.3 * rng.normal(size=(n, d))
    h2 = z @ rng.normal(size=(3, d)) + 0.3 * rng.normal(size=(n, d))
    return jnp.asarray(h1, jnp.float32), jnp.asarray(h2, jnp.float32)


def test_chol_cca_value_parity():
    """cca_corr_chol must match the eigh oracle (dcca/objectives.py:46-84
    math) for both top-k and all-singular-values modes."""
    h1, h2 = _correlated_views()
    for use_all in (False, True):
        ref = float(O.cca_corr(h1, h2, 4, use_all))
        got = float(O.cca_corr_chol(h1, h2, 4, use_all))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_chol_cca_gradient_parity():
    """The custom singular-value VJP must agree with autodiff through the
    eigh formulation."""
    h1, h2 = _correlated_views(n=100, d=5)
    g_ref = jax.grad(lambda a: O.cca_corr(a, h2, 3))(h1)
    g_chol = jax.grad(lambda a: O.cca_corr_chol(a, h2, 3))(h1)
    np.testing.assert_allclose(np.asarray(g_chol), np.asarray(g_ref),
                               rtol=5e-2, atol=1e-4)


def test_mcca_chol_matches_eigh():
    h1, h2 = _correlated_views()
    h3, _ = _correlated_views(seed=1)
    ref = float(O.mcca_loss([h1, h2, h3], 4))
    got = float(O.mcca_loss_chol([h1, h2, h3], 4))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_trimodal_mcca_solver():
    """The trimodal DCCA training path (main_mnist_svhn_fashion.py):
    3 encoders, pairwise mcca loss, LCCA fit on the first two views."""
    from mmvae_tpu.data.loaders import ArrayLoader, PairedDataset

    rng = np.random.default_rng(0)
    xs = [rng.uniform(size=(32, 1, 28, 28)).astype(np.float32),
          rng.uniform(size=(32, 3, 32, 32)).astype(np.float32),
          rng.uniform(size=(32, 1, 28, 28)).astype(np.float32)]
    loader = ArrayLoader(
        PairedDataset(xs, [np.zeros(32, np.int64)] * 3),
        batch_size=32, shuffle=False)
    solver = Solver(dcca_encoders_msf(8), 8, backend="chol")
    solver.fit(loader, val_loader=None, epochs=2)
    assert solver.lcca.w[0].shape == (8, 8)


def test_graft_roundtrip_circles(tmp_path):
    """Train a real (tiny) DCCA Solver on circles, save the artifact, build
    jnf_circles_squares with dcca=True, graft — the model's dcca_embeddings
    must equal the Solver's LCCA-projected trunk outputs."""
    train_l, test_l, _ = get_dataloaders("circles_squares", batch_size=32,
                                         dataset_size=20, n_repeat=4)
    solver = Solver(dcca_encoders_circles(8), 8)
    solver.fit(train_l, val_loader=None, epochs=1)
    npz_path = str(tmp_path / "dcca.npz")
    solver.save(npz_path)

    cfg = ExperimentConfig(
        model="jnf_circles_squares", obj="jmvae_nf", dist="normal",
        recon_losses=("normal", "normal"), latent_dim=2, no_nf=False,
        flow="maf", dcca=True, dim_dcca=4, extra={"dcca_path": npz_path},
    )
    bundle = registry.build(cfg)
    xs, _ = next(iter(test_l))
    xs = [jnp.asarray(x[:8]) for x in xs]
    key = jax.random.PRNGKey(0)
    variables = bundle.model.init({"params": key, "sample": key}, xs, K=1,
                                  method="init_all")
    variables = registry.graft_dcca_params(variables, npz_path, bundle.model)

    got = bundle.model.apply(variables, xs, method="dcca_embeddings")
    trunk = solver.model.apply(solver.variables, xs)
    for m in range(2):
        expected = solver.lcca.transform(np.asarray(trunk[m]), m)[:, :4]
        np.testing.assert_allclose(np.asarray(got[m]), expected,
                                   rtol=1e-4, atol=1e-5)
