"""PoE math parity vs torch recomputations of the reference formulas
(mvae.py:27-45, moepoe.py:20-70)."""

import numpy as np
import torch

from mmvae_tpu.models.poe import (
    mixture_component_selection, poe, poe_for_all_subsets,
)


def torch_poe(mus_list, log_vars_list):
    """mvae.py:27-45 verbatim recomputation."""
    mus = [torch.tensor(m) for m in mus_list]
    log_vars = [torch.tensor(l) for l in log_vars_list]
    mus.append(torch.zeros_like(mus[0]))
    log_vars.append(torch.zeros_like(log_vars[0]))
    lnT = torch.stack([-l for l in log_vars])
    lnV = -torch.logsumexp(lnT, dim=0)
    mus_s = torch.stack(mus)
    joint_mu = (torch.exp(lnT) * mus_s).sum(dim=0) * torch.exp(lnV)
    joint_std = torch.exp(0.5 * lnV)
    return joint_mu.numpy(), joint_std.numpy()


def test_poe_matches_reference():
    rng = np.random.default_rng(0)
    mus = [rng.normal(size=(4, 5)).astype(np.float32) for _ in range(3)]
    lvs = [rng.normal(size=(4, 5)).astype(np.float32) for _ in range(3)]
    mu, std = poe(mus, lvs)
    ref_mu, ref_std = torch_poe(mus, lvs)
    np.testing.assert_allclose(np.asarray(mu), ref_mu, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std), ref_std, rtol=1e-5, atol=1e-6)


def test_poe_equals_precision_weighting():
    """Log-space PoE == classic precision-weighted form."""
    rng = np.random.default_rng(1)
    mus = [rng.normal(size=(3, 4)).astype(np.float32) for _ in range(2)]
    lvs = [rng.normal(size=(3, 4)).astype(np.float32) * 0.5 for _ in range(2)]
    mu, std = poe(mus, lvs)
    # classic: T_i = 1/var_i (prior T=1); mu = sum(T_i mu_i)/sum(T_i)
    T = [np.exp(-lv) for lv in lvs] + [np.ones_like(lvs[0])]
    m = [*mus, np.zeros_like(mus[0])]
    T_sum = sum(T)
    np.testing.assert_allclose(np.asarray(mu),
                               sum(t * mm for t, mm in zip(T, m)) / T_sum,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std) ** 2, 1.0 / T_sum, rtol=1e-5)


def test_poe_for_all_subsets_structure():
    """moepoe.py:43-70: subsets of size >= 2; prior expert ONLY in the full
    subset."""
    rng = np.random.default_rng(2)
    mus = [rng.normal(size=(2, 3)).astype(np.float32) for _ in range(3)]
    lvs = [rng.normal(size=(2, 3)).astype(np.float32) for _ in range(3)]
    poe_mus, poe_lvs = poe_for_all_subsets(mus, lvs)
    # C(3,2) + C(3,3) = 4 subsets
    assert len(poe_mus) == 4
    # full subset (last) includes the prior: recompute with torch formula
    t_mus = [torch.tensor(m) for m in mus] + [torch.zeros(2, 3)]
    t_lvs = [torch.tensor(l) for l in lvs] + [torch.zeros(2, 3)]
    lnT = torch.stack([-l for l in t_lvs])
    lnV = -torch.logsumexp(lnT, dim=0)
    joint_mu = (torch.exp(lnT) * torch.stack(t_mus)).sum(0) * torch.exp(lnV)
    np.testing.assert_allclose(np.asarray(poe_mus[-1]), joint_mu.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(poe_lvs[-1]), lnV.numpy(),
                               rtol=1e-5, atol=1e-6)
    # pairwise subset (first = (0,1)) excludes the prior
    lnT2 = torch.stack([-torch.tensor(lvs[0]), -torch.tensor(lvs[1])])
    lnV2 = -torch.logsumexp(lnT2, dim=0)
    np.testing.assert_allclose(np.asarray(poe_lvs[0]), lnV2.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_mixture_component_selection_chunks():
    """moepoe.py:20-39: component k owns rows [k*B//M, ...); last takes the
    tail."""
    mus = [np.full((7, 2), k, np.float32) for k in range(3)]
    lvs = [np.full((7, 2), 10 + k, np.float32) for k in range(3)]
    mu_sel, lv_sel = mixture_component_selection(mus, lvs)
    expect = np.concatenate([np.full((2, 2), 0), np.full((2, 2), 1),
                             np.full((3, 2), 2)]).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(mu_sel), expect)
