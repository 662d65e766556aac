"""Numerically-stable log-space product-of-experts (mvae.py:27-45,
moepoe.py:43-70)."""

from __future__ import annotations

from itertools import combinations
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def poe(mus: Sequence[jax.Array], log_vars: Sequence[jax.Array], include_prior: bool = True):
    """Gaussian PoE in log-space (mvae.py:27-45).

    Returns (joint_mu, joint_std). With include_prior, a standard-normal
    expert is appended (mu=0, log_var=0).
    """
    mus = list(mus)
    log_vars = list(log_vars)
    if include_prior:
        mus.append(jnp.zeros_like(mus[0]))
        log_vars.append(jnp.zeros_like(log_vars[0]))
    ln_t = jnp.stack([-lv for lv in log_vars])          # log precisions
    ln_v = -jax.scipy.special.logsumexp(ln_t, axis=0)   # log joint variance
    joint_mu = jnp.sum(jnp.exp(ln_t) * jnp.stack(mus), axis=0) * jnp.exp(ln_v)
    joint_std = jnp.exp(0.5 * ln_v)
    return joint_mu, joint_std


def poe_log_var(mus, log_vars, subset: Sequence[int], include_prior: bool):
    """PoE over a subset of experts returning (mu, log_var)
    (moepoe.py:62-66)."""
    sel_mus = [mus[i] for i in subset]
    sel_lvs = [log_vars[i] for i in subset]
    if include_prior:
        sel_mus.append(jnp.zeros_like(sel_mus[0]))
        sel_lvs.append(jnp.zeros_like(sel_lvs[0]))
    ln_t = jnp.stack([-lv for lv in sel_lvs])
    joint_ln_v = -jax.scipy.special.logsumexp(ln_t, axis=0)
    joint_mu = jnp.sum(jnp.exp(ln_t) * jnp.stack(sel_mus), axis=0) * jnp.exp(joint_ln_v)
    return joint_mu, joint_ln_v


def poe_for_all_subsets(mus, log_vars) -> Tuple[List[jax.Array], List[jax.Array]]:
    """PoE for every subset of size >= 2; the prior expert is only added to
    the full subset, following the reference's reading of Sutter's MoPoE
    (moepoe.py:43-70). Returns (poe_mus, poe_log_vars)."""
    n_mod = len(mus)
    poe_mus, poe_lvs = [], []
    for k in range(2, n_mod + 1):
        for tup in combinations(range(n_mod), k):
            mu, lv = poe_log_var(mus, log_vars, list(tup), include_prior=(k == n_mod))
            poe_mus.append(mu)
            poe_lvs.append(lv)
    return poe_mus, poe_lvs


def mixture_component_selection(mus, log_vars):
    """Stratified selection: component k owns batch rows
    [k*B//M, (k+1)*B//M) (moepoe.py:20-39). Static shapes (B divisible or
    remainder handled like the reference: last chunk takes the tail)."""
    m = len(mus)
    b = mus[0].shape[0]
    starts = [(k * (b // m)) if k < m else b for k in range(m)]
    ends = starts[1:] + [b]
    mu_sel = jnp.concatenate([mus[k][starts[k]:ends[k]] for k in range(m)], axis=0)
    lv_sel = jnp.concatenate([log_vars[k][starts[k]:ends[k]] for k in range(m)], axis=0)
    return mu_sel, lv_sel
