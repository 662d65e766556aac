"""Hamiltonian MC sampling from products of flow-posterior experts
(jmvae_nf.py:272-437).

The reference's Python MCMC loop (with torch.autograd.grad per step) becomes
a lax.fori_loop with jax.value_and_grad — one compiled kernel for the whole
chain, leapfrog included.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def sample_from_moe_subset(model, variables, subset: Sequence[int], data, key):
    """Initial point: for each row pick a random modality in the subset and
    sample its unimodal posterior (jmvae_nf.py:272-290)."""
    n = data[0].shape[0]
    k_choice, *keys = jax.random.split(key, len(subset) + 1)
    choice = jax.random.randint(k_choice, (n,), 0, len(subset))
    zs = []
    for j, m in enumerate(subset):
        z_m = model.apply(variables, m, data[m], method="infer_latent_from_mod",
                          rngs={"sample": keys[j]})
        zs.append(z_m)
    zs = jnp.stack(zs)  # (|S|, n, D)
    return jnp.take_along_axis(zs, choice[None, :, None], axis=0)[0]


def sample_from_poe_subset(model, variables, subset: Sequence[int], data, key,
                           mcmc_steps: int = 100, n_lf: int = 10,
                           eps_lf: float = 0.01, K: int = 1,
                           divide_prior: bool = True,
                           return_acceptance: bool = False):
    """HMC over ln q_PoE(z | x_subset) (jmvae_nf.py:332-437).
    Returns (K, n_data, latent_dim); with return_acceptance=True returns
    (samples, acceptance_rate) where acceptance_rate is the mean accepted
    fraction over steps and chains (the reference records it per step,
    jmvae_nf.py:435 `acc_rate = moves.mean()`)."""
    n_data = data[0].shape[0]
    data = [jnp.concatenate([d] * K, axis=0) for d in data]
    n = data[0].shape[0]

    def ln_q(z):
        return model.apply(variables, subset, z, data,
                           method="poe_log_density", divide_prior=divide_prior)

    def ln_q_sum_and_grad(z):
        lnq, g = jax.value_and_grad(lambda zz: jnp.sum(ln_q(zz)))(z)
        return ln_q(z), g  # per-sample density + grad of the sum

    k0, k_loop = jax.random.split(key)
    z0 = sample_from_moe_subset(model, variables, subset, data, k0)

    def body(i, carry):
        z0, key, acc_sum = carry
        key, k_gamma, k_acc = jax.random.split(key, 3)
        z = z0
        rho = jax.random.normal(k_gamma, z.shape, z.dtype)
        lnq, g = ln_q_sum_and_grad(z)
        h0 = -lnq + 0.5 * jnp.sum(rho ** 2, axis=1)

        def leapfrog(j, st):
            z, rho, g = st
            rho_half = rho + (eps_lf / 2) * g
            z = z + eps_lf * rho_half
            lnq_j, g = ln_q_sum_and_grad(z)
            rho = rho_half + (eps_lf / 2) * g
            return (z, rho, g)

        z, rho, g = jax.lax.fori_loop(0, n_lf, leapfrog, (z, rho, g))
        lnq, _ = ln_q_sum_and_grad(z)
        h = -lnq + 0.5 * jnp.sum(rho ** 2, axis=1)
        alpha = jnp.exp(h0 - h)
        moves = (jax.random.uniform(k_acc, (n,)) < alpha).astype(z.dtype)[:, None]
        z = z * moves + (1 - moves) * z0
        return (z, key, acc_sum + jnp.mean(moves))

    z, _, acc_sum = jax.lax.fori_loop(0, mcmc_steps, body,
                                      (z0, k_loop, jnp.float32(0.0)))
    z = z.reshape(K, n_data, -1)
    if return_acceptance:
        return z, acc_sum / mcmc_steps
    return z
