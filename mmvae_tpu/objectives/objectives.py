"""Training objectives — functional rebuilds of bivae/objectives.py.

Every objective is a pure function
    (model, variables, x, key, spec, **cfg) -> (objective, details, state_upd)
returning the MAXIMIZATION objective (the train loop negates), a details
dict of scalar terms mirroring the reference's keys, and updated mutable
state (batch_stats). `spec` is the static ModelSpec; epoch-dependent scalars
(beta_kl, warmup phase) arrive as arguments.

The DReG estimators replace the reference's gradient hook
(objectives.py:398-401, 434-437) with a hand-assembled two-stage VJP:
stage 1 = encode+sample, stage 2 = decode+log-weights. The hook's semantics
(multiply dL/dz by the normalized importance weight) are reproduced exactly
by rescaling the stage-2 z-cotangent before pulling it back through stage 1
— same cost profile as torch (one forward, one backward), no recomputation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import distributions as D
from ..core.distributions import LocScale
from ..core.math import log_mean_exp


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static model metadata consumed by objectives (mirrors the attrs the
    reference hangs on Multi_VAES: multi_vaes.py:41-47)."""

    latent_dim: int
    posterior: str = "normal"                       # params.dist
    recon_dists: Tuple[str, ...] = ("normal", "normal")  # params.recon_losses
    lik_scaling: Tuple[float, ...] = (1.0, 1.0)
    vae_recon_losses: Tuple[str, ...] = ("mse", "mse")   # my_VAE reconstruction_loss
    no_recon: bool = False
    linear_warmup: bool = False
    align: int = -1
    llik_scaling: float = 1.0                       # unimodal objectives


def prior(spec: ModelSpec) -> LocScale:
    return LocScale(jnp.zeros((1, spec.latent_dim)), jnp.ones((1, spec.latent_dim)))


def _apply(model, variables, key, method, *args, train=True, **kwargs):
    mutable = ["batch_stats"] if train else False
    out = model.apply(
        variables, *args, method=method, train=train,
        rngs={"sample": key}, mutable=mutable, **kwargs,
    )
    if mutable is False:
        return out, {}
    return out


def _chain(variables, state):
    """Thread mutated collections (batch_stats) from a previous _apply into
    the next one, so BN running stats from EVERY forward pass of a
    multi-pass objective survive (the torch reference updates them on each
    train-mode forward). flax returns the FULL collection, so the latest
    chained result replaces the previous state wholesale."""
    return {**variables, **state} if state else variables


def _flat_sum(a, lead_ndim):
    return jnp.sum(a.reshape(*a.shape[:lead_ndim], -1), axis=-1)


def recon_log_prob(dist_name: str, recon, x, lead_ndim: int):
    """ln p(x|z) with unit scale, flattened over event dims
    (px_z wrapping at mmvae.py:54-76)."""
    lp = D.log_prob(dist_name, LocScale(recon, jnp.ones_like(recon)), x)
    return _flat_sum(lp, lead_ndim)


def recon_pointwise_loss(loss_name: str, recon, x):
    """recon_loss_dict equivalent (objectives.py:177): mse / bce / l1, summed."""
    r = recon.reshape(recon.shape[0], -1)
    t = x.reshape(x.shape[0], -1)
    if loss_name == "normal":      # F.mse_loss
        return jnp.sum((r - t) ** 2)
    if loss_name == "laplace":     # F.l1_loss
        return jnp.sum(jnp.abs(r - t))
    if loss_name == "bernoulli":   # F.binary_cross_entropy
        rc = jnp.clip(r, 1e-7, 1 - 1e-7)
        return -jnp.sum(t * jnp.log(rc) + (1 - t) * jnp.log1p(-rc))
    raise ValueError(loss_name)


# ===========================================================================
# Unimodal objectives (objectives.py:20-69)
# ===========================================================================

def elbo(model, variables, x, key, spec, K=1, beta_prior=1.0, train=True, **kw):
    """E[ELBO] for a unimodal VAE (objectives.py:20-25): mean over the K
    sample axis, SUM over the batch (the reference's .mean(0).sum())."""
    out, state = _apply(model, variables, key, None, x, K=K)
    qz = LocScale(out["mu"], out["std"])
    has_k = out["z"].ndim == 3  # UnimodalVAE drops the sample axis at K=1
    lpx_z = recon_log_prob(spec.recon_dists[0], out["recon"], x,
                           2 if has_k else 1)
    lpx_z = lpx_z * spec.llik_scaling
    kld = jnp.sum(D.kl(spec.posterior, qz, prior(spec)), axis=-1)
    val = lpx_z - beta_prior * kld  # (K, B) or (B,)
    if has_k:
        val = jnp.mean(val, axis=0)
    return jnp.sum(val), {}, state


def _unimodal_lw(model, variables, x, key, spec, K, train, detach_post):
    out, state = _apply(model, variables, key, None, x, K=K)
    zs = out["z"]
    has_k = zs.ndim == 3  # UnimodalVAE drops the sample axis at K=1
    mu, std = out["mu"], out["std"]
    if detach_post:
        mu, std = jax.lax.stop_gradient(mu), jax.lax.stop_gradient(std)
    lpz = jnp.sum(D.log_prob(spec.posterior, prior(spec), zs), axis=-1)
    lpx_z = recon_log_prob(spec.recon_dists[0], out["recon"], x,
                           2 if has_k else 1) * spec.llik_scaling
    lqz_x = jnp.sum(D.log_prob(spec.posterior, LocScale(mu, std), zs), axis=-1)
    lw = lpz + lpx_z - lqz_x
    if not has_k:
        lw = lw[None]  # restore the K=1 axis: log-weights are always (K, B)
    return lw, zs, state


def iwae(model, variables, x, key, spec, K=1, train=True, **kw):
    """IWAE bound (objectives.py:28-43)."""
    lw, _, state = _unimodal_lw(model, variables, x, key, spec, K, train, False)
    return jnp.sum(log_mean_exp(lw, axis=0)), {}, state


def dreg(model, variables, x, key, spec, K=1, train=True, **kw):
    """Unimodal DReG (objectives.py:46-69): detached posterior params +
    z-gradient reweighting, assembled with the same two-stage VJP as the
    multimodal variant."""
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def stage1(p):
        ((mu, std), zs, ldj), st1 = _apply(
            model, {"params": p, **rest}, key, "encode_and_sample", x,
            K=K, train=train,
        )
        return zs, ((mu, std), st1)

    zs, vjp1, ((mu, std), st1) = jax.vjp(stage1, params, has_aux=True)
    mu_d, std_d = jax.lax.stop_gradient((mu, std))

    rest2 = {**rest, **st1}

    def stage2(p, z):
        recon, st2 = _apply(model, {"params": p, **rest2}, key, "decode", z,
                            train=train)
        lpz = jnp.sum(D.log_prob(spec.posterior, prior(spec), z), axis=-1)
        lpx = recon_log_prob(spec.recon_dists[0], recon, x, 2) * spec.llik_scaling
        lqz = jnp.sum(D.log_prob(spec.posterior, LocScale(mu_d, std_d), z), axis=-1)
        return lpz + lpx - lqz, st2

    lw, vjp2, st2 = jax.vjp(stage2, params, zs, has_aux=True)
    w = jax.lax.stop_gradient(jax.nn.softmax(lw, axis=0))
    obj = jnp.sum(w * lw)
    gp2, gz = vjp2(w)
    gz = gz * w[..., None]
    (gp1,) = vjp1(gz)
    grads = jax.tree.map(jnp.add, gp1, gp2)
    return obj, {}, {**st1, **st2}, grads


# ===========================================================================
# Multimodal ELBOs (objectives.py:73-111)
# ===========================================================================

def m_elbo_naive(model, variables, x, key, spec, K=1, train=True, **kw):
    """Naive multimodal ELBO (objectives.py:73-84)."""
    out, state = _apply(model, variables, key, None, x, K=K)
    qz_params, recons, zss = out["qz_params"], out["recons"], out["zss"]
    n = len(qz_params)
    lpx_zs, klds = [], []
    for r in range(n):
        qz = LocScale(*qz_params[r])
        klds.append(jnp.sum(D.kl(spec.posterior, qz, prior(spec)), axis=-1))
        for d in range(n):
            lp = recon_log_prob(spec.recon_dists[d], recons[r][d], x[d], 2)
            lpx_zs.append(lp * spec.lik_scaling[d])
    obj = (1.0 / n) * (sum(lpx_zs) - sum(klds))
    return jnp.sum(jnp.mean(obj, axis=0)), {}, state


def m_elbo(model, variables, x, key, spec, K=1, train=True, **kw):
    """Importance-weighted multimodal ELBO with stop-grad cross weights
    (objectives.py:87-111)."""
    out, state = _apply(model, variables, key, None, x, K=K)
    qz_params, recons, zss = out["qz_params"], out["recons"], out["zss"]
    n = len(qz_params)
    lpx_zs, klds = [], []
    details = {}
    for r in range(n):
        qz_r = LocScale(*qz_params[r])
        klds.append(jnp.sum(D.kl(spec.posterior, qz_r, prior(spec)), axis=-1))
        for d in range(n):
            lp = recon_log_prob(spec.recon_dists[d], recons[d][d], x[d], 2)
            lp = lp * spec.lik_scaling[d]
            if d == r:
                lwt = jnp.zeros(())
            else:
                zs = jax.lax.stop_gradient(zss[d])
                qz_d = LocScale(*qz_params[d])
                lwt = jnp.sum(
                    D.log_prob(spec.posterior, qz_r, zs)
                    - jax.lax.stop_gradient(D.log_prob(spec.posterior, qz_d, zs)),
                    axis=-1,
                )
            lpx_zs.append(jnp.exp(lwt) * lp)
            details[f"lpx_zs{r}{d}"] = jnp.sum(lpx_zs[-1])
    obj = (1.0 / n) * (sum(lpx_zs) - sum(klds))
    return jnp.sum(jnp.mean(obj, axis=0)), details, state


# ===========================================================================
# Multimodal IWAE / DReG (objectives.py:117-131, 333-438)
# ===========================================================================

def _m_lws(x, spec, qz_params, zss, recons, detach_post: bool):
    """Per-expert importance weights lw_r = lpz + sum_d lpx - lqz_moe
    (objectives.py:117-131 / 372-388). Returns (M, K, B).

    NOTE: the reference scales lpx by `model.vaes[d].llik_scaling` in
    _m_iwae but `model.lik_scaling[d]` in _m_dreg; with my_pythae VAEs only
    the latter exists, so we use spec.lik_scaling for both (the live
    configs set them identically)."""
    n = len(qz_params)
    if detach_post:
        qz_params = jax.lax.stop_gradient(qz_params)
    lws = []
    for r in range(n):
        lpz = jnp.sum(D.log_prob(spec.posterior, prior(spec), zss[r]), axis=-1)
        lqz = log_mean_exp(
            jnp.stack([
                jnp.sum(D.log_prob(spec.posterior, LocScale(*qz_params[m]), zss[r]), axis=-1)
                for m in range(n)
            ])
        )
        lpx = sum(
            recon_log_prob(spec.recon_dists[d], recons[r][d], x[d], 2) * spec.lik_scaling[d]
            for d in range(n)
        )
        lws.append(lpz + lpx - lqz)
    return jnp.stack(lws)


def m_iwae(model, variables, x, key, spec, K=1, train=True, **kw):
    """Multimodal IWAE, tight bound: log-mean over M*K (objectives.py:333-340)."""
    out, state = _apply(model, variables, key, None, x, K=K)
    lws = _m_lws(x, spec, out["qz_params"], out["zss"], out["recons"], False)
    m, k, b = lws.shape
    return jnp.sum(log_mean_exp(lws.reshape(m * k, b), axis=0)), {}, state


def m_iwae_looser(model, variables, x, key, spec, K=1, train=True, **kw):
    """Looser bound: modality average outside the log (objectives.py:343-369)."""
    out, state = _apply(model, variables, key, None, x, K=K)
    lws = _m_lws(x, spec, out["qz_params"], out["zss"], out["recons"], False)
    return jnp.sum(jnp.mean(log_mean_exp(lws, axis=1), axis=0)), {}, state


def _m_dreg_value_and_grad(model, variables, x, key, spec, K, looser, train):
    """Shared DReG machinery (objectives.py:372-438). Returns
    (obj, details, state, grads) where grads are w.r.t. variables['params']."""
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def stage1(p):
        (qz_params, zss), st1 = _apply(
            model, {"params": p, **rest}, key, "encode_and_sample", x,
            K=K, train=train,
        )
        return zss, (qz_params, st1)

    zss, vjp1, (qz_params, st1) = jax.vjp(stage1, params, has_aux=True)

    # stage 2 applies on top of stage 1's mutated state so both stages'
    # batch_stats updates survive (encoder stats live in st1, decoder in
    # the st2 built from it)
    rest2 = {**rest, **st1}

    def stage2(p, z):
        recons, st2 = _apply(
            model, {"params": p, **rest2}, key, "decode_cross", z, train=train,
        )
        lws = _m_lws(x, spec, qz_params, z, recons, detach_post=True)
        return lws, st2

    lws, vjp2, st2 = jax.vjp(stage2, params, zss, has_aux=True)

    if looser:
        # softmax over K per (modality, batch) (objectives.py:435)
        w = jax.lax.stop_gradient(jax.nn.softmax(lws, axis=1))
        obj = jnp.sum(jnp.mean(w * lws, axis=0))
        n_mod = lws.shape[0]
        cot_obj = jnp.ones_like(lws) / n_mod  # d(obj)/d(w*lw) of mean(0).sum()
    else:
        # softmax over the joint (M*K) axis (objectives.py:399)
        m, k, b = lws.shape
        w = jax.lax.stop_gradient(
            jax.nn.softmax(lws.reshape(m * k, b), axis=0).reshape(m, k, b)
        )
        obj = jnp.sum(w * lws)
        cot_obj = jnp.ones_like(lws)

    # d(obj)/d(lws) with w constant
    cot = cot_obj * w
    gp2, gz = vjp2(cot)
    # torch hook: z-grad additionally scaled by w (objectives.py:401, 437)
    gz = gz * w[..., None]
    (gp1,) = vjp1(gz)
    grads = jax.tree.map(jnp.add, gp1, gp2)
    # st2 was computed on top of st1, so it carries both stages' updates
    state = {**st1, **st2}
    return obj, {}, state, grads


def m_dreg(model, variables, x, key, spec, K=1, train=True, **kw):
    return _m_dreg_value_and_grad(model, variables, x, key, spec, K, False, train)


def m_dreg_looser(model, variables, x, key, spec, K=1, train=True, **kw):
    return _m_dreg_value_and_grad(model, variables, x, key, spec, K, True, train)


# ===========================================================================
# JMVAE family (objectives.py:157-259)
# ===========================================================================

def _joint_kld_prior(mu, std):
    """-0.5 sum(1 + log_var - mu^2 - var) with log_var = 2 log std
    (objectives.py:209-211)."""
    log_var = 2 * jnp.log(std)
    return jnp.sum(-0.5 * jnp.sum(1 + log_var - mu ** 2 - jnp.exp(log_var), axis=-1))


def m_jmvae_nf(model, variables, x, key, spec, K=1, epoch=1, warmup=0,
               beta_prior=1.0, beta_kl=1.0, train=True, past_warmup=None, **kw):
    """The paper's JMVAE-NF loss (objectives.py:179-220).

    `past_warmup` replaces the `epoch >= warmup` python branch so the jitted
    step is phase-static; the train loop passes it per phase. beta_kl arrives
    pre-decayed by the schedule (jmvae_nf.py:189-193 `step`).
    """
    if past_warmup is None:
        past_warmup = epoch >= warmup
    # Post-warmup with BOTH the joint encoder and decoders optimizer-frozen
    # (the published fix_jencoder/fix_decoders recipe), every parameter
    # reachable through the joint forward is masked: its gradients are
    # computed and then zeroed. Detaching the forward outputs instead skips
    # those backward conv passes entirely — bit-identical updates
    # (tests/test_jnf_frozen_fastpath.py) at a fraction of the step cost.
    frozen_joint = bool(kw.get("frozen_joint", False)) and bool(past_warmup)
    k1, k2 = jax.random.split(key)
    out, state = _apply(model, variables, k1, None, x, train=train)
    if frozen_joint:
        out = jax.lax.stop_gradient(out)
    mu, std = out["qz_xy"]
    recons = out["recons"]
    details = {}
    loss = 0.0
    for m, xm in enumerate(x):
        l_m = recon_pointwise_loss(spec.recon_dists[m], recons[m], xm) * spec.lik_scaling[m]
        details[f"loss_{m}"] = l_m
        loss = loss - l_m
    details["loss"] = loss
    details["kld_prior"] = _joint_kld_prior(mu, std)
    if spec.linear_warmup:
        # epoch may be a traced scalar; keep the ramp jit-friendly
        beta_reg = jnp.minimum((epoch - 1) / warmup, 1.0) if warmup > 0 else 1.0
    else:
        beta_reg = 1.0
    if past_warmup or spec.linear_warmup:
        (reg, det), state = _apply(
            model, variables, k2, "compute_kld", x,
            train=train, no_recon=spec.no_recon, beta_kl=beta_kl,
            stop_joint_grad=frozen_joint,
        )
        details["reg"] = reg
        details.update(det)
    else:
        details["reg"] = 0.0
        reg = 0.0
    obj = loss - beta_reg * (beta_prior * details["kld_prior"] + reg)
    return obj, details, state


def m_telbo_nf(model, variables, x, key, spec, K=1, epoch=1, warmup=0,
               beta_prior=1.0, train=True, past_warmup=None, **kw):
    """TELBO with joint warmup + post-warmup unimodal ELBOs
    (objectives.py:223-259)."""
    if past_warmup is None:
        past_warmup = epoch >= warmup
    keys = jax.random.split(key, len(x) + 1)
    out, state = _apply(model, variables, keys[0], None, x, train=train)
    mu, std = out["qz_xy"]
    recons = out["recons"]
    details = {}
    loss = 0.0
    for m, xm in enumerate(x):
        l_m = recon_pointwise_loss(spec.recon_dists[m], recons[m], xm) * spec.lik_scaling[m]
        details[f"loss_{m}"] = l_m
        loss = loss - l_m
    details["loss"] = loss
    details["kld_prior"] = _joint_kld_prior(mu, std)
    if past_warmup:
        for m in range(len(x)):
            vout, st = _apply(
                model, _chain(variables, state), keys[m + 1], "vae_forward",
                x[m], m=m, train=train,
            )
            state = st or state
            neg_elbo = _vae_neg_elbo(spec, m, vout, x[m]) * spec.lik_scaling[m]
            details[f"neg_elbo_{m}"] = neg_elbo
            loss = loss - neg_elbo
    return loss - beta_prior * details["kld_prior"], details, state


def _vae_neg_elbo(spec, m, vout, x):
    """my_VAE.loss_function (vae_model_adapted.py:104-124): 0.5*mse (or bce)
    + analytic KLD, summed over the batch."""
    recon, mu, log_var = vout["recon"], vout["mu"], vout["log_var"]
    r = recon.reshape(x.shape[0], -1)
    t = x.reshape(x.shape[0], -1)
    if spec.vae_recon_losses[m] == "mse":
        recon_loss = 0.5 * jnp.sum((r - t) ** 2, axis=-1)
    else:
        rc = jnp.clip(r, 1e-7, 1 - 1e-7)
        recon_loss = -jnp.sum(t * jnp.log(rc) + (1 - t) * jnp.log1p(-rc), axis=-1)
    kld = -0.5 * jnp.sum(1 + log_var - mu ** 2 - jnp.exp(log_var), axis=-1)
    return jnp.sum(recon_loss + kld)


def m_jmvae(model, variables, x, key, spec, K=1, beta=0.0, epoch=1, warmup=0,
            beta_prior=1.0, train=True, past_warmup=None, **kw):
    """Original JMVAE loss (objectives.py:157-174). The joint-encoder freeze
    past warmup is handled by the optimizer mask."""
    if past_warmup is None:
        past_warmup = epoch >= warmup
    k1, k2 = jax.random.split(key)
    out, state = _apply(model, variables, k1, None, x, train=train)
    mu, std = out["qz_xy"]
    recons = out["recons"]
    uni, st2 = _apply(model, _chain(variables, state), k2,
                      "encode_all_unimodal", x, train=train)
    state = st2 or state
    loss = 0.0
    for m, xm in enumerate(x):
        lp = recon_log_prob(spec.recon_dists[m], recons[m], xm, 1)
        loss = loss + jnp.sum(jnp.mean(lp, axis=0))
    qz_xy = LocScale(mu, std)
    loss = loss - beta_prior * jnp.sum(
        jnp.mean(D.kl(spec.posterior, qz_xy, prior(spec)), axis=0)
    )
    details = {"loss": loss}
    kls = []
    for m, (mu_m, std_m) in enumerate(uni):
        klm = jnp.sum(jnp.mean(D.kl(spec.posterior, qz_xy, LocScale(mu_m, std_m)), axis=0))
        details[f"kl{m + 1}"] = klm
        kls.append(klm)
    obj = loss - beta * sum(kls) if past_warmup else loss
    return obj, details, state


# ===========================================================================
# VAEVAE / SVAE / multi-elbos / TELBO-legacy (objectives.py:133-155, 261-329)
# ===========================================================================

def _m_vaevae(model, variables, x, key, spec, dist_fn, K, beta, epoch, warmup,
              beta_prior, train, past_warmup):
    if past_warmup is None:
        past_warmup = epoch >= warmup
    keys = jax.random.split(key, 4)
    details = {}
    losses = []
    qs = []
    state = {}
    for m in range(2):
        vout, st = _apply(model, _chain(variables, state), keys[m],
                          "vae_forward", x[m], m=m, train=train)
        state = st or state
        lpx = recon_log_prob(spec.recon_dists[m], vout["recon"], x[m], 1) * spec.llik_scaling
        kld = jnp.sum(
            D.kl(spec.posterior, LocScale(vout["mu"], vout["std"]), prior(spec)), axis=-1
        )
        # reference elbo (objectives.py:20-25) SUMS over the batch (its
        # .mean(0) runs over the K=1 sample axis) while the alignment reg
        # below MEANS over the batch — the asymmetry is part of the spec
        losses.append(jnp.sum(lpx - beta_prior * kld))
        qs.append(LocScale(vout["mu"], vout["std"]))
    if spec.align != -1:
        reg = 0.5 * (
            jnp.sum(jnp.mean(dist_fn(qs[0], qs[1])[:, : spec.align], axis=0))
            + jnp.sum(jnp.mean(dist_fn(qs[1], qs[0])[:, : spec.align], axis=0))
        )
    else:
        reg = 0.5 * (
            jnp.sum(jnp.mean(dist_fn(qs[0], qs[1]), axis=0))
            + jnp.sum(jnp.mean(dist_fn(qs[1], qs[0]), axis=0))
        )
    details.update(loss=losses[0] + losses[1], reg=reg, loss1=losses[0], loss2=losses[1])
    obj = losses[0] + losses[1] - (beta * reg if past_warmup else 0.0)
    return obj, details, state


def m_vaevae_kl(model, variables, x, key, spec, K=1, beta=1000.0, epoch=1,
                warmup=0, beta_prior=1.0, train=True, past_warmup=None, **kw):
    fn = lambda p, q: D.kl(spec.posterior, p, q)
    return _m_vaevae(model, variables, x, key, spec, fn, K, beta, epoch, warmup,
                     beta_prior, train, past_warmup)


def m_vaevae_w2(model, variables, x, key, spec, K=1, beta=1000.0, epoch=1,
                warmup=0, beta_prior=1.0, train=True, past_warmup=None, **kw):
    return _m_vaevae(model, variables, x, key, spec, D.wasserstein_2, K, beta,
                     epoch, warmup, beta_prior, train, past_warmup)


def m_svae(model, variables, x, key, spec, K=1, beta=0.0, train=True, **kw):
    """SVAE / VAEVAE joint loss (objectives.py:284-303)."""
    k1, k2 = jax.random.split(key)
    out, state = _apply(model, variables, k1, None, x, train=train)
    mu, std = out["qz_xy"]
    qz_xy = LocScale(mu, std)
    loss, reg = 0.0, 0.0
    keys = jax.random.split(k2, len(x))
    for m, xm in enumerate(x):
        vout, st = _apply(model, _chain(variables, state), keys[m],
                          "vae_forward", xm, m=m, train=train)
        state = st or state
        q_m = LocScale(vout["mu"], vout["std"])
        loss = loss + jnp.mean(
            D.log_prob(spec.recon_dists[m], LocScale(vout["recon"], jnp.ones_like(vout["recon"])), xm)
        )
        reg = reg + jnp.sum(jnp.mean(D.kl(spec.posterior, q_m, prior(spec)), axis=0))
        loss = loss + jnp.mean(
            D.log_prob(spec.recon_dists[m], LocScale(out["recons"][m], jnp.ones_like(out["recons"][m])), xm)
        )
        reg = reg + jnp.sum(jnp.mean(D.kl(spec.posterior, qz_xy, q_m), axis=0))
    return 0.5 * (loss - beta * reg), {"loss": loss, "reg": reg}, state


def m_multi_elbos(model, variables, x, key, spec, K=1, train=True, **kw):
    """Sutter 2021 sum-of-ELBOs (objectives.py:261-281)."""
    k1, k2 = jax.random.split(key)
    out, state = _apply(model, variables, k1, None, x, train=train)
    mu, std = out["qz_xy"]
    uniout, st2 = _apply(model, _chain(variables, state), k2,
                         "unimodal_cross_forward", x, train=train)
    state = st2 or state
    qz_xs, px_zs = uniout["qz_params"], uniout["recons"]
    loss = 0.0
    n = len(x)
    for m in range(n):
        lp = recon_log_prob(spec.recon_dists[m], out["recons"][m], x[m], 1)
        loss = loss + jnp.mean(lp, axis=0)
        for r in range(n):
            lpr = recon_log_prob(spec.recon_dists[m], px_zs[r][m], x[m], 1)
            loss = loss + jnp.mean(lpr, axis=0)
        loss = loss - jnp.sum(jnp.mean(
            D.kl(spec.posterior, LocScale(*qz_xs[m]), prior(spec)), axis=0))
    loss = loss - jnp.sum(jnp.mean(D.kl(spec.posterior, LocScale(mu, std), prior(spec)), axis=0))
    return loss / 3.0, {}, state


def m_telbo(model, variables, x, key, spec, K=1, beta=0.0, epoch=1, warmup=0,
            beta_prior=1.0, train=True, **kw):
    """TELBO (objectives.py:306-329). NOTE: the reference's requires_grad_
    toggling there happens AFTER the forward graph is built, so it has no
    effect on the current step's gradients; we reproduce the actual
    (ungated) behavior."""
    k1, k2 = jax.random.split(key)
    out, state = _apply(model, variables, k1, None, x, train=train)
    mu, std = out["qz_xy"]
    uniout, st2 = _apply(model, _chain(variables, state), k2,
                         "unimodal_cross_forward", x, train=train)
    state = st2 or state
    qz_xs, px_zs = uniout["qz_params"], uniout["recons"]
    details = {"mloss": 0.0}
    for m in range(len(x)):
        lp = recon_log_prob(spec.recon_dists[m], px_zs[m][m], x[m], 1)
        details[f"loss_{m}"] = jnp.mean(lp, axis=0)
        details[f"loss_{m}"] -= beta_prior * jnp.sum(jnp.mean(
            D.kl(spec.posterior, LocScale(*qz_xs[m]), prior(spec)), axis=0))
        lpj = recon_log_prob(spec.recon_dists[m], out["recons"][m], x[m], 1)
        details["mloss"] += jnp.mean(lpj, axis=0)
    details["reg"] = beta_prior * jnp.sum(jnp.mean(
        D.kl(spec.posterior, LocScale(mu, std), prior(spec)), axis=0))
    obj = details["mloss"] - details["reg"] + beta * (details["loss_0"] + details["loss_1"])
    return obj, details, state


# ===========================================================================
# MMVAE-NF ELBO (objectives.py:441-479) and self-built (objectives.py:481-483)
# ===========================================================================

def m_elbo_nf(model, variables, x, key, spec, K=1, train=True, **kw):
    """Flow-posterior ELBO with unit-gaussian decoder (objectives.py:463-479)."""
    out, state = _apply(model, variables, key, None, x, train=train)
    ln_qz_xs, zs, recons = out["ln_qz_xs"], out["zs"], out["recons"]
    n = len(zs)
    obj = 0.0
    for e in range(n):
        log_prob_z = -0.5 * jnp.sum(zs[e] ** 2)
        kld = jnp.sum(ln_qz_xs[e]) - log_prob_z
        obj = obj - kld / n
        for d, recon in enumerate(recons[e]):
            obj = obj + (-0.5 * jnp.sum((recon - x[d]) ** 2)) / n * spec.lik_scaling[d]
    return obj, {}, state


def m_self_built(model, variables, x, key, spec, K=1, train=True, **kw):
    """MVAE / MoE-PoE build their own ELBO in forward (objectives.py:481-483)."""
    out, state = _apply(model, variables, key, None, x, train=train)
    return out["elbo"], {}, state


# ===========================================================================
# Registry — dispatch mirrors main.py:134-137
# ===========================================================================

OBJECTIVES = {
    "elbo": elbo,
    "iwae": iwae,
    "m_elbo_naive": m_elbo_naive,
    "m_elbo": m_elbo,
    "m_iwae": m_iwae,
    "m_iwae_looser": m_iwae_looser,
    "m_jmvae": m_jmvae,
    "m_jmvae_nf": m_jmvae_nf,
    "m_telbo": m_telbo,
    "m_telbo_nf": m_telbo_nf,
    "m_vaevae_kl": m_vaevae_kl,
    "m_vaevae_w2": m_vaevae_w2,
    "m_svae": m_svae,
    "m_multi_elbos": m_multi_elbos,
    "m_elbo_nf": m_elbo_nf,
    "m_self_built": m_self_built,
}

# Objectives that assemble their own gradients (return 4-tuple incl. grads)
CUSTOM_GRAD_OBJECTIVES = {
    "dreg": dreg,
    "m_dreg": m_dreg,
    "m_dreg_looser": m_dreg_looser,
}


def resolve(obj_name: str, multimodal: bool, looser: bool):
    """main.py:134-137 dispatch: ('m_' if multimodal) + obj + ('_looser' if
    looser and obj != 'elbo')."""
    name = ("m_" if multimodal else "") + obj_name
    if looser and obj_name != "elbo":
        name = name + "_looser"
    if name in CUSTOM_GRAD_OBJECTIVES:
        return name, CUSTOM_GRAD_OBJECTIVES[name], True
    return name, OBJECTIVES[name], False
