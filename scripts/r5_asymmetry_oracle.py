"""Supervised decoder oracle for the off-manifold asymmetry (VERDICT r4
weak#2 / r4 next#5).

Question: the hard flagship's svhn->mnist generations score classifier-FID
fid_0 ~ 18714 and PRD ~ 0 while cross-coherence is 0.83. Is that the
model's fault (recipe property) or inherent to the data (the conditional
p(mnist | svhn) is multimodal, so ANY conditional-mean-like decode lands
off-manifold)?

Oracle: train a fully SUPERVISED conv regressor svhn->mnist-pixels with L2
loss on the true hard pairs (the best any deterministic/Gaussian-likelihood
decoder could do — it converges to E[mnist | svhn]), then score its test
predictions with the same classifier-feature FID/PRD protocol the flagship
was scored with (eval/quality.py, Quality_assess.py pattern). If the oracle
also posts huge FID / PRD~0, the blur is inherent to conditional-mean
decoding on this stand-in — the reference anchor (its MNIST-direction FID
~10.5, ablation_n_made.py:43-46) differs because real MNIST partners are
near-unimodal given SVHN.

Run on TPU: python -u scripts/r5_asymmetry_oracle.py [--fold 0.0]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from mmvae_tpu.core.runtime import enable_compilation_cache
from mmvae_tpu.data import get_dataloaders
from mmvae_tpu.eval import classifiers as C
from mmvae_tpu.eval.fid import activation_statistics, calculate_frechet_distance
from mmvae_tpu.eval import prd as prd_mod
from mmvae_tpu.nets.encoders import DecoderMNIST, EncoderSVHN

enable_compilation_cache()


class Oracle(nn.Module):
    """Deterministic svhn->mnist regressor: EncoderSVHN trunk -> 64-d code
    -> DecoderMNIST. Supervised upper bound for any conditional-mean-style
    decoder on this pairing."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        mu, _ = EncoderSVHN(latent_dim=64)(x, train=train)
        return DecoderMNIST(latent_dim=64)(mu, train=train)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold", type=float, default=0.0,
                    help="0.0 scores the r4 hard stand-in (where fid_0 was "
                    "measured); pass 2.0 for the hard2 variant")
    ap.add_argument("--epochs", type=int, default=5)
    info = ap.parse_args()

    extra = {"fold": info.fold} if info.fold else {}
    train_l, test_l, _ = get_dataloaders(
        "mnist_svhn", batch_size=256, synthetic_n=20000,
        difficulty=0.55, confound_max=0.7, **extra)

    model = Oracle()
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 3, 32, 32), jnp.float32)
    variables = model.init({"params": key}, x0, train=True)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state, svhn, mnist):
        def loss_fn(p):
            out, aux = model.apply(
                {"params": p, "batch_stats": bstats}, svhn, train=True,
                mutable=["batch_stats"])
            return jnp.mean((out - mnist) ** 2), aux["batch_stats"]

        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), new_bs, opt_state, loss

    for ep in range(info.epochs):
        t0, tot, nb = time.time(), 0.0, 0
        for xs, _ in train_l:
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, jnp.asarray(xs[1]),
                jnp.asarray(xs[0]))
            tot += float(loss); nb += 1
        print(f"epoch {ep}: l2 {tot / nb:.5f} ({time.time() - t0:.1f}s)",
              flush=True)

    # classifier-feature FID/PRD, same protocol as validate --fid-encoder
    # classifier (eval/classifiers.make_feature_fn)
    clf_variables = C.train_classifier(
        C.MnistClassifier(), *_stack_all(train_l, 0), key, epochs=3)
    feat = C.make_feature_fn(C.MnistClassifier(), clf_variables)

    @jax.jit
    def predict(params, bstats, svhn):
        return model.apply({"params": params, "batch_stats": bstats}, svhn,
                           train=False)

    real_acts, gen_acts = [], []
    for xs, _ in test_l:
        real_acts.append(np.asarray(feat(jnp.asarray(xs[0]))))
        gen_acts.append(np.asarray(feat(predict(params, bstats,
                                                jnp.asarray(xs[1])))))
    real = np.concatenate(real_acts)
    gen = np.concatenate(gen_acts)
    n = min(len(real), len(gen))
    mu1, s1 = activation_statistics(real[:n])
    mu2, s2 = activation_statistics(gen[:n])
    fid = calculate_frechet_distance(mu1, s1, mu2, s2)
    p, r = prd_mod.compute_prd_from_embedding(gen[:n], real[:n])
    f8, f18 = prd_mod.prd_to_max_f_beta_pair(p, r)
    print(f"ORACLE fold={info.fold}: classifier-FID(svhn->mnist) = {fid:.1f}"
          f", prd_f8 = {f8:.3f}, prd_f1_8 = {f18:.3f}"
          f"  (flagship r4: fid_0 = 18714, prd ~ 0)")


def _stack_all(loader, mod):
    xs_all, ys_all = [], []
    for xs, ys in loader:
        xs_all.append(np.asarray(xs[mod]))
        ys_all.append(np.asarray(ys[mod]))
    return np.concatenate(xs_all), np.concatenate(ys_all)


if __name__ == "__main__":
    main()
