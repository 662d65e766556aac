"""Per-dataset metric glue — rebuilds of models/modalities/*.py.

- CelebA: 40-attribute bitwise cross-coherence + attribute-agreement joint
  coherence (modalities/celeba.py:17-123), attribute-vector text rendering
  for sample grids (celeba.py:128-157).
- Trimodal: PoE-subset conditional accuracy (trimodal.py:115-154) and PoE
  sample grids; subset conditional likelihoods live in eval/likelihoods.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .generation import generate, sample_from_conditional


# ---------------------------------------------------------------------------
# CelebA (modalities/celeba.py)
# ---------------------------------------------------------------------------

def celeba_attribute_metrics(model, variables, classifiers, data, classes_attrs,
                             key, spec, n_data: int = 100, ns: int = 30) -> Dict:
    """Bitwise attribute accuracy of cross-modal generations + joint
    coherence as attribute agreement (celeba.py:43-63)."""
    n_data = min(n_data, len(data[0]))
    bdata = [d[:n_data] for d in data]
    k1, k2 = jax.random.split(key)
    samples = sample_from_conditional(model, variables, bdata, k1, n=ns)
    true = jnp.asarray(classes_attrs[:n_data])  # (n_data, 40)
    true_mul = jnp.broadcast_to(true[:, None, :], (n_data, ns, true.shape[-1]))

    # attr predictions of image generations conditioned on attributes, and
    # vice versa; classifiers emit 40 attr logits
    metrics = {}
    for (i, j, name) in [(0, 1, "accuracy2"), (1, 0, "accuracy1")]:
        recon = samples[i][j]  # (ns, n_data, *event_j)
        flat = recon.reshape(ns * n_data, *recon.shape[2:])
        preds = (classifiers[j](flat) > 0).astype(jnp.int32)
        preds = preds.reshape(ns, n_data, -1).transpose(1, 0, 2)
        metrics[name] = float(jnp.mean(preds == true_mul))

    gen = generate(model, variables, k2, spec, N=ns * n_data)
    lab_img = classifiers[0](gen[0]) > 0
    lab_attr = classifiers[1](gen[1]) > 0
    metrics["joint_coherence"] = float(jnp.mean(lab_img == lab_attr))
    return metrics


CELEBA_ATTRS = [
    "5_o_Clock_Shadow", "Arched_Eyebrows", "Attractive", "Bags_Under_Eyes",
    "Bald", "Bangs", "Big_Lips", "Big_Nose", "Black_Hair", "Blond_Hair",
    "Blurry", "Brown_Hair", "Bushy_Eyebrows", "Chubby", "Double_Chin",
    "Eyeglasses", "Goatee", "Gray_Hair", "Heavy_Makeup", "High_Cheekbones",
    "Male", "Mouth_Slightly_Open", "Mustache", "Narrow_Eyes", "No_Beard",
    "Oval_Face", "Pale_Skin", "Pointy_Nose", "Receding_Hairline",
    "Rosy_Cheeks", "Sideburns", "Smiling", "Straight_Hair", "Wavy_Hair",
    "Wearing_Earrings", "Wearing_Hat", "Wearing_Lipstick",
    "Wearing_Necklace", "Wearing_Necktie", "Young",
]


def attributes_to_image(attrs: np.ndarray, size=(64, 64)) -> np.ndarray:
    """Render an attribute vector as a text image for sample grids
    (celeba.py:128-157). Returns (N, 3, H, W) float."""
    from PIL import Image, ImageDraw

    attrs = np.asarray(attrs).reshape(len(attrs), -1)
    out = np.zeros((len(attrs), 3) + size, dtype=np.float32)
    for i, a in enumerate(attrs):
        img = Image.new("RGB", size[::-1], "white")
        draw = ImageDraw.Draw(img)
        active = [CELEBA_ATTRS[k] for k in np.where(a > 0.5)[0][:6]]
        for row, name in enumerate(active):
            draw.text((1, 1 + row * 10), name[:12], fill="black")
        out[i] = np.transpose(np.asarray(img, np.float32) / 255.0, (2, 0, 1))
    return out


# ---------------------------------------------------------------------------
# Trimodal (modalities/trimodal.py)
# ---------------------------------------------------------------------------

def poe_subset_accuracy(model, variables, classifiers, data, classes, key, spec,
                        n_data: int = 100, ns: int = 100,
                        mcmc_steps: int = 100) -> Dict:
    """Condition on each 2-subset via PoE (HMC for flow posteriors, analytic
    for MVAE), generate the held-out modality, classify
    (trimodal.py:115-154)."""
    from ..models.mvae import MVAE
    from .hmc import sample_from_poe_subset

    n_data = min(n_data, len(data[0]))
    bdata = [jnp.asarray(d[:n_data]) for d in data]
    true = jnp.concatenate([jnp.asarray(classes[0][:n_data])] * ns)
    subsets = [[1, 2], [0, 2], [0, 1]]
    metrics = {}
    for s, gen_mod in zip(subsets, range(3)):
        k = jax.random.fold_in(key, gen_mod)
        if isinstance(model, MVAE):
            mu, std = model.apply(variables, s, bdata, method="poe_subset_params")
            from ..core import distributions as D
            from ..core.distributions import LocScale

            zs = D.normal_sample(
                LocScale(mu, std), k, (ns,))
        else:
            zs, acc_rate = sample_from_poe_subset(
                model, variables, s, bdata, k, mcmc_steps=mcmc_steps, K=ns,
                return_acceptance=True)
            # reference records per-step HMC acceptance (jmvae_nf.py:435);
            # chain-health diagnostic justifying the step budget
            metrics[f"hmc_acc_rate_{gen_mod}"] = float(acc_rate)
        flat = zs.reshape(ns * n_data, -1)
        recon = model.apply(variables, flat, method="decode_all")[gen_mod]
        preds = jnp.argmax(classifiers[gen_mod](recon), axis=1)
        metrics[f"cond_acc_{gen_mod}"] = float(jnp.mean(preds == true))
    return metrics
