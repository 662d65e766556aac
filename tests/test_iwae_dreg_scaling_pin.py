"""Pin the m_iwae / m_dreg lik-scaling unification as a verified claim.

The reference scales the reconstruction term differently in the two
K-sample multimodal bounds:

- ``_m_dreg`` multiplies by ``model.lik_scaling[d]``
  (/root/reference/src/bivae/objectives.py:100), an attribute every live
  per-dataset subclass sets in its constructor
  (e.g. mmvae/mmvae_mnist_svhn.py:53).
- ``_m_iwae`` multiplies by ``model.vaes[d].llik_scaling``
  (/root/reference/src/bivae/objectives.py:125,353). On the live path the
  ``vaes`` are my_pythae models, and NO class under
  ``/root/reference/src/bivae/my_pythae/`` defines ``llik_scaling``
  (grep: zero hits); only the legacy Shi base (models/vae.py:22) and
  ``models/old/`` subclasses carry it. Dispatching a live MMVAE config
  with obj=iwae would therefore raise AttributeError in the reference.

Our ``_m_lws`` (objectives/objectives.py) uses ``spec.lik_scaling`` for
both bounds. This test verifies that unification is exactly
reference-faithful for every config that can actually dispatch there:

1. every config in the corpus with obj in {iwae, dreg} uses ``dreg`` —
   the bound whose reference scaling IS lik_scaling[d]; and
2. for each such config the registry-built spec carries the same
   lik_scaling the reference subclass would compute, so the value the
   objective multiplies by is bit-identical.
"""

import glob
import json
import os

import pytest

from mmvae_tpu.core.config import ExperimentConfig
from mmvae_tpu.models import registry

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")

# reference per-subclass lik_scaling at llik_scaling==0 (the corpus value
# for every iwae/dreg config, asserted below):
R_MS = (3 * 32 * 32) / (1 * 28 * 28)
REF_LIK_SCALING = {
    # mmvae/mmvae_mnist_svhn.py:53
    "mnist_svhn": (R_MS, 1.0),
    # mmvae/mmvae_circles.py:59
    "circles_squares": (1.0, 1.0),
    # mmvae/mmvae_celeba.py:60: (1, prod(img)/prod(attr))
    "mmvae_celeba": (1.0, (3 * 64 * 64) / 40.0),
    # mmvae/medmnist.py mixin (modalities/medmnist.py:31): (3, 1)
    "mmvae_medmnist": (3.0, 1.0),
    # mmvae/mnist_svhn_fashion.py:52
    "mmvae_msf": (R_MS, 1.0, R_MS),
}


def _iwae_dreg_configs():
    out = []
    for f in sorted(glob.glob(os.path.join(CONFIG_ROOT, "**", "*.json"),
                              recursive=True)):
        cfg = json.load(open(f))
        if cfg.get("obj") in ("iwae", "dreg"):
            out.append((os.path.relpath(f, CONFIG_ROOT), cfg))
    return out


def test_corpus_has_iwae_dreg_configs():
    assert len(_iwae_dreg_configs()) >= 5  # corpus actually exercises this


def test_all_k_sample_configs_use_dreg():
    """No live config dispatches to m_iwae — matching the reference, where
    obj=iwae on a live model would hit the missing vaes[d].llik_scaling."""
    for rel, cfg in _iwae_dreg_configs():
        assert cfg["obj"] == "dreg", (
            f"{rel}: obj={cfg['obj']!r} would dispatch to m_iwae, whose "
            "reference scaling (vaes[d].llik_scaling) does not exist on "
            "live my_pythae models; the spec.lik_scaling unification is "
            "only verified for dreg")


@pytest.mark.parametrize("rel,cfg", _iwae_dreg_configs(),
                         ids=[r for r, _ in _iwae_dreg_configs()])
def test_dreg_configs_scale_by_reference_lik_scaling(rel, cfg):
    assert cfg.get("llik_scaling", 0) == 0, (
        f"{rel}: nonzero llik_scaling — extend REF_LIK_SCALING for the "
        "nonzero branch before trusting the unification for this config")
    model_name = cfg["model"]
    assert model_name in REF_LIK_SCALING, f"unknown dreg model {model_name}"
    bundle = registry.build(ExperimentConfig.from_dict(cfg))
    got = tuple(float(s) for s in bundle.spec.lik_scaling)
    want = REF_LIK_SCALING[model_name]
    assert got == pytest.approx(want), (rel, got, want)
