"""Pin every registry model's lik_scaling to the reference's EXECUTED value.

The reference sets lik_scaling in per-dataset subclass constructors; the
executed value depends on __init__ ordering quirks:

- JMVAE_NF.__init__ (jmvae_nf.py:29) sets (1,1) — subclasses that assign
  AFTER super() (celeba.py:101, jmvae_nf_mnist_svhn_dcca.py:93,
  mnist_svhn_fashion.py:88) keep their own value; subclasses that rely on a
  *_utils mixin assigned BEFORE super() (medmnist.py:37-40,
  chest_svhn.py:41-44) get overwritten back to (1,1).
- MMVAE/MVAE/MOEPOE bases never assign, so the mixin/subclass value
  survives there (mmvae/medmnist.py:37-40, mvae/medmnist.py:37-40).

Values below are transcribed from each wiring file (cited per row); the
nonzero-llik branch differs per family and is pinned too.
"""

import pytest

from mmvae_tpu.core.config import ExperimentConfig
from mmvae_tpu.models import registry

R_MS = (3 * 32 * 32) / (1 * 28 * 28)       # svhn/mnist pixel ratio
R_CELEBA = (3 * 64 * 64) / 40.0            # img/attr element ratio
L = 2.5                                    # arbitrary nonzero llik_scaling

# alias -> (expected at llik_scaling=0, expected at llik_scaling=L)
EXPECTED = {
    # mmvae/mmvae_mnist_svhn.py:53
    "mnist_svhn": ((R_MS, 1.0), (L, 1.0)),
    # mmvae/mmvae_circles.py:59 — unconditionally (1,1)
    "circles_squares": ((1.0, 1.0), (1.0, 1.0)),
    # jmvae_nf/jmvae_nf_circles.py inherits jmvae_nf.py:29
    "jnf_circles_squares": ((1.0, 1.0), (1.0, 1.0)),
    # jmvae_nf/jmvae_nf_mnist.py inherits jmvae_nf.py:29
    "jnf_mnist_fashion": ((1.0, 1.0), (1.0, 1.0)),
    # mmvae/mmave_mnist.py:57
    "mnist_fashion": ((1.0, 1.0), (L, 1.0)),
    # jmvae_nf/jmvae_nf_mnist_svhn_dcca.py:93 (assigned after super)
    "jnf_mnist_svhn_dcca": ((R_MS, 1.0), (L, 1.0)),
    # jmvae_nf/mnist_contour.py inherits jmvae_nf.py:29
    "jnf_mnist_contour": ((1.0, 1.0), (1.0, 1.0)),
    # jmvae_nf/celeba.py:101 (assigned after super)
    "jnf_celeba": ((1.0 / R_CELEBA, 1.0), (L, 1.0)),
    # mmvae/mmvae_celeba.py:60
    "mmvae_celeba": ((1.0, R_CELEBA), (L, 1.0)),
    # mmvae_nf/mnist_svhn.py:66
    "mmvae_nf_mnist_svhn": ((R_MS, 1.0), (L, 1.0)),
    # mvae/mnist_svhn.py:45
    "mvae_mnist_svhn": ((R_MS, 1.0), (L, 1.0)),
    # moepoe/mnist_svhn.py:52
    "moepoe_mnist_svhn": ((R_MS, 1.0), (L, 1.0)),
    # mvae/celeba.py:47 — "settings mentioned in the paper"
    "mvae_celeba": ((1.0, 50.0), (1.0, L)),
    # moepoe/celeba.py:60
    "moepoe_celeba": ((1.0 / R_CELEBA, 1.0), (1.0, L)),
    # mmvae_nf/celeba.py:59
    "mmvae_nf_celeba": ((1.0, R_CELEBA), (1.0, L)),
    # jmvae_nf/mnist_svhn_fashion.py:88 — unconditionally (1,1,1)
    "jnf_msf": ((1.0, 1.0, 1.0), (1.0, 1.0, 1.0)),
    # mmvae/mnist_svhn_fashion.py:52 — nonzero branch is (1,1,1)
    "mmvae_msf": ((R_MS, 1.0, R_MS), (1.0, 1.0, 1.0)),
    # mvae/msf.py:56
    "mvae_msf": ((R_MS, 1.0, R_MS), (L, 1.0, L)),
    # medmnist_utils (3,1) overwritten by JMVAE_NF.__init__ -> (1,1)
    "jnf_medmnist": ((1.0, 1.0), (1.0, 1.0)),
    # modalities/medmnist.py:31 survives under MMVAE/MVAE
    "mmvae_medmnist": ((3.0, 1.0), (1.0, 1.0)),
    "mvae_medmnist": ((3.0, 1.0), (1.0, 1.0)),
    # chest_svhn_utils (r,1) overwritten by JMVAE_NF.__init__ -> (1,1)
    "jnf_chest_svhn": ((1.0, 1.0), (1.0, 1.0)),
}


def _cfg(model: str, llik: float) -> ExperimentConfig:
    trimodal = model.endswith("msf")
    return ExperimentConfig(
        model=model, obj="elbo", K=1, latent_dim=4, batch_size=4, warmup=0,
        llik_scaling=llik, no_nf=("jnf" not in model), flow="maf", dcca=False,
        recon_losses=("normal",) * (3 if trimodal else 2),
    )


def test_registry_covers_expected():
    assert set(EXPECTED) == set(registry.REGISTRY)


@pytest.mark.parametrize("model", sorted(EXPECTED))
def test_lik_scaling_pins(model):
    want_zero, want_l = EXPECTED[model]
    got_zero = registry.build(_cfg(model, 0.0)).spec.lik_scaling
    got_l = registry.build(_cfg(model, L)).spec.lik_scaling
    assert tuple(got_zero) == pytest.approx(want_zero), (model, got_zero)
    assert tuple(got_l) == pytest.approx(want_l), (model, got_l)
