"""One real train step through every remaining model family/architecture in
the registry (ResNet MedMNIST, CelebA image+attrs, trimodal joint, MVAE
subset subsampling, DCCA two-step encoders, conv-MNIST with BN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.core.config import ExperimentConfig
from mmvae_tpu.models import registry
from mmvae_tpu.train import Trainer

SHAPES = {
    "jnf_medmnist": [(1, 28, 28), (3, 28, 28)],
    "mmvae_celeba": [(3, 64, 64), (1, 1, 40)],
    "moepoe_celeba": [(3, 64, 64), (1, 1, 40)],
    "jnf_chest_svhn": [(1, 28, 28), (3, 32, 32)],
    "jnf_msf": [(1, 28, 28), (3, 32, 32), (1, 28, 28)],
    "mvae_msf": [(1, 28, 28), (3, 32, 32), (1, 28, 28)],
    "jnf_mnist_svhn_dcca": [(1, 28, 28), (3, 32, 32)],
    "mnist_fashion": [(1, 28, 28), (1, 28, 28)],
}

OBJS = {
    "jnf_medmnist": ("jmvae_nf", {}),
    "mmvae_celeba": ("dreg", dict(looser=True, K=2, dist="laplace",
                                  recon_losses=("normal", "bernoulli"))),
    "moepoe_celeba": ("self_built", {}),
    "jnf_chest_svhn": ("jmvae_nf", {}),
    "jnf_msf": ("jmvae_nf", dict(recon_losses=("normal",) * 3)),
    "mvae_msf": ("self_built", dict(recon_losses=("normal",) * 3)),
    "jnf_mnist_svhn_dcca": ("jmvae_nf", dict(dcca=True, dim_dcca=4,
                                             no_recon=False)),
    "mnist_fashion": ("elbo", {}),
}


@pytest.mark.parametrize("model", list(SHAPES))
def test_registry_model_one_step(model):
    obj, extra = OBJS[model]
    cfg = ExperimentConfig(
        model=model, obj=obj, K=extra.pop("K", 1),
        looser=extra.pop("looser", False),
        dist=extra.pop("dist", "normal"),
        recon_losses=extra.pop("recon_losses", ("normal", "normal")),
        latent_dim=4, batch_size=4, warmup=0, no_nf=("jnf" not in model),
        flow="maf", **extra,
    )
    bundle = registry.build(cfg)
    rng = np.random.default_rng(0)
    xs = [rng.uniform(size=(4,) + s).astype(np.float32) for s in SHAPES[model]]
    trainer = Trainer(bundle.model, bundle.spec, cfg)
    key = jax.random.PRNGKey(0)
    variables = trainer.init_variables(xs, key)
    opt_state = trainer.init_opt_state(variables)
    step = trainer.train_step(past_warmup=True)
    variables, opt_state, loss, _ = step(
        variables, opt_state, [jnp.asarray(x) for x in xs], key,
        jnp.float32(1e-3), jnp.float32(1.0), jnp.float32(1.0))
    assert np.isfinite(float(loss)), (model, float(loss))
