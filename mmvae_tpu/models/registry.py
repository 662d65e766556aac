"""Model registry — config string -> built model + spec + dataset wiring.

Rebuild of models/__init__.py:2-57 (the 22 exported VAE_<name> aliases) plus
the per-dataset subclass wiring files (encoder choices, lik_scaling, joint
encoders, DCCA hookup). `build(cfg)` mirrors `getattr(models,
'VAE_'+args.model)(args)` at main.py:70-71.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.config import ExperimentConfig
from ..dcca.nets import (
    LCCAWrappedEncoder, dcca_encoders_celeba, dcca_encoders_circles,
    dcca_encoders_medmnist, dcca_encoders_mnist_svhn, dcca_encoders_msf,
    identity_lcca,
)
from ..flows import IAF, MAF
from ..nets import (
    DecoderMNIST, DecoderSVHN, DoubleHeadJoint, DoubleHeadMLP, EncoderMNIST,
    EncoderSVHN, MLPDecoder, MLPEncoder, MultipleHeadJoint, TwoStepsEncoder,
)
from ..nets.resnets import (
    celeba_decoder, celeba_encoder, medmnist_decoder, medmnist_encoder,
)
from ..objectives import ModelSpec
from .jmvae_nf import JMVAE_NF
from .mmvae import MMVAE
from .mmvae_nf import MMVAE_NF
from .moepoe import MOEPOE
from .mvae import MVAE
from .vae import UnimodalVAE


@dataclasses.dataclass
class ModelBundle:
    model: object                 # flax module
    spec: ModelSpec
    dataset: str                  # data.loaders.DATASETS key
    shape_mods: Tuple[Tuple[int, ...], ...]
    model_name: str
    classifier_keys: Tuple[str, ...] = ()


def _flow(cfg: ExperimentConfig, name: str):
    """Unimodal posterior flow per config (jmvae_nf_mnist_svhn_dcca.py:39-43,
    jmvae_nf_circles.py:51 n_made_blocks=2 default for MAF)."""
    if cfg.no_nf:
        return None
    if cfg.flow == "lin_nf":
        from ..flows import LinearNF

        return LinearNF(features=cfg.latent_dim, name=name)
    n_blocks = cfg.n_made_blocks if cfg.n_made_blocks is not None else 2
    flow_cls = IAF if cfg.flow == "iaf" else MAF
    return flow_cls(features=cfg.latent_dim, n_made_blocks=n_blocks,
                    s_bound=cfg.s_bound_flow, name=name)


def _vae(cfg, encoder, decoder, name, posterior=None, with_flow=False):
    return UnimodalVAE(
        encoder=encoder, decoder=decoder, latent_dim=cfg.latent_dim,
        flow=_flow(cfg, f"{name}_flow") if with_flow else None,
        posterior=posterior or ("laplace" if cfg.dist == "laplace" else "normal"),
        model_name=name,
    )


def _ms_lik_scaling(cfg) -> Tuple[float, float]:
    """((3*32*32)/(1*28*28), 1) unless overridden (mmvae_mnist_svhn.py:54)."""
    return ((3 * 32 * 32) / (1 * 28 * 28), 1.0) if cfg.llik_scaling == 0 else (cfg.llik_scaling, 1.0)


def _dcca_pair(cfg, builders, dim_first: int = 16, artifacts=None):
    """DCCA-wrapped frozen encoders (dcca/models/mnist_svhn.py:97-104).
    artifacts: optional (m_list, w_list) from a fitted LinearCCA — when
    given, the trunk outdim follows the artifact."""
    if artifacts is not None:
        dim_first = int(np.asarray(artifacts[0][0]).shape[0])
    encs = builders(dim_first)
    wrapped = []
    for i, enc in enumerate(encs):
        if artifacts is not None and i < len(artifacts[0]):
            m, w = artifacts[0][i], artifacts[1][i]
        else:
            # LCCA covers the first two views only; extra trimodal views
            # keep the raw trunk (main_mnist_svhn_fashion.py:99,180)
            m, w = identity_lcca(dim_first)
        wrapped.append(
            LCCAWrappedEncoder(encoder=enc, m=np.asarray(m), w=np.asarray(w),
                               latent_dim=cfg.dim_dcca,
                               name=f"first_encoder_{i}")
        )
    return wrapped


# ---------------------------------------------------------------------------
# MNIST-SVHN family
# ---------------------------------------------------------------------------

def mnist_svhn(cfg: ExperimentConfig) -> ModelBundle:
    """MMVAE on MNIST-SVHN (mmvae/mmvae_mnist_svhn.py:31-63): MLP enc/dec for
    MNIST, conv enc/dec for SVHN, Laplace or Normal posteriors."""
    vaes = [
        _vae(cfg, MLPEncoder(latent_dim=cfg.latent_dim),
             MLPDecoder(latent_dim=cfg.latent_dim, output_shape=(1, 28, 28)), "mnist"),
        _vae(cfg, EncoderSVHN(latent_dim=cfg.latent_dim),
             DecoderSVHN(latent_dim=cfg.latent_dim), "svhn"),
    ]
    model = MMVAE(vaes=vaes, posterior=cfg.dist)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses),
                     lik_scaling=_ms_lik_scaling(cfg))
    return ModelBundle(model, spec, "mnist_svhn", ((1, 28, 28), (3, 32, 32)),
                       "mmvae_mnist_svhn", ("mnist", "svhn"))


def _jnf_mnist_svhn(cfg: ExperimentConfig, use_dcca: bool, dcca_artifacts=None) -> ModelBundle:
    """JMVAE-NF(-DCCA) on MNIST-SVHN (jmvae_nf_mnist_svhn_dcca.py:38-101)."""
    joint = DoubleHeadJoint(
        encoders=[MLPEncoder(latent_dim=20), EncoderSVHN(latent_dim=20)],
        latent_dim=cfg.latent_dim, hidden_dim=512,
        num_hidden_layers=cfg.num_hidden_layers, name="joint_encoder",
    )
    dcca = _dcca_pair(cfg, dcca_encoders_mnist_svhn, 16, dcca_artifacts) if use_dcca else None
    if use_dcca:
        enc1 = TwoStepsEncoder(first_encoder=dcca[0], latent_dim=cfg.latent_dim)
        enc2 = TwoStepsEncoder(first_encoder=dcca[1], latent_dim=cfg.latent_dim)
    else:
        enc1 = MLPEncoder(latent_dim=cfg.latent_dim)
        enc2 = EncoderSVHN(latent_dim=cfg.latent_dim)
    vaes = [
        _vae(cfg, enc1, MLPDecoder(latent_dim=cfg.latent_dim, output_shape=(1, 28, 28)),
             "mnist", posterior="normal", with_flow=True),
        _vae(cfg, enc2, DecoderSVHN(latent_dim=cfg.latent_dim), "svhn",
             posterior="normal", with_flow=True),
    ]
    model = JMVAE_NF(joint_encoder=joint, vaes=vaes, posterior=cfg.dist,
                     dcca_encoders=dcca if (use_dcca and cfg.dcca) else None)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses),
                     lik_scaling=_ms_lik_scaling(cfg),
                     no_recon=cfg.no_recon, linear_warmup=cfg.linear_warmup)
    return ModelBundle(model, spec, "mnist_svhn", ((1, 28, 28), (3, 32, 32)),
                       "jmvae_nf_dcca_mnist_svhn" if use_dcca else "jmvae_nf_mnist_svhn",
                       ("mnist", "svhn"))


def _load_dcca_artifacts(cfg: ExperimentConfig, dataset: str):
    """Linear-CCA projection arrays from a dcca_train run, if present
    (load_dcca_* factories, dcca/models/mnist_svhn.py:97-104). The LCCA is
    fit on the first two views only (main_mnist_svhn_fashion.py:99)."""
    import os

    path = cfg.extra.get(
        "dcca_path", os.path.join("../experiments/dcca", dataset, "dcca.npz"))
    if not os.path.exists(path):
        return None, None
    npz = np.load(path)
    return ([npz["m0"], npz["m1"]], [npz["w0"], npz["w1"]]), path


def jnf_mnist_svhn_dcca(cfg: ExperimentConfig) -> ModelBundle:
    artifacts = None
    if cfg.dcca:
        artifacts, path = _load_dcca_artifacts(cfg, "mnist_svhn")
    return _jnf_mnist_svhn(cfg, use_dcca=cfg.dcca, dcca_artifacts=artifacts)


def graft_dcca_params(variables, dcca_npz_path: str, template_model):
    """Load the pretrained DCCA trunk params from a Solver artifact into
    every first_encoder_* site of a freshly-initialized variable tree
    (the reference loads model{1,2}.pt at model construction,
    dcca/models/mnist_svhn.py:55-58)."""
    from flax import serialization

    npz = np.load(dcca_npz_path)
    # rebuild solver param tree structure from bytes
    raw = npz["params"].tobytes()
    solver_vars = serialization.msgpack_restore(bytearray(raw))
    trunk_params = solver_vars.get("params", solver_vars)

    def graft(tree, mod_idx=None):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            # track which modality subtree we are in (vaes_{i} or
            # dcca_encoders_{i})
            idx = mod_idx
            for prefix in ("vaes_", "dcca_encoders_", "first_encoder_"):
                if k.startswith(prefix) and k[len(prefix):].isdigit():
                    idx = int(k[len(prefix):])
            if k.startswith("first_encoder") and isinstance(v, dict) and idx is not None:
                src = trunk_params.get(f"encoders_{idx}")
                if src is not None:
                    # the wrapped trunk is the single child of the
                    # LCCAWrappedEncoder scope (its `encoder` field)
                    out[k] = {tn: src for tn in v}
                    continue
            out[k] = graft(v, idx)
        return out

    out = dict(variables)
    out["params"] = graft(variables["params"])
    return out


def mvae_mnist_svhn(cfg: ExperimentConfig) -> ModelBundle:
    """MVAE (mvae/mnist_svhn.py): same nets as MMVAE, normal posteriors."""
    vaes = [
        _vae(cfg, MLPEncoder(latent_dim=cfg.latent_dim),
             MLPDecoder(latent_dim=cfg.latent_dim, output_shape=(1, 28, 28)),
             "mnist", posterior="normal"),
        _vae(cfg, EncoderSVHN(latent_dim=cfg.latent_dim),
             DecoderSVHN(latent_dim=cfg.latent_dim), "svhn", posterior="normal"),
    ]
    model = MVAE(vaes=vaes, lik_scaling=_ms_lik_scaling(cfg))
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior="normal",
                     recon_dists=tuple(cfg.recon_losses),
                     lik_scaling=_ms_lik_scaling(cfg))
    return ModelBundle(model, spec, "mnist_svhn", ((1, 28, 28), (3, 32, 32)),
                       "mvae_mnist_svhn", ("mnist", "svhn"))


def moepoe_mnist_svhn(cfg: ExperimentConfig) -> ModelBundle:
    vaes = [
        _vae(cfg, MLPEncoder(latent_dim=cfg.latent_dim),
             MLPDecoder(latent_dim=cfg.latent_dim, output_shape=(1, 28, 28)),
             "mnist", posterior="normal"),
        _vae(cfg, EncoderSVHN(latent_dim=cfg.latent_dim),
             DecoderSVHN(latent_dim=cfg.latent_dim), "svhn", posterior="normal"),
    ]
    # moepoe/mnist_svhn.py:52: same (3*32*32)/(28*28) scaling as MMVAE
    model = MOEPOE(vaes=vaes, lik_scaling=_ms_lik_scaling(cfg),
                   recon_dists=tuple(cfg.recon_losses), beta_kl=cfg.beta_kl)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior="normal",
                     recon_dists=tuple(cfg.recon_losses),
                     lik_scaling=_ms_lik_scaling(cfg))
    return ModelBundle(model, spec, "mnist_svhn", ((1, 28, 28), (3, 32, 32)),
                       "moepoe_mnist_svhn", ("mnist", "svhn"))


def mmvae_nf_mnist_svhn(cfg: ExperimentConfig) -> ModelBundle:
    """MMVAE-NF (mmvae_nf/mnist_svhn.py): flow VAEs, normal posteriors."""
    vaes = [
        _vae(cfg, MLPEncoder(latent_dim=cfg.latent_dim),
             MLPDecoder(latent_dim=cfg.latent_dim, output_shape=(1, 28, 28)),
             "mnist", posterior="normal", with_flow=True),
        _vae(cfg, EncoderSVHN(latent_dim=cfg.latent_dim),
             DecoderSVHN(latent_dim=cfg.latent_dim), "svhn",
             posterior="normal", with_flow=True),
    ]
    model = MMVAE_NF(vaes=vaes)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior="normal",
                     recon_dists=tuple(cfg.recon_losses),
                     lik_scaling=_ms_lik_scaling(cfg))
    return ModelBundle(model, spec, "mnist_svhn", ((1, 28, 28), (3, 32, 32)),
                       "mmvae_nf_mnist_svhn", ("mnist", "svhn"))


# ---------------------------------------------------------------------------
# circles-squares
# ---------------------------------------------------------------------------

def circles_squares(cfg: ExperimentConfig) -> ModelBundle:
    """MMVAE on circles-squares (mmvae/mmvae_circles.py). 1x32x32 conv
    enc/dec (SVHN-style single channel, correct 32x32 output)."""
    vaes = [
        _vae(cfg, EncoderSVHN(latent_dim=cfg.latent_dim, n_channels=1),
             DecoderSVHN(latent_dim=cfg.latent_dim, n_channels=1),
             "squares", posterior="normal"),
        _vae(cfg, EncoderSVHN(latent_dim=cfg.latent_dim, n_channels=1),
             DecoderSVHN(latent_dim=cfg.latent_dim, n_channels=1),
             "circles", posterior="normal"),
    ]
    model = MMVAE(vaes=vaes, posterior=cfg.dist)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses), lik_scaling=(1.0, 1.0))
    return ModelBundle(model, spec, "circles_squares", ((1, 32, 32), (1, 32, 32)),
                       "mmvae_circles", ("empty_full", "empty_full"))


def jnf_circles_squares(cfg: ExperimentConfig) -> ModelBundle:
    """JMVAE-NF on circles-squares (jmvae_nf_circles.py:40-70)."""
    joint = DoubleHeadMLP(latent_dim=cfg.latent_dim, hidden_dim=512,
                          num_hidden_layers=cfg.num_hidden_layers,
                          name="joint_encoder")
    dcca_artifacts = _load_dcca_artifacts(cfg, "circles_squares")[0] if cfg.dcca else None
    dcca = _dcca_pair(cfg, dcca_encoders_circles, 16, dcca_artifacts) if cfg.dcca else None
    if cfg.dcca:
        # the reference passes num_hidden=1 here but TwoStepsEncoder
        # IGNORES the argument and always builds 512-wide x3 hidden
        # (nn/encoders.py:183-184) — reproduce the executed architecture
        enc1 = TwoStepsEncoder(first_encoder=dcca[0], latent_dim=cfg.latent_dim)
        enc2 = TwoStepsEncoder(first_encoder=dcca[1], latent_dim=cfg.latent_dim)
    else:
        enc1 = EncoderSVHN(latent_dim=cfg.latent_dim, n_channels=1)
        enc2 = EncoderSVHN(latent_dim=cfg.latent_dim, n_channels=1)
    vaes = [
        _vae(cfg, enc1, DecoderSVHN(latent_dim=cfg.latent_dim, n_channels=1),
             "squares", posterior="normal", with_flow=True),
        _vae(cfg, enc2, DecoderSVHN(latent_dim=cfg.latent_dim, n_channels=1),
             "circles", posterior="normal", with_flow=True),
    ]
    model = JMVAE_NF(joint_encoder=joint, vaes=vaes, posterior=cfg.dist,
                     dcca_encoders=dcca if cfg.dcca else None)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses), lik_scaling=(1.0, 1.0),
                     no_recon=cfg.no_recon, linear_warmup=cfg.linear_warmup)
    return ModelBundle(model, spec, "circles_squares", ((1, 32, 32), (1, 32, 32)),
                       "jmvae_nf_circles", ("empty_full", "empty_full"))


# ---------------------------------------------------------------------------
# MNIST-Fashion
# ---------------------------------------------------------------------------

def mnist_fashion(cfg: ExperimentConfig) -> ModelBundle:
    """MMVAE on MNIST-Fashion (mmvae/mmave_mnist.py): conv MNIST nets."""
    vaes = [
        _vae(cfg, EncoderMNIST(latent_dim=cfg.latent_dim),
             DecoderMNIST(latent_dim=cfg.latent_dim), "mnist"),
        _vae(cfg, EncoderMNIST(latent_dim=cfg.latent_dim),
             DecoderMNIST(latent_dim=cfg.latent_dim), "fashion"),
    ]
    model = MMVAE(vaes=vaes, posterior=cfg.dist)
    # mmave_mnist.py:57: (1, 1) at llik_scaling==0, else (llik_scaling, 1)
    ls = (1.0, 1.0) if cfg.llik_scaling == 0 else (cfg.llik_scaling, 1.0)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses), lik_scaling=ls)
    return ModelBundle(model, spec, "mnist_fashion", ((1, 28, 28), (1, 28, 28)),
                       "mmvae_mnist_fashion", ("mnist", "fashion"))


def jnf_mnist_fashion(cfg: ExperimentConfig) -> ModelBundle:
    """JMVAE-NF on MNIST-Fashion (jmvae_nf_mnist.py:40-60): DoubleHeadMLP
    joint, conv MNIST vaes."""
    joint = DoubleHeadMLP(latent_dim=cfg.latent_dim, hidden_dim=512,
                          num_hidden_layers=1, name="joint_encoder")
    vaes = [
        _vae(cfg, EncoderMNIST(latent_dim=cfg.latent_dim),
             DecoderMNIST(latent_dim=cfg.latent_dim), "mnist",
             posterior="normal", with_flow=True),
        _vae(cfg, EncoderMNIST(latent_dim=cfg.latent_dim),
             DecoderMNIST(latent_dim=cfg.latent_dim), "fashion",
             posterior="normal", with_flow=True),
    ]
    model = JMVAE_NF(joint_encoder=joint, vaes=vaes, posterior=cfg.dist)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses), lik_scaling=(1.0, 1.0),
                     no_recon=cfg.no_recon, linear_warmup=cfg.linear_warmup)
    return ModelBundle(model, spec, "mnist_fashion", ((1, 28, 28), (1, 28, 28)),
                       "jmvae_nf_mnist_fashion", ("mnist", "fashion"))


# ---------------------------------------------------------------------------
# Trimodal MNIST-SVHN-Fashion
# ---------------------------------------------------------------------------

def _msf_vaes(cfg, posterior=None, with_flow=False, encoders=None):
    if encoders is None:
        encoders = [MLPEncoder(latent_dim=cfg.latent_dim),
                    EncoderSVHN(latent_dim=cfg.latent_dim),
                    MLPEncoder(latent_dim=cfg.latent_dim)]
    return [
        _vae(cfg, encoders[0],
             MLPDecoder(latent_dim=cfg.latent_dim, output_shape=(1, 28, 28)),
             "mnist", posterior=posterior, with_flow=with_flow),
        _vae(cfg, encoders[1],
             DecoderSVHN(latent_dim=cfg.latent_dim), "svhn",
             posterior=posterior, with_flow=with_flow),
        _vae(cfg, encoders[2],
             MLPDecoder(latent_dim=cfg.latent_dim, output_shape=(1, 28, 28)),
             "fashion", posterior=posterior, with_flow=with_flow),
    ]


def _msf_scaling(cfg, family: str = "mvae"):
    """Trimodal lik scalings differ per family in the reference:
    mvae/msf.py:56   -> (r, 1, r) at llik==0, (llik, 1, llik) otherwise;
    mmvae/mnist_svhn_fashion.py:52 -> (r, 1, r) at llik==0, (1, 1, 1) otherwise
    with r = (3*32*32)/(28*28)."""
    r = (3 * 32 * 32) / (28 * 28)
    if cfg.llik_scaling == 0:
        return (r, 1.0, r)
    if family == "mmvae":
        return (1.0, 1.0, 1.0)
    return (cfg.llik_scaling, 1.0, cfg.llik_scaling)


def mmvae_msf(cfg: ExperimentConfig) -> ModelBundle:
    model = MMVAE(vaes=_msf_vaes(cfg), posterior=cfg.dist)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses) if len(cfg.recon_losses) == 3
                     else ("normal",) * 3,
                     lik_scaling=_msf_scaling(cfg, "mmvae"))
    return ModelBundle(model, spec, "mnist_svhn_fashion",
                       ((1, 28, 28), (3, 32, 32), (1, 28, 28)),
                       "mmvae_msf", ("mnist", "svhn", "fashion"))


def jnf_msf(cfg: ExperimentConfig) -> ModelBundle:
    """Trimodal JMVAE-NF (jmvae_nf/mnist_svhn_fashion.py:50-53):
    MultipleHeadJoint over three conv/MLP heads."""
    joint = MultipleHeadJoint(
        encoders=[MLPEncoder(latent_dim=20), EncoderSVHN(latent_dim=20),
                  MLPEncoder(latent_dim=20)],
        latent_dim=cfg.latent_dim, hidden_dim=512,
        num_hidden_layers=cfg.num_hidden_layers, name="joint_encoder",
    )
    dcca, encoders = None, None
    if cfg.dcca:
        # Trimodal DCCA (jmvae_nf/mnist_svhn_fashion.py:59-66): raw mcca
        # trunks — NO LCCA applied for msf (apply_linear_cca=False,
        # main_mnist_svhn_fashion.py:180) — under TwoStepsEncoders x3
        dcca = _dcca_pair(cfg, dcca_encoders_msf, 16, None)
        encoders = [TwoStepsEncoder(first_encoder=d, latent_dim=cfg.latent_dim)
                    for d in dcca]
    model = JMVAE_NF(joint_encoder=joint,
                     vaes=_msf_vaes(cfg, "normal", True, encoders),
                     posterior=cfg.dist, dcca_encoders=dcca)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses) if len(cfg.recon_losses) == 3
                     else ("normal",) * 3,
                     # jmvae_nf/mnist_svhn_fashion.py:88: always (1, 1, 1)
                     lik_scaling=(1.0, 1.0, 1.0),
                     no_recon=cfg.no_recon, linear_warmup=cfg.linear_warmup)
    return ModelBundle(model, spec, "mnist_svhn_fashion",
                       ((1, 28, 28), (3, 32, 32), (1, 28, 28)),
                       "jmvae_nf_msf", ("mnist", "svhn", "fashion"))


def mvae_msf(cfg: ExperimentConfig) -> ModelBundle:
    """Trimodal MVAE with subset subsampling (mvae/msf.py)."""
    model = MVAE(vaes=_msf_vaes(cfg, "normal"), lik_scaling=_msf_scaling(cfg),
                 subsampling=True, k_subsample=1)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior="normal",
                     recon_dists=("normal",) * 3, lik_scaling=_msf_scaling(cfg))
    return ModelBundle(model, spec, "mnist_svhn_fashion",
                       ((1, 28, 28), (3, 32, 32), (1, 28, 28)),
                       "mvae_msf", ("mnist", "svhn", "fashion"))


# ---------------------------------------------------------------------------
# MedMNIST (pneumonia <-> blood)
# ---------------------------------------------------------------------------

def _medmnist_vaes(cfg, posterior=None, with_flow=False, encoders=None):
    if encoders is None:
        encoders = [medmnist_encoder(cfg.latent_dim, 1),
                    medmnist_encoder(cfg.latent_dim, 3)]
    return [
        _vae(cfg, encoders[0],
             medmnist_decoder(cfg.latent_dim, 1), "pneumonia",
             posterior=posterior, with_flow=with_flow),
        _vae(cfg, encoders[1],
             medmnist_decoder(cfg.latent_dim, 3), "blood",
             posterior=posterior, with_flow=with_flow),
    ]


def _medmnist_scaling(cfg):
    """modalities/medmnist.py:31: (3, 1) at llik_scaling==0, else (1, 1).
    Survives only for mmvae/mvae; the jnf family's JMVAE_NF.__init__ runs
    after medmnist_utils.__init__ and overwrites it with (1, 1)."""
    return (3.0, 1.0) if cfg.llik_scaling == 0 else (1.0, 1.0)


def mmvae_medmnist(cfg: ExperimentConfig) -> ModelBundle:
    model = MMVAE(vaes=_medmnist_vaes(cfg), posterior=cfg.dist)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses),
                     lik_scaling=_medmnist_scaling(cfg))
    return ModelBundle(model, spec, "medmnist", ((1, 28, 28), (3, 28, 28)),
                       "mmvae_medmnist", ("pneumonia", "blood"))


def jnf_medmnist(cfg: ExperimentConfig) -> ModelBundle:
    joint = DoubleHeadJoint(
        encoders=[medmnist_encoder(20, 1), medmnist_encoder(20, 3)],
        latent_dim=cfg.latent_dim, hidden_dim=512,
        num_hidden_layers=cfg.num_hidden_layers, name="joint_encoder",
    )
    dcca, encoders = None, None
    if cfg.dcca:
        # JMVAE-NF-DCCA medmnist (modalities/medmnist.py:48-56): DCCA
        # trunks (medmnist ResNets, dcca/models/medmnist.py:16-21) under
        # TwoStepsEncoders
        artifacts = _load_dcca_artifacts(cfg, "medmnist")[0]
        dcca = _dcca_pair(cfg, dcca_encoders_medmnist, 16, artifacts)
        encoders = [TwoStepsEncoder(first_encoder=d, latent_dim=cfg.latent_dim)
                    for d in dcca]
    model = JMVAE_NF(joint_encoder=joint,
                     vaes=_medmnist_vaes(cfg, "normal", True, encoders),
                     posterior=cfg.dist, dcca_encoders=dcca)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses),
                     # medmnist_utils sets (3,1) but JMVAE_NF.__init__ runs
                     # AFTER it and overwrites to (1,1) (jmvae_nf.py:29,
                     # jmvae_nf/medmnist.py:37-40) — the executed value is
                     # (1,1); only mmvae/mvae keep the utils scaling.
                     lik_scaling=(1.0, 1.0),
                     no_recon=cfg.no_recon, linear_warmup=cfg.linear_warmup)
    return ModelBundle(model, spec, "medmnist", ((1, 28, 28), (3, 28, 28)),
                       "jmvae_nf_medmnist", ("pneumonia", "blood"))


def mvae_medmnist(cfg: ExperimentConfig) -> ModelBundle:
    model = MVAE(vaes=_medmnist_vaes(cfg, "normal"),
                 lik_scaling=_medmnist_scaling(cfg))
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior="normal",
                     recon_dists=tuple(cfg.recon_losses),
                     lik_scaling=_medmnist_scaling(cfg))
    return ModelBundle(model, spec, "medmnist", ((1, 28, 28), (3, 28, 28)),
                       "mvae_medmnist", ("pneumonia", "blood"))


# ---------------------------------------------------------------------------
# CelebA (image <-> 40 binary attributes)
# ---------------------------------------------------------------------------

def _celeba_vaes(cfg, posterior=None, with_flow=False, encoders=None):
    """Image modality: ResNet enc/dec (jmvae_nf/celeba.py:23 pythae nets);
    attribute modality: MLP over the 1x1x40 attribute tensor
    (datasets.py:419). encoders overrides (DCCA TwoStepsEncoders)."""
    if encoders is None:
        encoders = [celeba_encoder(cfg.latent_dim),
                    MLPEncoder(latent_dim=cfg.latent_dim)]
    return [
        _vae(cfg, encoders[0], celeba_decoder(cfg.latent_dim),
             "celeb", posterior=posterior, with_flow=with_flow),
        _vae(cfg, encoders[1],
             MLPDecoder(latent_dim=cfg.latent_dim, output_shape=(1, 1, 40)),
             "attributes", posterior=posterior, with_flow=with_flow),
    ]


CELEBA_SHAPES = ((3, 64, 64), (1, 1, 40))
_CELEBA_R = (3 * 64 * 64) / 40.0  # prod(img shape) / prod(attr shape)


def mmvae_celeba(cfg: ExperimentConfig) -> ModelBundle:
    model = MMVAE(vaes=_celeba_vaes(cfg), posterior=cfg.dist)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses),
                     # mmvae_celeba.py:60: (1, prod(img)/prod(attr)) at
                     # llik==0 — the ATTRIBUTE recon is up-weighted
                     lik_scaling=(1.0, _CELEBA_R) if cfg.llik_scaling == 0
                     else (cfg.llik_scaling, 1.0))
    return ModelBundle(model, spec, "celeba", CELEBA_SHAPES,
                       "mmvae_celeba", ("celeba_img", "celeba_attr"))


def jnf_celeba(cfg: ExperimentConfig) -> ModelBundle:
    # jmvae_nf/celeba.py:62-64: hidden_dim 1024, 128-dim ResNet image head,
    # 40-dim MLP attribute head
    joint = DoubleHeadJoint(
        encoders=[celeba_encoder(128), MLPEncoder(latent_dim=40)],
        latent_dim=cfg.latent_dim, hidden_dim=1024,
        num_hidden_layers=cfg.num_hidden_layers, name="joint_encoder",
    )
    dcca, encoders = None, None
    if cfg.dcca:
        # JMVAE-NF-DCCA celeba (jmvae_nf/celeba.py:74-85): DCCA trunks
        # (ResNet image / MLP attrs, dcca/models/celeba.py) under
        # TwoStepsEncoders; LCCA wrapper latent 40 (celeba.py:50)
        artifacts = _load_dcca_artifacts(cfg, "celeba")[0]
        dcca = _dcca_pair(cfg, dcca_encoders_celeba, 40, artifacts)
        encoders = [TwoStepsEncoder(first_encoder=d, latent_dim=cfg.latent_dim)
                    for d in dcca]
    model = JMVAE_NF(joint_encoder=joint,
                     vaes=_celeba_vaes(cfg, "normal", True, encoders),
                     posterior=cfg.dist, dcca_encoders=dcca)
    # jmvae_nf/celeba.py:101: (prod(attr)/prod(img), 1) at llik==0
    ls = (1.0 / _CELEBA_R, 1.0) if cfg.llik_scaling == 0 \
        else (cfg.llik_scaling, 1.0)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses), lik_scaling=ls,
                     no_recon=cfg.no_recon, linear_warmup=cfg.linear_warmup)
    return ModelBundle(model, spec, "celeba", CELEBA_SHAPES,
                       "jmvae_nf_celeba", ("celeba_img", "celeba_attr"))


def mvae_celeba(cfg: ExperimentConfig) -> ModelBundle:
    # mvae/celeba.py:47: (1, 50) — "settings mentioned in the paper"
    ls = (1.0, 50.0) if cfg.llik_scaling == 0 else (1.0, cfg.llik_scaling)
    model = MVAE(vaes=_celeba_vaes(cfg, "normal"), lik_scaling=ls)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior="normal",
                     recon_dists=tuple(cfg.recon_losses), lik_scaling=ls)
    return ModelBundle(model, spec, "celeba", CELEBA_SHAPES,
                       "mvae_celeba", ("celeba_img", "celeba_attr"))


def moepoe_celeba(cfg: ExperimentConfig) -> ModelBundle:
    # moepoe/celeba.py:60: (prod(attr)/prod(img), 1) at llik==0
    ls = (1.0 / _CELEBA_R, 1.0) if cfg.llik_scaling == 0 \
        else (1.0, cfg.llik_scaling)
    model = MOEPOE(vaes=_celeba_vaes(cfg, "normal"), lik_scaling=ls,
                   recon_dists=tuple(cfg.recon_losses), beta_kl=cfg.beta_kl)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior="normal",
                     recon_dists=tuple(cfg.recon_losses), lik_scaling=ls)
    return ModelBundle(model, spec, "celeba", CELEBA_SHAPES,
                       "moepoe_celeba", ("celeba_img", "celeba_attr"))


def mmvae_nf_celeba(cfg: ExperimentConfig) -> ModelBundle:
    model = MMVAE_NF(vaes=_celeba_vaes(cfg, "normal", True))
    # mmvae_nf/celeba.py:59: (1, prod(img)/prod(attr)) at llik==0
    ls = (1.0, _CELEBA_R) if cfg.llik_scaling == 0 else (1.0, cfg.llik_scaling)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior="normal",
                     recon_dists=tuple(cfg.recon_losses), lik_scaling=ls)
    return ModelBundle(model, spec, "celeba", CELEBA_SHAPES,
                       "mmvae_nf_celeba", ("celeba_img", "celeba_attr"))


# ---------------------------------------------------------------------------
# chest-SVHN, mnist-contour
# ---------------------------------------------------------------------------

def jnf_chest_svhn(cfg: ExperimentConfig) -> ModelBundle:
    """jmvae_nf/chest_svhn.py: medmnist ResNet for chest-xray, conv for SVHN."""
    joint = DoubleHeadJoint(
        encoders=[medmnist_encoder(20, 1), EncoderSVHN(latent_dim=20)],
        latent_dim=cfg.latent_dim, hidden_dim=512,
        num_hidden_layers=cfg.num_hidden_layers, name="joint_encoder",
    )
    vaes = [
        _vae(cfg, medmnist_encoder(cfg.latent_dim, 1),
             medmnist_decoder(cfg.latent_dim, 1), "chest",
             posterior="normal", with_flow=True),
        _vae(cfg, EncoderSVHN(latent_dim=cfg.latent_dim),
             DecoderSVHN(latent_dim=cfg.latent_dim), "svhn",
             posterior="normal", with_flow=True),
    ]
    model = JMVAE_NF(joint_encoder=joint, vaes=vaes, posterior=cfg.dist)
    # chest_svhn_utils sets (3*32*32/(28*28), 1) but JMVAE_NF.__init__ runs
    # AFTER it and overwrites to (1,1) (jmvae_nf.py:29, chest_svhn.py:41-44)
    # — the executed value is (1,1).
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses), lik_scaling=(1.0, 1.0),
                     no_recon=cfg.no_recon, linear_warmup=cfg.linear_warmup)
    return ModelBundle(model, spec, "chest_svhn", ((1, 28, 28), (3, 32, 32)),
                       "jmvae_nf_chest_svhn", ("pneumonia", "svhn"))


def jnf_mnist_contour(cfg: ExperimentConfig) -> ModelBundle:
    """jmvae_nf/mnist_contour.py: MNIST image <-> Canny contour pairs."""
    joint = DoubleHeadMLP(latent_dim=cfg.latent_dim, hidden_dim=512,
                          num_hidden_layers=cfg.num_hidden_layers,
                          name="joint_encoder")
    vaes = [
        _vae(cfg, EncoderMNIST(latent_dim=cfg.latent_dim),
             DecoderMNIST(latent_dim=cfg.latent_dim), "mnist",
             posterior="normal", with_flow=True),
        _vae(cfg, EncoderMNIST(latent_dim=cfg.latent_dim),
             DecoderMNIST(latent_dim=cfg.latent_dim), "contour",
             posterior="normal", with_flow=True),
    ]
    model = JMVAE_NF(joint_encoder=joint, vaes=vaes, posterior=cfg.dist)
    spec = ModelSpec(latent_dim=cfg.latent_dim, posterior=cfg.dist,
                     recon_dists=tuple(cfg.recon_losses), lik_scaling=(1.0, 1.0),
                     no_recon=cfg.no_recon, linear_warmup=cfg.linear_warmup)
    return ModelBundle(model, spec, "mnist_contour", ((1, 28, 28), (1, 28, 28)),
                       "jmvae_nf_mnist_contour", ("mnist", "mnist"))


# ---------------------------------------------------------------------------
# registry (models/__init__.py:2-57)
# ---------------------------------------------------------------------------

REGISTRY: Dict[str, Callable[[ExperimentConfig], ModelBundle]] = {
    "mnist_svhn": mnist_svhn,
    "circles_squares": circles_squares,
    "jnf_circles_squares": jnf_circles_squares,
    "jnf_mnist_fashion": jnf_mnist_fashion,
    "mnist_fashion": mnist_fashion,
    "jnf_mnist_svhn_dcca": jnf_mnist_svhn_dcca,
    "jnf_mnist_contour": jnf_mnist_contour,
    "jnf_celeba": jnf_celeba,
    "mmvae_celeba": mmvae_celeba,
    "mmvae_nf_mnist_svhn": mmvae_nf_mnist_svhn,
    "mvae_mnist_svhn": mvae_mnist_svhn,
    "moepoe_mnist_svhn": moepoe_mnist_svhn,
    "mvae_celeba": mvae_celeba,
    "moepoe_celeba": moepoe_celeba,
    "mmvae_nf_celeba": mmvae_nf_celeba,
    "jnf_msf": jnf_msf,
    "mmvae_msf": mmvae_msf,
    "mvae_msf": mvae_msf,
    "jnf_medmnist": jnf_medmnist,
    "mmvae_medmnist": mmvae_medmnist,
    "mvae_medmnist": mvae_medmnist,
    "jnf_chest_svhn": jnf_chest_svhn,
}


def build(cfg: ExperimentConfig) -> ModelBundle:
    """getattr(models, 'VAE_'+args.model)(args) equivalent (main.py:70-71)."""
    return REGISTRY[cfg.model](cfg)
