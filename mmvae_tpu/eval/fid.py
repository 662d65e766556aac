"""FID — Fréchet Inception Distance (analysis/pytorch_fid/ rebuild).

Components:
- calculate_frechet_distance: numpy/scipy (fid_score.py:148-200)
- preprocessing: bilinear resize to 299x299 + zero-channel padding for
  1-channel inputs (utils.py:315-320 add_channels; modalities/mnist_svhn.py:17)
- InceptionV3FID: the pytorch-fid InceptionV3 variant in flax (FID-specific
  InceptionA/C/E pooling quirks included), with a torch-state-dict weight
  converter (`load_torch_inception_weights`) for the published FID weights
  (inception.py:13 URL — zero-egress here, so the file must be provided
  locally); without weights the architecture still runs (random features)
  and `cross_modal_fid` also accepts any custom encoder
  (analysis/Quality_assess.py pattern).
- cross_modal_fid: per-direction conditional FID (modalities/mnist_svhn.py:13-66)
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# Fréchet distance (fid_score.py:148-200)
# ---------------------------------------------------------------------------

def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    import scipy.linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    tr_covmean = np.trace(covmean)
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)


def activation_statistics(acts: np.ndarray):
    return np.mean(acts, axis=0), np.cov(acts, rowvar=False)


# ---------------------------------------------------------------------------
# preprocessing
# ---------------------------------------------------------------------------

def fid_preprocess(x: jax.Array) -> jax.Array:
    """Resize NCHW to 299x299 bilinear + pad 1-channel inputs with zero
    channels (transforms at modalities/mnist_svhn.py:17, utils.py:315-320)."""
    n, c = x.shape[0], x.shape[1]
    y = jax.image.resize(x, (n, c, 299, 299), method="bilinear")
    if c == 1:
        y = jnp.concatenate([y, jnp.zeros_like(y), jnp.zeros_like(y)], axis=1)
    return y


# ---------------------------------------------------------------------------
# InceptionV3 (pytorch-fid variant) in flax
# ---------------------------------------------------------------------------

class BasicConv2d(nn.Module):
    features: int
    kernel_size: tuple
    stride: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        ph, pw = self.padding
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.features, x.shape[1], kh, kw), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, kernel, (self.stride, self.stride), ((ph, ph), (pw, pw)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        bn = nn.BatchNorm(use_running_average=True, epsilon=1e-3, axis=1,
                          use_bias=True, use_scale=True, name="bn")
        return nn.relu(bn(y))


def _avg_pool(x, window=3, stride=1, pad=1, count_include_pad=True):
    """torch AvgPool2d semantics on NCHW."""
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, window, window), (1, 1, stride, stride),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    if count_include_pad:
        return sums / (window * window)
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, window, window), (1, 1, stride, stride),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    return sums / counts


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, window, window), (1, 1, stride, stride),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)))


class InceptionA(nn.Module):
    pool_features: int
    fid: bool = True  # FIDInceptionA: avgpool count_include_pad=False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool(x, count_include_pad=not self.fid)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool(x, count_include_pad=not self.fid)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=1)


class InceptionE(nn.Module):
    pool: str = "avg"  # FIDInceptionE_1: avg(count_include_pad=False); E_2: max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=1)
        if self.pool == "avg":
            bp = _avg_pool(x, count_include_pad=False)
        else:
            bp = _max_pool(x, window=3, stride=1, pad=1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=1)


class InceptionV3FID(nn.Module):
    """pytorch-fid InceptionV3 up to the 2048-d pool3 features
    (inception.py:16-345). Input: NCHW float in [0,1]; the module applies
    the (2x - 1) normalization itself (inception.py normalize_input)."""

    @nn.compact
    def __call__(self, x):
        x = 2 * x - 1
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(2, 3))  # adaptive avg pool -> (N, 2048)


# the published pytorch-fid weights (inception.py:13) embed the first 8
# sha256 hex chars in the filename, per the torch.hub convention
FID_WEIGHTS_NAME = "pt_inception-2015-12-05-6726825d.pth"
FID_WEIGHTS_SHA256_PREFIX = "6726825d"


def verify_fid_weights(path: str) -> str:
    """Hash-check a FID weights file before use. Returns the sha256 hex.

    The expected prefix is parsed from the filename's ``-<8hex>.pth``
    suffix (torch.hub's download convention, which pytorch-fid's
    FID_WEIGHTS_URL follows — inception.py:13); a file named like the
    published checkpoint but with different bytes is rejected. Files
    without a hash-suffixed name are allowed through (custom weights)
    with the digest printed for the record.
    """
    import hashlib
    import os
    import re

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    digest = h.hexdigest()
    m = re.search(r"-([0-9a-f]{8,})\.pth$", os.path.basename(path))
    if m and not digest.startswith(m.group(1)):
        raise ValueError(
            f"FID weights hash mismatch for {path}: sha256={digest} does "
            f"not start with filename-embedded prefix {m.group(1)}")
    print(f"fid weights {os.path.basename(path)}: sha256={digest}")
    return digest


def load_torch_inception_weights(variables, pt_path: str):
    """Convert the pytorch-fid checkpoint (state_dict of FIDInceptionV3)
    into our variable tree. Returns updated variables.

    Raises if any checkpoint tensor other than the unused classifier head
    (``fc.*``, inception.py:193 num_classes=1008) or BN bookkeeping
    (``num_batches_tracked``) goes unconsumed — a renamed-key or
    wrong-architecture file fails loudly instead of silently keeping
    random init for part of the network."""
    import torch

    sd = torch.load(pt_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    params = jax.tree.map(np.array, variables["params"])
    stats = jax.tree.map(np.array, variables["batch_stats"])
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key].numpy()

    def visit(tree_p, tree_s, prefix):
        if "kernel" in tree_p and "bn" in tree_p:
            tree_p["kernel"] = take(prefix + ".conv.weight")
            tree_p["bn"]["scale"] = take(prefix + ".bn.weight")
            tree_p["bn"]["bias"] = take(prefix + ".bn.bias")
            tree_s["bn"]["mean"] = take(prefix + ".bn.running_mean")
            tree_s["bn"]["var"] = take(prefix + ".bn.running_var")
            return
        for k in tree_p:
            visit(tree_p[k], tree_s.get(k, {}), f"{prefix}.{k}" if prefix else k)

    visit(params, stats, "")
    leftovers = {k for k in sd
                 if not k.endswith("num_batches_tracked")
                 and not k.startswith("fc.")} - consumed
    if leftovers:
        raise ValueError(
            f"unconsumed FID checkpoint keys (wrong file?): {sorted(leftovers)[:8]}"
            f"{' ...' if len(leftovers) > 8 else ''}")
    return {"params": params, "batch_stats": stats}


def make_inception_fn(weights_path: Optional[str] = None, batch: int = 64):
    """wrapper_inception equivalent (inception.py:332-345): images -> 2048-d
    activations, jitted, chunked over the batch.

    Remote-backend hygiene (docs/BENCH_NOTES.md round-2): init is jitted
    (eager init dispatches every inception op over the tunnel), inputs are
    channel-padded on host and the last chunk is padded to `batch`, so the
    whole run costs exactly one ~90s remote compile per input resolution.
    The forward is compiled with the persistent compilation cache bypassed:
    the axon remote backend's `deserialize_executable` hangs indefinitely on
    the cached inception executable (observed via SIGUSR1 stack dumps), so a
    fresh compile per process is the reliable path.
    """
    import contextlib

    @contextlib.contextmanager
    def _no_persistent_cache():
        prev = jax.config.jax_enable_compilation_cache
        jax.config.update("jax_enable_compilation_cache", False)
        try:
            yield
        finally:
            jax.config.update("jax_enable_compilation_cache", prev)

    model = InceptionV3FID()
    key = jax.random.PRNGKey(0)
    with _no_persistent_cache():
        variables = jax.jit(model.init)(key, jnp.zeros((1, 3, 299, 299)))
        jax.block_until_ready(variables)
    if weights_path is not None:
        verify_fid_weights(weights_path)
        variables = jax.device_put(
            load_torch_inception_weights(variables, weights_path))

    @jax.jit
    def fwd(v, x):
        return model.apply(v, fid_preprocess(x))

    compiled_shapes = set()

    def activations(images) -> np.ndarray:
        images = np.asarray(images, dtype=np.float32)
        n, c = images.shape[0], images.shape[1]
        if c == 1:  # zero-channel padding commutes with the resize
            images = np.concatenate(
                [images, np.zeros_like(images), np.zeros_like(images)], axis=1)
        out = []
        for s in range(0, n, batch):
            chunk = images[s: s + batch]
            m = chunk.shape[0]
            # pad to the next power-of-two bucket (capped at `batch`) so a
            # ragged final chunk reuses at most one extra compiled shape
            bucket = min(batch, 1 << max(0, (m - 1)).bit_length())
            if m < bucket:
                chunk = np.concatenate(
                    [chunk, np.zeros((bucket - m, *chunk.shape[1:]), chunk.dtype)])
            if chunk.shape not in compiled_shapes:
                with _no_persistent_cache():
                    acts = np.asarray(fwd(variables, jnp.asarray(chunk)))
                compiled_shapes.add(chunk.shape)
            else:
                acts = np.asarray(fwd(variables, jnp.asarray(chunk)))
            out.append(acts[:m])
        return np.concatenate(out)

    return activations


# ---------------------------------------------------------------------------
# cross-modal FID (modalities/mnist_svhn.py:13-66)
# ---------------------------------------------------------------------------

def cross_modal_fid(model, variables, loader, spec, key,
                    encoder_fn: Callable, n_batches: Optional[int] = None,
                    verbose: bool = False, compute_prd: bool = False,
                    prd_curve_dir: Optional[str] = None):
    """Conditional FID over ALL ordered cross pairs: reference activations
    of real test data vs activations of samples generated from each other
    modality.

    Key naming follows the reference exactly: bimodal models emit
    ``fid_{target}`` (generated from the single other modality,
    modalities/mnist_svhn.py:58-64); >=3 modalities emit the full
    M x (M-1) matrix ``fid_{src}_{target}`` (modalities/trimodal.py:60-78,
    src = modality conditioned on, target = modality sampled).

    n_batches=None consumes the entire test loader — the reference
    protocol (mnist_svhn.py:26-33); pass an int to cap explicitly.

    compute_prd additionally emits ``prd_f8[_...]`` / ``prd_f1_8[_...]``
    per direction from the same activations (prd_score.py:139,
    plot_prds_from_utils.py protocol); with prd_curve_dir set, the full
    (precision, recall) arrays are saved as prd_curve_<dir>.npz and the
    curve figure as prd_curve_<dir>.png (prd_score.py:177-228 plot).

    encoder_fn may be ONE callable (the Inception network — resizes any
    modality to 299x299) or a LIST of per-modality callables (custom
    encoders, e.g. eval classifier features via
    classifiers.make_feature_fn — the Quality_assess.py custom-encoder
    pattern); activations of modality m always come from encoder m.
    """
    import time

    from .generation import sample_from_conditional

    t0 = time.time()

    def _mark(msg):
        if verbose:
            print(f"  [fid +{time.time() - t0:6.1f}s] {msg}", flush=True)

    n_mod = None
    ref_acts: List[List[np.ndarray]] = []
    gen_acts: dict = {}
    enc = None
    for bi, (xs, _) in enumerate(loader):
        if n_batches is not None and bi >= n_batches:
            break
        if n_mod is None:
            n_mod = len(xs)
            enc = (list(encoder_fn) if isinstance(encoder_fn, (list, tuple))
                   else [encoder_fn] * n_mod)
            assert len(enc) == n_mod
            ref_acts = [[] for _ in range(n_mod)]
            gen_acts = {(s, t): [] for s in range(n_mod)
                        for t in range(n_mod) if s != t}
        for m in range(n_mod):
            ref_acts[m].append(enc[m](xs[m]))
        _mark(f"batch {bi}: real activations")
        gen = sample_from_conditional(model, variables,
                                      [jnp.asarray(x) for x in xs],
                                      jax.random.fold_in(key, bi), n=1)
        for (src, tgt), acc in gen_acts.items():
            acc.append(enc[tgt](np.asarray(gen[src][tgt][0])))
        _mark(f"batch {bi}: generated activations")

    ref_cat = [np.concatenate(r) for r in ref_acts]
    ref_stats = [activation_statistics(r) for r in ref_cat]
    fids = {}
    for (src, tgt), acc in gen_acts.items():
        gen_cat = np.concatenate(acc)
        mu1, s1 = ref_stats[tgt]
        mu2, s2 = activation_statistics(gen_cat)
        keysuf = f"{tgt}" if n_mod == 2 else f"{src}_{tgt}"
        fids[f"fid_{keysuf}"] = calculate_frechet_distance(mu1, s1, mu2, s2)
        _mark(f"frechet distance {keysuf}")
        if compute_prd:
            from . import prd

            n = min(len(gen_cat), len(ref_cat[tgt]))
            precision, recall = prd.compute_prd_from_embedding(
                gen_cat[:n], ref_cat[tgt][:n])
            f8, f18 = prd.prd_to_max_f_beta_pair(precision, recall)
            fids[f"prd_f8_{keysuf}"] = float(f8)
            fids[f"prd_f1_8_{keysuf}"] = float(f18)
            if prd_curve_dir:
                os.makedirs(prd_curve_dir, exist_ok=True)
                base = os.path.join(prd_curve_dir, f"prd_curve_{keysuf}")
                np.savez(base + ".npz", precision=precision, recall=recall)
                prd.plot_prd_curves([(f"F8={f8:.3f} F1/8={f18:.3f}",
                                      precision, recall)], base + ".png")
            _mark(f"prd {keysuf}")
    return fids
