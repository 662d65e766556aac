"""Visualisation helpers — rebuild of bivae/vis.py on PIL/matplotlib.

save_image/save_samples grids (vis.py:194-204), embedding scatter plots
(vis.py:38-101), radius histograms (vis.py:178-192). Latent reduction uses
the in-repo UMAP (`embed.py` — umap-learn is not in the TPU image);
visualize_umap mirrors dcca/utils.py:113-122 (sklearn TSNE)."""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2) -> np.ndarray:
    """torchvision.utils.make_grid equivalent on NCHW float arrays."""
    images = np.asarray(images)
    n, c, h, w = images.shape
    ncol = nrow
    nr = math.ceil(n / ncol)
    grid = np.zeros((c, nr * (h + padding) + padding,
                     ncol * (w + padding) + padding), dtype=images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[:, y: y + h, x: x + w] = images[i]
    return grid


def save_image(images: np.ndarray, path: str, nrow: int = 8):
    """Clamp to [0,1], tile, write PNG (torchvision save_image semantics)."""
    from PIL import Image

    grid = make_grid(np.clip(np.asarray(images, np.float32), 0, 1), nrow)
    arr = (grid * 255).astype(np.uint8)
    if arr.shape[0] == 1:
        img = Image.fromarray(arr[0], mode="L")
    else:
        img = Image.fromarray(np.transpose(arr, (1, 2, 0)), mode="RGB")
    img.save(path)


def adjust_shape(a: np.ndarray, b: np.ndarray):
    """Pad channels/spatial dims so two modality batches stack in one grid
    (utils.py:324-360 equivalent)."""
    a, b = np.asarray(a), np.asarray(b)
    c = max(a.shape[1], b.shape[1])
    h = max(a.shape[2], b.shape[2])
    w = max(a.shape[3], b.shape[3])

    def fix(x):
        if x.shape[1] < c:
            x = np.concatenate([x] + [np.zeros_like(x[:, :1])] * (c - x.shape[1]), 1)
        ph, pw = h - x.shape[2], w - x.shape[3]
        return np.pad(x, ((0, 0), (0, 0),
                          (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)))

    return fix(a), fix(b)


def save_samples(data: Sequence[np.ndarray], path: str, nrow: int = 8):
    """Two-modality sample grid (vis.py:194-204)."""
    a, b = adjust_shape(np.asarray(data[0]), np.asarray(data[1]))
    save_image(np.concatenate([a, b]), path, nrow=nrow)


def reduce_latents(z: np.ndarray, dim: int = 2, method: str = "umap") -> np.ndarray:
    """2-D embedding for latent scatter plots (multi_vaes.py:143-146, where
    the reducer is umap.UMAP). Default is the in-repo UMAP (`embed.py`,
    no umap-learn dependency); method="pca" keeps the fast linear option."""
    z = np.asarray(z)
    if z.shape[1] <= dim:
        return z
    if method == "pca":
        from sklearn.decomposition import PCA

        return PCA(n_components=dim).fit_transform(z)
    from .embed import UMAP

    return UMAP(n_components=dim).fit_transform(z)


def visualize_umap(z, classes, save_file: Optional[str] = None):
    """DCCA-embedding scatter (dcca/utils.py:113-122 — which, despite the
    name, reduces with sklearn TSNE; reproduced exactly, with the in-repo
    UMAP as fallback)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    z = np.asarray(z).reshape(len(z), -1)
    try:
        from sklearn.manifold import TSNE
        reducer = "tsne"
    except ImportError:
        # only a missing sklearn switches algorithms; genuine TSNE runtime
        # failures (NaN input, shape errors) must propagate
        from .embed import UMAP as TSNE  # noqa: N814
        reducer = "umap"
    if z.shape[1] > 2:
        kwargs = ({"perplexity": min(30.0, max(1.0, len(z) - 1.0))}
                  if reducer == "tsne" else {})
        z_embed = TSNE(**kwargs).fit_transform(z)
        print(f"visualize_umap: reduced with {reducer}")
    else:
        z_embed = z
    fig = plt.figure()
    plt.scatter(z_embed[:, 0], z_embed[:, 1],
                c=np.asarray(classes) if classes is not None else None,
                s=6, cmap="tab10")
    if save_file is not None:
        fig.savefig(save_file, dpi=100)
    plt.close(fig)
    return z_embed


def plot_embeddings_colorbars(zxy, zx, classes0, classes1, path: str):
    """Joint/uni embedding scatter (vis.py:38-101)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(1, 2, figsize=(10, 4))
    for ax, z, c in [(axs[0], zxy, classes0), (axs[1], zx, classes1)]:
        z = np.asarray(z)
        sc = ax.scatter(z[:, 0], z[:, 1], c=np.asarray(c) if c is not None else None,
                        s=4, cmap="tab10")
        fig.colorbar(sc, ax=ax)
    fig.savefig(path, dpi=100)
    plt.close(fig)


def plot_hist(values: np.ndarray, path: str, bins: int = 30):
    """Radius histograms for circles analytics (vis.py:178-192)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.hist(np.asarray(values).ravel(), bins=bins)
    fig.savefig(path, dpi=100)
    plt.close(fig)


def extract_rayon(images: np.ndarray) -> np.ndarray:
    """Estimate ring/disc radii from rasterized circles: max radial extent of
    lit pixels (utils.py extract_rayon equivalent, used by the circles
    analytics at main.py:204-209)."""
    images = np.asarray(images)
    lead = images.shape[:-3]
    images = images.reshape(-1, *images.shape[-3:])
    n, c, h, w = images.shape
    xs = np.linspace(-1, 1, w)
    X, Y = np.meshgrid(xs, xs)
    r = np.sqrt(X ** 2 + Y ** 2).astype(np.float32)
    mask = images[:, 0] > 0.5
    out = np.where(mask.any(axis=(1, 2)),
                   (mask * r[None]).max(axis=(1, 2)), 0.0).astype(np.float32)
    return out.reshape(lead) if lead else out
