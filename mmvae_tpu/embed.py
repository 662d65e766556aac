"""Dependency-free UMAP for latent-space visualisation.

The reference reduces >2-D latents with ``umap.UMAP`` before scatter plots
(multi_vaes.py:17,143-146) and plots DCCA embeddings with
``visualize_umap`` (dcca/utils.py:113-122 — which, despite the name, calls
sklearn TSNE). ``umap-learn`` is not in this image, so this module
implements the UMAP algorithm (McInnes et al. 2018) directly:

- exact kNN + smooth-kNN-distance calibration + fuzzy simplicial set
  union in numpy (the graph is tiny — plot-sized n),
- the stochastic layout optimisation as a single jitted ``lax.fori_loop``
  over epochs with static edge/negative shapes, so the hot loop runs
  vectorized on-device instead of umap-learn's numba per-edge loop.

Deviation from umap-learn (documented): edges update simultaneously per
epoch (batch SGD) rather than sequentially (async SGD), and the embedding
is PCA-initialised rather than spectral — both are standard variants that
preserve the embedding structure the plots need.
"""

from __future__ import annotations

import numpy as np

__all__ = ["UMAP"]

# a/b for the default (min_dist=0.1, spread=1.0) fuzzy-membership curve,
# used when scipy's curve_fit is unavailable.
_DEFAULT_AB = (1.5769434603113077, 0.8950608779109733)


def _knn(x: np.ndarray, k: int):
    """Exact k-nearest-neighbours (excluding self) by chunked L2."""
    n = x.shape[0]
    sq = (x * x).sum(1)
    idx = np.empty((n, k), np.int64)
    dst = np.empty((n, k), np.float32)
    chunk = max(1, min(n, 4096 * 4096 // max(n, 1)))
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        d2 = sq[s:e, None] - 2.0 * (x[s:e] @ x.T) + sq[None, :]
        np.maximum(d2, 0.0, out=d2)
        d2[np.arange(s, e) - s, np.arange(s, e)] = np.inf  # drop self
        part = np.argpartition(d2, k - 1, axis=1)[:, :k]
        pd = np.take_along_axis(d2, part, axis=1)
        order = np.argsort(pd, axis=1)
        idx[s:e] = np.take_along_axis(part, order, axis=1)
        dst[s:e] = np.sqrt(np.take_along_axis(pd, order, axis=1))
    return idx, dst


def _smooth_knn(dists: np.ndarray, k: int, n_iter: int = 64):
    """Per-point (rho, sigma): rho is the nearest-neighbour distance and
    sigma solves sum_j exp(-max(0, d_ij - rho)/sigma) = log2(k) by
    vectorized bisection (umap-learn smooth_knn_dist semantics)."""
    rho = dists[:, 0].copy()
    target = np.log2(k)
    lo = np.zeros(len(dists), np.float64)
    hi = np.full(len(dists), np.inf)
    mid = np.ones(len(dists), np.float64)
    d = np.maximum(dists - rho[:, None], 0.0)
    for _ in range(n_iter):
        val = np.exp(-d / mid[:, None]).sum(1)
        too_big = val > target
        hi = np.where(too_big, mid, hi)
        lo = np.where(too_big, lo, mid)
        mid = np.where(too_big, (lo + hi) / 2.0,
                       np.where(np.isinf(hi), lo * 2.0, (lo + hi) / 2.0))
    # umap-learn clamps sigma away from zero relative to the mean distance
    mean_d = float(dists.mean()) or 1.0
    sigma = np.maximum(mid, 1e-3 * mean_d)
    return rho.astype(np.float32), sigma.astype(np.float32)


def _fuzzy_graph(idx: np.ndarray, dists: np.ndarray, k: int):
    """Directed memberships -> fuzzy-union symmetrized edge list
    (W = A + A^T - A∘A^T over the kNN support)."""
    n = idx.shape[0]
    rho, sigma = _smooth_knn(dists, k)
    w = np.exp(-np.maximum(dists - rho[:, None], 0.0) / sigma[:, None])
    rows = np.repeat(np.arange(n), k)
    cols = idx.ravel()
    vals = w.ravel().astype(np.float64)
    # symmetrize via a dict over (i, j) pairs — support is only n*k entries
    fwd = {}
    for r, c, v in zip(rows, cols, vals):
        fwd[(int(r), int(c))] = v
    heads, tails, weights = [], [], []
    seen = set()
    for (r, c), v in fwd.items():
        key = (min(r, c), max(r, c))
        if key in seen:
            continue
        seen.add(key)
        vt = fwd.get((c, r), 0.0)
        union = v + vt - v * vt
        if union > 0.0:
            heads.append(r)
            tails.append(c)
            weights.append(union)
    return (np.asarray(heads, np.int32), np.asarray(tails, np.int32),
            np.asarray(weights, np.float32))


def _fit_ab(min_dist: float, spread: float):
    """Least-squares fit of 1/(1 + a d^{2b}) to the target membership curve
    (umap-learn find_ab_params)."""
    if abs(min_dist - 0.1) < 1e-12 and abs(spread - 1.0) < 1e-12:
        return _DEFAULT_AB
    try:
        from scipy.optimize import curve_fit

        xs = np.linspace(0, spread * 3, 300)
        ys = np.where(xs < min_dist, 1.0, np.exp(-(xs - min_dist) / spread))
        (a, b), _ = curve_fit(lambda x, a, b: 1.0 / (1.0 + a * x ** (2 * b)),
                              xs, ys, p0=(1.0, 1.0), maxfev=10000)
        return float(a), float(b)
    except Exception:
        return _DEFAULT_AB


def _optimize_layout(emb0, heads, tails, weights, *, a, b, n_epochs,
                     neg_rate, lr, seed):
    """Jitted epoch loop of the UMAP cross-entropy SGD.

    Per epoch every edge fires with probability w/w_max (the vectorized
    counterpart of umap-learn's epochs_per_sample schedule); attractive
    updates move both endpoints, each sampled edge also draws ``neg_rate``
    uniform negatives repelling the head. Gradient clipping at ±4 and the
    linearly-decaying learning rate match umap-learn layouts.py.
    """
    import jax
    import jax.numpy as jnp

    emb0 = jnp.asarray(emb0, jnp.float32)
    heads = jnp.asarray(heads)
    tails = jnp.asarray(tails)
    p_edge = jnp.asarray(weights / max(float(weights.max()), 1e-12))
    n, dim = emb0.shape
    n_edges = heads.shape[0]

    def epoch(i, carry):
        emb, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        alpha = lr * (1.0 - i / n_epochs)
        keep = (jax.random.uniform(k1, (n_edges,)) < p_edge).astype(jnp.float32)

        yh = emb[heads]
        yt = emb[tails]
        diff = yh - yt
        d2 = (diff * diff).sum(-1)
        grad_coef = (-2.0 * a * b * jnp.power(jnp.maximum(d2, 1e-12), b - 1.0)
                     / (1.0 + a * jnp.power(jnp.maximum(d2, 1e-12), b)))
        g = jnp.clip(grad_coef[:, None] * diff, -4.0, 4.0) * keep[:, None]
        upd = jnp.zeros_like(emb)
        upd = upd.at[heads].add(g)
        upd = upd.at[tails].add(-g)

        negs = jax.random.randint(k2, (n_edges, neg_rate), 0, n)
        yn = emb[negs]                                   # (E, R, dim)
        diff_n = yh[:, None, :] - yn
        d2n = (diff_n * diff_n).sum(-1)
        rep_coef = (2.0 * b / ((0.001 + d2n)
                    * (1.0 + a * jnp.power(jnp.maximum(d2n, 1e-12), b))))
        gn = jnp.clip(rep_coef[..., None] * diff_n, -4.0, 4.0)
        # umap-learn layouts.py: coincident negative pairs (dist == 0,
        # sample != head) get a fixed +4 repulsive gradient per dim; a
        # sampled self-pair gets none
        coincident = (d2n <= 0.0) & (negs != heads[:, None])
        gn = jnp.where(coincident[..., None], 4.0, gn)
        gn = gn * keep[:, None, None]
        upd = upd.at[heads].add(gn.sum(1))

        return emb + alpha * upd, key

    @jax.jit
    def run(emb0, key):
        final, _ = jax.lax.fori_loop(0, n_epochs, epoch, (emb0, key))
        return final

    return np.asarray(run(emb0, jax.random.PRNGKey(seed)))


class UMAP:
    """Drop-in for ``umap.UMAP`` on the arguments the reference exercises."""

    def __init__(self, n_neighbors: int = 15, n_components: int = 2,
                 min_dist: float = 0.1, spread: float = 1.0,
                 n_epochs: int = 200, negative_sample_rate: int = 5,
                 learning_rate: float = 1.0, random_state: int = 0):
        self.n_neighbors = n_neighbors
        self.n_components = n_components
        self.min_dist = min_dist
        self.spread = spread
        self.n_epochs = n_epochs
        self.negative_sample_rate = negative_sample_rate
        self.learning_rate = learning_rate
        self.random_state = random_state

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32).reshape(len(x), -1)
        n = x.shape[0]
        if n <= self.n_components:
            return x[:, : self.n_components]
        k = min(self.n_neighbors, n - 1)
        idx, dists = _knn(x, k)
        heads, tails, weights = _fuzzy_graph(idx, dists, k)
        a, b = _fit_ab(self.min_dist, self.spread)

        # PCA init scaled to the ±10 box umap-learn uses
        xc = x - x.mean(0)
        _, _, vt = np.linalg.svd(xc, full_matrices=False)
        emb0 = xc @ vt[: self.n_components].T
        scale = np.abs(emb0).max() or 1.0
        emb0 = emb0 / scale * 10.0
        emb0 += np.random.default_rng(self.random_state).normal(
            0, 1e-4, emb0.shape)

        return _optimize_layout(
            emb0, heads, tails, weights, a=a, b=b,
            n_epochs=self.n_epochs, neg_rate=self.negative_sample_rate,
            lr=self.learning_rate, seed=self.random_state)
