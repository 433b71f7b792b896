"""Minimal NumPy UMAP: fuzzy kNN graph + cross-entropy SGD layout.

The reference's playground used umap-learn for latent atlases
(scripts/playground/probe_pdb_in_umap.py, visualize_latent_and_codebook
variants); that package is not available in this image, so this module
implements the core of the algorithm (McInnes et al. 2018) directly:

  1. kNN graph; per-point bandwidth sigma_i solved so the smoothed
     neighbor weights sum to log2(k) (the fuzzy simplicial set),
  2. probabilistic t-conorm symmetrization  w = u + v - u*v,
  3. 2D layout minimizing the fuzzy cross-entropy by SGD over edges with
     negative sampling, using the standard (a, b) low-dimensional kernel
     1 / (1 + a d^{2b}).

`transform` places new points at the weight-averaged embedding of their
high-dimensional nearest neighbors (how probe structures are localized
in a cached atlas).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# kernel coefficients fit for min_dist=0.1, spread=1.0 (umap defaults)
_A, _B = 1.577, 0.895


def _knn(x: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    try:
        from sklearn.neighbors import NearestNeighbors

        nn = NearestNeighbors(n_neighbors=k + 1).fit(x)
        d, i = nn.kneighbors(x)
        return d[:, 1:], i[:, 1:]
    except ImportError:  # pragma: no cover - sklearn is in the image
        d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1)[:, 1 : k + 1]
        return np.sqrt(np.take_along_axis(d2, idx, 1)), idx


def fuzzy_graph(x: np.ndarray, k: int = 15
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rows/cols/weights of the symmetrized fuzzy kNN graph."""
    dist, idx = _knn(x, k)
    n = x.shape[0]
    rho = dist[:, 0:1]
    target = np.log2(k)
    lo = np.full((n, 1), 1e-8)
    hi = np.full((n, 1), 1e4)
    for _ in range(48):  # binary search for sigma_i
        mid = 0.5 * (lo + hi)
        s = np.exp(-np.maximum(dist - rho, 0.0) / mid).sum(
            axis=1, keepdims=True)
        hi = np.where(s > target, mid, hi)
        lo = np.where(s <= target, mid, lo)
    sigma = 0.5 * (lo + hi)
    w = np.exp(-np.maximum(dist - rho, 0.0) / sigma)

    rows = np.repeat(np.arange(n), k)
    cols = idx.ravel()
    vals = w.ravel()
    # symmetrize: W = U + U^T - U o U^T via a dict over index pairs
    dense = {}
    for r, c, v in zip(rows, cols, vals):
        dense[(r, c)] = v
    er, ec, ev = [], [], []
    seen = set()
    for (r, c), v in dense.items():
        if (c, r) in seen or (r, c) in seen:
            continue
        seen.add((r, c))
        v2 = dense.get((c, r), 0.0)
        ev.append(v + v2 - v * v2)
        er.append(r)
        ec.append(c)
    return np.asarray(er), np.asarray(ec), np.asarray(ev, np.float64)


def fit_umap(x: np.ndarray, k: int = 15, n_epochs: int = 300,
             lr: float = 1.0, neg_samples: int = 5,
             seed: int = 0, init: Optional[np.ndarray] = None
             ) -> np.ndarray:
    """[N, D] -> [N, 2] embedding."""
    x = np.asarray(x, np.float64)
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    er, ec, ew = fuzzy_graph(x, k=min(k, n - 1))
    if init is None:
        # PCA init, scaled to ~[-10, 10] like umap's spectral init range
        xc = x - x.mean(0)
        _u, _s, vt = np.linalg.svd(xc, full_matrices=False)
        y = xc @ vt[:2].T
        y = 10.0 * y / (np.abs(y).max() + 1e-12)
    else:
        y = np.asarray(init, np.float64).copy()
    y = y + rng.normal(scale=1e-4, size=y.shape)

    # per-edge sampling cadence ~ 1/weight (umap's epochs_per_sample)
    eps = n_epochs * ew / ew.max()
    next_due = np.zeros_like(eps)
    for epoch in range(n_epochs):
        alpha = lr * (1.0 - epoch / n_epochs)
        act = next_due <= epoch
        if not act.any():
            continue
        next_due[act] += n_epochs / np.maximum(eps[act], 1e-12)
        i, j = er[act], ec[act]
        d = y[i] - y[j]
        d2 = (d * d).sum(-1, keepdims=True)
        # attractive: d/dd of log(1 + a d^{2b})
        coeff = (-2.0 * _A * _B * d2 ** (_B - 1.0)
                 / (1.0 + _A * d2 ** _B))
        grad = np.clip(coeff * d, -4.0, 4.0)
        np.add.at(y, i, alpha * grad)
        np.add.at(y, j, -alpha * grad)
        # repulsive: negative samples for the heads
        for _ in range(neg_samples):
            jn = rng.integers(0, n, size=i.shape[0])
            d = y[i] - y[jn]
            d2 = (d * d).sum(-1, keepdims=True)
            coeff = (2.0 * _B / ((1e-3 + d2)
                                 * (1.0 + _A * d2 ** _B)))
            np.add.at(y, i, alpha * np.clip(coeff * d, -4.0, 4.0))
    return y.astype(np.float32)


def transform(x_train: np.ndarray, y_train: np.ndarray,
              x_new: np.ndarray, k: int = 5) -> np.ndarray:
    """Place new points at the distance-weighted mean of their
    neighbors' embeddings (probe projection into a cached atlas)."""
    x_train = np.asarray(x_train, np.float64)
    x_new = np.atleast_2d(np.asarray(x_new, np.float64))
    out = np.zeros((x_new.shape[0], y_train.shape[1]), np.float32)
    for r, p in enumerate(x_new):
        d2 = ((x_train - p) ** 2).sum(-1)
        idx = np.argsort(d2)[:k]
        w = 1.0 / (np.sqrt(d2[idx]) + 1e-8)
        w /= w.sum()
        out[r] = (w[:, None] * y_train[idx]).sum(0)
    return out
