"""Deterministic k-means (host numpy) for bone initialization.

Replaces kmeans_pytorch in the reference's bone re-init
(ref:nnutils/train_utils.py:243-251, :473-484): k-means++ seeding with a
fixed RNG, Lloyd iterations to tolerance."""

from __future__ import annotations

import numpy as np


def kmeans(x: np.ndarray, k: int, seed: int = 18, iters: int = 100,
           tol: float = 1e-4) -> np.ndarray:
    """x [N, D] -> centers [k, D]."""
    rng = np.random.RandomState(seed)
    n = len(x)
    centers = np.empty((k, x.shape[1]), x.dtype)
    centers[0] = x[rng.randint(n)]
    d2 = ((x - centers[0]) ** 2).sum(-1)
    for i in range(1, k):
        probs = d2 / max(d2.sum(), 1e-12)
        centers[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((x - centers[i]) ** 2).sum(-1))
    for _ in range(iters):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(-1)
        new_centers = centers.copy()
        for j in range(k):
            sel = x[assign == j]
            if len(sel):
                new_centers[j] = sel.mean(0)
        shift = np.abs(new_centers - centers).max()
        centers = new_centers
        if shift < tol:
            break
    return centers
