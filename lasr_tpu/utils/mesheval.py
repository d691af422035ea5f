"""Mesh evaluation utilities: surface sampling, rigid ICP, chamfer metrics.

Replaces the pytorch3d ops used by the reference's evaluation
(ref:scripts/eval_mesh.py:138-168): sample_points_from_meshes,
iterative_closest_point, chamfer_distance with normal consistency."""

from __future__ import annotations

import numpy as np


def sample_points(verts: np.ndarray, faces: np.ndarray, n: int,
                  seed: int = 0, return_normals: bool = False):
    """Area-weighted uniform surface sampling."""
    rng = np.random.RandomState(seed)
    tri = verts[faces]                                  # [F, 3, 3]
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=-1)
    probs = area / max(area.sum(), 1e-12)
    fid = rng.choice(len(faces), size=n, p=probs)
    u = rng.rand(n, 1)
    v = rng.rand(n, 1)
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    t = tri[fid]
    pts = t[:, 0] + u * (t[:, 1] - t[:, 0]) + v * (t[:, 2] - t[:, 0])
    if not return_normals:
        return pts.astype(np.float32)
    nrm = cross[fid]
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    return pts.astype(np.float32), nrm.astype(np.float32)


def _nearest(a: np.ndarray, b: np.ndarray):
    """For each point in a, index of nearest point in b (KD-tree)."""
    from scipy.spatial import cKDTree
    return cKDTree(b).query(a, workers=-1)[1]


def icp_align(x: np.ndarray, y: np.ndarray, iters: int = 100,
              estimate_scale: bool = False, tol: float = 1e-7):
    """Rigid ICP aligning x -> y. Returns (R, t, s) with x' = s * x @ R + t
    (row-vector convention, matching pytorch3d's RTs application,
    ref:scripts/eval_mesh.py:156-159)."""
    R = np.eye(3)
    t = np.zeros(3)
    s = 1.0
    prev = np.inf
    xt = x.copy()
    for _ in range(iters):
        idx = _nearest(xt, y)
        yc = y[idx]
        err = ((xt - yc) ** 2).sum(-1).mean()
        if abs(prev - err) < tol:
            break
        prev = err
        # umeyama / kabsch for the correspondence set
        mx, my = x.mean(0), yc.mean(0)
        xc_ = x - mx
        yc_ = yc - my
        H = xc_.T @ yc_
        U, S, Vt = np.linalg.svd(H)
        d = np.sign(np.linalg.det(U @ Vt))
        D = np.diag([1.0, 1.0, d])
        R = U @ D @ Vt                       # row-vector: x @ R
        if estimate_scale:
            s = (S * np.diag(D)).sum() / max((xc_ ** 2).sum(), 1e-12)
        t = my - s * mx @ R
        xt = s * x @ R + t
    return R, t, s


def chamfer_normal(x, nx, y, ny):
    """pytorch3d chamfer_distance semantics: mean squared nearest distance
    both directions summed, plus (1 - |cos|) normal consistency."""
    ix = _nearest(x, y)
    iy = _nearest(y, x)
    cd = ((x - y[ix]) ** 2).sum(-1).mean() + ((y - x[iy]) ** 2).sum(-1).mean()
    nc = ((1 - np.abs((nx * ny[ix]).sum(-1))).mean()
          + (1 - np.abs((ny * nx[iy]).sum(-1))).mean()) / 2
    return float(cd), float(nc)


def normalize_extent(verts: np.ndarray, pts_for_extent: np.ndarray | None = None,
                     extent: float = 10.0):
    """Center and scale so the max pairwise distance is `extent`
    (ref:scripts/eval_mesh.py:135-146)."""
    v = verts - verts.mean(0, keepdims=True)
    p = v if pts_for_extent is None else \
        pts_for_extent - pts_for_extent.mean(0, keepdims=True)
    # max pairwise distance via convex-hull-free approximation on samples
    sub = p[np.random.RandomState(0).choice(len(p), min(len(p), 4000),
                                            replace=False)]
    d = np.sqrt(((sub[:, None] - sub[None]) ** 2).sum(-1)).max()
    return v * (extent / max(d, 1e-12))
