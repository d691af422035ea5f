"""Loss ops vs direct dense implementations of the reference formulas
(and vs torch.nn.functional.grid_sample for the DT barrier sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lasr_tpu.models import mesh as mesh_mod
from lasr_tpu.ops import chamfer, dt, laplacian, point_mesh


@pytest.fixture(scope="module")
def sphere():
    v, f = mesh_mod.icosphere(2)  # 162 verts, 320 faces
    return v, f


def dense_laplacian(faces, nv):
    L = np.zeros((nv, nv), np.float64)
    for (a, b, c) in faces:
        for i, j in ((a, b), (b, a), (b, c), (c, b), (c, a), (a, c)):
            L[i, j] = -1
    np.fill_diagonal(L, -L.sum(1))
    for i in range(nv):
        if L[i, i] != 0:
            L[i] /= L[i, i]
    return L


def test_laplacian_matches_dense(sphere):
    v, f = sphere
    rng = np.random.RandomState(0)
    x = (v[None] + rng.randn(2, len(v), 3) * 0.1).astype(np.float32)
    topo = laplacian.MeshTopology.build(f, len(v))
    got = np.asarray(laplacian.laplacian_loss(jnp.asarray(x), topo))
    L = dense_laplacian(f, len(v))
    want = np.einsum("bvd->b", (L @ x.astype(np.float64)) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_arap_matches_dense(sphere):
    v, f = sphere
    rng = np.random.RandomState(1)
    xa = (v[None] + rng.randn(2, len(v), 3) * 0.05).astype(np.float32)
    xb = (v[None] + rng.randn(2, len(v), 3) * 0.05).astype(np.float32)
    topo = laplacian.MeshTopology.build(f, len(v))
    got = np.asarray(laplacian.arap_loss(jnp.asarray(xa), jnp.asarray(xb), topo))
    # reference formula: mean over adjacency entries of |Δ||x||² - Δ||dx||²|
    # (ref:nnutils/loss_utils.py:46-64 with dx=frame a, x=frame b)
    A = dense_laplacian(f, len(v)) != 0
    np.fill_diagonal(A, False)
    want = []
    for bi in range(2):
        vals = []
        for i in range(len(v)):
            for j in range(len(v)):
                if A[i, j]:
                    ea = ((xa[bi, i] - xa[bi, j]) ** 2).sum()
                    eb = ((xb[bi, i] - xb[bi, j]) ** 2).sum()
                    vals.append(abs(ea - eb))
        want.append(np.mean(vals))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_flatten_zero_for_plane():
    # flat grid: all dihedral cosines are -1 -> loss 0
    verts, faces = [], []
    n = 4
    for i in range(n):
        for j in range(n):
            verts.append([i, j, 0.0])
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    topo = laplacian.MeshTopology.build(faces, len(verts))
    loss = np.asarray(laplacian.flatten_loss(jnp.asarray(verts[None]), topo))
    assert loss[0] < 1e-4


def test_flatten_positive_for_sphere(sphere):
    v, f = sphere
    topo = laplacian.MeshTopology.build(f, len(v))
    loss = np.asarray(laplacian.flatten_loss(jnp.asarray(v[None]), topo))
    assert loss[0] > 0.01  # sphere is curved everywhere (small but nonzero)


def test_chamfer_brute_force():
    rng = np.random.RandomState(2)
    a = rng.randn(2, 50, 3).astype(np.float32)
    b = rng.randn(2, 70, 3).astype(np.float32)
    da, db, ia, ib = jax.tree.map(np.asarray, chamfer.chamfer(jnp.asarray(a), jnp.asarray(b)))
    d = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(da, d.min(-1), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(db, d.min(-2), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(ia, d.argmin(-1))
    np.testing.assert_array_equal(ib, d.argmin(-2))


def test_point_triangle_sqdist_cases():
    tri = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    cases = [
        ([0.2, 0.2, 0.5], 0.25),      # above interior -> plane distance
        ([-1.0, -1.0, 0.0], 2.0),     # nearest vertex a
        ([2.0, 0.0, 0.0], 1.0),       # nearest vertex b
        ([0.5, -1.0, 0.0], 1.0),      # nearest edge ab
        ([1.0, 1.0, 0.0], 0.5),       # nearest edge bc
        ([0.25, 0.25, 0.0], 0.0),     # inside
    ]
    for p, want in cases:
        got = float(point_mesh.point_triangle_sqdist(jnp.asarray(p), tri))
        assert abs(got - want) < 1e-6, (p, got, want)


def test_point_mesh_face_distance_symmetric_sphere(sphere):
    v, f = sphere
    verts = jnp.asarray(v[None])
    faces = jnp.asarray(f.astype(np.int32))
    # mirrored sphere = same sphere -> distance ~ 0
    pts = verts * jnp.asarray([-1.0, 1.0, 1.0])
    d = float(point_mesh.point_mesh_face_distance(verts, faces, pts))
    assert d < 1e-8
    # shifted points -> positive, roughly shift²
    d2 = float(point_mesh.point_mesh_face_distance(verts, faces, pts + 3.0))
    assert d2 > 1.0


def test_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as TF
    rng = np.random.RandomState(3)
    img = rng.rand(2, 16, 16).astype(np.float32)
    coords = (rng.rand(2, 40, 2).astype(np.float32) * 2.4 - 1.2)  # incl. outside
    got = np.asarray(dt.grid_sample_border(jnp.asarray(img), jnp.asarray(coords)))
    want = TF.grid_sample(torch.from_numpy(img)[:, None],
                          torch.from_numpy(coords)[:, :, None],
                          padding_mode="border", align_corners=False)
    np.testing.assert_allclose(got, want[:, 0, :, 0].numpy(), atol=1e-5)
