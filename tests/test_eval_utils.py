"""Tests for mesh evaluation utilities and the native remesher."""

import os

import numpy as np
import pytest

from lasr_tpu.models.mesh import icosphere
from lasr_tpu.utils import mesheval

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sample_points_on_sphere():
    v, f = icosphere(2)
    pts, nrm = mesheval.sample_points(v, f, 5000, return_normals=True)
    r = np.linalg.norm(pts, axis=-1)
    assert 0.95 < r.min() and r.max() < 1.001
    # normals roughly radial
    cos = (pts / r[:, None] * nrm).sum(-1)
    assert np.abs(cos).mean() > 0.97


def test_icp_recovers_rigid_transform():
    v, f = icosphere(2)
    # stretch so the shape has orientation structure
    x = mesheval.sample_points(v * np.array([1.0, 2.0, 0.7]), f, 2000)
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    t = np.array([0.3, -0.2, 0.5])
    y = x @ R + t
    Re, te, se = mesheval.icp_align(x, y, iters=50)
    xa = se * x @ Re + te
    err = np.sqrt(((xa - y) ** 2).sum(-1)).mean()
    assert err < 1e-3


def test_chamfer_normal_zero_for_identical():
    v, f = icosphere(2)
    x, nx = mesheval.sample_points(v, f, 3000, return_normals=True)
    y, ny = mesheval.sample_points(v, f, 3000, seed=1, return_normals=True)
    cd, nc = mesheval.chamfer_normal(x, nx, y, ny)
    assert cd < 5e-3
    assert nc < 0.05


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REPO, "native/build/libremesh.so")),
    reason="native remesher not built (make -C native)")
def test_remesh_deformed_sphere():
    from lasr_tpu.utils.remesh import remesh
    v, f = icosphere(3)
    # squash + bend so it's a nontrivial closed shape
    v = v * np.array([1.0, 0.6, 1.4])
    v[:, 0] += 0.3 * np.sin(3 * v[:, 2])
    nv, nf = remesh(v.astype(np.float32), f, 1600, grid=64)
    assert len(nf) <= 1600
    # watertight: every directed edge has its reverse
    edges = {}
    for a, b, c in nf:
        for e in ((a, b), (b, c), (c, a)):
            edges[e] = edges.get(e, 0) + 1
    assert all(c == 1 for c in edges.values())
    assert all((b, a) in edges for (a, b) in edges)
    # surface stays close to the input
    x = mesheval.sample_points(nv, nf, 2000)
    y = mesheval.sample_points(v, f, 2000, seed=1)
    cd, _ = mesheval.chamfer_normal(x, x, y, y)
    assert cd < 0.02


def test_badja_loader_metadata():
    from lasr_tpu.data.badja import ANNOTATED_CLASSES, JOINT_COLORS
    assert len(ANNOTATED_CLASSES) == 20
    assert JOINT_COLORS.shape == (20, 3)
