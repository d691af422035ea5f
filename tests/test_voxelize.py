"""Voxelization parity: the JAX op vs a direct numpy transcription of the
reference CUDA kernels (ref:third_party/softras/soft_renderer/cuda/
voxelization_cuda_kernel.cu, wrapper functional/voxelization.py), plus
solid-fill invariants on an icosphere.
"""

import numpy as np

from lasr_tpu.ops.voxelize import voxelize, mesh_voxelize


def _np_rasterize(faces, vs):
    """voxelize_sub1 (dim=2 orientation): faces [B,F,3,3] in (y,x,z)."""
    B, F = faces.shape[:2]
    vox = np.zeros((B, vs, vs, vs), np.int32)
    for bn in range(B):
        for fn in range(F):
            f = faces[bn, fn]
            y1d, x1d, z1d = f[1] - f[0]
            y2d, x2d, z2d = f[2] - f[0]
            det = x1d * y2d - x2d * y1d
            if det == 0:
                continue
            for y in range(vs):
                for x in range(vs):
                    ypd, xpd = y - f[0, 0], x - f[0, 1]
                    t1 = (y2d * xpd - x2d * ypd) / det
                    t2 = (-y1d * xpd + x1d * ypd) / det
                    if t1 < 0 or t2 < 0 or t1 + t2 > 1:
                        continue
                    zi = int(np.floor(t1 * z1d + t2 * z2d + f[0, 2]))
                    for yi in (y, y - 1):
                        for xi in (x, x - 1):
                            if 0 <= yi < vs and 0 <= xi < vs and 0 <= zi < vs:
                                vox[bn, yi, xi, zi] = 1
    return vox


def _np_voxelize(face_vertices, vs):
    faces = face_vertices * vs
    v2 = _np_rasterize(faces, vs)
    v0 = _np_rasterize(faces[..., [2, 1, 0]], vs).transpose(0, 3, 2, 1)
    v1 = _np_rasterize(faces[..., [0, 2, 1]], vs).transpose(0, 1, 3, 2)
    vox = ((v0 + v1 + v2) > 0).astype(np.int32)
    # vertices (voxelize_sub2)
    for bn in range(faces.shape[0]):
        for f in faces[bn]:
            for k in range(3):
                yi, xi, zi = np.floor(f[k]).astype(int)
                if 0 <= yi < vs and 0 <= xi < vs and 0 <= zi < vs:
                    vox[bn, yi, xi, zi] = 1
    # flood fill (voxelize_sub3/4)
    vis = np.zeros_like(vox)
    for bn in range(vox.shape[0]):
        border = np.zeros((vs, vs, vs), bool)
        border[[0, -1]] = border[:, [0, -1]] = border[:, :, [0, -1]] = True
        vis[bn][border & (vox[bn] == 0)] = 1
        changed = True
        while changed:
            changed = False
            grown = np.zeros_like(vis[bn])
            for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)):
                grown |= np.roll(vis[bn], sh, axis=ax)
            grow = (grown > 0) & (vox[bn] == 0) & (vis[bn] == 0) & ~border
            if grow.any():
                vis[bn][grow] = 1
                changed = True
    return 1 - vis


def test_voxelize_matches_numpy_reference():
    rng = np.random.RandomState(0)
    vs = 16
    # a few random triangles inside the unit cube
    fv = rng.rand(2, 6, 3, 3).astype(np.float32) * 0.8 + 0.1
    got = np.asarray(voxelize(fv, vs))
    want = _np_voxelize(fv.astype(np.float64), vs)
    np.testing.assert_array_equal(got, want)


def test_mesh_voxelize_icosphere_is_solid():
    from lasr_tpu.models.mesh import icosphere

    verts, faces = icosphere(2)
    vs = 32
    # Mesh.voxelize maps v -> (v * vs/(vs-1) + 0.5) * vs, so vertices must
    # live in ~[-0.5, 0.5] to land inside the grid (ref:mesh.py:177-179).
    vox = np.asarray(mesh_voxelize(verts[None] * 0.4, faces, vs))
    assert vox.shape == (1, vs, vs, vs)
    # center voxel filled (solid interior), corners empty
    assert vox[0, vs // 2, vs // 2, vs // 2] == 1
    assert vox[0, 0, 0, 0] == 0
    # occupancy close to sphere volume 4/3 pi r^3, r = 0.4 * vs/(vs-1) * vs
    r = 0.4 * vs / (vs - 1) * vs
    vol = 4 / 3 * np.pi * r ** 3
    assert abs(vox.sum() / vol - 1.0) < 0.15
