"""Mesh -> solid voxel occupancy (SoftRas `voxelization` parity).

Behavioral port of the reference CUDA kernels
(ref:third_party/softras/soft_renderer/cuda/voxelization_cuda_kernel.cu,
wrapper functional/voxelization.py, Mesh.voxelize mesh.py:177-179):

1. surface marking: for each of the three axis permutations, every integer
   (y, x) grid point inside a face's 2D projection marks the voxel at the
   barycentrically interpolated depth plus its (y-1, x-1) neighborhood
   (voxelize_sub1); face vertices mark their containing voxel
   (voxelize_sub2).
2. solid fill: flood "visible" outside air from the boundary through
   unoccupied voxels (voxelize_sub3/4); occupancy = 1 - visible, i.e. the
   surface plus enclosed interior.

The per-face CUDA loops become a dense [grid, faces] barycentric test
feeding a scatter-max; the iterative host-synchronized flood fill becomes a
`lax.while_loop` over a 6-neighborhood dilation — both single fused XLA
computations with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rasterize_axis(faces: jax.Array, vs: int) -> jax.Array:
    """faces [B, F, 3, 3] in (y, x, z) voxel coords -> occupancy [B,vs,vs,vs].

    Marks floor(z) at every integer (y, x) inside the projected triangle,
    plus the (y-1, x), (y, x-1), (y-1, x-1) duplicates (voxelize_sub1)."""
    B, F = faces.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(vs), jnp.arange(vs), indexing="ij")
    grid = jnp.stack([ys, xs], -1).reshape(-1, 2).astype(faces.dtype)  # [G,2]

    v0 = faces[:, :, 0]                                   # [B,F,3]
    e1 = faces[:, :, 1] - v0
    e2 = faces[:, :, 2] - v0
    det = e1[..., 1] * e2[..., 0] - e2[..., 1] * e1[..., 0]   # x1*y2 - x2*y1

    pd = grid[None, None] - v0[:, :, None, :2]            # [B,F,G,2] (y,x)
    t1 = (e2[..., 0, None] * pd[..., 1] - e2[..., 1, None] * pd[..., 0])
    t2 = (-e1[..., 0, None] * pd[..., 1] + e1[..., 1, None] * pd[..., 0])
    safe_det = jnp.where(det == 0, 1.0, det)[..., None]
    t1 = t1 / safe_det
    t2 = t2 / safe_det
    inside = ((det != 0)[..., None] & (t1 >= 0) & (t2 >= 0)
              & (t1 + t2 <= 1))                           # [B,F,G]

    z = t1 * e1[..., 2, None] + t2 * e2[..., 2, None] + v0[..., 2, None]
    zi = jnp.floor(z).astype(jnp.int32)                   # [B,F,G]
    zok = (zi >= 0) & (zi < vs)

    vox = jnp.zeros((B, vs, vs, vs), jnp.bool_)
    yi = grid[:, 0].astype(jnp.int32)[None, None]
    xi = grid[:, 1].astype(jnp.int32)[None, None]
    bidx = jnp.arange(B)[:, None, None]
    for dy in (0, -1):
        for dx in (0, -1):
            yy, xx = yi + dy, xi + dx
            ok = inside & zok & (yy >= 0) & (xx >= 0)
            vox = vox.at[bidx, jnp.maximum(yy, 0), jnp.maximum(xx, 0),
                         jnp.clip(zi, 0, vs - 1)].max(ok)
    return vox


def _mark_vertices(faces: jax.Array, vs: int) -> jax.Array:
    """voxelize_sub2: each face vertex marks its floor voxel."""
    B = faces.shape[0]
    pts = faces.reshape(B, -1, 3)
    idx = jnp.floor(pts).astype(jnp.int32)
    ok = jnp.all((idx >= 0) & (idx < vs), axis=-1)
    idx = jnp.clip(idx, 0, vs - 1)
    vox = jnp.zeros((B, vs, vs, vs), jnp.bool_)
    bidx = jnp.arange(B)[:, None]
    return vox.at[bidx, idx[..., 0], idx[..., 1], idx[..., 2]].max(ok)


def _dilate6(x: jax.Array) -> jax.Array:
    """OR of the 6-neighborhood over the last three axes."""
    out = x
    for axis in (1, 2, 3):
        p = jnp.pad(x, [(0, 0)] * axis + [(1, 1)] + [(0, 0)] * (3 - axis))
        n = x.shape[axis]
        out = out | jax.lax.slice_in_dim(p, 0, n, axis=axis) \
                  | jax.lax.slice_in_dim(p, 2, n + 2, axis=axis)
    return out


def _solid_fill(vox: jax.Array) -> jax.Array:
    """voxelize_sub3/4: occupancy = NOT(outside air reachable from the
    boundary through unoccupied voxels)."""
    vs = vox.shape[1]
    boundary = jnp.zeros((vs, vs, vs), jnp.bool_)
    for axis in range(3):
        boundary = boundary | (jnp.arange(vs) == 0).reshape(
            [-1 if a == axis else 1 for a in range(3)])
        boundary = boundary | (jnp.arange(vs) == vs - 1).reshape(
            [-1 if a == axis else 1 for a in range(3)])
    visible = boundary[None] & ~vox

    def cond(state):
        visible, prev_count = state
        return visible.sum() != prev_count

    def body(state):
        visible, _ = state
        count = visible.sum()
        grown = _dilate6(visible) & ~vox
        # sub4 only updates interior cells; boundary stays as seeded.
        grown = jnp.where(boundary[None], visible, grown | visible)
        return grown, count

    visible, _ = jax.lax.while_loop(cond, body, (visible, jnp.int32(-1)))
    return (~visible).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def voxelize(face_vertices: jax.Array, voxel_size: int = 32,
             normalize: bool = False) -> jax.Array:
    """face_vertices [B, F, 3, 3] (x, y, z) -> solid occupancy
    [B, vs, vs, vs] int32 (parity with functional/voxelization.py:42-58:
    coordinates are scaled by `voxel_size` unless `normalize`)."""
    faces = face_vertices
    if not normalize:
        faces = faces * voxel_size
    vs = voxel_size
    # reference sub1 reads coords as (y, x, z) = input (dim0, dim1, dim2)
    # and permutes for the other two axes; outputs are transposed back.
    vox2 = _rasterize_axis(faces, vs)                       # dims as-is
    vox0 = _rasterize_axis(faces[..., [2, 1, 0]], vs).transpose(0, 3, 2, 1)
    vox1 = _rasterize_axis(faces[..., [0, 2, 1]], vs).transpose(0, 1, 3, 2)
    vox = vox0 | vox1 | vox2 | _mark_vertices(faces, vs)
    return _solid_fill(vox)


def mesh_voxelize(verts: jax.Array, faces: jax.Array,
                  voxel_size: int = 32) -> jax.Array:
    """Mesh.voxelize parity (ref:softras mesh.py:177-179): verts [B, V, 3]
    in [-1, 1] clip space, faces [F, 3] int."""
    fv = verts[:, faces]                                    # [B, F, 3, 3]
    fv = fv * voxel_size / (voxel_size - 1) + 0.5
    return voxelize(fv, voxel_size, normalize=False)
