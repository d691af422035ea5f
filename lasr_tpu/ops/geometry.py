"""Camera projection and linear-blend skinning (jnp).

Parity targets: ref:nnutils/geom_utils.py (pinhole_cam, obj_to_cam) and the
SoftRas screen-space convention chain used by LASR
(ref:nnutils/mesh_net.py:75-104,340-357): the model adds the renderer eye
offset and flips y before rasterizing, and the look_at transform subtracts the
same eye again — the net effect is that the rasterizer consumes
(x_ndc, -y_ndc, z_cam) directly.  We implement that net convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pinhole_project(verts: jax.Array, ppoint: jax.Array, focal: jax.Array) -> jax.Array:
    """Project camera-space vertices to NDC, keeping depth.

    verts: [B, N, 3+] (x, y, z[, extra]); ppoint: [B, 2]; focal: [B] or [B, 1].
    Returns verts with x, y replaced by `pp + focal * x / z` (z and any extra
    channels unchanged) — ref:nnutils/geom_utils.py:27-34.
    """
    focal = focal.reshape(-1, 1)
    z = verts[..., 2]
    x = ppoint[:, None, 0] + verts[..., 0] * focal / z
    y = ppoint[:, None, 1] + verts[..., 1] * focal / z
    return jnp.concatenate([jnp.stack([x, y], -1), verts[..., 2:]], -1)


def orthographic_project(verts: jax.Array, ppoint: jax.Array, scale: jax.Array) -> jax.Array:
    """Orthographic variant (ref:nnutils/geom_utils.py:36-43)."""
    scale = scale.reshape(-1, 1)
    x = ppoint[:, None, 0] + verts[..., 0] * scale
    y = ppoint[:, None, 1] + verts[..., 1] * scale
    return jnp.concatenate([jnp.stack([x, y], -1), verts[..., 2:]], -1)


def blend_skinning(
    verts: jax.Array,        # [B, N, 3] canonical vertices
    part_rot: jax.Array,     # [B, K, 3, 3] per-part rotation (column convention)
    part_trans: jax.Array,   # [B, K, 3]
    skin: jax.Array,         # [B, K, N] blend weights (softmax over K)
) -> jax.Array:
    """LBS: v' = sum_k skin_k (R_k v + t_k).  Single einsum over (parts, verts).

    Equivalent to the part loop in ref:nnutils/geom_utils.py:57-63 (which uses
    row-vector `v @ R`; callers there pre-transpose, so both compute R_k v).
    """
    # [B, K, N, 3] = verts rotated by each part
    rotated = jnp.einsum("bkij,bnj->bkni", part_rot, verts, precision="highest") + part_trans[:, :, None, :]
    return jnp.einsum("bkn,bkni->bni", skin, rotated, precision="highest")


def rigid_transform(verts: jax.Array, rot: jax.Array, trans: jax.Array) -> jax.Array:
    """v' = R v + t for [B, N, 3], [B, 3, 3], [B, 3]."""
    return jnp.einsum("bij,bnj->bni", rot, verts, precision="highest") + trans[:, None, :]


def obj_to_cam(
    verts: jax.Array,        # [B, N, 3] canonical vertices
    body_rot: jax.Array,     # [B, 3, 3]
    body_trans: jax.Array,   # [B, 3]
    part_rot: jax.Array | None = None,    # [B, K, 3, 3]
    part_trans: jax.Array | None = None,  # [B, K, 3]
    skin: jax.Array | None = None,        # [B, K, N]
    to_cam: bool = True,
) -> jax.Array:
    """Articulated object-to-camera transform (ref:nnutils/geom_utils.py:45-71).

    Parts deform in canonical space; the body transform then moves the result
    into the camera frame (skipped when to_cam=False, which yields the
    camera-invariant deformed shape used by the motion regularizers,
    ref:nnutils/mesh_net.py:291).
    """
    if skin is not None:
        verts = blend_skinning(verts, part_rot, part_trans, skin)
    if to_cam:
        verts = rigid_transform(verts, body_rot, body_trans)
    return verts


def gmm_skinning_weights(
    verts: jax.Array,     # [N, 3] or [H, N, 3] canonical vertices (stop-grad upstream)
    ctl_centers: jax.Array,   # [..., K, 3] gaussian centers
    ctl_rot: jax.Array,       # [..., K, 3, 3] gaussian orientations
    log_scales: jax.Array,    # [..., K, 3] log precisions
    temperature: float = 10.0,
) -> jax.Array:
    """Gaussian-mixture skinning weights, softmax over bones.

    skin_k(v) ∝ exp(-T * (c_k - v)^T R_k S_k R_k^T (c_k - v)) — matches
    ref:nnutils/mesh_net.py:261-267 where dis_norm = (c-v) @ R(q_k), scaled by
    exp(log_ctl) elementwise, squared and summed.
    """
    # diff: [..., K, N, 3]
    diff = ctl_centers[..., :, None, :] - verts[..., None, :, :]
    # rotate into gaussian frame: (c-v) @ R  (row-vector convention as in ref)
    local = jnp.einsum("...kni,...kij->...knj", diff, ctl_rot, precision="highest")
    maha = (jnp.exp(log_scales)[..., :, None, :] * local**2).sum(-1)  # [..., K, N]
    return jax.nn.softmax(-temperature * maha, axis=-2)


def bone_transforms_about_pivots(
    rot: jax.Array,     # [B, K, 3, 3] raw per-bone rotations (column convention)
    trans: jax.Array,   # [B, K, 3] raw per-bone translations
    pivots: jax.Array,  # [B, K, 3] rest joint centers
) -> tuple[jax.Array, jax.Array]:
    """Re-center bone rotations about their rest pivots.

    v' = R (v - p) + p + t  =>  effective translation t' = -R p + p + t.
    Matches ref:nnutils/mesh_net.py:275-283 (which also transposes the part
    rotations there; we keep column convention throughout so no transpose).
    """
    t_eff = -jnp.einsum("bkij,bkj->bki", rot, pivots, precision="highest") + pivots + trans
    return rot, t_eff
