"""Quaternion utilities (jnp).

Replaces the reference's kornia conversions (ref:nnutils/mesh_net.py:232,250)
and the pose-noise quaternion sampling (ref:third_party/ext_utils/quatlib.py).

Conventions: quaternions are Hamilton; `xyzw` component order matches the
reference's kornia 0.x usage (identity = [0,0,0,1]).  Matrices act on column
vectors: v_cam = R @ v.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize quaternions along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat_xyzw(q: jax.Array) -> jax.Array:
    """[..., 4] (x, y, z, w) unit quaternion -> [..., 3, 3] rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], -2)


def quat_to_rotmat_wxyz(q: jax.Array) -> jax.Array:
    """[..., 4] (w, x, y, z) unit quaternion -> [..., 3, 3] rotation matrix."""
    return quat_to_rotmat_xyzw(jnp.concatenate([q[..., 1:], q[..., :1]], -1))


def rotmat_to_quat_wxyz(m: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation matrix -> [..., 4] (w, x, y, z) quaternion.

    Branch-free Shepperd-style extraction (safe for all rotations).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Four candidate extractions; pick the numerically best.
    qw0 = safe_sqrt(1.0 + tr) / 2
    c0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], -1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2
    c1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], -1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2
    c2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], -1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2
    c3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], -1)

    cands = jnp.stack([c0, c1, c2, c3], -2)  # [..., 4, 4]
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    idx = jnp.argmax(scores, -1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), -2)[..., 0, :]
    return normalize(q)


def random_quat_wxyz(key: jax.Array, batch: int) -> jax.Array:
    """Uniform random unit quaternions, (w, x, y, z).

    Same distribution as the reference's sampler
    (ref:third_party/ext_utils/quatlib.py:22-28): u,v,w ~ U[0,1],
    q = (sqrt(1-u) sin 2πv, sqrt(1-u) cos 2πv, sqrt(u) sin 2πw, sqrt(u) cos 2πw).
    """
    u, v, w = jnp.split(jax.random.uniform(key, (3 * batch,)), 3)
    v = v * 2 * jnp.pi
    w = w * 2 * jnp.pi
    return jnp.stack(
        [jnp.sqrt(1 - u) * jnp.sin(v), jnp.sqrt(1 - u) * jnp.cos(v),
         jnp.sqrt(u) * jnp.sin(w), jnp.sqrt(u) * jnp.cos(w)], -1)


def scale_quat_toward_identity(q: jax.Array, t: jax.Array) -> jax.Array:
    """Slerp each quaternion from identity toward q by fraction t.

    Mirrors ref:third_party/ext_utils/quatlib.py:30-50 (q in (w,x,y,z) order,
    identity p = (1,0,0,0)); linear interpolation fallback when nearly aligned.
    """
    d = q[..., 0]
    q = jnp.where(d[..., None] < 0, -q, q)
    d = jnp.abs(d)
    p = jnp.zeros_like(q).at[..., 0].set(1.0)

    near = d > 0.999
    lin = p + t[..., None] * (q - p)
    lin = lin / jnp.maximum(jnp.linalg.norm(lin, axis=-1, keepdims=True), 1e-12)

    t0 = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    st0 = jnp.sin(t0)
    s1 = jnp.sin(t0 * t) / jnp.where(near, 1.0, st0)
    s0 = jnp.cos(t0 * t) - d * s1
    slerp = s0[..., None] * p + s1[..., None] * q
    return jnp.where(near[..., None], lin, slerp)


def geodesic_distance(m1: jax.Array, m2: jax.Array) -> jax.Array:
    """Geodesic angle between rotation matrices [..., 3, 3] -> [...].

    Matches ref:third_party/ext_utils/util_rot.py:27-38 (acos of clipped
    (trace-1)/2).  We clip with a small margin: acos' is infinite at ±1, and
    the reference relies on a NaN-gradient guard to survive that
    (ref:nnutils/train_utils.py:289-290); the margin yields the same training
    behavior without poisoning the step.
    """
    m = jnp.matmul(m1, jnp.swapaxes(m2, -1, -2), precision="highest")
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1) / 2
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    return jnp.arccos(cos)
