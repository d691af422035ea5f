import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lasr_tpu.models import mesh as mesh_mod
from lasr_tpu.ops import quat


def test_icosphere_counts():
    v, f = mesh_mod.icosphere(3)
    assert v.shape == (642, 3)
    assert f.shape == (1280, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-6)
    v4, f4 = mesh_mod.icosphere(4)
    assert v4.shape == (2562, 3) and f4.shape == (5120, 3)


def test_icosphere_closed_manifold():
    v, f = mesh_mod.icosphere(2)
    # Euler characteristic of a sphere: V - E + F = 2
    e = mesh_mod.undirected_edges(f)
    assert len(v) - len(e) + len(f) == 2
    # every edge shared by exactly two faces
    quads = mesh_mod.flatten_quads(f)
    assert len(quads) == len(e)


def test_symmetric_mesh_structure():
    sym = mesh_mod.symmetric_icosphere(3)
    v, f = sym.verts, sym.faces
    assert v.shape == (642, 3) and f.shape == (1280, 3)
    ni, ns = sym.num_indept, sym.num_sym
    assert ni + 2 * ns == 642
    # center verts on the plane
    assert np.all(v[:ni, 0] == 0)
    # left block is the exact mirror of the right block, in pair order
    np.testing.assert_array_equal(v[ni + ns:], v[ni:ni + ns] * np.array([-1, 1, 1], np.float32))
    # face blocks: paired faces reference mirrored vertices in the same slot order
    nif, nsf = sym.num_indept_faces, sym.num_sym_faces
    assert nif + 2 * nsf == 1280
    vmirror = np.arange(642)
    vmirror[ni:ni + ns] = np.arange(ni + ns, ni + 2 * ns)
    vmirror[ni + ns:] = np.arange(ni, ni + ns)
    right = f[nif:nif + nsf]
    left = f[nif + nsf:]
    np.testing.assert_array_equal(vmirror[right], left)
    # right faces are on x>0 side where they differ
    for rf, lf in zip(right[:20], left[:20]):
        changed = rf != lf
        assert np.all(v[rf][changed, 0] > v[lf][changed, 0])
    # reordering is a permutation of the original sphere
    v0, _ = mesh_mod.icosphere(3)
    np.testing.assert_array_equal(np.sort(v.view(np.uint32).reshape(-1)),
                                  np.sort(v0.view(np.uint32).reshape(-1)))


def test_quat_roundtrip():
    key = jax.random.PRNGKey(0)
    q = quat.normalize(jax.random.normal(key, (32, 4)))
    m = quat.quat_to_rotmat_xyzw(q)
    # orthonormal, det +1
    eye = jnp.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(np.asarray(eye), np.eye(3)[None].repeat(32, 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(m)), 1.0, atol=1e-5)
    # roundtrip through wxyz extraction (sign ambiguity)
    q_wxyz = jnp.concatenate([q[:, 3:], q[:, :3]], -1)
    q2 = quat.rotmat_to_quat_wxyz(m)
    dot = jnp.abs((q_wxyz * q2).sum(-1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-5)


def test_quat_identity_and_axis():
    # identity
    m = quat.quat_to_rotmat_xyzw(jnp.array([0.0, 0, 0, 1]))
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-7)
    # 90 deg about z: q = (0,0,sin45,cos45); R @ e_x = e_y
    s = np.sin(np.pi / 4)
    m = quat.quat_to_rotmat_xyzw(jnp.array([0.0, 0, s, s]))
    np.testing.assert_allclose(np.asarray(m @ jnp.array([1.0, 0, 0])),
                               [0, 1, 0], atol=1e-6)


def test_random_quat_unit_and_slerp():
    q = quat.random_quat_wxyz(jax.random.PRNGKey(1), 256)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-5)
    # slerp toward identity with t=0 -> identity; t=1 -> q (up to sign)
    t0 = quat.scale_quat_toward_identity(q, jnp.zeros(256))
    np.testing.assert_allclose(np.asarray(t0[:, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.abs(t0[:, 1:])).max(), 0.0, atol=1e-4)
    t1 = quat.scale_quat_toward_identity(q, jnp.ones(256))
    dot = jnp.abs((t1 * q).sum(-1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-4)
    # small t gives small rotation angle ~ t * angle(q)
    t = quat.scale_quat_toward_identity(q, jnp.full(256, 0.1))
    ang_q = 2 * np.arccos(np.clip(np.abs(np.asarray(q[:, 0])), 0, 1))
    ang_t = 2 * np.arccos(np.clip(np.abs(np.asarray(t[:, 0])), 0, 1))
    mask = ang_q > 1e-3
    np.testing.assert_allclose(ang_t[mask] / ang_q[mask], 0.1, atol=2e-2)


def test_geodesic_distance():
    s = np.sin(np.pi / 4)
    m1 = quat.quat_to_rotmat_xyzw(jnp.array([[0.0, 0, s, s]]))  # 90deg
    eye = jnp.eye(3)[None]
    d = quat.geodesic_distance(m1, eye)
    np.testing.assert_allclose(np.asarray(d), np.pi / 2, atol=1e-5)


def test_vertex_adjacency():
    v, f = mesh_mod.icosphere(1)
    idx, mask = mesh_mod.vertex_adjacency(f, len(v))
    deg = mask.sum(1)
    # icosphere: 12 original verts have degree 5, the rest 6
    assert (deg == 5).sum() == 12
    assert (deg == 6).sum() == len(v) - 12
