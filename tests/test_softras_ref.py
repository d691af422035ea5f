"""Tests for the pure-jnp soft rasterizer reference.

Gradient checks use float64 finite differences.  Note the rasterizer's VJP is
*intentionally* the reference CUDA kernel's gradient, which freezes the
clipped barycentric weights: finite differences therefore only validate
  * alpha w.r.t. vertex xy (envelope theorem: frozen-foot == true derivative),
  * rgb w.r.t. vertex z (w doesn't depend on z),
  * rgb w.r.t. textures (linear with frozen weights == true derivative).
rgb w.r.t. vertex xy has an extra true-derivative term the CUDA kernel drops
by design; it is checked against the Pallas kernel instead (test_softras_pallas).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lasr_tpu.ops import softras_ref as sr


@pytest.fixture(autouse=True)
def _x64():
    """f64 for finite differences, scoped so it can't leak into other modules."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def tri_scene(dtype=jnp.float64):
    """Two overlapping triangles at different depths, plus one off-screen."""
    f0 = [[-0.5, -0.5, 10.0], [0.6, -0.4, 10.0], [0.0, 0.7, 10.0]]   # front
    f1 = [[-0.3, -0.6, 12.0], [0.8, -0.1, 12.0], [-0.1, 0.9, 12.0]]  # behind
    f2 = [[5.0, 5.0, 10.0], [6.0, 5.0, 10.0], [5.0, 6.0, 10.0]]      # off-screen
    faces = jnp.asarray([[f0, f1, f2]], dtype)          # [1, 3, 3, 3]
    tex = jnp.asarray(
        [[[[1, 0, 0]] * 3, [[0, 1, 0]] * 3, [[0, 0, 1]] * 3]], dtype)  # [1,3,3,3]
    return faces, tex


CFG = sr.RasterizeConfig(image_size=32, sigma=3e-3, gamma=1e-2,
                         background=(0.0, 0.0, 0.0), face_chunk=2)


def test_forward_basic_coverage():
    faces, tex = tri_scene()
    out = sr.soft_rasterize_ref(faces, tex, CFG, near=1.0, far=100.0)
    out = np.asarray(out)
    assert out.shape == (1, 4, 32, 32)
    alpha = out[0, 3]
    # roughly the triangle's area fraction of the image is occupied
    assert 0.1 < (alpha > 0.5).mean() < 0.6
    # center pixel: front (red) triangle dominates
    rgb_c = out[0, :3, 18, 16]
    assert rgb_c[0] > 0.8 and rgb_c[1] < 0.2
    # alpha in [0, 1]
    assert alpha.min() >= 0 and alpha.max() <= 1 + 1e-6
    # some soft boundary pixels exist
    assert ((alpha > 0.05) & (alpha < 0.95)).sum() > 10


def test_forward_depth_ordering():
    # make the green triangle the front one instead
    faces, tex = tri_scene()
    faces = faces.at[0, 1, :, 2].set(8.0)
    out = np.asarray(sr.soft_rasterize_ref(faces, tex, CFG, 1.0, 100.0))
    rgb_c = out[0, :3, 18, 16]
    assert rgb_c[1] > 0.8 and rgb_c[0] < 0.2


def test_background_color():
    faces, tex = tri_scene()
    cfg = sr.RasterizeConfig(image_size=32, sigma=3e-3, gamma=1e-2,
                             background=(0.25, 0.5, 0.75), face_chunk=3)
    out = np.asarray(sr.soft_rasterize_ref(faces, tex, cfg, 1.0, 100.0))
    np.testing.assert_allclose(out[0, :3, 0, 0], [0.25, 0.5, 0.75], atol=1e-3)
    assert out[0, 3, 0, 0] < 1e-3


def test_chunking_invariance():
    faces, tex = tri_scene()
    outs = []
    for chunk in (1, 2, 3):
        cfg = sr.RasterizeConfig(image_size=32, sigma=3e-3, gamma=1e-2, face_chunk=chunk)
        outs.append(np.asarray(sr.soft_rasterize_ref(faces, tex, cfg, 1.0, 100.0)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-10)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-10)


def test_face_order_invariance():
    faces, tex = tri_scene()
    perm = jnp.asarray([2, 0, 1])
    out1 = np.asarray(sr.soft_rasterize_ref(faces, tex, CFG, 1.0, 100.0))
    out2 = np.asarray(sr.soft_rasterize_ref(faces[:, perm], tex[:, perm], CFG, 1.0, 100.0))
    np.testing.assert_allclose(out1, out2, atol=1e-9)


def test_hard_rgb_mode():
    faces, tex = tri_scene()
    cfg = sr.RasterizeConfig(image_size=32, sigma=1e-5, gamma=1e-2,
                             aggr_rgb="hard", background=(1.0, 1.0, 1.0))
    out = np.asarray(sr.soft_rasterize_ref(faces, tex, cfg, 1.0, 100.0))
    # interior pixels exactly the front color
    np.testing.assert_allclose(out[0, :3, 18, 16], [1, 0, 0], atol=1e-6)
    # background pixels exactly bg
    np.testing.assert_allclose(out[0, :3, 0, 0], [1, 1, 1], atol=1e-6)


def test_vertex_color_interpolation():
    # single triangle with distinct vertex colors; center = mean of corners
    faces = jnp.asarray([[[[-0.9, -0.9, 10.0], [0.9, -0.9, 10.0], [0.0, 0.9, 10.0]]]],
                        jnp.float64)
    tex = jnp.asarray([[[[1, 0, 0], [0, 1, 0], [0, 0, 1]]]], jnp.float64)
    cfg = sr.RasterizeConfig(image_size=64, sigma=1e-4, gamma=1e-4)
    out = np.asarray(sr.soft_rasterize_ref(faces, tex, cfg, 1.0, 100.0))
    # colors barycentric-interpolate: every interior pixel sums to ~1
    interior = out[0, 3] > 0.99
    sums = out[0, :3].sum(0)[interior]
    np.testing.assert_allclose(sums, 1.0, atol=1e-3)
    # centroid (0, -0.3) ndc -> row 41, col 31/32: ~ (1/3, 1/3, 1/3)
    cen = out[0, :3, 41, 32]
    np.testing.assert_allclose(cen, [1 / 3] * 3, atol=0.05)


def test_near_far_culls_rgb_not_alpha():
    faces, tex = tri_scene()
    out = np.asarray(sr.soft_rasterize_ref(faces, tex, CFG, near=50.0, far=100.0))
    # z in [10,12] < near: rgb stays background, alpha still rendered
    assert out[0, 3].max() > 0.9
    assert np.abs(out[0, :3]).max() < 1e-6


def _fd_check(f, x, g_analytic, idxs, h=1e-6, rtol=5e-3, atol=1e-7):
    x = np.asarray(x, np.float64)
    for idx in idxs:
        xp = x.copy(); xp[idx] += h
        xm = x.copy(); xm[idx] -= h
        fd = (f(jnp.asarray(xp)) - f(jnp.asarray(xm))) / (2 * h)
        ga = g_analytic[idx]
        assert np.isclose(fd, ga, rtol=rtol, atol=atol), (idx, float(fd), float(ga))


@pytest.mark.slow
def test_grad_alpha_wrt_xy_finite_diff():
    faces, tex = tri_scene()
    rng = np.random.RandomState(0)
    pix_w = jnp.asarray(rng.rand(1, 32, 32), jnp.float64)

    def loss_fn(fv):
        out = sr.soft_rasterize_ref(fv, tex, CFG, 1.0, 100.0)
        return (out[:, 3] * pix_w).sum()

    g = np.asarray(jax.grad(loss_fn)(faces))
    idxs = [(0, 0, 0, 0), (0, 0, 1, 1), (0, 0, 2, 0), (0, 1, 0, 1), (0, 1, 2, 0)]
    _fd_check(lambda fv: float(loss_fn(fv.reshape(faces.shape))),
              np.asarray(faces).ravel(), g.ravel(),
              [np.ravel_multi_index(i, faces.shape) for i in idxs])


@pytest.mark.slow
def test_grad_rgb_wrt_z_and_tex_finite_diff():
    faces, tex = tri_scene()
    rng = np.random.RandomState(1)
    pix_w = jnp.asarray(rng.rand(1, 3, 32, 32), jnp.float64)

    def loss_z(fv):
        out = sr.soft_rasterize_ref(fv, tex, CFG, 1.0, 100.0)
        return (out[:, :3] * pix_w).sum()

    g = np.asarray(jax.grad(loss_z)(faces))
    # vertex z entries of the two visible triangles
    idxs = [(0, 0, 0, 2), (0, 0, 1, 2), (0, 1, 0, 2), (0, 1, 2, 2)]
    _fd_check(lambda fv: float(loss_z(fv.reshape(faces.shape))),
              np.asarray(faces).ravel(), g.ravel(),
              [np.ravel_multi_index(i, faces.shape) for i in idxs])

    def loss_t(tx):
        out = sr.soft_rasterize_ref(faces, tx, CFG, 1.0, 100.0)
        return (out[:, :3] * pix_w).sum()

    gt = np.asarray(jax.grad(loss_t)(tex))
    idxs = [(0, 0, 0, 0), (0, 0, 1, 1), (0, 1, 2, 2), (0, 1, 0, 0)]
    _fd_check(lambda tx: float(loss_t(tx.reshape(tex.shape))),
              np.asarray(tex).ravel(), gt.ravel(),
              [np.ravel_multi_index(i, tex.shape) for i in idxs])


def test_grads_finite_everywhere():
    # saturated sigma (tiny) — the regime where naive prod/softmax autodiff NaNs
    faces, tex = tri_scene(jnp.float32)
    cfg = sr.RasterizeConfig(image_size=32, sigma=1e-5, gamma=1e-4)

    def loss_fn(fv, tx):
        out = sr.soft_rasterize_ref(fv, tx, cfg, 1.0, 100.0)
        return (out ** 2).sum()

    gf, gt = jax.grad(loss_fn, argnums=(0, 1))(faces, tex)
    assert np.isfinite(np.asarray(gf)).all()
    assert np.isfinite(np.asarray(gt)).all()


def test_degenerate_face_no_nan():
    faces, tex = tri_scene(jnp.float32)
    faces = faces.at[0, 2].set(
        jnp.asarray([[0.1, 0.1, 10.0]] * 3, faces.dtype))  # zero-area
    out = sr.soft_rasterize_ref(faces, tex, CFG, 1.0, 100.0)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda fv: (sr.soft_rasterize_ref(fv, tex, CFG, 1.0, 100.0) ** 2).sum())(faces)
    assert np.isfinite(np.asarray(g)).all()


def test_surface_texture_mode():
    faces = jnp.asarray([[[[-0.9, -0.9, 10.0], [0.9, -0.9, 10.0], [0.0, 0.9, 10.0]]]],
                        jnp.float64)
    res = 4
    tex = jnp.broadcast_to(jnp.asarray([0.2, 0.4, 0.6], jnp.float64),
                           (1, 1, res * res, 3))
    cfg = sr.RasterizeConfig(image_size=32, sigma=1e-4, gamma=1e-4,
                             texture_type="surface")
    out = np.asarray(sr.soft_rasterize_ref(faces, tex, cfg, 1.0, 100.0))
    np.testing.assert_allclose(out[0, :3, 20, 16], [0.2, 0.4, 0.6], atol=1e-2)
