"""Pallas kernel (interpret mode on CPU) vs jnp reference: forward + VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lasr_tpu.ops import softras_ref as sr
from lasr_tpu.ops.softras_pallas import soft_rasterize_pallas


def random_mesh_scene(key, B=2, F=24, S=32):
    """Random triangle soup roughly covering the view, depths in [8, 12]."""
    k1, k2, k3 = jax.random.split(key, 3)
    centers = jax.random.uniform(k1, (B, F, 1, 2), minval=-0.9, maxval=0.9)
    offsets = jax.random.normal(k2, (B, F, 3, 2)) * 0.15
    xy = centers + offsets
    z = jax.random.uniform(k3, (B, F, 3, 1), minval=8.0, maxval=12.0)
    fv = jnp.concatenate([xy, z], -1).astype(jnp.float32)
    tex = jax.random.uniform(jax.random.PRNGKey(7), (B, F, 3, 3)).astype(jnp.float32)
    return fv, tex


CFGS = [
    sr.RasterizeConfig(image_size=32, sigma=1e-3, gamma=1e-2, face_chunk=16),
    sr.RasterizeConfig(image_size=32, sigma=1e-4, gamma=1e-4,
                       background=(1.0, 1.0, 1.0), face_chunk=16),
]


@pytest.mark.parametrize("cfg", CFGS, ids=["soft", "sharp-whitebg"])
def test_pallas_matches_ref_forward(cfg):
    fv, tex = random_mesh_scene(jax.random.PRNGKey(0))
    near, far = 5.0, 15.0
    ref = np.asarray(sr.soft_rasterize_ref(fv, tex, cfg, near, far))
    pal = np.asarray(soft_rasterize_pallas(fv, tex, near, far, cfg, True))
    np.testing.assert_allclose(pal, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("cfg", CFGS, ids=["soft", "sharp-whitebg"])
@pytest.mark.slow
def test_pallas_matches_ref_grads(cfg):
    fv, tex = random_mesh_scene(jax.random.PRNGKey(1))
    near, far = 5.0, 15.0
    rng = np.random.RandomState(0)
    pix_w = jnp.asarray(rng.rand(2, 4, 32, 32).astype(np.float32))

    def loss_ref(fv, tex):
        return (sr.soft_rasterize_ref(fv, tex, cfg, near, far) * pix_w).sum()

    def loss_pal(fv, tex):
        return (soft_rasterize_pallas(fv, tex, near, far, cfg, True) * pix_w).sum()

    gr_v, gr_t = jax.grad(loss_ref, argnums=(0, 1))(fv, tex)
    gp_v, gp_t = jax.grad(loss_pal, argnums=(0, 1))(fv, tex)
    # Gradient magnitudes vary hugely; compare with scale-aware tolerance.
    # sigma=1e-4 amplifies f32 accumulation-order differences by ~1e4 in the
    # xy distance chain, hence the looser bound (tex grads match to ~1e-6).
    tol = 1e-3 if cfg.sigma <= 1e-4 else 2e-4
    scale_v = np.abs(np.asarray(gr_v)).max() + 1e-8
    scale_t = np.abs(np.asarray(gr_t)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(gp_v) / scale_v,
                               np.asarray(gr_v) / scale_v, atol=tol)
    np.testing.assert_allclose(np.asarray(gp_t) / scale_t,
                               np.asarray(gr_t) / scale_t, atol=tol)


def test_pallas_nonsquare_chunking():
    # F not a multiple of the kernel chunk exercises padding faces
    fv, tex = random_mesh_scene(jax.random.PRNGKey(2), B=1, F=7)
    cfg = CFGS[0]
    ref = np.asarray(sr.soft_rasterize_ref(fv, tex, cfg, 5.0, 15.0))
    pal = np.asarray(soft_rasterize_pallas(fv, tex, 5.0, 15.0, cfg, True))
    np.testing.assert_allclose(pal, ref, atol=2e-5, rtol=1e-4)


def test_pallas_per_image_near_far():
    fv, tex = random_mesh_scene(jax.random.PRNGKey(3), B=2)
    cfg = CFGS[0]
    near = jnp.asarray([5.0, 11.0])  # second image: most faces z-culled
    far = jnp.asarray([15.0, 12.0])
    ref = np.asarray(sr.soft_rasterize_ref(fv, tex, cfg, near, far))
    pal = np.asarray(soft_rasterize_pallas(fv, tex, near, far, cfg, True))
    np.testing.assert_allclose(pal, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("K", [2, 9], ids=["K2", "K9"])
@pytest.mark.slow
def test_pallas_kchannel_forward_and_grads(K):
    # K-channel textures (the merged flow+texture model render uses K=9
    # with per-channel backgrounds)
    fv, _ = random_mesh_scene(jax.random.PRNGKey(4))
    tex = jax.random.normal(jax.random.PRNGKey(11), (2, 24, 3, K)).astype(jnp.float32)
    bg = tuple(float(i % 2) for i in range(K))
    cfg = sr.RasterizeConfig(image_size=32, sigma=1e-3, gamma=1e-2,
                             background=bg, face_chunk=16)
    near, far = 5.0, 15.0
    ref = np.asarray(sr.soft_rasterize_ref(fv, tex, cfg, near, far))
    pal = np.asarray(soft_rasterize_pallas(fv, tex, near, far, cfg, True))
    assert pal.shape == (2, K + 1, 32, 32)
    # normal-distributed textures (|tex| up to ~3) widen f32
    # accumulation-order noise vs the [0,1] RGB cases
    np.testing.assert_allclose(pal, ref, atol=2e-4, rtol=1e-4)

    rng = np.random.RandomState(0)
    pix_w = jnp.asarray(rng.rand(2, K + 1, 32, 32).astype(np.float32))

    def loss_ref(fv, tex):
        return (sr.soft_rasterize_ref(fv, tex, cfg, near, far) * pix_w).sum()

    def loss_pal(fv, tex):
        return (soft_rasterize_pallas(fv, tex, near, far, cfg, True) * pix_w).sum()

    gr_v, gr_t = jax.grad(loss_ref, argnums=(0, 1))(fv, tex)
    gp_v, gp_t = jax.grad(loss_pal, argnums=(0, 1))(fv, tex)
    scale_v = np.abs(np.asarray(gr_v)).max() + 1e-8
    scale_t = np.abs(np.asarray(gr_t)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(gp_v) / scale_v,
                               np.asarray(gr_v) / scale_v, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp_t) / scale_t,
                               np.asarray(gr_t) / scale_t, atol=2e-4)


def test_pallas_xbinned_narrow_tiles(monkeypatch):
    """Two-level (y, x) face binning + sub-row pixel tiles: the x-culling
    path (tile_xbounds vs chunk bbox cols 2-3) must be exact — culled
    (tile, chunk) pairs are precisely those beyond the distance threshold.
    PT=16 < S=32 makes tiles half-rows; F=64 with face_chunk=16 gives 4
    chunks in 2 y-bands x 2 x-bins (default LASR_RASTER_XG=2)."""
    import lasr_tpu.ops.softras_pallas as sp
    monkeypatch.setattr(sp, "_DEFAULT_PT", 16)
    fv, _ = random_mesh_scene(jax.random.PRNGKey(5), B=2, F=64)
    tex = jax.random.uniform(jax.random.PRNGKey(6), (2, 64, 3, 3)).astype(
        jnp.float32)
    cfg = sr.RasterizeConfig(image_size=32, sigma=1e-3, gamma=1e-2,
                             face_chunk=16)
    near, far = 5.0, 15.0
    ref = np.asarray(sr.soft_rasterize_ref(fv, tex, cfg, near, far))
    pal = np.asarray(soft_rasterize_pallas(fv, tex, near, far, cfg, True))
    np.testing.assert_allclose(pal, ref, atol=2e-5, rtol=1e-4)

    rng = np.random.RandomState(0)
    pix_w = jnp.asarray(rng.rand(2, 4, 32, 32).astype(np.float32))
    gr = jax.grad(lambda v: (sr.soft_rasterize_ref(v, tex, cfg, near, far)
                             * pix_w).sum())(fv)
    gp = jax.grad(lambda v: (soft_rasterize_pallas(v, tex, near, far, cfg,
                                                   True) * pix_w).sum())(fv)
    scale = np.abs(np.asarray(gr)).max() + 1e-8
    # 5e-3: PT=16 splits the per-face gradient accumulation across 2x the
    # tiles, reordering f32 sums — measured IDENTICAL max error (2.74e-3)
    # with x-binning on and off, so the culling itself is exact
    np.testing.assert_allclose(np.asarray(gp) / scale,
                               np.asarray(gr) / scale, atol=5e-3)
