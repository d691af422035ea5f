"""Public soft-rasterizer API.

`soft_rasterize(face_vertices, textures, cfg, near, far)` renders
[B, F, 3, 3] screen-space triangles with per-vertex colors to [B, 4, H, W]
RGBA.  Dispatches to the Pallas TPU kernel for the training configuration
(euclidean distance, softmax rgb, prod alpha, vertex textures) and to the jnp
reference for everything else (hard modes, surface textures, CPU).

Replaces ref:third_party/softras/soft_renderer/functional/soft_rasterize.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .softras_ref import RasterizeConfig, soft_rasterize_ref
from .softras_pallas import soft_rasterize_pallas, _supported

__all__ = ["RasterizeConfig", "soft_rasterize", "render_mesh"]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def soft_rasterize(face_vertices, textures, cfg: RasterizeConfig, near, far,
                   force_ref: bool = False, interpret: bool | None = None):
    if force_ref or not _supported(cfg):
        return soft_rasterize_ref(face_vertices, textures, cfg, near, far)
    if interpret is None:
        interpret = not _on_tpu()
    return soft_rasterize_pallas(face_vertices, textures, near, far, cfg,
                                 interpret)


def render_mesh(verts, faces, textures, cfg: RasterizeConfig, near, far,
                **kw):
    """Gather per-face data and rasterize.

    verts: [B, N, 3] screen-space (x, y in NDC with y already flipped to the
    rasterizer's y-up convention, z = camera depth); faces: [B, F, 3] int;
    textures: [B, N, 3] vertex colors.  Mirrors sr.Mesh(...).face_vertices +
    rasterizer (ref:third_party/softras/soft_renderer/mesh.py:105-109).
    """
    fv = _gather(verts, faces)
    ft = _gather(textures, faces)
    return soft_rasterize(fv, ft, cfg, near, far, **kw)


def _gather(attr, faces):
    """attr [B, N, C], faces [B, F, 3] -> [B, F, 3, C]."""
    B, F, _ = faces.shape
    return jax.vmap(lambda a, f: a[f])(attr, faces)
