"""Bilinear grid sampling (jnp).

Replaces torch.nn.functional.grid_sample(..., padding_mode='border',
align_corners=False) as used for the distance-transform bone barrier
(ref:nnutils/mesh_net.py:528-529).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_border(img: jax.Array, coords: jax.Array) -> jax.Array:
    """img [B, H, W], coords [B, N, 2] in [-1, 1] (x, y) -> [B, N].

    torch align_corners=False convention: pixel = ((c + 1) * size - 1) / 2,
    border padding (indices clamped).
    """
    B, H, W = img.shape
    x = ((coords[..., 0] + 1.0) * W - 1.0) / 2.0
    y = ((coords[..., 1] + 1.0) * H - 1.0) / 2.0

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def gather(ix, iy):
        ix = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iy = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        return jax.vmap(lambda im, iyy, ixx: im[iyy, ixx])(img, iy, ix)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))
