"""Soft rasterizer — pure-jnp reference implementation.

Re-derivation of the SoftRas differentiable rasterizer semantics
(ref:third_party/softras/soft_renderer/cuda/soft_rasterize_cuda_kernel.cu),
built TPU-style: no per-pixel loops, a `lax.scan` over face chunks with
streaming softmax-depth accumulators (the same structure the Pallas kernel
uses on VMEM tiles).  This module is the ground truth for the Pallas kernel
tests and the CPU fallback path.

Gradient contract: `stop_gradient` is placed so that *plain autodiff* of this
forward reproduces the CUDA backward exactly —
  * xy grads through the sigmoid·distance chain with a frozen closest point
    (cuda_kernel.cu:644-655: grad = 2·sign·C·tc_k·dis_{x,y}),
  * z grads through the softmax-depth chain with frozen clipped barycentrics
    (cuda_kernel.cu:636-639),
  * texture grads through frozen barycentric weights (cuda_kernel.cu:622),
  * no gradient through face_inv / the barycentric matrix in euclidean mode.

Screen convention: face vertices are (x, y, z) with x, y in NDC [-1, 1]
(y up), z = camera-space depth.  Output images are [B, 4, H, W] RGBA with
row 0 = top (y = +1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

sg = jax.lax.stop_gradient


@jax.custom_vjp
def _prod_reduce(x: jax.Array) -> jax.Array:
    """prod over the last axis with the CUDA backward's clamped division
    (cuda_kernel.cu:591: grad *= prod_all / max(x_i, 1e-6)).  Plain
    reduce_prod autodiff divides by exact zeros (saturated sigmoids make
    1-D == 0 routinely), which this clamp avoids — bug-compatibly with the
    reference."""
    return jnp.prod(x, -1)


def _prod_reduce_fwd(x):
    p = jnp.prod(x, -1)
    return p, (x, p)


def _prod_reduce_bwd(res, g):
    x, p = res
    return ((g * p)[..., None] / jnp.maximum(x, 1e-6),)


_prod_reduce.defvjp(_prod_reduce_fwd, _prod_reduce_bwd)


# ----------------------------------------------------------------------------
# Config
# ----------------------------------------------------------------------------

@dataclass(frozen=True)
class RasterizeConfig:
    image_size: int = 256
    sigma: float = 1e-4          # sigma_val: sigmoid sharpness of D
    gamma: float = 1e-4          # gamma_val: softmax-depth temperature
    dist_eps: float = 1e-4       # occupancy cutoff; threshold = sigma*log(1/eps-1)
    eps: float = 1e-3            # background softmax logit
    dist_func: str = "euclidean"     # euclidean | barycentric | hard
    aggr_rgb: str = "softmax"        # softmax | hard
    aggr_alpha: str = "prod"         # prod | sum | hard
    texture_type: str = "vertex"     # vertex | surface
    double_side: bool = True         # 'fill_back' in the reference
    # one float per texture channel (K=3 for plain RGB renders; the model's
    # merged flow+texture render uses K=9)
    background: tuple[float, ...] = (0.0, 0.0, 0.0)
    face_chunk: int = 128

    @property
    def dist_threshold(self) -> float:
        import math
        return self.sigma * math.log(1.0 / self.dist_eps - 1.0)


# ----------------------------------------------------------------------------
# Per-face precompute (cuda_kernel.cu:245-305)
# ----------------------------------------------------------------------------

class FacePre(NamedTuple):
    """Per-face screen-space terms; every field is [..., F]-shaped (or with a
    trailing small axis) so the pair math broadcasts against pixel axes."""
    fx: jax.Array     # [..., F, 3] vertex x
    fy: jax.Array     # [..., F, 3] vertex y
    fz: jax.Array     # [..., F, 3] vertex z (camera depth)
    inv: jax.Array    # [..., F, 3, 3] barycentric matrix (w = inv @ [x, y, 1])
    a0: jax.Array     # [..., F, 3, 3] per-edge face_sym row differences
    obt: jax.Array    # [..., F, 3] obtuse-corner flags
    frontside: jax.Array  # [..., F] bool


def face_precompute(face_vertices: jax.Array) -> FacePre:
    """face_vertices: [..., F, 3, 3] (vertex, xyz)."""
    fx = face_vertices[..., 0]
    fy = face_vertices[..., 1]
    fz = face_vertices[..., 2]
    x0, x1, x2 = fx[..., 0], fx[..., 1], fx[..., 2]
    y0, y1, y2 = fy[..., 0], fy[..., 1], fy[..., 2]

    det = x2 * (y0 - y1) + x0 * (y1 - y2) + x1 * (y2 - y0)
    det = jnp.where(det > 0, jnp.maximum(det, 1e-10), jnp.minimum(det, -1e-10))
    # adjugate rows (cuda_kernel.cu:274-277); no gradient flows through inv in
    # euclidean mode (backward ignores it), so freeze it outright.
    inv = jnp.stack(
        [
            jnp.stack([y1 - y2, x2 - x1, x1 * y2 - x2 * y1], -1),
            jnp.stack([y2 - y0, x0 - x2, x2 * y0 - x0 * y2], -1),
            jnp.stack([y0 - y1, x1 - x0, x0 * y1 - x1 * y0], -1),
        ],
        -2,
    ) / det[..., None, None]
    inv = sg(inv)

    # face_sym[j,k] = xj xk + yj yk + 1; only row differences a0_k = sym[v0]-sym[v1]
    # are consumed, i.e. a0_k[j] = (x_v0 - x_v1) x_j + (y_v0 - y_v1) y_j.
    # Frozen: the closest-point barycentrics are treated as constants.
    def edge_a0(v0, v1):
        dx = fx[..., v0] - fx[..., v1]
        dy = fy[..., v0] - fy[..., v1]
        return dx[..., None] * fx + dy[..., None] * fy
    a0 = sg(jnp.stack([edge_a0(0, 1), edge_a0(1, 2), edge_a0(2, 0)], -2))

    # obtuse flags (cuda_kernel.cu:296-304)
    def obt_at(k0, k1, k2):
        return ((fx[..., k1] - fx[..., k0]) * (fx[..., k2] - fx[..., k0])
                + (fy[..., k1] - fy[..., k0]) * (fy[..., k2] - fy[..., k0])) < 0
    obt = sg(jnp.stack([obt_at(0, 1, 2), obt_at(1, 2, 0), obt_at(2, 0, 1)], -1))

    frontside = sg((y2 - y0) * (x1 - x0) < (y1 - y0) * (x2 - x0))
    return FacePre(fx, fy, fz, inv, a0, obt, frontside)


# ----------------------------------------------------------------------------
# Per-(pixel, face) terms (cuda_kernel.cu:25-158)
# ----------------------------------------------------------------------------

def _edge_foot(a0_k: jax.Array, w: jax.Array, v0: int, v1: int, v2: int,
               clamp: bool) -> jax.Array:
    """Barycentrics of the foot of the pixel on edge (v0, v1).

    a0_k: [..., 3] frozen edge terms; w: [..., 3] pixel barycentrics.
    Returns tc [..., 3] with tc[v2] = 0 (clamped to the segment if `clamp`).
    """
    denom = a0_k[..., v0] - a0_k[..., v1]
    denom = jnp.where(jnp.abs(denom) < 1e-12, jnp.where(denom < 0, -1e-12, 1e-12), denom)
    t_v0 = ((w * a0_k).sum(-1) - a0_k[..., v1]) / denom
    t_v1 = 1.0 - t_v0
    if clamp:
        t_v0 = jnp.clip(t_v0, 0.0, 1.0)
        t_v1 = jnp.clip(t_v1, 0.0, 1.0)
    comps = [None, None, None]
    comps[v0], comps[v1], comps[v2] = t_v0, t_v1, jnp.zeros_like(t_v0)
    return jnp.stack(comps, -1)


def pair_distance(pre: FacePre, xp: jax.Array, yp: jax.Array):
    """Signed euclidean point-to-face terms for every (pixel, face) pair.

    pre fields broadcast with a face axis; xp/yp carry pixel axes (mutually
    broadcastable, e.g. pre [F, ...] vs xp [P, 1]).

    Returns (w, sign, dis) where dis is the squared screen distance to the
    closest point of the triangle and sign is +1 inside / −1 outside.  Gradients match the CUDA backward: only the
    explicit closest_point(face) − pixel dependence is kept.
    """
    hom = jnp.stack([xp, yp, jnp.ones_like(xp)], -1)
    w = (pre.inv * hom[..., None, :]).sum(-1)  # [..., 3]; frozen (inv frozen)

    inside = jnp.all((w > 0) & (w < 1), axis=-1)

    # inside: unclamped foot on each of the 3 edges, take the nearest
    tcs = [
        _edge_foot(pre.a0[..., 0, :], w, 0, 1, 2, clamp=False),
        _edge_foot(pre.a0[..., 1, :], w, 1, 2, 0, clamp=False),
        _edge_foot(pre.a0[..., 2, :], w, 2, 0, 1, clamp=False),
    ]

    def foot_dis(tc):
        dx = (sg(tc) * pre.fx).sum(-1) - xp
        dy = (sg(tc) * pre.fy).sum(-1) - yp
        return dx, dy, dx * dx + dy * dy

    in_d = [foot_dis(tc) for tc in tcs]
    in_best = jnp.argmin(jnp.stack([d[2] for d in in_d], -1), -1)

    def pick(idx, items):
        out = items[2]
        out = jnp.where(idx == 1, items[1], out)
        out = jnp.where(idx == 0, items[0], out)
        return out

    in_dx = pick(in_best, [d[0] for d in in_d])
    in_dy = pick(in_best, [d[1] for d in in_d])

    # outside: vertex-region selection with obtuse correction
    # (cuda_kernel.cu:110-126), then the chosen edge's clamped foot.
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]

    def corner_dot(k0, k2):
        return ((xp - pre.fx[..., k0]) * (pre.fx[..., k2] - pre.fx[..., k0])
                + (yp - pre.fy[..., k0]) * (pre.fy[..., k2] - pre.fy[..., k0])) > 0

    v0 = jnp.where(
        (w1 <= 0) & (w2 <= 0),
        jnp.where(pre.obt[..., 0] & corner_dot(0, 2), 2, 0),
        jnp.where(
            (w2 <= 0) & (w0 <= 0),
            jnp.where(pre.obt[..., 1] & corner_dot(1, 0), 0, 1),
            jnp.where(
                (w0 <= 0) & (w1 <= 0),
                jnp.where(pre.obt[..., 2] & corner_dot(2, 1), 1, 2),
                jnp.where(w0 <= 0, 1, jnp.where(w1 <= 0, 2, 0)),
            ),
        ),
    )
    out_tcs = [
        _edge_foot(pre.a0[..., 0, :], w, 0, 1, 2, clamp=True),
        _edge_foot(pre.a0[..., 1, :], w, 1, 2, 0, clamp=True),
        _edge_foot(pre.a0[..., 2, :], w, 2, 0, 1, clamp=True),
    ]
    out_d = [foot_dis(tc) for tc in out_tcs]
    out_dx = pick(v0, [d[0] for d in out_d])
    out_dy = pick(v0, [d[1] for d in out_d])

    dis_x = jnp.where(inside, in_dx, out_dx)
    dis_y = jnp.where(inside, in_dy, out_dy)
    dis = dis_x * dis_x + dis_y * dis_y
    sign = jnp.where(inside, 1.0, -1.0)
    return w, sign, dis


def barycentric_clip(w: jax.Array) -> jax.Array:
    """Clamp to [0,1] and renormalize (cuda_kernel.cu:53-58); frozen."""
    wc = jnp.clip(w, 0.0, 1.0)
    return sg(wc / jnp.maximum(wc.sum(-1, keepdims=True), 1e-5))


def occupancy(pre: FacePre, xp, yp, cfg: RasterizeConfig):
    """(w, D, valid): soft fragment probability and the distance cull."""
    if cfg.dist_func == "euclidean":
        w, sign, dis = pair_distance(pre, xp, yp)
        soft = jax.nn.sigmoid(sign * dis / cfg.sigma)
        valid = (sign > 0) | (dis < cfg.dist_threshold)
    elif cfg.dist_func == "barycentric":
        hom = jnp.stack([xp, yp, jnp.ones_like(xp)], -1)
        w = (pre.inv * hom[..., None, :]).sum(-1)
        wmin = jnp.min(w, -1)
        dis = jnp.where(wmin > 0, wmin * wmin, -(wmin * wmin))
        soft = jax.nn.sigmoid(dis / cfg.sigma)
        valid = -dis < cfg.dist_threshold
    elif cfg.dist_func == "hard":
        hom = jnp.stack([xp, yp, jnp.ones_like(xp)], -1)
        w = (pre.inv * hom[..., None, :]).sum(-1)
        inside = jnp.all((w >= 0) & (w <= 1), axis=-1)
        soft = inside.astype(w.dtype)
        valid = inside
    else:
        raise ValueError(cfg.dist_func)
    return w, soft, valid


def sample_texture(tex: jax.Array, w_clip: jax.Array, cfg: RasterizeConfig) -> jax.Array:
    """Per-pair color [..., 3] from per-face texture.

    vertex mode: barycentric blend of the 3 vertex colors (frozen weights,
    cuda_kernel.cu:190-193).  surface mode: nearest-texel lookup in the RxR
    per-face atlas (cuda_kernel.cu:181-188; non-differentiable lookup).
    """
    if cfg.texture_type == "vertex":
        # tex: [..., F, 3(vert), 3(rgb)]
        return (sg(w_clip)[..., None] * tex).sum(-2)
    # surface: tex [..., F, R*R, 3]
    res = int(round(tex.shape[-2] ** 0.5))
    wx = jnp.clip((w_clip[..., 0] * res).astype(jnp.int32), 0, res - 1)
    wy = jnp.clip((w_clip[..., 1] * res).astype(jnp.int32), 0, res - 1)
    lower = (w_clip[..., 0] + w_clip[..., 1]) * res - wx - wy <= 1
    idx = jnp.where(lower, wy * res + wx, (res - 1 - wy) * res + (res - 1 - wx))
    return jnp.take_along_axis(tex, idx[..., None, None], axis=-2)[..., 0, :]


# ----------------------------------------------------------------------------
# Full rasterization (scan over face chunks)
# ----------------------------------------------------------------------------

def pixel_grid(image_size: int, dtype=jnp.float32):
    """NDC pixel centers; row 0 = top (y=+1), col 0 = left (x=-1)."""
    s = image_size
    xs = (2.0 * jnp.arange(s, dtype=dtype) + 1.0 - s) / s
    ys = (2.0 * (s - 1.0 - jnp.arange(s, dtype=dtype)) + 1.0 - s) / s
    xp = jnp.tile(xs[None, :], (s, 1)).reshape(-1)
    yp = jnp.tile(ys[:, None], (1, s)).reshape(-1)
    return xp, yp


def _safe_depth(pre: FacePre, w_clip: jax.Array, near, far):
    """Interpolated depth zp with sanitized gradients; valid z-range mask."""
    fz = jnp.where(jnp.abs(pre.fz) < 1e-8,
                   jnp.where(pre.fz < 0, -1e-8, 1e-8), pre.fz)
    inv_z = (w_clip / fz).sum(-1)
    inv_z = jnp.where(jnp.abs(inv_z) < 1e-12,
                      jnp.where(inv_z < 0, -1e-12, 1e-12), inv_z)
    zp = 1.0 / inv_z
    zvalid = (zp >= near) & (zp <= far)
    zp = jnp.where(zvalid, zp, far)  # constant on the invalid branch
    return zp, zvalid


def soft_rasterize_ref(
    face_vertices: jax.Array,  # [B, F, 3, 3]
    textures: jax.Array,       # [B, F, 3, K] (vertex) or [B, F, R*R, 3]
    cfg: RasterizeConfig,
    near,
    far,
) -> jax.Array:
    """Returns [B, K+1, H, W] (K texture channels + alpha)."""
    B, F = face_vertices.shape[:2]
    K = textures.shape[-1]
    assert len(cfg.background) == K, \
        f"background needs {K} entries, got {len(cfg.background)}"
    S = cfg.image_size
    dt = face_vertices.dtype
    # near/far are plain floats in the reference (implicitly detached when
    # crossing into the CUDA kernel) — freeze them here too.
    near = sg(jnp.broadcast_to(jnp.asarray(near, dt), (B,)))
    far = sg(jnp.broadcast_to(jnp.asarray(far, dt), (B,)))
    xp, yp = pixel_grid(S, dt)  # [P]

    C = min(cfg.face_chunk, F)
    pad = (-F) % C
    if pad:
        # Degenerate padding faces far off-screen: every pixel is beyond the
        # distance threshold (D=0) and the interpolated depth is z-culled.
        fv_pad = jnp.full((B, pad, 3, 3), 1e5, face_vertices.dtype).at[..., 2].set(1e9)
        face_vertices = jnp.concatenate([face_vertices, fv_pad], 1)
        textures = jnp.concatenate(
            [textures, jnp.zeros((B, pad) + textures.shape[2:], textures.dtype)], 1)
    n_chunks = face_vertices.shape[1] // C

    fv_chunks = face_vertices.reshape(B, n_chunks, C, 3, 3).transpose(1, 0, 2, 3, 4)
    tx_chunks = textures.reshape((B, n_chunks, C) + textures.shape[2:]).transpose(
        (1, 0, 2) + tuple(range(3, textures.ndim + 1)))

    bg = jnp.asarray(cfg.background, dt)
    P = S * S

    def init_carry():
        alpha = jnp.zeros((B, P), dt)
        if cfg.aggr_alpha == "prod":
            alpha = jnp.ones((B, P), dt)
        if cfg.aggr_rgb == "softmax":
            s_sum = jnp.full((B, P), jnp.exp(cfg.eps / cfg.gamma), dt)
            s_max = jnp.full((B, P), cfg.eps, dt)
            rgb = jnp.broadcast_to(bg[None, None] * s_sum[..., None], (B, P, K))
        else:  # hard
            s_sum = jnp.full((B, P), 1e7, dt)   # running min depth
            s_max = jnp.zeros((B, P), dt)
            rgb = jnp.broadcast_to(bg[None, None], (B, P, K)).astype(dt)
        return alpha, rgb, s_sum, s_max

    def chunk_step(carry, chunk):
        fv, tx = chunk  # [B, C, 3, 3], [B, C, T, 3]
        alpha, rgb, s_sum, s_max = carry
        pre = face_precompute(fv)

        # broadcast: faces [B, 1, C, ...] vs pixels [1, P, 1]
        pre_b = jax.tree.map(lambda a: a[:, None], pre)
        xpb, ypb = xp[None, :, None], yp[None, :, None]

        w, soft, valid = occupancy(pre_b, xpb, ypb, cfg)  # [B, P, C]
        soft = jnp.where(valid, soft, 0.0)

        if cfg.aggr_alpha == "prod":
            alpha = alpha * _prod_reduce(1.0 - soft)
        elif cfg.aggr_alpha == "sum":
            alpha = alpha + soft.sum(-1)
        else:  # hard
            alpha = jnp.maximum(alpha, jnp.max((soft > 0.5).astype(jnp.float32), -1))

        w_clip = barycentric_clip(w)
        nearb, farb = near[:, None, None], far[:, None, None]
        zp, zvalid = _safe_depth(pre_b, w_clip, nearb, farb)
        rgb_valid = valid & zvalid
        if not cfg.double_side:
            rgb_valid &= pre_b.frontside
        color = sample_texture(tx[:, None], w_clip, cfg)  # [B, P, C, 3]

        if cfg.aggr_rgb == "softmax":
            z_norm = (farb - zp) / (farb - nearb)
            # The exp argument must be masked *before* exponentiation: a
            # distance-culled face can carry z_norm above the running max of
            # the valid faces (e.g. background pixels), and exp would
            # overflow before the zero weight could kill it.  The CUDA kernel
            # `continue`s past such faces entirely.  The max element keeps its
            # own gradient (new_max is grad-free).
            z_for_max = jnp.where(rgb_valid, sg(z_norm), -jnp.inf)
            new_max = jnp.maximum(s_max, jnp.max(z_for_max, -1))
            scale = jnp.exp((s_max - new_max) / cfg.gamma)
            arg = jnp.where(rgb_valid, (z_norm - new_max[..., None]) / cfg.gamma,
                            -jnp.inf)
            wgt = jnp.where(rgb_valid, soft, 0.0) * jnp.exp(arg)
            s_sum = s_sum * scale + wgt.sum(-1)
            rgb = rgb * scale[..., None] + (wgt[..., None] * color).sum(-2)
            s_max = new_max
        else:  # hard z-buffer (no gradients; used for GT/eval renders)
            inside = jnp.all((w >= 0) & (w <= 1), -1)
            zb = jnp.where(rgb_valid & inside, zp, jnp.inf)
            k = jnp.argmin(zb, -1)
            zk = jnp.take_along_axis(zb, k[..., None], -1)[..., 0]
            hit = zk < s_sum
            s_sum = jnp.where(hit, zk, s_sum)
            ck = jnp.take_along_axis(color, k[..., None, None], -2)[..., 0, :]
            rgb = jnp.where(hit[..., None], ck, rgb)

        return (alpha, rgb, s_sum, s_max), None

    carry, _ = jax.lax.scan(chunk_step, init_carry(), (fv_chunks, tx_chunks))
    alpha, rgb, s_sum, _ = carry

    if cfg.aggr_alpha == "prod":
        alpha = 1.0 - alpha
    elif cfg.aggr_alpha == "sum":
        alpha = alpha / F
    if cfg.aggr_rgb == "softmax":
        rgb = rgb / s_sum[..., None]

    out = jnp.concatenate([rgb, alpha[..., None]], -1)  # [B, P, K+1]
    return out.reshape(B, S, S, K + 1).transpose(0, 3, 1, 2)
