"""Soft rasterizer — Pallas TPU kernel with custom VJP.

TPU-native re-derivation of the SoftRas CUDA kernels
(ref:third_party/softras/soft_renderer/cuda/soft_rasterize_cuda_kernel.cu):

  * CUDA launches one thread per pixel looping over all faces with atomicAdd
    gradient scatter.  Here: the grid walks (batch, pixel tiles); each kernel
    instance streams face chunks through VMEM with flash-attention-style
    running (softmax_sum, softmax_max, rgb, alpha-product) accumulators.
    The TPU grid is sequential per core, so the backward accumulates per-face
    gradients across pixel tiles by revisiting the same output block — no
    atomics needed.
  * Data layout is lane-friendly: per-face quantities live as rows of a
    [B, D, F] tensor (faces in lanes), pixels in sublanes; all pair math runs
    on [PT, C] tiles on the VPU.

Supported modes (the ones LASR trains with): dist_func='euclidean',
aggr_rgb='softmax', aggr_alpha='prod', texture_type='vertex', double-sided.
Everything else falls back to the jnp reference (ops/softras_ref.py), which
this kernel is tested against bit-for-intent (forward and VJP).

Gradient semantics match the CUDA backward (frozen closest point / frozen
clipped barycentrics).  One deliberate deviation: the CUDA backward drops the
alpha-channel gradient of faces whose interpolated depth falls outside
[near, far] (cuda_kernel.cu:599 `continue` skips the final scatter), while the
forward includes them in alpha; we keep forward/backward consistent.  LASR
sets near/far to cover the full depth range each step
(ref:nnutils/mesh_net.py:304-311), so the z-cull never fires in training.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .softras_ref import RasterizeConfig, soft_rasterize_ref

# facedata row indices ([B, D, F] layout)
_FX = 0          # 0-2   vertex x
_FY = 3          # 3-5   vertex y
_FZ = 6          # 6-8   vertex z
_INV = 9         # 9-17  barycentric matrix, row-major
_A0 = 18         # 18-26 per-edge face_sym differences a0_k[j] (k major)
_RDEN = 27       # 27-29 1 / (a0_k[v0] - a0_k[v1])
_A0V1 = 30       # 30-32 a0_k[v1]
_RFZ = 33        # 33-35 1 / vertex z
_OBT = 36        # 36-38 obtuse-corner flags
_TEX = 39        # 39-(39+3K-1) vertex colors (vertex major: row
#                  _TEX + K*j + k for vertex j, channel k); K = texture
#                  channels (3 for plain RGB; the merged model render uses 9)


def _drows(K: int) -> int:
    return _TEX + 3 * K


_EDGE = ((0, 1, 2), (1, 2, 0), (2, 0, 1))  # (v0, v1, v2) per edge k

# fwd_raw column layout ([B, P, OUT] with OUT = _out_cols(K)):
# 0..K-1 rgb out, K alpha, K+1 softmax_sum, K+2 softmax_max, rest zero pad.


def _out_cols(K: int) -> int:
    return max(8, -(-(K + 3) // 8) * 8)

# Tile geometry, overridable for hardware sweeps (exp/raster_tile_sweep.py):
# PT = pixels per kernel tile (sublanes; must divide S*S), C = faces per
# streamed chunk (lanes; multiple of 128).  Larger PT amortizes the chunk
# loop across more pixels but coarsens the per-tile y-band culling.
import os as _os

_DEFAULT_PT = int(_os.environ.get("LASR_RASTER_PT", 256))
_DEFAULT_C = int(_os.environ.get("LASR_RASTER_C", 128))
# chunks per y super-band for two-level (y, x) face binning; 0 = y-only.
# DEFAULT 0: grouping XG chunks into one y band makes every chunk's y-span
# XG times coarser, and with full-row tiles (PT=256) the x-cull that was
# supposed to pay for it never fires — measured +13 ms/step on the spot3
# training step.  Only worth exploring together with PT < S.
_DEFAULT_XG = int(_os.environ.get("LASR_RASTER_XG", 0))


def _sign_clamp(x, eps):
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)


def build_facedata(face_vertices: jax.Array, textures: jax.Array,
                   face_chunk: int = _DEFAULT_C, margin: float = 0.0,
                   xband_group: int | None = None):
    """[B, F, 3, 3] verts + [B, F, 3, 3] vertex colors ->
    (rows [B, _D, F'], chunk_bbox [B, F'//C, 4], inv_perm [B, F]).

    Faces are sorted by screen-y center so each chunk covers a compact y
    band; the kernels cull whole (pixel-tile, chunk) pairs against
    chunk_bbox (the TPU-shaped analogue of the CUDA kernel's per-pixel
    check_border early-exit, cuda_kernel.cu:375).  inv_perm maps original
    face ids to sorted positions so the VJP can unsort gradients.
    F' is F padded to a multiple of `face_chunk` with far-off-screen faces.
    Pure jnp; differentiation never crosses this function (the custom VJP
    produces vertex/texture gradients directly).
    """
    B, F = face_vertices.shape[:2]
    K = textures.shape[-1]
    if xband_group is None:
        xband_group = _DEFAULT_XG
    ycen = face_vertices[..., 1].mean(-1)                    # [B, F]
    if xband_group and F >= xband_group * face_chunk:
        # Two-level spatial binning: y-sort into super-bands of
        # xband_group*C faces, then x-sort within each band, so each chunk
        # is compact in BOTH axes.  Tiles narrower than a full image row
        # (PT < S) can then cull chunks on x as well as y — y-only culling
        # left every in-band chunk live for the whole row.  The composite
        # float key keeps band id dominant (x normalized to [0, 0.999]).
        xcen = face_vertices[..., 0].mean(-1)
        order1 = jnp.argsort(ycen, axis=1)
        x_s = jnp.take_along_axis(xcen, order1, 1)
        band = (jnp.arange(F) // (xband_group * face_chunk)) \
            .astype(jnp.float32)
        xmin = x_s.min(1, keepdims=True)
        xrange = x_s.max(1, keepdims=True) - xmin
        xr = jnp.clip((x_s - xmin) / jnp.maximum(xrange, 1e-12), 0.0, 1.0)
        order2 = jnp.argsort(band[None] + 0.999 * xr, axis=1)
        order = jnp.take_along_axis(order1, order2, 1)
    else:
        order = jnp.argsort(ycen, axis=1)
    inv_perm = jnp.argsort(order, axis=1)                    # orig -> sorted
    face_vertices = jnp.take_along_axis(
        face_vertices, order[:, :, None, None], 1)
    textures = jnp.take_along_axis(textures, order[:, :, None, None], 1)
    fx = face_vertices[..., 0]  # [B, F, 3]
    fy = face_vertices[..., 1]
    fz = face_vertices[..., 2]
    x0, x1, x2 = fx[..., 0], fx[..., 1], fx[..., 2]
    y0, y1, y2 = fy[..., 0], fy[..., 1], fy[..., 2]

    det = x2 * (y0 - y1) + x0 * (y1 - y2) + x1 * (y2 - y0)
    det = _sign_clamp(det, 1e-10)
    inv = jnp.stack([
        y1 - y2, x2 - x1, x1 * y2 - x2 * y1,
        y2 - y0, x0 - x2, x2 * y0 - x0 * y2,
        y0 - y1, x1 - x0, x0 * y1 - x1 * y0,
    ], -1) / det[..., None]                      # [B, F, 9]

    a0_rows, rden_rows, a0v1_rows = [], [], []
    for (v0, v1, _v2) in _EDGE:
        dx = fx[..., v0] - fx[..., v1]
        dy = fy[..., v0] - fy[..., v1]
        a0 = dx[..., None] * fx + dy[..., None] * fy   # [B, F, 3]
        a0_rows.append(a0)
        rden_rows.append(1.0 / _sign_clamp(a0[..., v0] - a0[..., v1], 1e-12))
        a0v1_rows.append(a0[..., v1])

    def obt_at(k0, k1, k2):
        return (((fx[..., k1] - fx[..., k0]) * (fx[..., k2] - fx[..., k0])
                 + (fy[..., k1] - fy[..., k0]) * (fy[..., k2] - fy[..., k0])) < 0)

    obt = [obt_at(*e).astype(jnp.float32) for e in
           ((0, 1, 2), (1, 2, 0), (2, 0, 1))]

    rfz = 1.0 / _sign_clamp(fz, 1e-8)
    tex = textures.reshape(B, F, 3 * K)

    rows = jnp.concatenate([
        fx, fy, fz, inv,
        jnp.concatenate(a0_rows, -1),
        jnp.stack(rden_rows, -1),
        jnp.stack(a0v1_rows, -1),
        rfz,
        jnp.stack(obt, -1),
        tex,
    ], -1)                                        # [B, F, 39+3K]
    assert rows.shape[-1] == _drows(K)
    rows = rows.transpose(0, 2, 1)                # [B, D, F]

    pad = (-F) % face_chunk
    if pad:
        padrow = jnp.zeros((B, _drows(K), pad), rows.dtype)
        # off-screen: xy=1e5 so every pixel is beyond the distance threshold;
        # rfz tiny so zp is huge and z-culled.
        padrow = padrow.at[:, _FX:_FX + 6].set(1e5)
        padrow = padrow.at[:, _RFZ:_RFZ + 3].set(1e-9)
        padrow = padrow.at[:, _RDEN:_RDEN + 3].set(1e12)
        rows = jnp.concatenate([rows, padrow], -1)

    Fp = rows.shape[-1]
    nchunks = Fp // face_chunk
    fyv = rows[:, _FY:_FY + 3].reshape(B, 3, nchunks, face_chunk)
    fxv = rows[:, _FX:_FX + 3].reshape(B, 3, nchunks, face_chunk)
    bbox = jnp.stack([
        fyv.min((1, 3)) - margin, fyv.max((1, 3)) + margin,
        fxv.min((1, 3)) - margin, fxv.max((1, 3)) + margin,
    ], -1)                                                    # [B, nchunks, 4]
    return rows, bbox, inv_perm


def _pair_geometry(fd, xp, yp, sigma, threshold):
    """Shared pair math for fwd/bwd kernels.

    fd: callable row -> [1, C] face-quantity slice; xp/yp: [PT, 1].
    Returns dict of [PT, C] arrays.
    """
    inv = [fd(_INV + i) for i in range(9)]
    w0 = inv[0] * xp + inv[1] * yp + inv[2]
    w1 = inv[3] * xp + inv[4] * yp + inv[5]
    w2 = inv[6] * xp + inv[7] * yp + inv[8]
    w = (w0, w1, w2)
    inside = ((w0 > 0) & (w0 < 1) & (w1 > 0) & (w1 < 1) & (w2 > 0) & (w2 < 1))

    fxv = [fd(_FX + j) for j in range(3)]
    fyv = [fd(_FY + j) for j in range(3)]

    # per-edge foot parameter t (fraction on v0): inside pixels use the raw
    # foot, outside the [0,1]-clamped one — selecting t per edge up front
    # halves the foot/distance math vs computing both variants
    t_sel = []
    for k, (v0, v1, _v2) in enumerate(_EDGE):
        a0 = [fd(_A0 + 3 * k + j) for j in range(3)]
        wa0 = w0 * a0[0] + w1 * a0[1] + w2 * a0[2]
        t = (wa0 - fd(_A0V1 + k)) * fd(_RDEN + k)
        t_sel.append(jnp.where(inside, t, jnp.clip(t, 0.0, 1.0)))

    def foot(k, t):
        """(tc0, tc1, tc2, dis_x, dis_y) for edge k with foot parameter t."""
        v0, v1, _ = _EDGE[k]
        tc = [None, None, None]
        tc[v0], tc[v1], tc[_EDGE[k][2]] = t, 1.0 - t, jnp.zeros_like(t)
        dis_x = tc[0] * fxv[0] + tc[1] * fxv[1] + tc[2] * fxv[2] - xp
        dis_y = tc[0] * fyv[0] + tc[1] * fyv[1] + tc[2] * fyv[2] - yp
        return tc, dis_x, dis_y

    feet = [foot(k, t_sel[k]) for k in range(3)]
    # inside: nearest of the 3 (unclamped) edge feet; d equals the raw-foot
    # distance there because t_sel == t_raw for inside pixels
    d = [dx * dx + dy * dy for _, dx, dy in feet]
    best01 = d[0] < d[1]
    best = jnp.where(best01 & (d[0] < d[2]), 0,
                     jnp.where(~best01 & (d[1] < d[2]), 1, 2))

    # outside: vertex-region selection with obtuse correction
    def corner_dot(k0, k2):
        return ((xp - fxv[k0]) * (fxv[k2] - fxv[k0])
                + (yp - fyv[k0]) * (fyv[k2] - fyv[k0])) > 0

    obt = [fd(_OBT + k) > 0.5 for k in range(3)]
    v0sel = jnp.where(
        (w1 <= 0) & (w2 <= 0),
        jnp.where(obt[0] & corner_dot(0, 2), 2, 0),
        jnp.where(
            (w2 <= 0) & (w0 <= 0),
            jnp.where(obt[1] & corner_dot(1, 0), 0, 1),
            jnp.where(
                (w0 <= 0) & (w1 <= 0),
                jnp.where(obt[2] & corner_dot(2, 1), 1, 2),
                jnp.where(w0 <= 0, 1, jnp.where(w1 <= 0, 2, 0)),
            ),
        ),
    )

    sel = jnp.where(inside, best, v0sel)

    def pick(items):
        out = items[2]
        for k in (1, 0):
            out = jnp.where(sel == k, items[k], out)
        return out

    dis_x = pick([f[1] for f in feet])
    dis_y = pick([f[2] for f in feet])
    tc = [pick([f[0][j] for f in feet]) for j in range(3)]

    dis = dis_x * dis_x + dis_y * dis_y
    sign = jnp.where(inside, 1.0, -1.0)
    logits = sign * dis / sigma
    valid = inside | (dis < threshold)
    # sigmoid and softplus share one exp(-|l|): sigmoid(l) = 1/(1+e) for
    # l >= 0 else e/(1+e); softplus(l) = max(l, 0) + log1p(e).  These are
    # exactly the numerically-stable forms jax.nn uses internally, but
    # computing them jointly halves the transcendental count of the
    # hottest per-(pixel, face) expression (the kernel pair is ~66% of the
    # training step, results/profile_r5.json).
    e = jnp.exp(-jnp.abs(logits))
    rden = 1.0 / (1.0 + e)
    soft = jnp.where(logits < 0, e * rden, rden)
    soft = jnp.where(valid, soft, 0.0)
    # log(1-D) = -softplus(logits); summed in log space because Mosaic has no
    # lane reduce_prod and the log-sum is better conditioned anyway.  Where
    # the f32 sigmoid saturates to exactly 1.0 the reference's product becomes
    # an exact 0 (and its backward zeroes out via the 1e-6 clamp); propagate
    # -inf so exp(logalpha) reproduces that exactly.
    sp = jnp.maximum(logits, 0.0) + jnp.log1p(e)
    log1m = jnp.where(valid,
                      jnp.where(soft >= 1.0, -jnp.inf, -sp), 0.0)

    # clipped barycentrics + interpolated depth
    wc0, wc1, wc2 = (jnp.clip(c, 0.0, 1.0) for c in w)
    rs = 1.0 / jnp.maximum(wc0 + wc1 + wc2, 1e-5)
    wc0, wc1, wc2 = wc0 * rs, wc1 * rs, wc2 * rs
    rfz = [fd(_RFZ + j) for j in range(3)]
    inv_z = _sign_clamp(wc0 * rfz[0] + wc1 * rfz[1] + wc2 * rfz[2], 1e-12)
    zp = 1.0 / inv_z

    return dict(valid=valid, soft=soft, log1m=log1m, sign=sign,
                dis_x=dis_x, dis_y=dis_y, tc=tc, wc=(wc0, wc1, wc2),
                zp=zp, rfz=rfz)


def _make_fd(data_ref, c0, C):
    def fd(row):
        return data_ref[0, row, pl.ds(c0, C)].reshape(1, C)
    return fd


def _tex_mat(data_ref, c0, C, K, j):
    """Vertex-j color block as a [K, C] matrix (rows are contiguous)."""
    return data_ref[0, pl.ds(_TEX + K * j, K), pl.ds(c0, C)]


def _mm(a, b, dims):
    """MXU matmul for the texture contractions, full-f32.

    precision=HIGHEST matters: the TPU MXU's default precision truncates f32
    inputs to bf16 (~3 decimal digits), which showed up as ~2e-2 relative
    drift in vertex gradients on hardware.  The contracted K dim is tiny
    (3..9 channels) so the extra passes are cheap.
    """
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _pixel_coords(t, PT, S):
    pix = t * PT + jax.lax.broadcasted_iota(jnp.int32, (PT, 1), 0)
    xi = (pix % S).astype(jnp.float32)
    row = (pix // S).astype(jnp.float32)
    xp = (2.0 * xi + 1.0 - S) / S
    yp = (S - 1.0 - 2.0 * row) / S
    return xp, yp


def _tile_ybounds(t, PT, S):
    r0 = (t * PT) // S
    r1 = ((t + 1) * PT - 1) // S
    ymax = (S - 1.0 - 2.0 * r0.astype(jnp.float32)) / S
    ymin = (S - 1.0 - 2.0 * r1.astype(jnp.float32)) / S
    return ymin, ymax


def _tile_xbounds(t, PT, S):
    """x-extent of pixel tile t.  Tiles narrower than a row (PT < S, with
    S % PT == 0) cover a contiguous column span of one row, so their x
    bounds cull chunks that are x-binned (build_facedata xband_group);
    full-row tiles span all of x and the x-check is a no-op."""
    if PT >= S:
        return -1.0, 1.0
    c0 = (t * PT) % S
    c1 = c0 + PT - 1
    xmin = (2.0 * c0.astype(jnp.float32) + 1.0 - S) / S
    xmax = (2.0 * c1.astype(jnp.float32) + 1.0 - S) / S
    return xmin, xmax


def _fwd_kernel(near_ref, far_ref, bbox_ref, data_ref, out_ref, *, S, PT, C,
                nchunks, K, sigma, gamma, eps, threshold, bg):
    t = pl.program_id(1)
    xp, yp = _pixel_coords(t, PT, S)
    b = pl.program_id(0)
    near = near_ref[b]
    far = far_ref[b]
    rzrange = 1.0 / (far - near)
    tile_ymin, tile_ymax = _tile_ybounds(t, PT, S)
    tile_xmin, tile_xmax = _tile_xbounds(t, PT, S)

    # Accumulators live in the out block and are updated under pl.when: a
    # lax.cond with a carried tuple lowers to predicated execution of BOTH
    # branches on Mosaic, which silently disabled the bbox culling (the
    # forward ran at dense cost, 3x the properly-culled backward).
    OUT = _out_cols(K)
    pad0 = jnp.zeros((PT, OUT - (K + 3)), jnp.float32)
    out_ref[0] = jnp.concatenate(
        [*(jnp.full((PT, 1), bg[k] * math.exp(eps / gamma), jnp.float32)
           for k in range(K)),
         jnp.zeros((PT, 1), jnp.float32),                        # log(1-a)
         jnp.full((PT, 1), math.exp(eps / gamma), jnp.float32),  # ssum
         jnp.full((PT, 1), eps, jnp.float32),                    # smax
         pad0], -1)

    def body(i, carry):
        overlap = ((bbox_ref[b, i, 0] <= tile_ymax)
                   & (bbox_ref[b, i, 1] >= tile_ymin)
                   & (bbox_ref[b, i, 2] <= tile_xmax)
                   & (bbox_ref[b, i, 3] >= tile_xmin))

        @pl.when(overlap)
        def _():
            acc = out_ref[0]
            rgb_mat = acc[:, :K]                             # [PT, K]
            logalpha = acc[:, K:K + 1]
            ssum = acc[:, K + 1:K + 2]
            smax = acc[:, K + 2:K + 3]

            fd = _make_fd(data_ref, i * C, C)
            g = _pair_geometry(fd, xp, yp, sigma, threshold)

            logalpha = logalpha + jnp.sum(g["log1m"], axis=-1, keepdims=True)

            zp = g["zp"]
            zvalid = (zp >= near) & (zp <= far)
            rgb_valid = g["valid"] & zvalid
            z_norm = (far - zp) * rzrange

            z_masked = jnp.where(rgb_valid, z_norm, -jnp.inf)
            new_max = jnp.maximum(smax, jnp.max(z_masked, -1, keepdims=True))
            scale = jnp.exp((smax - new_max) / gamma)
            wgt = jnp.where(rgb_valid, g["soft"], 0.0) * jnp.exp(
                jnp.where(rgb_valid, (z_norm - new_max) / gamma, -jnp.inf))
            ssum = ssum * scale + jnp.sum(wgt, -1, keepdims=True)

            # out[p,k] += sum_c wgt*(sum_j wc_j tex_jk): three [PT,C]x[K,C]^T
            # MXU matmuls instead of a K-loop of VPU lane reductions
            contrib = sum(
                _mm(wgt * g["wc"][j], _tex_mat(data_ref, i * C, C, K, j),
                    ((1,), (1,)))
                for j in range(3))                           # [PT, K]
            out_ref[0] = jnp.concatenate(
                [rgb_mat * scale + contrib, logalpha, ssum, new_max, pad0],
                -1)
        return carry

    jax.lax.fori_loop(0, nchunks, body, 0)

    acc = out_ref[0]
    rsum = 1.0 / acc[:, K + 1:K + 2]
    out_ref[0] = jnp.concatenate(
        [*(acc[:, k:k + 1] * rsum for k in range(K)),
         1.0 - jnp.exp(acc[:, K:K + 1]),
         acc[:, K + 1:K + 2], acc[:, K + 2:K + 3], pad0], -1)


def _bwd_kernel(near_ref, far_ref, bbox_ref, data_ref, fwd_ref, gout_ref,
                grad_ref, *, S, PT, C, nchunks, K, sigma, gamma, threshold):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        grad_ref[0, :, :] = jnp.zeros(grad_ref.shape[1:], jnp.float32)

    xp, yp = _pixel_coords(t, PT, S)
    b = pl.program_id(0)
    near = near_ref[b]
    far = far_ref[b]
    rzrange = 1.0 / (far - near)
    tile_ymin, tile_ymax = _tile_ybounds(t, PT, S)
    tile_xmin, tile_xmax = _tile_xbounds(t, PT, S)

    g_rgb_mat = gout_ref[0, :, :K]                           # [PT, K]
    g_alpha = gout_ref[0, :, K].reshape(PT, 1)
    out_rgb_mat = fwd_ref[0, :, :K]
    out_alpha = fwd_ref[0, :, K].reshape(PT, 1)
    g_dot_out = jnp.sum(g_rgb_mat * out_rgb_mat, -1, keepdims=True)
    ssum = fwd_ref[0, :, K + 1].reshape(PT, 1)
    smax = fwd_ref[0, :, K + 2].reshape(PT, 1)
    rssum = 1.0 / ssum

    def work(i):
        c0 = i * C
        fd = _make_fd(data_ref, c0, C)
        g = _pair_geometry(fd, xp, yp, sigma, threshold)
        soft = g["soft"]
        valid = g["valid"]

        # alpha ('prod'): dL/dD = g_alpha * prod_{j != f}(1-D_j)
        #               = g_alpha * (1 - alpha_out) / max(1-D, 1e-6)
        C_alpha = g_alpha * (1.0 - out_alpha) / jnp.maximum(1.0 - soft, 1e-6)
        C_alpha = jnp.where(valid, C_alpha, 0.0)

        zp = g["zp"]
        zvalid = (zp >= near) & (zp <= far)
        rgb_valid = valid & zvalid
        z_norm = (far - zp) * rzrange
        zsm = jnp.where(rgb_valid, soft, 0.0) * jnp.exp(
            jnp.where(rgb_valid, (z_norm - smax) / gamma, -jnp.inf)) * rssum

        wc = g["wc"]
        # sum_k g_rgb_k*(col_k - out_rgb_k) with col_k = sum_j wc_j tex_jk,
        # restructured as MXU matmuls over the K channels:
        #   sum_j wc_j * (g_rgb @ T_j) - <g_rgb, out_rgb>
        C_rgb = -g_dot_out
        for j in range(3):
            Tj = _tex_mat(data_ref, c0, C, K, j)             # [K, C]
            C_rgb += wc[j] * _mm(g_rgb_mat, Tj, ((1,), (0,)))
            # texture grads (rows 9..9+3K-1, vertex major), all K channels
            # in one [PT,K]^T x [PT,C] contraction over pixels
            gt = _mm(g_rgb_mat, zsm * wc[j], ((0,), (0,)))   # [K, C]
            grad_ref[0, pl.ds(9 + K * j, K), pl.ds(c0, C)] += gt
        C_rgb = C_rgb * zsm

        # z grads: rows 6..8
        C_z = C_rgb / gamma * (-rzrange) * zp * zp
        for j in range(3):
            gz = jnp.sum(C_z * wc[j] * g["rfz"][j] * g["rfz"][j],
                         axis=0, keepdims=True)
            grad_ref[0, 6 + j:7 + j, pl.ds(c0, C)] += gz

        # xy grads through the sigmoid-distance chain: rows 0..5
        C_xy = C_alpha + jnp.where(soft > 0, C_rgb / jnp.maximum(soft, 1e-30), 0.0)
        C_xy = C_xy * soft * (1.0 - soft) / sigma
        base = 2.0 * g["sign"] * C_xy
        for j in range(3):
            gx = jnp.sum(base * g["tc"][j] * g["dis_x"], axis=0, keepdims=True)
            gy = jnp.sum(base * g["tc"][j] * g["dis_y"], axis=0, keepdims=True)
            grad_ref[0, 0 + j:1 + j, pl.ds(c0, C)] += gx
            grad_ref[0, 3 + j:4 + j, pl.ds(c0, C)] += gy

    def body(i, carry):
        overlap = ((bbox_ref[b, i, 0] <= tile_ymax)
                   & (bbox_ref[b, i, 1] >= tile_ymin)
                   & (bbox_ref[b, i, 2] <= tile_xmax)
                   & (bbox_ref[b, i, 3] >= tile_xmin))

        @pl.when(overlap)
        def _():
            work(i)
        return carry

    jax.lax.fori_loop(0, nchunks, body, 0)


def _supported(cfg: RasterizeConfig, image_size_sq_pt: bool = True) -> bool:
    return (cfg.dist_func == "euclidean" and cfg.aggr_rgb == "softmax"
            and cfg.aggr_alpha == "prod" and cfg.texture_type == "vertex"
            and cfg.double_side)


def _facedata_K(facedata) -> int:
    return (facedata.shape[1] - _TEX) // 3


def _fwd_pallas(facedata, bbox, near, far, cfg: RasterizeConfig,
                interpret: bool):
    B = facedata.shape[0]
    Fp = facedata.shape[2]
    K = _facedata_K(facedata)
    OUT = _out_cols(K)
    S = cfg.image_size
    P = S * S
    PT = min(_DEFAULT_PT, P)
    C = _DEFAULT_C
    assert P % PT == 0 and Fp % C == 0
    kern = functools.partial(
        _fwd_kernel, S=S, PT=PT, C=C, nchunks=Fp // C, K=K,
        sigma=cfg.sigma, gamma=cfg.gamma, eps=cfg.eps,
        threshold=cfg.dist_threshold, bg=cfg.background)
    return pl.pallas_call(
        kern,
        grid=(B, P // PT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _drows(K), Fp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PT, OUT), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, OUT), jnp.float32),
        interpret=interpret,
    )(near, far, bbox, facedata)


def _bwd_pallas(facedata, bbox, fwd_raw, gout, near, far,
                cfg: RasterizeConfig, interpret: bool):
    B = facedata.shape[0]
    Fp = facedata.shape[2]
    K = _facedata_K(facedata)
    OUT = _out_cols(K)
    G = 9 + 3 * K
    S = cfg.image_size
    P = S * S
    PT = min(_DEFAULT_PT, P)
    C = _DEFAULT_C
    kern = functools.partial(
        _bwd_kernel, S=S, PT=PT, C=C, nchunks=Fp // C, K=K,
        sigma=cfg.sigma, gamma=cfg.gamma, threshold=cfg.dist_threshold)
    return pl.pallas_call(
        kern,
        grid=(B, P // PT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _drows(K), Fp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PT, OUT), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PT, K + 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, Fp), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, Fp), jnp.float32),
        interpret=interpret,
    )(near, far, bbox, facedata, fwd_raw, gout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def soft_rasterize_pallas(face_vertices, textures, near, far,
                          cfg: RasterizeConfig, interpret: bool = False,
                          channel_last: bool = False):
    """[B, F, 3, 3] verts + [B, F, 3, K] vertex colors -> [B, K+1, H, W]
    (or [B, H, W, K+1] with channel_last=True — the kernel's native pixel-
    major layout; requesting it skips a [B, S, S, K+1] transpose copy pair
    in BOTH directions of the autodiff, measured at ~1.5 ms/step each way
    on the merged 10-channel training render, results/profile_r5.json)."""
    out, _ = _pallas_fwd(face_vertices, textures, near, far, cfg, interpret,
                         channel_last)
    return out


def _pallas_fwd(face_vertices, textures, near, far, cfg, interpret,
                channel_last=False):
    B, F = face_vertices.shape[:2]
    K = textures.shape[-1]
    assert len(cfg.background) == K, \
        f"background needs {K} entries, got {len(cfg.background)}"
    S = cfg.image_size
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (B,))
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (B,))
    facedata, bbox, inv_perm = build_facedata(
        face_vertices.astype(jnp.float32), textures.astype(jnp.float32),
        margin=math.sqrt(cfg.dist_threshold))
    fwd_raw = _fwd_pallas(facedata, bbox, near, far, cfg, interpret)
    out = fwd_raw[..., :K + 1].reshape(B, S, S, K + 1)
    if not channel_last:
        out = out.transpose(0, 3, 1, 2)
    return out, (facedata, bbox, inv_perm, fwd_raw, near, far, F)


def _pallas_bwd(cfg, interpret, channel_last, res, g):
    facedata, bbox, inv_perm, fwd_raw, near, far, F = res
    B = facedata.shape[0]
    K = _facedata_K(facedata)
    G = 9 + 3 * K
    P = cfg.image_size ** 2
    if not channel_last:
        g = g.transpose(0, 2, 3, 1)
    gout = g.reshape(B, P, K + 1).astype(jnp.float32)
    grads = _bwd_pallas(facedata, bbox, fwd_raw, gout, near, far, cfg,
                        interpret)
    # Unsort back to the caller's face order.  As a take_along_axis this is
    # a lane-axis gather with per-batch indices that XLA lowers to a
    # serialized custom fusion measured at 9.3 ms/step — 16% of the whole
    # training step (results/profile_r5.json, %fusion.1878).  A permutation
    # is a one-hot matmul, so contract on the MXU instead:
    # out[b, g, j] = grads[b, g, inv_perm[b, j]].
    Fp = grads.shape[-1]
    onehot = (inv_perm[:, :, None] ==
              jnp.arange(Fp)[None, None]).astype(grads.dtype)   # [B, Fp, Fp]
    grads = jnp.einsum("bgk,bjk->bgj", grads, onehot,
                       precision=jax.lax.Precision.HIGHEST)
    gx = grads[:, 0:3].transpose(0, 2, 1)        # [B, F, 3]
    gy = grads[:, 3:6].transpose(0, 2, 1)
    gz = grads[:, 6:9].transpose(0, 2, 1)
    g_verts = jnp.stack([gx, gy, gz], -1)        # [B, F, 3, 3]
    g_tex = grads[:, 9:G].transpose(0, 2, 1).reshape(B, F, 3, K)
    return g_verts, g_tex, None, None


soft_rasterize_pallas.defvjp(_pallas_fwd, _pallas_bwd)
