"""VCN-robust optical flow network — JAX/TPU inference port.

Behavioral port of the reference's preprocessing flow model
(ref:third_party/ext_nnutils/VCNplus.py:159 `VCN`, submodule.py `pspnet`,
conv4d.py `butterfly4D`/`sepConv4d`), eval-mode semantics only: LASR runs
this net offline inside preprocess/auto_gen.py to produce flo-/occ- PFMs;
it is never trained here.

Design differences from the torch original (TPU-first, not a translation):

* Pure functional NHWC pipeline over a nested-dict param pytree — one jit
  per input shape, no modules, no size-bound buffers (the reference rebuilds
  `flow_reg`/`WarpModule` per input size, ref:preprocess/auto_gen.py:110-117;
  here everything is shape-polymorphic at trace time).
* Cost volumes are laid out [b, u, v, h, w, c] and the per-(u,v)-offset
  correlation is built from statically unrolled shifted products of a single
  zero-padded feature map — XLA fuses the 81 slice-multiplies; the 4D
  "butterfly" convolutions become pairs of dense 2D convolutions over (u,v)
  and (h, w) with the complementary axes folded into the batch dimension,
  which keeps every contraction on the MXU.
* The truncated soft winner-take-all (ref:VCNplus.py:68-112) is an argmax +
  window mask + masked softmax expectation — no scatter, no maxpool trick.

`convert_torch_state` maps a torch `state_dict` (e.g. the published
`vcn_rob.pth`) onto this param tree; tests/test_vcn.py checks numerical
parity against the reference torch implementation on random weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LEAK = 0.1
BN_EPS = 1e-5

# Per-level max displacement (u = x axis) and squeeze factors
# (ref:preprocess/auto_gen.py:60 md=[4,4,4,4,4], VCNplus.py:342 facs).
MD = (4, 4, 4, 4, 4)
FDIM = (16, 16, 16, 16, 12)


# ---------------------------------------------------------------------------
# primitive layers


def _lrelu(x):
    return jnp.where(x >= 0, x, LEAK * x)


def _conv2d(x, w, b=None, stride=1, dilation=1, padding=0):
    """NHWC conv, HWIO weights, symmetric int padding (torch-style)."""
    s = (stride, stride) if isinstance(stride, int) else stride
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    p = (padding, padding) if isinstance(padding, int) else padding
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=s, padding=[(p[0], p[0]), (p[1], p[1])],
        rhs_dilation=d, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b
    return out


def _bn(x, p):
    scale = p["w"] / jnp.sqrt(p["v"] + BN_EPS)
    return (x - p["m"]) * scale + p["b"]


def _cbr(p, x, stride=1, dilation=1, padding=None):
    """conv2DBatchNormRelu (ref:submodule.py:100): conv+BN+leaky-relu."""
    k = p["conv"].shape[0]
    if padding is None:
        padding = dilation if dilation > 1 else k // 2
    return _lrelu(_bn(_conv2d(x, p["conv"], stride=stride, dilation=dilation,
                              padding=padding), p["bn"]))


def _cb(p, x, stride=1, padding=None):
    """conv2DBatchNorm (ref:submodule.py:76)."""
    k = p["conv"].shape[0]
    if padding is None:
        padding = k // 2
    return _bn(_conv2d(x, p["conv"], stride=stride, padding=padding), p["bn"])


def _resize_axis(x, axis, new_size):
    """torch F.interpolate(mode=linear, align_corners=False) along one axis."""
    n = x.shape[axis]
    if n == new_size:
        return x
    scale = n / new_size
    src = jnp.clip((jnp.arange(new_size) + 0.5) * scale - 0.5, 0.0, n - 1.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    t = (src - i0).astype(x.dtype)
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = new_size
    t = t.reshape(shape)
    return x0 * (1.0 - t) + x1 * t


def _resize_bilinear(x, size, axes=(1, 2)):
    return _resize_axis(_resize_axis(x, axes[0], size[0]), axes[1], size[1])


def _avg_pool(x, k, s):
    out = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                (1, k[0], k[1], 1), (1, s[0], s[1], 1),
                                "VALID")
    return out / (k[0] * k[1])


def _max_pool_3x3s2p1(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1),
                                                (0, 0)])


# ---------------------------------------------------------------------------
# pspnet feature pyramid (ref:submodule.py:158-272, is_proj=False)


def _res_block(p, x, stride):
    out = _cbr(p["conv1"], x, stride=stride)
    out = _cb(p["conv2"], out)
    res = x
    if "down" in p:
        res = _bn(_conv2d(x, p["down"]["conv"], stride=stride), p["down"]["bn"])
    return _lrelu(out + res)


def _pyramid_pooling(p, x):
    """ref:submodule.py:127-156 (levels=3)."""
    h, w = x.shape[1], x.shape[2]
    k_sizes = []
    for pool_size in np.linspace(1, min(h, w) // 2, 3, dtype=int):
        k_sizes.append((int(h / pool_size), int(w / pool_size)))
    k_sizes = k_sizes[::-1]
    pp_sum = x
    for i in range(3):
        out = _avg_pool(x, k_sizes[i], k_sizes[i])
        out = _cbr(p["paths"][i], out, padding=0)
        out = _resize_bilinear(out, (h, w))
        pp_sum = pp_sum + out / 3.0
    return _lrelu(pp_sum / 2.0)


def pspnet(p, x):
    """x [B,H,W,3] -> features at 1/64, 1/32, 1/16, 1/8, 1/4 resolution."""
    x = _cbr(p["conv1_1"], x, stride=2)
    x = _cbr(p["conv1_2"], x)
    conv1 = _cbr(p["conv1_3"], x)
    pool1 = _max_pool_3x3s2p1(conv1)
    rconv3 = _res_block(p["res3"], pool1, 2)
    conv4 = _res_block(p["res5"], rconv3, 2)
    conv5 = _res_block(p["res6"], conv4, 2)
    conv6 = _res_block(p["res7"], conv5, 2)
    conv6 = _pyramid_pooling(p["pp"], conv6)

    conv6x = _resize_bilinear(conv6, conv5.shape[1:3])
    conv5 = _cbr(p["iconv5"],
                 jnp.concatenate([conv5, _cbr(p["upconv6"], conv6x)], -1))
    conv5x = _resize_bilinear(conv5, conv4.shape[1:3])
    conv4 = _cbr(p["iconv4"],
                 jnp.concatenate([conv4, _cbr(p["upconv5"], conv5x)], -1))
    conv4x = _resize_bilinear(conv4, rconv3.shape[1:3])
    conv3 = _cbr(p["iconv3"],
                 jnp.concatenate([rconv3, _cbr(p["upconv4"], conv4x)], -1))
    conv3x = _resize_bilinear(conv3, pool1.shape[1:3])
    conv2 = _cbr(p["iconv2"],
                 jnp.concatenate([pool1, _cbr(p["upconv3"], conv3x)], -1))
    return conv6, conv5, conv4, conv3, conv2


# ---------------------------------------------------------------------------
# 4D cost-volume convolutions (ref:conv4d.py)
# cost layout here: [b, u, v, h, w, c]


def _conv_uv(x, w, b=None, bn=None, stride=1):
    """k×k conv over (u, v), identity over (h, w) (ref torch `conv2`,
    Conv3d (k,k,1) on the [b,c,u,v,h*w] view)."""
    bsz, u, v, h, wd, c = x.shape
    y = x.transpose(0, 3, 4, 1, 2, 5).reshape(bsz * h * wd, u, v, c)
    k = w.shape[0]
    y = _conv2d(y, w, b, stride=stride, padding=k // 2)
    u2, v2 = y.shape[1], y.shape[2]
    y = y.reshape(bsz, h, wd, u2, v2, -1).transpose(0, 3, 4, 1, 2, 5)
    if bn is not None:
        y = _bn(y, bn)
    return y


def _conv_hw(x, w, b=None, bn=None, stride=1):
    """k×k conv over (h, w), identity over (u, v) (ref torch `conv1`)."""
    bsz, u, v, h, wd, c = x.shape
    y = x.reshape(bsz * u * v, h, wd, c)
    k = w.shape[0]
    y = _conv2d(y, w, b, stride=stride, padding=k // 2)
    h2, w2 = y.shape[1], y.shape[2]
    y = y.reshape(bsz, u, v, h2, w2, -1)
    if bn is not None:
        y = _bn(y, bn)
    return y


def _sepconv4d(p, x, stride=1, full=True):
    """ref:conv4d.py:198-245: (u,v) conv → relu → (h,w) conv → opt. proj."""
    x = _conv_uv(x, p["convuv"]["w"], p["convuv"].get("b"),
                 p["convuv"].get("bn"), stride=stride)
    x = jax.nn.relu(x)
    x = _conv_hw(x, p["convhw"]["w"], p["convhw"].get("b"),
                 p["convhw"].get("bn"), stride=stride if full else 1)
    if "proj" in p:
        x = jnp.einsum("...i,io->...o", x, p["proj"]["w"])
        if "b" in p["proj"]:
            x = x + p["proj"]["b"]
        if "bn" in p["proj"]:
            x = _bn(x, p["proj"]["bn"])
    return x


def _projfeat4d(p, x, stride=1):
    """1×1 channel conv with (u,v) stride + BN (ref:conv4d.py:178-196)."""
    if stride > 1:
        x = x[:, ::stride, ::stride]
    y = jnp.einsum("...i,io->...o", x, p["w"])
    if "b" in p:
        y = y + p["b"]
    if "bn" in p:
        y = _bn(y, p["bn"])
    return y


def _sep_block(p, x, stride=1, full=True):
    """sepConv4dBlock (ref:conv4d.py:248-273)."""
    out = jax.nn.relu(_sepconv4d(p["conv1"], x, stride=stride, full=full))
    if "down_sep" in p:
        x = _sepconv4d(p["down_sep"], x, stride=stride, full=True)
    elif "down_proj" in p:
        x = _projfeat4d(p["down_proj"], x, stride=stride)
    return jax.nn.relu(x + _sepconv4d(p["conv2"], out, stride=1, full=full))


def _butterfly4d(p, x, full):
    """ref:conv4d.py:137-174: U-Net over the (u,v[,h,w]) axes."""
    out = jax.nn.relu(_projfeat4d(p["proj"], x))
    b, u, v, h, w, c = out.shape
    out1 = _sep_block(p["conva1"], out, stride=2, full=full)
    _, u1, v1, h1, w1, _ = out1.shape
    out2 = _sep_block(p["conva2"], out1, stride=2, full=full)
    out2 = _sep_block(p["convb3"], out2, 1, full)

    tout1 = _resize_bilinear(out2, (u1, v1), axes=(1, 2))
    tout1 = _resize_bilinear(tout1, (h1, w1), axes=(3, 4))
    out1 = _sep_block(p["convb2"], tout1 + out1, 1, full)

    tout = _resize_bilinear(out1, (u, v), axes=(1, 2))
    tout = _resize_bilinear(tout, (h, w), axes=(3, 4))
    return _sep_block(p["convb1"], tout + out, 1, full)


# ---------------------------------------------------------------------------
# matching pieces (ref:VCNplus.py)


def _corrf(ref, tar, md, fac=1):
    """Per-channel shifted correlation volume [b,u,v,h,w,c]
    (eval-mode path of ref:VCNplus.py:350-373: out-of-range cells are 0).

    u indexes x-displacement in [-md, md]; v indexes y-displacement in
    [-md//fac, md//fac]; cost[u,v,y,x] = ref[y,x] * tar[y+dv, x+du].
    """
    mdv = int(md // fac)
    b, h, w, c = tar.shape
    tarp = jnp.pad(tar, ((0, 0), (mdv, mdv), (md, md), (0, 0)))
    rows = []
    for du in range(-md, md + 1):
        row = []
        for dv in range(-mdv, mdv + 1):
            shifted = jax.lax.dynamic_slice(
                tarp, (0, dv + mdv, du + md, 0), (b, h, w, c))
            row.append(ref * shifted)
        rows.append(jnp.stack(row, 1))
    cost = jnp.stack(rows, 1)  # [b, u, v, h, w, c]
    return _lrelu(cost)


def _flow_reg(cost, md, fac=1, wsize=3):
    """Truncated soft winner-take-all (ref:VCNplus.py:40-112, ent=True).

    cost [B, u, v, h, w] -> (flow [B, 2, h, w], ent [B, 2, h, w]).
    """
    B, u, v, h, w = cost.shape
    mdv = int(md // fac)
    flat = cost.reshape(B, u * v, h, w)
    idx = jnp.argmax(flat, axis=1)
    ustar, vstar = idx // v, idx % v
    uu = jnp.arange(u).reshape(1, u, 1, 1, 1)
    vv = jnp.arange(v).reshape(1, 1, v, 1, 1)
    mask = ((jnp.abs(uu - ustar[:, None, None]) <= wsize)
            & (jnp.abs(vv - vstar[:, None, None]) <= wsize))
    masked = jnp.where(mask, cost, -jnp.inf)
    prob = jax.nn.softmax(masked.reshape(B, u * v, h, w), axis=1)
    prob = prob.reshape(B, u, v, h, w)

    dispx = (jnp.arange(u) - md).astype(cost.dtype).reshape(1, u, 1, 1, 1)
    dispy = (jnp.arange(v) - mdv).astype(cost.dtype).reshape(1, 1, v, 1, 1)
    outx = (prob * dispx).sum((1, 2))
    outy = (prob * dispy).sum((1, 2))

    clamped = jnp.clip(prob, 1e-9, 1 - 1e-9)
    local_ent = (-prob * jnp.log(clamped)).sum((1, 2))
    local_ent = local_ent / np.log((wsize * 2 + 1) ** 2)
    gprob = jax.nn.softmax(flat, axis=1).reshape(B, u, v, h, w)
    gclamped = jnp.clip(gprob, 1e-9, 1 - 1e-9)
    global_ent = (-gprob * jnp.log(gclamped)).sum((1, 2)) / np.log(u * v)

    return (jnp.stack([outx, outy], 1), jnp.stack([local_ent, global_ent], 1))


def _warp(x, flo):
    """Backward-warp x [b,h,w,c] by flow [b,h,w,2] (px), zero out-of-view
    (ref:VCNplus.py:115-148, grid_sample align_corners=True)."""
    b, h, w, c = x.shape
    gx = jnp.arange(w, dtype=x.dtype) + flo[..., 0]
    gy = jnp.arange(h, dtype=x.dtype).reshape(1, h, 1) + flo[..., 1]
    ngx = 2.0 * gx / max(w - 1, 1) - 1.0
    ngy = 2.0 * gy / max(h - 1, 1) - 1.0
    inb = (jnp.abs(ngx) < 1) & (jnp.abs(ngy) < 1)

    ix = (ngx + 1) * 0.5 * (w - 1)
    iy = (ngy + 1) * 0.5 * (h - 1)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0

    def gather(yy, xx):
        valid = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1))
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        flat = x.reshape(b, h * w, c)
        g = jnp.take_along_axis(
            flat, (yc * w + xc).reshape(b, h * w, 1), axis=1).reshape(x.shape)
        return g * valid[..., None]

    out = ((1 - tx)[..., None] * (1 - ty)[..., None] * gather(iy0, ix0)
           + tx[..., None] * (1 - ty)[..., None] * gather(iy0, ix0 + 1)
           + (1 - tx)[..., None] * ty[..., None] * gather(iy0 + 1, ix0)
           + tx[..., None] * ty[..., None] * gather(iy0 + 1, ix0 + 1))
    return out * inb[..., None], inb


def _conv_stack(p, x):
    """PWC-style dilated refinement stack (ref:VCNplus.py:214-220 etc.):
    6× (biased conv+BN+leaky-relu) with dilations 1,2,4,8,16,1 + final
    plain conv (ref submodule.py:68-73 `conv` keeps the conv bias AND BN)."""
    for layer, dil in zip(p["layers"], (1, 2, 4, 8, 16, 1)):
        y = _conv2d(x, layer["conv"], layer["bias"], dilation=dil,
                    padding=dil)
        x = _lrelu(_bn(y, layer["bn"]))
    return _conv2d(x, p["final"]["w"], p["final"]["b"], padding=1)


def _cost_matching(p, level, up_flow, c1, c2, flowh, enth, full):
    """One pyramid level (ref:VCNplus.py:375-427, eval semantics)."""
    md, fac = MD[level], 1
    c1n = c1 / (jnp.linalg.norm(c1, axis=-1, keepdims=True) + 1e-9)
    c2n = c2 / (jnp.linalg.norm(c2, axis=-1, keepdims=True) + 1e-9)
    warp = c2n if level == 0 else _warp(c2n, up_flow)[0]

    feat = _butterfly4d(p["f"], _corrf(c1n, warp, md, fac), full=full)
    cost = _sepconv4d(p["p"], feat, stride=1, full=full)  # [b,u,v,h,w,k]

    b, u, v, h, w, k = cost.shape
    cvol = cost.transpose(0, 5, 1, 2, 3, 4).reshape(b * k, u, v, h, w)
    flowhh, enthh = _flow_reg(cvol, md, fac)     # [b*k, 2, h, w]
    flowhh = flowhh.reshape(b, k, 2, h, w)
    if level > 0:
        flowhh = flowhh + up_flow.transpose(0, 3, 1, 2)[:, None]
    enthh = enthh.reshape(b, k, 2, h, w)

    if level == 0:
        flowh = flowhh
        enth = enthh
    else:
        def up_hyp(t, scale):
            bb, kk, two, hh, ww = t.shape
            t = _resize_bilinear(t.reshape(bb, kk * two, hh, ww),
                                 (h, w), axes=(2, 3))
            return t.reshape(bb, kk, two, h, w) * scale
        flowh = jnp.concatenate([flowhh, up_hyp(flowh, 2.0)], 1)
        enth = jnp.concatenate([enthh, up_hyp(enth, 1.0)], 1)

    kh = flowh.shape[1]
    ent_img = enth.reshape(b, kh * 2, h, w).transpose(0, 2, 3, 1)
    flow_img = flowh.reshape(b, kh * 2, h, w).transpose(0, 2, 3, 1)
    x = jnp.concatenate([ent_img, flow_img, c1], -1)

    oor = _conv_stack(p["oor"], x)[..., 0] if level == 4 else None
    va = _conv_stack(p["fuse"], x)            # [b, h, w, 2*kh]
    va = va.reshape(b, h, w, kh, 2)
    weights = jax.nn.softmax(va, axis=3)
    hyp = flowh.transpose(0, 3, 4, 1, 2)      # [b, h, w, kh, 2]
    flow = (hyp * weights).sum(3)             # [b, h, w, 2]
    return flow, flowh, enth, oor


def vcn_forward(params, im_lr):
    """im_lr [2b, H, W, 3] (left batch then right batch, H/W multiples of 64)
    -> (flow [b, H, W, 2] in input pixels, oor [b, H/4, W/4] logits).

    Mirrors ref:VCNplus.py:513-543.
    """
    bs = im_lr.shape[0] // 2
    H, W = im_lr.shape[1], im_lr.shape[2]
    feats = pspnet(params["pspnet"], im_lr)
    pairs = [(f[:bs], f[bs:]) for f in feats]

    flow, flowh, enth, oor = None, None, None, None
    for level in range(5):
        c1, c2 = pairs[level]
        if level == 0:
            up_flow = None
        else:
            size = (H // 2 ** (6 - level), W // 2 ** (6 - level))
            up_flow = _resize_bilinear(flow, size) * 2.0
        flow, flowh, enth, oor = _cost_matching(
            params["levels"][level], level, up_flow, c1, c2, flowh, enth,
            full=(level == 4))
    flow = _resize_bilinear(flow, (H, W)) * 4.0
    return flow, oor


# ---------------------------------------------------------------------------
# torch checkpoint conversion


def _t(state, key):
    v = state[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _conv2d_w(state, key):
    return jnp.asarray(_t(state, key).transpose(2, 3, 1, 0))   # OIHW -> HWIO


def _bn_p(state, prefix):
    return {"w": jnp.asarray(_t(state, prefix + ".weight")),
            "b": jnp.asarray(_t(state, prefix + ".bias")),
            "m": jnp.asarray(_t(state, prefix + ".running_mean")),
            "v": jnp.asarray(_t(state, prefix + ".running_var"))}


def _cbr_p(state, prefix, unit="cbr_unit"):
    return {"conv": _conv2d_w(state, f"{prefix}.{unit}.0.weight"),
            "bn": _bn_p(state, f"{prefix}.{unit}.1")}


def _res_p(state, prefix):
    p = {"conv1": _cbr_p(state, prefix + ".convbnrelu1"),
         "conv2": _cbr_p(state, prefix + ".convbn2", unit="cb_unit")}
    if prefix + ".downsample.0.weight" in state:
        p["down"] = {"conv": _conv2d_w(state, prefix + ".downsample.0.weight"),
                     "bn": _bn_p(state, prefix + ".downsample.1")}
    return p


def _sep_p(state, prefix, with_bn):
    """sepConv4d params. torch `conv2` = (u,v)-conv (kernel (k,k,1)); torch
    `conv1` = (h,w)-conv (kernel (1,k,k))."""
    p = {}
    if with_bn:
        wuv = _t(state, prefix + ".conv2.0.weight")      # [O,I,k,k,1]
        p["convuv"] = {"w": jnp.asarray(wuv[..., 0].transpose(2, 3, 1, 0)),
                       "bn": _bn_p(state, prefix + ".conv2.1")}
        whw = _t(state, prefix + ".conv1.0.weight")      # [O,I,1,k,k]
        p["convhw"] = {"w": jnp.asarray(whw[:, :, 0].transpose(2, 3, 1, 0)),
                       "bn": _bn_p(state, prefix + ".conv1.1")}
        if prefix + ".proj.0.weight" in state:
            wp = _t(state, prefix + ".proj.0.weight")    # [O,I,1,1]
            p["proj"] = {"w": jnp.asarray(wp[:, :, 0, 0].T),
                         "bn": _bn_p(state, prefix + ".proj.1")}
    else:
        wuv = _t(state, prefix + ".conv2.weight")
        p["convuv"] = {"w": jnp.asarray(wuv[..., 0].transpose(2, 3, 1, 0)),
                       "b": jnp.asarray(_t(state, prefix + ".conv2.bias"))}
        whw = _t(state, prefix + ".conv1.weight")
        p["convhw"] = {"w": jnp.asarray(whw[:, :, 0].transpose(2, 3, 1, 0)),
                       "b": jnp.asarray(_t(state, prefix + ".conv1.bias"))}
        if prefix + ".proj.weight" in state:
            wp = _t(state, prefix + ".proj.weight")
            p["proj"] = {"w": jnp.asarray(wp[:, :, 0, 0].T),
                         "b": jnp.asarray(_t(state, prefix + ".proj.bias"))}
    return p


def _projfeat_p(state, prefix):
    w = _t(state, prefix + ".conv1.weight")              # [O,I,1,1,1]
    p = {"w": jnp.asarray(w[:, :, 0, 0, 0].T)}
    if prefix + ".conv1.bias" in state:
        p["b"] = jnp.asarray(_t(state, prefix + ".conv1.bias"))
    if prefix + ".bn.weight" in state:
        p["bn"] = _bn_p(state, prefix + ".bn")
    return p


def _sep_block_p(state, prefix, with_bn, full):
    p = {"conv1": _sep_p(state, prefix + ".conv1", with_bn),
         "conv2": _sep_p(state, prefix + ".conv2", with_bn)}
    if prefix + ".downsample.conv1.weight" in state:
        p["down_proj"] = _projfeat_p(state, prefix + ".downsample")
    elif (prefix + ".downsample.conv2.0.weight" in state
          or prefix + ".downsample.conv2.weight" in state):
        p["down_sep"] = _sep_p(state, prefix + ".downsample", with_bn)
    return p


def _butterfly_p(state, prefix, full):
    return {"proj": _projfeat_p(state, prefix + ".proj.0"),
            "conva1": _sep_block_p(state, prefix + ".conva1", True, full),
            "conva2": _sep_block_p(state, prefix + ".conva2", True, full),
            "convb3": _sep_block_p(state, prefix + ".convb3", True, full),
            "convb2": _sep_block_p(state, prefix + ".convb2", True, full),
            "convb1": _sep_block_p(state, prefix + ".convb1", True, full)}


def _stack_p(state, conv_prefixes, final_prefix):
    layers = []
    for cp in conv_prefixes:
        layers.append({"conv": _conv2d_w(state, cp + ".0.weight"),
                       "bias": jnp.asarray(_t(state, cp + ".0.bias")),
                       "bn": _bn_p(state, cp + ".1")})
    return {"layers": layers,
            "final": {"w": _conv2d_w(state, final_prefix + ".weight"),
                      "b": jnp.asarray(_t(state, final_prefix + ".bias"))}}


def convert_torch_state(state: dict) -> dict:
    """Map a torch VCN state_dict onto the JAX param tree."""
    state = {k[len("module."):] if k.startswith("module.") else k: v
             for k, v in state.items()}
    psp = {
        "conv1_1": _cbr_p(state, "pspnet.convbnrelu1_1"),
        "conv1_2": _cbr_p(state, "pspnet.convbnrelu1_2"),
        "conv1_3": _cbr_p(state, "pspnet.convbnrelu1_3"),
        "res3": _res_p(state, "pspnet.res_block3.0"),
        "res5": _res_p(state, "pspnet.res_block5.0"),
        "res6": _res_p(state, "pspnet.res_block6.0"),
        "res7": _res_p(state, "pspnet.res_block7.0"),
        "pp": {"paths": [
            _cbr_p(state, f"pspnet.pyramid_pooling.path_module_list.{i}")
            for i in range(3)]},
        "upconv6": _cbr_p(state, "pspnet.upconv6.1"),
        "iconv5": _cbr_p(state, "pspnet.iconv5"),
        "upconv5": _cbr_p(state, "pspnet.upconv5.1"),
        "iconv4": _cbr_p(state, "pspnet.iconv4"),
        "upconv4": _cbr_p(state, "pspnet.upconv4.1"),
        "iconv3": _cbr_p(state, "pspnet.iconv3"),
        "upconv3": _cbr_p(state, "pspnet.upconv3.1"),
        "iconv2": _cbr_p(state, "pspnet.iconv2"),
    }
    levels = []
    fnames = ["f6", "f5", "f4", "f3", "f2"]
    pnames = ["p6", "p5", "p4", "p3", "p2"]
    dnames = ["dc6", "dc5", "dc4", "dc3", "dc2"]
    for i in range(5):
        full = i == 4
        fuse = _stack_p(
            state, [f"{dnames[i]}_conv{j}" for j in range(1, 7)],
            f"{dnames[i]}_conv7")
        oor = _stack_p(
            state, [f"{dnames[i]}_convo.{j}" for j in range(6)],
            f"{dnames[i]}_convo.6")
        levels.append({"f": _butterfly_p(state, fnames[i], full),
                       "p": _sep_p(state, pnames[i], with_bn=False),
                       "fuse": fuse, "oor": oor})
    return {"pspnet": psp, "levels": levels}


def load_vcn(path: str):
    """Load the published vcn_rob.pth (torch) -> (params, mean_L, mean_R)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    mean_L = np.asarray(ckpt.get("mean_L", [[0.33, 0.33, 0.33]])).mean(0)
    mean_R = np.asarray(ckpt.get("mean_R", [[0.33, 0.33, 0.33]])).mean(0)
    state = ckpt.get("state_dict", ckpt)
    return convert_torch_state(state), mean_L, mean_R


# ---------------------------------------------------------------------------
# inference wrapper (ref:preprocess/auto_gen.py:85-150 flow_inference)


@functools.partial(jax.jit, static_argnums=())
def _run(params, im_lr):
    return vcn_forward(params, im_lr)


def flow_inference(params, img0, img1, mean_L=None, mean_R=None, testres=1.0):
    """img0/img1 uint8 RGB [H, W, 3] -> (flow [H, W, 3], occ [H, W]).

    Resizes to multiples of 64, BGR-flips and mean-subtracts like the
    reference, runs the net, and rescales flow back to input pixels."""
    import cv2
    if mean_L is None:
        mean_L = np.array([0.33, 0.33, 0.33])
    if mean_R is None:
        mean_R = np.array([0.33, 0.33, 0.33])
    H, W = img0.shape[:2]
    maxh, maxw = H * testres, W * testres
    max_h = int(maxh // 64 * 64)
    max_w = int(maxw // 64 * 64)
    if max_h < maxh:
        max_h += 64
    if max_w < maxw:
        max_w += 64

    imL = cv2.resize(img0, (max_w, max_h))
    imR = cv2.resize(img1, (max_w, max_h))
    imL = imL[:, :, ::-1] / 255.0 - mean_L[None, None]
    imR = imR[:, :, ::-1] / 255.0 - mean_R[None, None]
    im_lr = jnp.asarray(
        np.stack([imL, imR]).astype(np.float32))
    flow, occ = _run(params, im_lr)
    flow = np.asarray(flow[0])
    occ = np.asarray(occ[0])

    occ = cv2.resize(occ, (W, H), interpolation=cv2.INTER_LINEAR)
    flow = np.concatenate(
        [cv2.resize(flow[..., 0], (W, H))[..., None],
         cv2.resize(flow[..., 1], (W, H))[..., None]], -1)
    flow[..., 0] *= W / max_w
    flow[..., 1] *= H / max_h
    flow = np.concatenate([flow, np.ones_like(flow[..., :1])], -1)
    return flow.astype(np.float32), occ.astype(np.float32)
