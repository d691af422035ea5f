"""In-framework optical flow network (PWC-lite, flax).

Role: the reference pipeline's flow comes from VCN-robust with distributed
pretrained weights (ref:preprocess/auto_gen.py:84-191,
ref:models/VCN_exp/...); no such weights are obtainable offline, and the
classical fallback (DIS) measures 19px EPE on 35px motion on the synthetic
fixtures (results/flow_epe_syn-dog-15.json) — too noisy to supervise
camera search.  This is the weights-free answer: a compact coarse-to-fine
flow CNN trained *in-repo* on rendered pairs with exact flow
(scripts/gen_flow_data.py + scripts/train_flow.py), used as an auto_gen
backend (--flow_backend flownet).

TPU-first design notes: static shapes everywhere (the 9x9 local
correlation is an unrolled stack of slices XLA fuses into one kernel),
NHWC layout, all convs MXU-eligible, and the whole forward is one jittable
function of (params, im0, im1).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample(img, x, y):
    """img [N, H, W, C]; x, y [N, H, W] absolute pixel coords -> [N, H, W, C].
    Zero padding outside."""
    N, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def gather(yy, xx):
        yi = jnp.clip(yy.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xx.astype(jnp.int32), 0, W - 1)
        batch = jnp.arange(N)[:, None, None]
        val = img[batch, yi, xi]
        valid = ((yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1))
        return val * valid[..., None]

    return ((1 - wy) * (1 - wx) * gather(y0, x0)
            + (1 - wy) * wx * gather(y0, x0 + 1)
            + wy * (1 - wx) * gather(y0 + 1, x0)
            + wy * wx * gather(y0 + 1, x0 + 1))


def warp(img, flow):
    """Backward-warp img by flow: out(p) = img(p + flow(p))."""
    N, H, W, _ = img.shape
    yy, xx = jnp.mgrid[:H, :W]
    x = xx[None] + flow[..., 0]
    y = yy[None] + flow[..., 1]
    return bilinear_sample(img, x, y)


def local_corr(f0, f1, radius: int = 4):
    """Cosine-similarity local correlation volume [N, H, W, (2r+1)^2].

    Features are L2-normalized along channels so entries live in [-1, 1]:
    the v2 net's mean/sqrt(C) scaling left the correlation ~1000x smaller
    than the concatenated feature activations, and the estimator learned to
    ignore it — memorizing tiny sets through the feature path while
    collapsing to the zero-flow basin on diverse data (the round-3 failure
    measured in results/flownet_val.json)."""
    N, H, W, C = f0.shape
    # rsqrt(sum^2 + eps): finite gradients at zero-norm pixels (black
    # borders / padding), unlike x/(|x| + eps) whose VJP divides by |x|
    f0 = f0 * jax.lax.rsqrt(
        jnp.sum(f0 * f0, -1, keepdims=True) + 1e-4)
    f1 = f1 * jax.lax.rsqrt(
        jnp.sum(f1 * f1, -1, keepdims=True) + 1e-4)
    r = radius
    p = jnp.pad(f1, ((0, 0), (r, r), (r, r), (0, 0)))
    rows = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            rows.append(jnp.sum(
                f0 * jax.lax.dynamic_slice(
                    p, (0, dy, dx, 0), (N, H, W, C)), -1))
    return jnp.stack(rows, -1)


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1)(x)
        return nn.leaky_relu(x, 0.1)


class Pyramid(nn.Module):
    """Shared-weight feature pyramid: levels at 1/4, 1/8, 1/16."""

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(16, 2)(x)
        x = ConvBlock(16)(x)
        x = ConvBlock(32, 2)(x)
        x = ConvBlock(32)(x)
        l4 = ConvBlock(32)(x)
        x = ConvBlock(64, 2)(l4)
        x = ConvBlock(64)(x)
        l8 = ConvBlock(64)(x)
        x = ConvBlock(96, 2)(l8)
        x = ConvBlock(96)(x)
        l16 = ConvBlock(96)(x)
        return [l16, l8, l4]          # coarse -> fine


class Estimator(nn.Module):
    """Per-level flow delta: PWC-style densely connected estimator
    (each conv sees every earlier activation — the capacity that makes the
    correlation volume actually decodable; a plain 3-conv stack plateaued
    at near-zero-flow predictions)."""

    @nn.compact
    def __call__(self, corr, feat, flow):
        x = jnp.concatenate([corr, feat, flow], -1)
        for ch in (128, 96, 64, 32):
            y = ConvBlock(ch)(x)
            x = jnp.concatenate([y, x], -1)
        return nn.Conv(2, (3, 3), padding=1,
                       kernel_init=nn.initializers.normal(1e-3))(x), x


class Context(nn.Module):
    """Dilated-conv refinement on the finest level (PWC context network)."""

    @nn.compact
    def __call__(self, x):
        for ch, d in ((96, 1), (96, 2), (64, 4), (48, 8), (32, 1)):
            x = nn.leaky_relu(
                nn.Conv(ch, (3, 3), padding=d, kernel_dilation=(d, d))(x),
                0.1)
        return nn.Conv(2, (3, 3), padding=1,
                       kernel_init=nn.initializers.normal(1e-3))(x)


def _up2(flow):
    N, H, W, C = flow.shape
    return 2.0 * jax.image.resize(flow, (N, 2 * H, 2 * W, C), "bilinear")


class FlowNet(nn.Module):
    """Coarse-to-fine flow: returns per-level predictions, finest last,
    each in its own pixel scale."""
    radius: int = 4

    @nn.compact
    def __call__(self, im0, im1):
        im0 = im0 - 0.45
        im1 = im1 - 0.45
        pyr = Pyramid()
        f0s, f1s = pyr(im0), pyr(im1)
        N, Hc, Wc, _ = f0s[0].shape
        flow = jnp.zeros((N, Hc, Wc, 2), im0.dtype)
        est = [Estimator() for _ in range(3)]
        outs = []
        x = None
        for i, (f0, f1) in enumerate(zip(f0s, f1s)):
            if i > 0:
                flow = _up2(flow)
            f1w = warp(f1, flow)
            corr = local_corr(f0, f1w, self.radius)
            delta, x = est[i](corr, f0, flow)
            flow = flow + delta
            outs.append(flow)
        flow = flow + Context()(x)     # refine the finest level
        outs.append(flow)
        return outs


def multiscale_loss(outs, gt_flow, mask=None):
    """Supervised EPE over levels; gt_flow [N, H, W, 2] full-res pixels.
    mask optional [N, H, W] (1 = supervise)."""
    N, H, W, _ = gt_flow.shape
    total = 0.0
    # coarse -> fine, PWC-style; last two entries are the finest level
    # before and after the context refinement
    weights = (0.32, 0.16, 0.08, 0.08)
    for w, out in zip(weights, outs):
        h, wd = out.shape[1], out.shape[2]
        # per-axis scale: x by width ratio, y by height ratio (differs only
        # for non-square inputs; all current callers are square)
        s = jnp.asarray([wd / W, h / H], gt_flow.dtype)
        gt = jax.image.resize(gt_flow, (N, h, wd, 2), "bilinear") * s
        err = jnp.sqrt(jnp.sum((out - gt) ** 2, -1) + 1e-8)
        if mask is not None:
            m = jax.image.resize(mask.astype(jnp.float32),
                                 (N, h, out.shape[2]), "bilinear")
            m = 0.1 + 0.9 * m          # background still weakly supervised
            err = err * m
        total = total + w * jnp.mean(err)
    return total


def full_res_flow(outs, size):
    """Finest prediction upsampled to `size` (H, W) in pixel units."""
    out = outs[-1]
    N, h, w, _ = out.shape
    scale = jnp.asarray([size[1] / w, size[0] / h], out.dtype)
    return jax.image.resize(out, (N, size[0], size[1], 2),
                            "bilinear") * scale


# ----------------------------------------------------------------------
# inference wrapper (auto_gen backend)
# ----------------------------------------------------------------------
def load_params(path: str):
    from flax import traverse_util
    flat = dict(np.load(path, allow_pickle=False))
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})


def save_params(path: str, params):
    from flax import traverse_util
    flat = {"/".join(k): np.asarray(v) for k, v in
            traverse_util.flatten_dict(params).items()}
    # atomic: a crash mid-write must not corrupt the previous good copy
    # (np.savez appends .npz when missing, so keep the suffix on the temp)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def make_backend(weights_path: str, infer_size: int = 256,
                 scales=(1.0, 0.5)):
    """auto_gen-compatible backend: (img0, img1) BGR uint8 ->
    (flow [H, W, 3], occ [H, W]) with forward/backward consistency.

    Test-time two-scale inference: the PWC pyramid's reach tops out around
    ~60 px at 256 px inference (syn-dog-15 pair 11, 69 px GT motion, scored
    41.7 px EPE — the round-4 validation outlier).  Running the net again
    at half resolution halves the apparent motion; per pixel, the scale
    whose forward-backward error is smaller wins.  Pass scales=(1.0,) for
    the single-scale behavior."""
    import cv2

    params = load_params(weights_path)
    net = FlowNet()
    runners = {}
    for sc in scales:
        isz = max(int(infer_size * sc) // 32 * 32, 64)

        def _make(isz):
            @jax.jit
            def _run(a, b):
                return full_res_flow(net.apply(params, a, b), (isz, isz))
            return _run
        runners[isz] = _make(isz)

    def infer_at(img0, img1, isz, run, W, H):
        """(flow full-res px [isz, isz, 2], fw/bw err full-res px)."""
        a = cv2.resize(img0, (isz, isz))[..., ::-1] / 255.0
        b = cv2.resize(img1, (isz, isz))[..., ::-1] / 255.0
        a = jnp.asarray(a[None], jnp.float32)
        b = jnp.asarray(b[None], jnp.float32)
        fw = np.asarray(run(a, b))[0]
        bw = np.asarray(run(b, a))[0]
        yy, xx = np.mgrid[:isz, :isz]
        scale = np.array([W / isz, H / isz], np.float32)
        bx = cv2.remap(bw[..., 0],
                       np.clip(xx + fw[..., 0], 0, isz - 1)
                       .astype(np.float32),
                       np.clip(yy + fw[..., 1], 0, isz - 1)
                       .astype(np.float32), cv2.INTER_LINEAR)
        by = cv2.remap(bw[..., 1],
                       np.clip(xx + fw[..., 0], 0, isz - 1)
                       .astype(np.float32),
                       np.clip(yy + fw[..., 1], 0, isz - 1)
                       .astype(np.float32), cv2.INTER_LINEAR)
        err = np.sqrt(((fw[..., 0] + bx) * scale[0]) ** 2
                      + ((fw[..., 1] + by) * scale[1]) ** 2)
        return fw * scale, err

    def backend(img0, img1):
        H, W = img0.shape[:2]
        S0 = max(infer_size, 64)
        flows, errs = [], []
        for isz, run in runners.items():
            f, e = infer_at(img0, img1, isz, run, W, H)
            flows.append(cv2.resize(f, (S0, S0),
                                    interpolation=cv2.INTER_LINEAR))
            errs.append(cv2.resize(e, (S0, S0),
                                   interpolation=cv2.INTER_LINEAR))
        flows = np.stack(flows)                       # [n, S0, S0, 2]
        errs = np.stack(errs)                         # [n, S0, S0]
        # Coarser scales produce SMOOTHER flow whose fw/bw error is low
        # even when inaccurate (consistency is necessary, not sufficient),
        # so a raw argmin degraded mid-range pairs (11.9 -> 12.1 px mean).
        # Penalize non-native scales: they only win where the native scale
        # clearly fails (large-motion regions beyond the pyramid's reach).
        biased = errs.copy()
        biased[1:] += 4.0                             # px
        pick = np.argmin(biased, axis=0)              # per-pixel winner
        fw = np.take_along_axis(
            flows, pick[None, ..., None], 0)[0]       # full-res px units
        err = np.take_along_axis(errs, pick[None], 0)[0]
        # GRADED occlusion score.  Sign convention (must match the DIS
        # backend and the VCN scores the reference ships,
        # ref:dataloader/vidbase.py:151): the flow loss weights pixels by
        # sigmoid(-occ) (lasr.py, ref:mesh_net.py:403-406), so CONSISTENT
        # pixels get a large NEGATIVE score.  clip(err_px - 1) matches
        # preprocess/auto_gen.py:57, interchangeable downstream.
        occ = np.clip(err - 1.0, -10.0, 100.0).astype(np.float32)
        flow = np.concatenate([fw, occ[..., None]], -1)
        flow = cv2.resize(flow, (W, H), interpolation=cv2.INTER_LINEAR)
        occ_full = flow[..., 2].copy()
        # channel 2 of the written flow is the validity INDICATOR consumed
        # by the dataloader (`flow[..., 2] != 0`, data/video.py) — the DIS
        # backend writes all-ones there; the graded score lives in occ only
        flow[..., 2] = 1.0
        return flow.astype(np.float32), occ_full
    return backend
