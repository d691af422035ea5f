"""Training-pair generator for the in-framework flow net (models/flownet.py).

Renders randomized articulated-spot pairs with exact vertex-correspondence
flow — the same construction as the benchmark fixtures
(scripts/render_syn.py) but with randomized pose deltas, articulation,
textures, backgrounds, and framing, so the trained net covers the motion
distribution auto_gen sees on the camel/pika-style sequences.

Writes database/flow_syn/shard-%03d.npz with im0/im1 (uint8 [N,S,S,3] RGB),
flow ([N,S,S,2] float16, pixels, image convention), mask (uint8).

Usage: python scripts/gen_flow_data.py --n 1200 [--device cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--device" in sys.argv:
    _dev = sys.argv[sys.argv.index("--device") + 1]
else:
    _dev = next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith("--device=")), "cpu")
if _dev == "cpu":
    jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lasr_tpu.ops.rasterize import RasterizeConfig, soft_rasterize  # noqa: E402
from lasr_tpu.utils import obj as obj_io  # noqa: E402

S = 256
_cache = {}


def sharp_render(face_verts, face_tex):
    """Near-hard soft rasterization on the production Pallas TPU kernel
    (vertex colors, tiny sigma): the data engine runs on the same kernel
    the optimizer trains through, at ~2 orders of magnitude the reference
    path's throughput on-chip.  face_verts [B, F, 3, 3] screen geometry
    (y up, z in [1.5, 2.5]); face_tex [B, F, 3, C] per-vertex values
    (colors or camera-space positions)."""
    cfg = RasterizeConfig(image_size=S, sigma=3e-5, gamma=1e-4,
                          background=(0.0,) * face_tex.shape[-1])
    key = (cfg, face_verts.shape, face_tex.shape)
    if key not in _cache:
        B = face_verts.shape[0]
        near = jnp.full((B,), 1.0)
        far = jnp.full((B,), 3.0)
        _cache[key] = jax.jit(
            lambda fv, ft: soft_rasterize(fv, ft, cfg, near, far))
    return np.asarray(_cache[key](jnp.asarray(face_verts),
                                  jnp.asarray(face_tex)))


def rodrigues(rvec):
    rvec = np.asarray(rvec, np.float64)
    th = np.linalg.norm(rvec)
    if th < 1e-12:
        return np.eye(3)
    k = rvec / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def articulate(v0, s_axis, phase, amp, wave, bob):
    """Randomized variant of render_syn's spine swing + wave + head bob."""
    v = v0.copy()
    s = (v[:, 2] - v0[:, 2].min()) / np.ptp(v0[:, 2])
    lever = s - 0.5
    ang = (amp * np.sin(2 * np.pi * phase) * lever
           + wave * np.sin(2 * np.pi * (s - 2 * phase)) * (0.3 + np.abs(lever)))
    ca, sa = np.cos(ang), np.sin(ang)
    x, z = v[:, 0].copy(), v[:, 2].copy()
    v[:, 0] = ca * x + sa * z
    v[:, 2] = -sa * x + ca * z
    b = bob * np.sin(2 * np.pi * phase + 1.3) * np.clip(s - 0.66, 0, None) / 0.34
    y, z = v[:, 1].copy(), v[:, 2].copy()
    v[:, 1] = np.cos(b) * y - np.sin(b) * z
    v[:, 2] = np.sin(b) * y + np.cos(b) * z
    return v.astype(np.float32)


def random_background(r):
    kind = r.randint(3)
    if kind == 0:
        return np.full((S, S, 3), r.rand(3), np.float32)
    if kind == 1:   # vertical/horizontal gradient
        a, b = r.rand(3), r.rand(3)
        t = np.linspace(0, 1, S)[:, None] if r.rand() < 0.5 \
            else np.linspace(0, 1, S)[None, :]
        return (a[None, None] * (1 - t[..., None])
                + b[None, None] * t[..., None]).astype(np.float32)
    noise = r.rand(S // 8, S // 8, 3).astype(np.float32)
    return cv2.resize(noise, (S, S), interpolation=cv2.INTER_CUBIC)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1200)
    ap.add_argument("--shard_size", type=int, default=100)
    ap.add_argument("--outdir", default="database/flow_syn")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shard_offset", type=int, default=0,
                    help="first shard index (append to an existing set)")
    ap.add_argument("--motion_scale", type=float, default=1.0,
                    help="scale the pose-delta ranges: the benchmark "
                    "sequences step ~25-35px of flow (render_syn orbit) "
                    "while the default ranges average ~19px")
    ap.add_argument("--device", default="cpu")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    verts, faces, uv, face_uv, tex_img = obj_io.load_obj(
        "database/misc/spot/spot_triangulated.obj")
    overts = verts.copy()
    overts[:, 1] *= -1
    overts[:, 1] += 0.1
    overts /= 1.2
    # per-vertex colors from the texture image (the Pallas kernel is
    # vertex-textured): average the texture at each vertex's uv corners
    base_vcol = None
    if tex_img is not None and uv is not None and face_uv is not None:
        th, tw = tex_img.shape[:2]
        px = np.clip((uv[:, 0] * (tw - 1)).astype(int), 0, tw - 1)
        py = np.clip(((1 - uv[:, 1]) * (th - 1)).astype(int), 0, th - 1)
        uv_col = tex_img[py, px].astype(np.float32)
        if uv_col.max() > 1.5:
            uv_col /= 255.0
        acc = np.zeros((len(verts), 3), np.float64)
        cnt = np.zeros(len(verts), np.float64)
        np.add.at(acc, faces.reshape(-1), uv_col[face_uv.reshape(-1)])
        np.add.at(cnt, faces.reshape(-1), 1.0)
        base_vcol = (acc / np.maximum(cnt[:, None], 1)).astype(np.float32)

    r = np.random.RandomState(args.seed)
    focal = 10.0
    buf = {k: [] for k in ("im0", "im1", "flow", "mask")}
    shard = args.shard_offset
    t0 = time.time()
    # block accumulation: the tunneled TPU pays ~1s per dispatch round-trip,
    # so geometry for BLOCK pairs is built host-side and rendered in four
    # batched dispatches instead of 4*BLOCK sequential ones
    BLOCK = 8
    pend = {k: [] for k in ("fg0", "fg1", "tex", "pos0t", "pos1t", "bg")}

    def flush():
        if not pend["fg0"]:
            return
        fg0 = np.stack(pend["fg0"]); fg1 = np.stack(pend["fg1"])
        tex = np.stack(pend["tex"])
        rgb0 = sharp_render(fg0, tex)
        rgb1 = sharp_render(fg1, tex)
        pos0 = sharp_render(fg0, np.stack(pend["pos0t"]))
        pos1 = sharp_render(fg0, np.stack(pend["pos1t"]))
        for j in range(len(fg0)):
            q0 = np.transpose(pos0[j, :3], (1, 2, 0)).copy()
            q1 = np.transpose(pos1[j, :3], (1, 2, 0)).copy()
            # soft edges: keep only solidly-covered pixels for flow truth
            bgm = (pos0[j, 3] < 0.9) | (np.abs(q0[:, :, 2]) < 1e-3) \
                | (np.abs(q1[:, :, 2]) < 1e-3)
            q0[bgm] = 10.0
            q1[bgm] = 10.0
            for q in (q0, q1):
                q[:, :, 0] = q[:, :, 0] * focal / q[:, :, 2]
                q[:, :, 1] = q[:, :, 1] * focal / q[:, :, 2]
            flow = (q1 - q0)[:, :, :2] / 2.0 * (S - 1)
            flow[bgm] = 0.0
            bg_img, bg1 = pend["bg"][j]

            def composite(rgb, bg):
                img = np.transpose(rgb[:3], (1, 2, 0))
                alpha = rgb[3][..., None]
                out = img * alpha + bg * (1 - alpha)
                out = np.clip(out + r.standard_normal(out.shape) * 0.02, 0, 1)
                return (255 * out).astype(np.uint8)

            buf["im0"].append(composite(rgb0[j], bg_img))
            buf["im1"].append(composite(rgb1[j], bg1))
            buf["flow"].append(flow.astype(np.float16))
            # supervise at full weight only where the flow truth is solid
            buf["mask"].append((~bgm).astype(np.uint8))
        for k in pend:
            pend[k] = []

    for i in range(args.n):
        # articulation: a pair of nearby phases
        amp = r.uniform(0.0, 1.0)
        wave = r.uniform(0.0, 0.35)
        bob = r.uniform(0.0, 0.4)
        ph0 = r.rand()
        ph1 = ph0 + r.uniform(0.0, 0.12) * args.motion_scale
        va = articulate(overts, None, ph0, amp, wave, bob)
        vb = articulate(overts, None, ph1, amp, wave, bob)

        # cameras: random base orientation; relative rotation up to 45 deg
        R0 = rodrigues(r.standard_normal(3) * 10)     # ~uniform orientation
        axis = r.standard_normal(3)
        axis /= np.linalg.norm(axis)
        Rrel = rodrigues(axis * np.radians(
            r.uniform(2.0, min(45.0 * args.motion_scale, 60.0))))
        depth0 = r.uniform(8.0, 14.0)
        depth1 = depth0 * np.exp(r.uniform(-0.08, 0.08) * args.motion_scale)
        t2d0 = r.uniform(-0.25, 0.25, 2) * depth0 / focal
        t2d1 = t2d0 + r.uniform(-0.06, 0.06, 2) * args.motion_scale
        T0 = np.array([t2d0[0], t2d0[1], depth0])
        T1 = np.array([t2d1[0], t2d1[1], depth1])

        vc0 = va @ R0.T + T0
        vc1 = vb @ (Rrel @ R0).T + T1

        def geom(vc):
            p = vc.copy()
            p[:, 0] = vc[:, 0] * focal / vc[:, 2]
            p[:, 1] = vc[:, 1] * focal / vc[:, 2]
            zmin, zmax = vc[:, 2].min(), vc[:, 2].max()
            p[:, 2] = (vc[:, 2] - zmin) / max(zmax - zmin, 1e-6) - 0.5
            g = p.copy()
            g[:, 1] *= -1
            g[:, 2] += 2.0
            return p, g

        p0, g0 = geom(vc0)
        p1, g1 = geom(vc1)

        # texture: spot's vertex colors with jitter, or procedural smooth
        # color; per-vertex detail noise gives the matcher high-frequency
        # texture (~3px spacing at these framings)
        if base_vcol is not None and r.rand() < 0.6:
            vcol = np.clip(base_vcol * r.uniform(0.6, 1.3, 3)
                           + r.uniform(-0.1, 0.1), 0, 1)
        else:
            w = r.standard_normal((3, 3)) * r.uniform(0.5, 2.0)
            vcol = 0.5 + 0.5 * np.tanh(overts @ w.T + r.standard_normal(3))
        vcol = np.clip(vcol + r.standard_normal(vcol.shape) *
                       r.uniform(0.03, 0.18), 0, 1).astype(np.float32)
        tex = vcol[faces]                          # [F, 3, 3] vertex colors

        # ONE background per pair (real videos have a consistent backdrop);
        # frame 1's copy gets a small global shift to mimic camera sway
        bg_img = random_background(r)
        shift = r.uniform(-4, 4, 2)
        M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
        bg1 = cv2.warpAffine(bg_img, M, (S, S), borderMode=cv2.BORDER_REFLECT)

        pend["fg0"].append(g0[faces])
        pend["fg1"].append(g1[faces])
        pend["tex"].append(tex)
        # exact flow comes from rendering camera positions of both frames
        # with frame-0 geometry (render_syn.py:193-210)
        pend["pos0t"].append(vc0[faces].astype(np.float32))
        pend["pos1t"].append(vc1[faces].astype(np.float32))
        pend["bg"].append((bg_img, bg1))
        if len(pend["fg0"]) == BLOCK or i == args.n - 1:
            flush()

        if len(buf["im0"]) >= args.shard_size or i == args.n - 1:
            path = os.path.join(args.outdir, f"shard-{shard:03d}.npz")
            np.savez_compressed(path,
                                **{k: np.stack(v) for k, v in buf.items()})
            rate = (i + 1) / (time.time() - t0)
            print(f"{path}: {len(buf['im0'])} pairs ({i + 1}/{args.n}, "
                  f"{rate:.2f} pairs/s)", flush=True)
            buf = {k: [] for k in buf}
            shard += 1


if __name__ == "__main__":
    main()
