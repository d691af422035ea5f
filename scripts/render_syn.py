"""Synthetic ground-truth sequence renderer.

Behavioral port of ref:scripts/render_syn.py: renders a textured mesh (spot
the cow) orbiting the camera, writing a DAVIS-layout dataset with exact
silhouettes, cameras, meshes, and vertex-correspondence optical flow — the
deterministic end-to-end fixture for tests and benchmarks.

Usage: python scripts/render_syn.py --outdir syn-spot3f --model spot --nframes 3
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Fixture generation is an offline pass; default to the host CPU backend so
# it never contends with a training run for the accelerator (--device tpu to
# opt in).  Env JAX_PLATFORMS is ignored once sitecustomize pre-imports jax,
# so this must be a config update before first use.
if "--device" in sys.argv:
    _dev = sys.argv[sys.argv.index("--device") + 1]
else:
    _dev = next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith("--device=")), "cpu")
if _dev == "cpu":
    jax.config.update("jax_platforms", "cpu")

import cv2
import numpy as np
import jax.numpy as jnp

from lasr_tpu.data.flowvis import flow_to_image
from lasr_tpu.data.pfm import write_pfm
from lasr_tpu.ops.rasterize import RasterizeConfig, soft_rasterize
from lasr_tpu.utils import obj as obj_io

# the reference adds/subtracts the SoftRas look_at eye; its renderer's net
# effect for render_syn is a +2*|eye_z| shift on z (ref:scripts/render_syn.py:51
# combined with softras look_at/orthogonal transforms)
EYE_Z = 1.0 / math.tan(math.radians(30)) + 1.0
IMG_SIZE = 512


def rodrigues(rvec):
    return cv2.Rodrigues(np.asarray(rvec, np.float64))[0].astype(np.float32)


def rotmat_to_quat_wxyz_np(m):
    from lasr_tpu.ops.quat import rotmat_to_quat_wxyz
    return np.asarray(rotmat_to_quat_wxyz(jnp.asarray(m)))


_render_cache = {}


def hard_render(face_verts, face_tex, background=(0.0, 0.0, 0.0)):
    import jax
    cfg = RasterizeConfig(image_size=IMG_SIZE, sigma=1e-12, gamma=1e-4,
                          dist_func="hard", aggr_rgb="hard", aggr_alpha="prod",
                          texture_type="surface" if face_tex.shape[2] > 3 else "vertex",
                          background=background, face_chunk=16)
    key = (cfg, face_verts.shape, face_tex.shape)
    if key not in _render_cache:
        _render_cache[key] = jax.jit(
            lambda fv, ft: soft_rasterize(fv, ft, cfg, 1.0, 100.0, force_ref=True))
    return np.asarray(_render_cache[key](jnp.asarray(face_verts),
                                         jnp.asarray(face_tex)))


def raster_geometry(proj_verts):
    """(x, y, z_norm) projected verts -> rasterizer input with the reference's
    y-flip and z offset."""
    out = proj_verts.copy()
    out[:, :, 1] *= -1
    out[:, :, 2] += 2 * EYE_Z
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="syn-spot3f")
    ap.add_argument("--model", default="spot")
    ap.add_argument("--nframes", type=int, default=3)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--filedir", default="database")
    ap.add_argument("--asset_dir", default="database/misc")
    ap.add_argument("--device", default="cpu", help="cpu | tpu")
    args = ap.parse_args()

    # Models: 'spot' = rigid orbiting cow (ref:scripts/render_syn.py:70-74).
    # 'dog' = articulated sequence; the reference loads per-frame animated
    # meshes from the author's machine (ref:scripts/render_syn.py:83-88,
    # dog_model_animation_%06d.obj — not distributable), so the in-repo
    # equivalent procedurally articulates the spot asset: a lateral spine
    # swing + traveling body wave + head bob, giving exact nonrigid GT
    # meshes/flow for the full bone/LBS optimization benchmark (dog15.sh).
    assert args.model in ("spot", "dog"), \
        "only the spot asset ships with the repo (dog = articulated spot)"
    verts, faces, uv, face_uv, tex_img = obj_io.load_obj(
        os.path.join(args.asset_dir, "spot/spot_triangulated.obj"))
    # spot canonicalization (ref:scripts/render_syn.py:70-74)
    overts = verts.copy()
    overts[:, 1] *= -1
    overts[:, 1] += 0.1
    overts /= 1.2

    def articulate(v0: np.ndarray, phase: float) -> np.ndarray:
        """Nonrigid pose at `phase` in [0, 1): spot's long axis is z
        (tail z<0, head z>0), up is y, symmetry axis x."""
        v = v0.copy()
        s = (v[:, 2] - v0[:, 2].min()) / np.ptp(v0[:, 2])   # 0 tail -> 1 head
        lever = (s - 0.5)
        # lateral swing about y, strongest at head/tail, + traveling wave
        ang = (0.8 * np.sin(2 * np.pi * phase) * lever
               + 0.25 * np.sin(2 * np.pi * (s - 2 * phase)) * (0.3 + np.abs(lever)))
        ca, sa = np.cos(ang), np.sin(ang)
        x, z = v[:, 0].copy(), v[:, 2].copy()
        v[:, 0] = ca * x + sa * z
        v[:, 2] = -sa * x + ca * z
        # head bob: pitch the front third up/down
        bob = 0.3 * np.sin(2 * np.pi * phase + 1.3) * np.clip(s - 0.66, 0, None) / 0.34
        y, z = v[:, 1].copy(), v[:, 2].copy()
        v[:, 1] = np.cos(bob) * y - np.sin(bob) * z
        v[:, 2] = np.sin(bob) * y + np.cos(bob) * z
        return v.astype(np.float32)
    if tex_img is not None and face_uv is not None:
        face_tex = obj_io.bake_face_textures(uv, face_uv, tex_img, res=5)
    else:
        face_tex = np.full((len(faces), 25, 3), 0.7, np.float32)

    base = args.filedir
    dirs = {k: os.path.join(base, "DAVIS", k, "Full-Resolution", args.outdir)
            for k in ["JPEGImages", "Annotations", "FlowFW", "FlowBW",
                      "Meshes", "Camera"]}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    rng = np.random.RandomState(0)
    cam_list, verts_cam_list, verts_proj_list = [], [], []
    bgcolor = None
    fv_gather = lambda v: v[faces]              # [F, 3, 3]

    for i in range(args.nframes):
        if args.model == "dog":
            frame_overts = articulate(overts, i / args.nframes)
        else:
            frame_overts = overts
        rotx = 0.0 if i == 0 else float(rng.rand())
        roty = 3 * 1.57 + args.alpha * 6.28 * i / args.nframes
        R = rodrigues([rotx, roty, 0.0])
        q = rotmat_to_quat_wxyz_np(R)           # (w, x, y, z)
        focal, depth = 10.0, 10.0
        T = np.array([0.0, 0.0, depth], np.float32)
        cam = np.array([focal, 0.0, 0.0, q[0], q[1], q[2], q[3], depth],
                       np.float32)
        cam_list.append(cam)

        vcam = frame_overts @ R.T + T            # column-convention R v + T
        verts_cam_list.append(vcam)

        # perspective projection + z normalization (ref :171-175)
        proj = vcam.copy()
        proj[:, 0] = vcam[:, 0] * focal / vcam[:, 2]
        proj[:, 1] = vcam[:, 1] * focal / vcam[:, 2]
        zmin, zmax = vcam[:, 2].min(), vcam[:, 2].max()
        proj[:, 2] = (vcam[:, 2] - zmin) / (zmax - zmin) - 0.5
        verts_proj_list.append(proj)

        geom = raster_geometry(proj[None])
        img = hard_render(fv_gather(geom[0])[None], face_tex[None])
        mask = img[0, 3]
        rgb = np.transpose(img[0, :3], (1, 2, 0)) * 255.0
        if bgcolor is None:
            bgcolor = 255.0 - rgb[mask.astype(bool)].mean(0)
        rgb[~mask.astype(bool)] = bgcolor
        cv2.imwrite(os.path.join(dirs["JPEGImages"], f"{i:05d}.jpg"),
                    np.clip(rgb[:, :, ::-1], 0, 255).astype(np.uint8))
        cv2.imwrite(os.path.join(dirs["Annotations"], f"{i:05d}.png"),
                    (128 * mask).astype(np.uint8))
        np.savetxt(os.path.join(dirs["Camera"], f"{i:05d}.txt"), cam)
        obj_io.save_obj(os.path.join(dirs["Meshes"], f"{i:05d}.obj"),
                        vcam, faces)

    # flow from vertex correspondence (ref :49-65, 200-218)
    occ = -np.ones((IMG_SIZE, IMG_SIZE), np.float32)

    def render_flow(src_idx, dst_idx):
        geom = raster_geometry(verts_proj_list[src_idx][None])
        fv = fv_gather(geom[0])[None]
        pos_src = fv_gather(verts_cam_list[src_idx])[None]
        pos_dst = fv_gather(verts_cam_list[dst_idx])[None]
        r0 = hard_render(fv, pos_src)
        r1 = hard_render(fv, pos_dst)
        p0 = np.transpose(r0[0, :3], (1, 2, 0)).copy()
        p1 = np.transpose(r1[0, :3], (1, 2, 0)).copy()
        bg = (p0[:, :, 2] < 1e-9) | (p1[:, :, 2] < 1e-9)
        p0[bg] = 10.0
        p1[bg] = 10.0
        focal = 10.0
        for p in (p0, p1):
            p[:, :, 0] = p[:, :, 0] * focal / p[:, :, 2]
            p[:, :, 1] = p[:, :, 1] * focal / p[:, :, 2]
        flow = (p1 - p0)[:, :, :2] / 2.0 * (IMG_SIZE - 1)
        return np.concatenate([flow, (1 - bg.astype(np.float32))[:, :, None]],
                              -1).astype(np.float32), bg

    for i in range(1, args.nframes):
        flow_fw, _ = render_flow(i - 1, i)
        flow_bw, _ = render_flow(i, i - 1)
        write_pfm(os.path.join(dirs["FlowFW"], f"flo-{i - 1:05d}.pfm"), flow_fw)
        write_pfm(os.path.join(dirs["FlowBW"], f"flo-{i:05d}.pfm"), flow_bw)
        write_pfm(os.path.join(dirs["FlowFW"], f"occ-{i - 1:05d}.pfm"), occ)
        write_pfm(os.path.join(dirs["FlowBW"], f"occ-{i:05d}.pfm"), occ)
        cv2.imwrite(os.path.join(dirs["FlowFW"], f"col-{i - 1:05d}.jpg"),
                    flow_to_image(flow_fw)[:, :, ::-1])
        cv2.imwrite(os.path.join(dirs["FlowBW"], f"col-{i:05d}.jpg"),
                    flow_to_image(flow_bw)[:, :, ::-1])
    print(f"wrote {args.nframes} frames to {dirs['JPEGImages']}")


if __name__ == "__main__":
    main()
