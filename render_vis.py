"""Turntable / per-frame visualization of extracted meshes.

Behavioral port of ref:render_vis.py: loads pred%d.ply + cam%d.txt written by
extract.py and renders a gif — per-frame camera view, optional --freeze
turntable, optional --vis_bones overlay of bone spheres.  The reference's
pyrender/EGL renderer (with shadow mapping and a floor plane) is replaced by
our own hard rasterizer with Lambertian shading; shadows/floor are omitted.

Usage: python render_vis.py --testdir log/spot3-gtcam-1 --outpath out.gif
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cv2
import imageio
import numpy as np
import jax.numpy as jnp

from lasr_tpu.ops.rasterize import RasterizeConfig, soft_rasterize
from lasr_tpu.utils.ply import read_ply


def shaded_render(verts, faces, colors, fl, pp, size=512):
    """Camera-frame mesh -> [size, size, 4] image (pixel intrinsics fl/pp
    normalized into NDC)."""
    z = verts[:, 2]
    x = (fl * verts[:, 0] / z + pp[0]) / (size / 2) - 1.0
    y = (fl * verts[:, 1] / z + pp[1]) / (size / 2) - 1.0
    geom = np.stack([x, -y, z], -1)

    fv = verts[faces]
    fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    vn = np.zeros_like(verts)
    np.add.at(vn, faces.reshape(-1), np.repeat(fn, 3, 0))
    vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
    light_dir = np.array([0.3, 0.5, -0.8])
    light_dir /= np.linalg.norm(light_dir)
    lam = 0.45 + 0.55 * np.clip((vn * light_dir).sum(-1), 0, 1)[:, None]
    shaded = np.clip(colors * lam, 0, 1)

    cfg = RasterizeConfig(image_size=size, sigma=1e-12, gamma=1e-4,
                          dist_func="hard", aggr_rgb="hard", aggr_alpha="hard",
                          background=(1.0, 1.0, 1.0), face_chunk=64)
    out = np.asarray(soft_rasterize(
        jnp.asarray(geom[faces][None]), jnp.asarray(shaded[faces][None]),
        cfg, float(z.min() - 1), float(z.max() + 1), force_ref=True))
    return out[0].transpose(1, 2, 0)


def roty(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-c * 0 - s, 0, c]])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--testdir", required=True)
    ap.add_argument("--outpath", default="out.gif")
    ap.add_argument("--freeze", action="store_true",
                    help="turntable around one frame instead of the sequence")
    ap.add_argument("--vis_bones", action="store_true")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--fps", type=int, default=10)
    args = ap.parse_args()

    preds = sorted(glob.glob(os.path.join(args.testdir, "pred*.ply")),
                   key=lambda p: int(re.findall(r"pred(\d+)\.ply", p)[0]))
    if not preds:
        raise SystemExit(f"no pred*.ply under {args.testdir}")

    frames = []
    seq = [preds[len(preds) // 2]] * 36 if args.freeze else preds
    for t, p in enumerate(seq):
        i = int(re.findall(r"pred(\d+)\.ply", p)[0])
        verts, faces, colors = read_ply(p)
        colors = (colors.astype(np.float32) / 255.0 if colors is not None
                  else np.full((len(verts), 3), 0.7, np.float32))
        cam = np.loadtxt(os.path.join(args.testdir, f"cam{i}.txt"))
        fl, pp = cam[3, 0], cam[3, 2:4]
        # normalize intrinsics into the render viewport
        scale_px = args.size / (2.2 * (pp.max() + 1e-6)) if pp.max() > 1 else 1.0
        fl_r, pp_r = fl * scale_px, pp * scale_px

        if args.freeze:
            center = verts.mean(0)
            ang = 2 * np.pi * t / len(seq)
            c, s = np.cos(ang), np.sin(ang)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            verts = (verts - center) @ R.T + center

        if args.vis_bones and os.path.exists(
                os.path.join(args.testdir, f"gauss{i}.ply")):
            gv, gf, _ = read_ply(os.path.join(args.testdir, f"gauss{i}.ply"))
            gc = np.full((len(gv), 3), np.array([0.9, 0.3, 0.2]), np.float32)
            faces = np.concatenate([faces, gf + len(verts)])
            verts = np.concatenate([verts, gv])
            colors = np.concatenate([colors * 0.5 + 0.35, gc])

        img = shaded_render(verts, faces, colors, fl_r, pp_r, args.size)
        frames.append((255 * np.clip(img[:, :, :3], 0, 1)).astype(np.uint8))
        print(f"rendered {p}")

    imageio.mimsave(args.outpath, frames, fps=args.fps, loop=0)
    print(f"wrote {args.outpath} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
