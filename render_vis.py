"""Turntable / per-frame visualization of extracted meshes.

Behavioral port of ref:render_vis.py: loads pred%d.ply + cam%d.txt written by
extract.py and renders a gif — per-frame camera view, optional --freeze
turntable, optional --vis_bones (transparent surface over gaussian bone
ellipsoids), optional --remesh N (watertight remesh before rendering,
ref:render_vis.py:96-100), with a ground plane and a projected soft shadow
standing in for the reference's pyrender directional shadow map
(ref:render_vis.py:180-240).  Runs on the host CPU backend by default
(--device tpu to opt in) — it is an offline vis pass.

Usage: python render_vis.py --testdir log/spot3-gtcam-1 --outpath out.gif
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax

if "--device" in sys.argv:
    _dev = sys.argv[sys.argv.index("--device") + 1]
else:
    _dev = next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith("--device=")), "cpu")
if _dev == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import imageio
import numpy as np
import jax.numpy as jnp

from lasr_tpu.ops.rasterize import RasterizeConfig, soft_rasterize
from lasr_tpu.utils.ply import read_ply

LIGHT_DIR = np.array([0.25, 0.55, -0.6])   # camera frame; +y = image down
LIGHT_DIR /= np.linalg.norm(LIGHT_DIR)


def raster_pass(verts, faces, colors, fl, pp, size, background=(1.0, 1.0, 1.0)):
    """Camera-frame mesh -> [size, size, 4] image (pixel intrinsics fl/pp)."""
    z = verts[:, 2]
    x = (fl * verts[:, 0] / z + pp[0]) / (size / 2) - 1.0
    y = (fl * verts[:, 1] / z + pp[1]) / (size / 2) - 1.0
    geom = np.stack([x, -y, z], -1)
    cfg = RasterizeConfig(image_size=size, sigma=1e-12, gamma=1e-4,
                          dist_func="hard", aggr_rgb="hard", aggr_alpha="hard",
                          background=background, face_chunk=64)
    out = np.asarray(soft_rasterize(
        jnp.asarray(geom[faces][None]), jnp.asarray(colors[faces][None]),
        cfg, float(z.min() - 1), float(z.max() + 1), force_ref=True))
    return out[0].transpose(1, 2, 0)


def lambert(verts, faces, colors, amb=0.45):
    """Per-vertex Lambertian shading against LIGHT_DIR."""
    fv = verts[faces]
    fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    vn = np.zeros_like(verts)
    np.add.at(vn, faces.reshape(-1), np.repeat(fn, 3, 0))
    vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
    lam = amb + (1 - amb) * np.clip((vn * -LIGHT_DIR).sum(-1), 0, 1)[:, None]
    return np.clip(colors * np.abs(lam), 0, 1)


def floor_geometry(verts, floor_y, extent):
    """Ground quad + the mesh's shadow projected along LIGHT_DIR onto it.

    Returns (verts [N,3], faces [M,3], colors [N,3]).  Shadow verts are
    scaled by 0.998 toward the camera: identical screen position under
    pinhole projection, strictly nearer depth — wins the z-test against the
    coplanar floor without bias hacks."""
    cx, cz = verts[:, 0].mean(), verts[:, 2].mean()
    e = 6.0 * extent
    fq = np.array([[cx - e, floor_y, cz - e], [cx + e, floor_y, cz - e],
                   [cx + e, floor_y, cz + e], [cx - e, floor_y, cz + e]],
                  np.float32)
    fq[:, 2] = np.maximum(fq[:, 2], 0.05 * extent)   # stay in front of camera
    ffaces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    fcol = np.full((4, 3), 0.92, np.float32)
    return fq, ffaces, fcol


def project_shadow(verts, floor_y):
    t = (floor_y - verts[:, 1]) / LIGHT_DIR[1]
    sh = verts + np.clip(t, 0, None)[:, None] * LIGHT_DIR
    return (sh * 0.998).astype(np.float32)


def cat_mesh(*parts):
    """parts: (verts, faces, colors) triples -> one concatenated triple."""
    vs, fs, cs, off = [], [], [], 0
    for v, f, c in parts:
        vs.append(v); fs.append(f + off); cs.append(c); off += len(v)
    return (np.concatenate(vs).astype(np.float32),
            np.concatenate(fs).astype(np.int32),
            np.concatenate(cs).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--testdir", required=True)
    ap.add_argument("--outpath", default="out.gif")
    ap.add_argument("--freeze", action="store_true",
                    help="turntable around one frame instead of the sequence")
    ap.add_argument("--vis_bones", action="store_true",
                    help="transparent surface over gaussian bone ellipsoids")
    ap.add_argument("--remesh", type=int, default=0,
                    help="watertight-remesh predictions to N faces first "
                         "(ref:render_vis.py:96-100)")
    ap.add_argument("--floor", dest="floor", action="store_true", default=True)
    ap.add_argument("--nofloor", dest="floor", action="store_false")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--device", default="cpu", help="cpu | tpu")
    args = ap.parse_args()

    preds = sorted(glob.glob(os.path.join(args.testdir, "pred*.ply")),
                   key=lambda p: int(re.findall(r"pred(\d+)\.ply", p)[0]))
    if not preds:
        raise SystemExit(f"no pred*.ply under {args.testdir}")

    # sequence-constant floor height: max image-down extent over all frames
    floor_y, extent = -np.inf, 0.0
    for p in preds:
        v, _, _ = read_ply(p)
        floor_y = max(floor_y, v[:, 1].max())
        extent = max(extent, np.linalg.norm(v - v.mean(0), axis=1).max())
    floor_y += 0.02 * extent

    frames = []
    seq = [preds[len(preds) // 2]] * 36 if args.freeze else preds
    for t, p in enumerate(seq):
        i = int(re.findall(r"pred(\d+)\.ply", p)[0])
        verts, faces, colors = read_ply(p)
        colors = (colors.astype(np.float32) / 255.0 if colors is not None
                  else np.full((len(verts), 3), 0.7, np.float32))
        if args.remesh > 0:
            from lasr_tpu.utils.remesh import remesh as remesh_fn
            nv, nf = remesh_fn(verts, faces, args.remesh)
            # nearest-vertex color transfer
            d = ((nv[:, None] - verts[None]) ** 2).sum(-1)
            colors = colors[d.argmin(1)]
            verts, faces = nv, nf.astype(np.int32)
        cam = np.loadtxt(os.path.join(args.testdir, f"cam{i}.txt"))
        fl, pp = cam[3, 0], cam[3, 2:4]
        scale_px = args.size / (2.2 * (pp.max() + 1e-6)) if pp.max() > 1 else 1.0
        fl_r, pp_r = fl * scale_px, pp * scale_px

        if args.freeze:
            center = verts.mean(0)
            ang = 2 * np.pi * t / len(seq)
            c, s = np.cos(ang), np.sin(ang)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            verts = (verts - center) @ R.T + center

        surf = (verts, faces, lambert(verts, faces, colors))
        backdrop = []
        if args.floor:
            fv, ff, fc = floor_geometry(verts, floor_y, extent)
            shadow = (project_shadow(verts, floor_y), faces,
                      np.full((len(verts), 3), 0.55, np.float32))
            backdrop = [(fv, ff, fc), shadow]

        bone_path = os.path.join(args.testdir, f"gauss{i}.ply")
        if args.vis_bones and os.path.exists(bone_path):
            gv, gf, gc = read_ply(bone_path)
            gcol = (gc.astype(np.float32) / 255.0 if gc is not None
                    else np.tile(np.array([0.85, 0.3, 0.2], np.float32),
                                 (len(gv), 1)))
            if args.freeze:
                gv = (gv - center) @ R.T + center
            bones = (gv.astype(np.float32), gf.astype(np.int32),
                     lambert(gv, gf.astype(np.int32), gcol))
            # pass A: floor + shadow + opaque bones; pass B: surface;
            # composite the surface at alpha 0.5 (the reference's
            # transparent-surface bone mode)
            va, fa, ca = cat_mesh(*(backdrop + [bones]))
            imgA = raster_pass(va, fa, ca, fl_r, pp_r, args.size)
            imgB = raster_pass(*surf, fl_r, pp_r, args.size,
                               background=(0.0, 0.0, 0.0))
            a = 0.5 * imgB[:, :, 3:4]
            img = imgB[:, :, :3] * a + imgA[:, :, :3] * (1 - a)
        else:
            va, fa, ca = cat_mesh(*(backdrop + [surf]))
            img = raster_pass(va, fa, ca, fl_r, pp_r, args.size)[:, :, :3]

        frames.append((255 * np.clip(img, 0, 1)).astype(np.uint8))
        print(f"rendered {p}")

    imageio.mimsave(args.outpath, frames, fps=args.fps, loop=0)
    print(f"wrote {args.outpath} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
