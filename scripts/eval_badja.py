"""Keypoint-transfer evaluation on BADJA: PCK @ 0.2·sqrt(silhouette area).

Behavioral port of ref:scripts/eval_badja.py (--type mesh): for every ordered
frame pair, render the optical flow induced by the two reconstructed meshes
(3D vertex coordinates rasterized as colors, reprojected through each frame's
camera), transport the annotated keypoints by that flow, and score them
against the target annotations.

Usage: python scripts/eval_badja.py --testdir log/camel-5 --seqname camel
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from lasr_tpu.data.badja import BADJAData
from lasr_tpu.ops.rasterize import RasterizeConfig, soft_rasterize
from lasr_tpu.utils.ply import read_ply


def render_mesh_flow(ref_v, tar_v, faces, ref_cam, tar_cam, img_size):
    """Flow (NDC units) from the reference mesh's pixels to the target mesh,
    via hard-rasterized 3D coordinates (ref:nnutils/geom_utils.py:73-95)."""
    def cam_apply(v, cam):
        R, T = cam[:3, :3], cam[:3, 3]
        return v @ R + T    # row-vector convention, as written by extract

    def project(v, cam):
        fl = cam[3, 0] / img_size * 2
        pp = cam[3, 2:4] / img_size * 2 - 1
        x = pp[0] + v[:, 0] * fl / v[:, 2]
        y = pp[1] + v[:, 1] * fl / v[:, 2]
        return np.stack([x, y, v[:, 2]], -1)

    vr = cam_apply(ref_v, ref_cam)
    vt = cam_apply(tar_v, tar_cam)
    pr = project(vr, ref_cam)
    pt = project(vt, tar_cam)

    geom = pr.copy()
    geom[:, 1] *= -1
    cfg = RasterizeConfig(image_size=img_size, sigma=1e-12, gamma=1e-4,
                          dist_func="hard", aggr_rgb="hard", aggr_alpha="prod",
                          face_chunk=64)
    z = vr[:, 2]
    near, far = float(z.min() - 1), float(z.max() + 1)
    out = np.asarray(soft_rasterize(jnp.asarray(geom[faces][None]),
                                    jnp.asarray(vt[faces][None].astype(np.float32)),
                                    cfg, near, far, force_ref=True))
    coords = out[0, :3].transpose(1, 2, 0)          # target cam-space coords
    bg = coords[:, :, 2] < 1e-9

    fl_t = tar_cam[3, 0] / img_size * 2
    pp_t = tar_cam[3, 2:4] / img_size * 2 - 1
    with np.errstate(divide="ignore", invalid="ignore"):
        px = pp_t[0] + coords[:, :, 0] * fl_t / coords[:, :, 2]
        py = pp_t[1] + coords[:, :, 1] * fl_t / coords[:, :, 2]
    xs = (2 * np.arange(img_size) + 1 - img_size) / img_size
    grid_x = np.tile(xs[None, :], (img_size, 1))
    grid_y = np.tile(xs[:, None], (1, img_size))
    flow = np.stack([px - grid_x, py - grid_y], -1)
    flow[bg] = 0.0
    return flow, bg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--testdir", required=True)
    ap.add_argument("--seqname", required=True)
    ap.add_argument("--badja_path", default="database")
    args = ap.parse_args()

    data = list(BADJAData(args.seqname, args.badja_path))
    annos, meshes, cams, frs = [], [], [], []
    for rgb, sil, joints, vis, name in data:
        fr = int(re.findall(r"(\d+)\.", os.path.basename(name))[0])
        ply = os.path.join(args.testdir, f"pred{fr}.ply")
        if not os.path.exists(ply):
            continue
        annos.append((rgb, sil, joints, vis))
        v, f, _ = read_ply(ply)
        meshes.append((v, f))
        cams.append(np.loadtxt(os.path.join(args.testdir, f"cam{fr}.txt")))
        frs.append(fr)

    pck_all = []
    for i in range(len(annos)):
        for j in range(len(annos)):
            if i == j:
                continue
            rimg, rsil, rkp, rvis = annos[i]
            _, _, tkp, tvis = annos[j]
            img_size = max(rimg.shape[:2])
            flow, bg = render_mesh_flow(meshes[i][0], meshes[j][0],
                                        meshes[i][1], cams[i], cams[j],
                                        img_size)
            # sample flow at the nearest valid pixel to each keypoint (y, x)
            H = W = img_size
            valid = ~bg & (np.linalg.norm(flow, axis=-1) > 1e-6)
            ys, xs = np.where(valid)
            if len(ys) == 0:
                continue
            preds = rkp.astype(np.float64).copy()
            for k, (ky, kx) in enumerate(rkp):
                d = (ys - ky) ** 2 + (xs - kx) ** 2
                b = d.argmin()
                preds[k, 0] = ky + flow[ys[b], xs[b], 1] * img_size / 2
                preds[k, 1] = kx + flow[ys[b], xs[b], 0] * img_size / 2
            diff = np.linalg.norm(preds - tkp, axis=-1)
            sqarea = np.sqrt((rsil[:, :, 0] > 0).sum())
            correct = (diff < sqarea * 0.2)[np.logical_and(tvis, rvis)]
            pck_all.append(correct)

    pck = 100 * np.concatenate(pck_all).astype(float).mean()
    print(f"PCK {pck:.02f}")
    with open(os.path.join(args.testdir, "eval_badja.json"), "w") as f:
        json.dump({"pck": pck}, f)


if __name__ == "__main__":
    main()
