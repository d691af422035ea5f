"""Keypoint-transfer evaluation on BADJA: PCK @ 0.2·sqrt(silhouette area).

Behavioral port of ref:scripts/eval_badja.py: for every ordered frame pair,
transport the annotated keypoints from reference to target frame and score
them against the target annotations.

--type mesh (default, ref:eval_badja.py --type mesh): transport by the flow
  induced by the two reconstructed meshes (3D vertex coordinates rasterized
  as colors, reprojected through each frame's camera).
--type flow (ref:eval_badja.py:158-204): transport by 2D optical flow
  computed directly on the two frames (the reference uses VCN; here the
  in-repo backends, --flow_backend dis|flownet) — the "how much does the 3D
  model actually add" baseline.
--type zero (ref:eval_badja.py:206-258): no motion at all — the floor any
  transfer method must beat.

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

import cv2
import numpy as np
import jax.numpy as jnp

from lasr_tpu.data.badja import BADJAData
from lasr_tpu.ops.rasterize import RasterizeConfig, soft_rasterize
from lasr_tpu.utils.ply import read_ply


def _host_rasterize_coords(pix, z, tar_coords, faces, img_size):
    """Exact hard rasterization on the host: painter's-algorithm face-id
    buffer (far-to-near cv2.fillPoly) + per-pixel barycentric interpolation
    of the target-frame camera coordinates.  Semantically identical to the
    soft rasterizer's dist_func='hard'/aggr_rgb='hard' mode (which is what
    the reference uses for flow transfer, ref:nnutils/geom_utils.py:73-95)
    but runs in ~0.1 s instead of ~40 s for a 512-px 6k-face mesh on CPU."""
    idbuf = np.full((img_size, img_size), -1, np.int32)
    face_z = z[faces].mean(1)
    tris = np.round(pix[faces]).astype(np.int32)
    order = np.argsort(-face_z)
    for fi in order:
        cv2.fillPoly(idbuf, [tris[fi]], int(fi))
    ys, xs = np.nonzero(idbuf >= 0)
    fid = idbuf[ys, xs]
    tri = pix[faces[fid]]                            # [N, 3, 2]
    # barycentric coords of each covered pixel in its face
    v0 = tri[:, 1] - tri[:, 0]
    v1 = tri[:, 2] - tri[:, 0]
    p = np.stack([xs, ys], 1) - tri[:, 0]
    den = v0[:, 0] * v1[:, 1] - v0[:, 1] * v1[:, 0]
    den = np.where(np.abs(den) < 1e-12, 1e-12, den)
    w1 = (p[:, 0] * v1[:, 1] - p[:, 1] * v1[:, 0]) / den
    w2 = (v0[:, 0] * p[:, 1] - v0[:, 1] * p[:, 0]) / den
    w0 = 1.0 - w1 - w2
    w = np.clip(np.stack([w0, w1, w2], 1), 0, 1)
    w /= w.sum(1, keepdims=True)
    vals = (tar_coords[faces[fid]] * w[:, :, None]).sum(1)
    out = np.zeros((img_size, img_size, tar_coords.shape[1]), np.float64)
    out[ys, xs] = vals
    return out


def render_mesh_flow(ref_v, tar_v, faces, ref_cam, tar_cam, img_size,
                     renderer="host"):
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

    if renderer == "host":
        # NDC -> pixel for the id-buffer; interpolate target cam coords
        pix = (pr[:, :2] + 1) / 2 * (img_size - 1)
        coords = _host_rasterize_coords(pix, vr[:, 2], vt, faces, img_size)
    else:
        geom = pr.copy()
        geom[:, 1] *= -1
        cfg = RasterizeConfig(image_size=img_size, sigma=1e-12, gamma=1e-4,
                              dist_func="hard", aggr_rgb="hard",
                              aggr_alpha="prod", face_chunk=64)
        z = vr[:, 2]
        near, far = float(z.min() - 1), float(z.max() + 1)
        out = np.asarray(soft_rasterize(
            jnp.asarray(geom[faces][None]),
            jnp.asarray(vt[faces][None].astype(np.float32)),
            cfg, near, far, force_ref=True))
        coords = out[0, :3].transpose(1, 2, 0)      # target cam-space coords
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
    ap.add_argument("--renderer", default="host", choices=["host", "soft"],
                    help="host = exact z-buffer hard rasterization (fast); "
                         "soft = the soft rasterizer in hard mode")
    ap.add_argument("--type", default="mesh", choices=["mesh", "flow", "zero"],
                    dest="eval_type",
                    help="keypoint transport: reconstructed-mesh flow, "
                         "direct 2D optical flow, or zero motion")
    ap.add_argument("--flow_backend", default="dis",
                    choices=["dis", "flownet"],
                    help="--type flow: which in-repo flow estimator")
    args = ap.parse_args()

    flow_fn = None
    if args.eval_type == "flow":
        if args.flow_backend == "flownet":
            import jax
            jax.config.update("jax_platforms", "cpu")
            from lasr_tpu.models.flownet import make_backend
            flow_fn = make_backend("database/misc/flownet.npz")
        else:
            from preprocess.auto_gen import dis_flow_backend
            flow_fn = dis_flow_backend

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
            timg, _, tkp, tvis = annos[j]
            img_size = max(rimg.shape[:2])
            preds = rkp.astype(np.float64).copy()
            if args.eval_type == "zero":
                pass                                # preds = rkp verbatim
            elif args.eval_type == "flow":
                pflow, _ = flow_fn(rimg[..., ::-1].copy(),
                                   timg[..., ::-1].copy())   # BGR in
                for k, (ky, kx) in enumerate(rkp):
                    yy = int(np.clip(ky, 0, pflow.shape[0] - 1))
                    xx = int(np.clip(kx, 0, pflow.shape[1] - 1))
                    preds[k, 0] = ky + pflow[yy, xx, 1]      # pixel units
                    preds[k, 1] = kx + pflow[yy, xx, 0]
            else:
                flow, bg = render_mesh_flow(meshes[i][0], meshes[j][0],
                                            meshes[i][1], cams[i], cams[j],
                                            img_size,
                                            renderer=args.renderer)
                # sample flow at the nearest valid pixel to each keypoint
                valid = ~bg & (np.linalg.norm(flow, axis=-1) > 1e-6)
                ys, xs = np.where(valid)
                if len(ys) == 0:
                    continue
                for k, (ky, kx) in enumerate(rkp):
                    d = (ys - ky) ** 2 + (xs - kx) ** 2
                    b = d.argmin()
                    preds[k, 0] = ky + flow[ys[b], xs[b], 1] * img_size / 2
                    preds[k, 1] = kx + flow[ys[b], xs[b], 0] * img_size / 2
            diff = np.linalg.norm(preds - tkp, axis=-1)
            # DAVIS-palette masks may store the object color in any channel
            sqarea = np.sqrt((rsil.max(-1) > 0).sum())
            correct = (diff < sqarea * 0.2)[np.logical_and(tvis, rvis)]
            pck_all.append(correct)

    pck = 100 * np.concatenate(pck_all).astype(float).mean()
    print(f"PCK {pck:.02f}")
    suffix = "" if args.eval_type == "mesh" else f"_{args.eval_type}"
    out = {"pck": pck, "type": args.eval_type}
    if args.eval_type == "flow":
        out["flow_backend"] = args.flow_backend
        suffix += f"_{args.flow_backend}"
    with open(os.path.join(args.testdir, f"eval_badja{suffix}.json"),
              "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
