"""Flow-quality audit on a synthetic fixture with exact GT flow.

The reference pipeline's flow comes from VCN-robust
(ref:preprocess/auto_gen.py:84-191, weights not distributable); ours
defaults to DIS (preprocess/auto_gen.py:36-59).  This measures what that
substitution costs where truth is known: end-point-error of DIS flow vs the
renderer's exact flow, inside the object mask, per adjacent pair.

Usage: python exp/flow_epe.py [--seq syn-dog-15]   (writes results/flow_epe_<seq>.json)
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

from lasr_tpu.data.pfm import read_pfm
from preprocess.auto_gen import dis_flow_backend


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default="syn-dog-15")
    ap.add_argument("--backend", default="dis", choices=("dis", "flownet"))
    args = ap.parse_args()
    if args.backend == "flownet":
        import jax
        jax.config.update("jax_platforms", "cpu")   # measurement tool;
        # leave the chip to whatever training run holds it
        from lasr_tpu.models.flownet import make_backend
        backend_fn = make_backend("database/misc/flownet.npz")
    else:
        backend_fn = dis_flow_backend
    root = "database/DAVIS"
    imgs = sorted(glob.glob(
        f"{root}/JPEGImages/Full-Resolution/{args.seq}/*.jpg"))
    rows = []
    for i in range(len(imgs) - 1):
        im0 = cv2.imread(imgs[i])
        im1 = cv2.imread(imgs[i + 1])
        mask = cv2.imread(
            f"{root}/Annotations/Full-Resolution/{args.seq}/{i:05d}.png", 0) > 0
        gt, _ = read_pfm(
            f"{root}/FlowFW/Full-Resolution/{args.seq}/flo-{i:05d}.pfm")
        gt = gt[..., :2]
        dis, occ = backend_fn(im0, im1)
        err = np.linalg.norm(dis[..., :2] - gt, axis=-1)
        mag = np.linalg.norm(gt, axis=-1)
        rows.append(dict(pair=i,
                         epe_mask=float(err[mask].mean()),
                         gt_mag_mask=float(mag[mask].mean()),
                         epe_occfree=float(
                             err[mask & (occ > 0)].mean()
                             if (mask & (occ > 0)).any() else np.nan)))
        print(rows[-1])
    summary = dict(
        seq=args.seq,
        mean_epe_mask=float(np.mean([r["epe_mask"] for r in rows])),
        mean_gt_mag=float(np.mean([r["gt_mag_mask"] for r in rows])),
        backend=("DIS (preset MEDIUM) + fw/bw occlusion"
                 if args.backend == "dis" else
                 "in-repo flownet (database/misc/flownet.npz)"),
        note="EPE inside the GT object mask, pixels; occfree = where the "
             "forward-backward occlusion score accepts the match",
        pairs=rows)
    os.makedirs("results", exist_ok=True)
    suffix = "" if args.backend == "dis" else f"_{args.backend}"
    out = f"results/flow_epe_{args.seq}{suffix}.json"
    json.dump(summary, open(out, "w"), indent=1)
    print(f"mean EPE (mask) {summary['mean_epe_mask']:.2f}px on motion of "
          f"{summary['mean_gt_mag']:.2f}px -> {out}")


if __name__ == "__main__":
    main()
