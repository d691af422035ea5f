"""A/B the mask-propagation warp flow (DIS vs learned flownet) against GT.

Propagates masks over <seq>-tmp frames with both backends and scores
per-frame IoU against the re-rendered GT silhouettes
(<seq>-maskgt-tmp, produced by exp/mask_iou.py).  Writes
results/mask_flow_ab_<seq>.json.  CPU-only (does not touch the chip).

Usage: python exp/mask_flow_ab.py pika
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import numpy as np  # noqa: E402


def iou_series(masks, gt_dir):
    ious = []
    for i, m in enumerate(masks):
        g = cv2.imread(os.path.join(gt_dir, f"{i:05d}.png"), 0)
        if g is None:
            break
        g = g > 0
        if m.shape != g.shape:
            m = cv2.resize(m.astype(np.uint8),
                           (g.shape[1], g.shape[0])) > 0
        inter = float(np.logical_and(m > 0, g).sum())
        union = float(np.logical_or(m > 0, g).sum())
        ious.append(inter / max(union, 1.0))
    return ious


def main():
    seq = sys.argv[1] if len(sys.argv) > 1 else "pika"
    root = "database/DAVIS"
    frames = sorted(glob.glob(
        f"{root}/JPEGImages/Full-Resolution/{seq}-tmp/*"))
    gt_dir = f"{root}/Annotations/Full-Resolution/{seq}-maskgt-tmp"
    assert frames, f"no {seq}-tmp frames (run video2frames first)"
    assert os.path.isdir(gt_dir), \
        f"no {gt_dir} (run exp/mask_iou.py {seq} first, or let it finish)"

    sys.path.insert(0, "preprocess")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "maskmod", "preprocess/mask.py")
    maskmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(maskmod)

    imgs = [cv2.imread(p) for p in frames]
    out = {"seq": seq, "n_frames": len(imgs)}
    methods = {
        "dis": lambda: maskmod.propagate_masks(imgs, flow="dis"),
        "flownet": lambda: maskmod.propagate_masks(imgs, flow="flownet"),
        "dis_bidir":
            lambda: maskmod.propagate_masks_bidir(imgs, flow="dis"),
        "flownet_bidir":
            lambda: maskmod.propagate_masks_bidir(imgs, flow="flownet"),
    }
    for name, fn in methods.items():
        masks = fn()
        ious = iou_series(masks, gt_dir)
        out[name] = {"mean_iou": float(np.mean(ious)),
                     "min_iou": float(np.min(ious)),
                     "per_frame": [round(v, 3) for v in ious]}
        print(f"{name}: mean IoU {out[name]['mean_iou']:.3f} "
              f"(min {out[name]['min_iou']:.3f})", flush=True)
    os.makedirs("results", exist_ok=True)
    json.dump(out, open(f"results/mask_flow_ab_{seq}.json", "w"), indent=1)


if __name__ == "__main__":
    main()
