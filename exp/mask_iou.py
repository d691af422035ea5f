"""Score the weights-free segmentation substitute against GT silhouettes.

The propagated-VOS masks (preprocess/mask.py --masksrc propagate — the
PointRend substitute, ref:preprocess/mask.py:63-67) live in
database/DAVIS/Annotations/<seq>.  For the in-repo raw-video benchmarks the
GT silhouettes were deliberately discarded by exp/make_<seq>.sh (pixels-only
pipeline), but the synthetic source is deterministic, so this script
re-renders it and scores per-frame IoU.

Usage: python exp/mask_iou.py camel   (writes results/mask_quality_<seq>.json)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys

import cv2
import numpy as np

# (render_syn flags, n frames) used by exp/make_<seq>.sh for each sequence
SOURCES = {
    "camel": ["--model", "dog", "--nframes", "26"],    # exp/make_camel.sh
    "pika": ["--model", "dog", "--nframes", "31"],     # exp/make_pika.sh
}


def main():
    seq = sys.argv[1] if len(sys.argv) > 1 else "camel"
    keep = "--keep" in sys.argv   # keep the re-rendered GT tree on disk
                                  # (exp/mask_flow_ab.py scores against it)
    root = "database/DAVIS"
    tmp = f"{seq}-maskgt-tmp"

    gt_dir = f"{root}/Annotations/Full-Resolution/{tmp}"
    nframes = int(SOURCES[seq][SOURCES[seq].index("--nframes") + 1])
    # completeness check on the LAST frame: a timeout-killed render leaves
    # a partial dir that a bare isdir() would silently trust
    last = os.path.join(gt_dir, f"{nframes - 1:05d}.png")
    if not os.path.exists(last):
        for sub in ("JPEGImages", "Annotations", "FlowFW", "FlowBW",
                    "Camera", "Meshes"):
            shutil.rmtree(f"{root}/{sub}/Full-Resolution/{tmp}",
                          ignore_errors=True)
        subprocess.run([sys.executable, "scripts/render_syn.py",
                        "--outdir", tmp] + SOURCES[seq], check=True)

    pred_paths = sorted(
        glob.glob(f"{root}/Annotations/Full-Resolution/{seq}/*.png"))
    ious = []
    for p in pred_paths:
        g = os.path.join(gt_dir, os.path.basename(p))
        if not os.path.exists(g):
            continue
        pred = cv2.imread(p, 0) > 0
        gt = cv2.imread(g, 0) > 0
        if pred.shape != gt.shape:
            pred = cv2.resize(pred.astype(np.uint8),
                              (gt.shape[1], gt.shape[0])) > 0
        inter = float(np.logical_and(pred, gt).sum())
        union = float(np.logical_or(pred, gt).sum())
        ious.append(inter / max(union, 1.0))

    out = {
        "seq": seq,
        "n_frames": len(ious),
        "mean_iou": float(np.mean(ious)),
        "min_iou": float(np.min(ious)),
        "per_frame_iou": [round(v, 3) for v in ious],
        "method": "preprocess/mask.py --masksrc propagate "
                  "(GrabCut + flow-propagated VOS)",
        "gt": "exact silhouettes re-rendered from the deterministic "
              "synthetic source",
        "reference_equiv": "detectron2 PointRend (ref:preprocess/mask.py)",
    }
    os.makedirs("results", exist_ok=True)
    path = f"results/mask_quality_{seq}.json"
    json.dump(out, open(path, "w"), indent=1)
    print(f"{seq}: mean IoU {out['mean_iou']:.3f} (min {out['min_iou']:.3f}) "
          f"over {len(ious)} frames -> {path}")

    if not keep:
        # clean the re-rendered GT tree (large; regenerable)
        for sub in ("JPEGImages", "Annotations", "FlowFW", "FlowBW",
                    "Camera", "Meshes"):
            shutil.rmtree(f"{root}/{sub}/Full-Resolution/{tmp}",
                          ignore_errors=True)


if __name__ == "__main__":
    main()
