"""Silhouette preprocessing: segment + renumber raw frames into DAVIS layout.

Behavioral port of ref:preprocess/mask.py, which runs detectron2 PointRend
(person + animal COCO classes) over <seq>-tmp frames and writes renumbered
JPEGImages/Annotations.  PointRend weights require a network download the
reference performs at run time; this port accepts any per-frame mask source:

  * --masksrc dir=<path>: precomputed masks (any instance segmenter, one png
    per frame) — the recommended path;
  * --masksrc grabcut: a weak classical baseline (center-prior GrabCut) for
    quick experiments without a segmenter.

Frames whose mask has fewer than 1000 pixels are skipped and the survivors
renumbered, as in the reference.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

import cv2
import numpy as np


def grabcut_mask(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    rect = (w // 8, h // 8, w * 3 // 4, h * 3 // 4)
    mask = np.zeros((h, w), np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv2.grabCut(img, mask, rect, bgd, fgd, 5, cv2.GC_INIT_WITH_RECT)
    return ((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seqname")
    ap.add_argument("--masksrc", default="grabcut",
                    help="'grabcut' or 'dir=<path-to-mask-pngs>'")
    ap.add_argument("--outroot", default="database/DAVIS")
    args = ap.parse_args()

    datadir = f"{args.outroot}/JPEGImages/Full-Resolution/{args.seqname}-tmp"
    imgdir = f"{args.outroot}/JPEGImages/Full-Resolution/{args.seqname}"
    maskdir = f"{args.outroot}/Annotations/Full-Resolution/{args.seqname}"
    for d in (imgdir, maskdir):
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d)

    mask_dir = None
    if args.masksrc.startswith("dir="):
        mask_dir = args.masksrc[4:]

    counter = 0
    for path in sorted(glob.glob(f"{datadir}/*")):
        img = cv2.imread(path)
        if mask_dir is not None:
            mpath = os.path.join(
                mask_dir, os.path.basename(path).rsplit(".", 1)[0] + ".png")
            mask = (cv2.imread(mpath, 0) > 0).astype(np.uint8)
        else:
            mask = grabcut_mask(img)
        if mask.sum() < 1000:
            print(f"skipping {path}: mask too small")
            continue
        out_mask = np.zeros(img.shape, np.uint8)
        out_mask[:, :, 2] = 128 * mask          # blue channel, as in the ref
        cv2.imwrite(f"{imgdir}/{counter:05d}.jpg", img)
        cv2.imwrite(f"{maskdir}/{counter:05d}.png", out_mask)
        counter += 1
    print(f"wrote {counter} frames")


if __name__ == "__main__":
    main()
