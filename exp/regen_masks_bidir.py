"""Regenerate a sequence's Annotations in place with bidirectional mask
propagation (preprocess/mask.py --masksrc propagate-bidir), WITHOUT
rewriting JPEGImages: mask.py's normal path re-encodes the frames
(cv2.imwrite on already-compressed JPEGs), which would mutate the
committed benchmark pixels.  This reads the committed frames and replaces
only the Annotations pngs.

Usage: python exp/regen_masks_bidir.py camel
"""

from __future__ import annotations

import glob
import sys

import cv2
import numpy as np

sys.path.insert(0, ".")
from preprocess.mask import propagate_masks_bidir  # noqa: E402


def main():
    seq = sys.argv[1]
    root = "database/DAVIS"
    imgdir = f"{root}/JPEGImages/Full-Resolution/{seq}"
    maskdir = f"{root}/Annotations/Full-Resolution/{seq}"
    paths = sorted(glob.glob(f"{imgdir}/*.jpg"))
    assert paths, imgdir
    masks = propagate_masks_bidir([cv2.imread(p) for p in paths])
    for p, mask in zip(paths, masks):
        assert mask.sum() >= 1000, p
        out = np.zeros((*mask.shape, 3), np.uint8)
        out[:, :, 2] = 128 * mask  # blue channel, as in the ref
        name = p.rsplit("/", 1)[1].rsplit(".", 1)[0]
        cv2.imwrite(f"{maskdir}/{name}.png", out)
    print(f"rewrote {len(paths)} masks in {maskdir}")


if __name__ == "__main__":
    main()
