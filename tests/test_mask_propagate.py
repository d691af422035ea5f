"""Flow-propagated video segmentation (preprocess/mask.py propagate mode).

Synthetic moving-disc video with known GT masks: the weights-free
PointRend substitute (GrabCut init + DIS-flow mask propagation +
mask-initialized GrabCut refinement) must track the object with high IoU.
"""

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "preprocess"))

from mask import grabcut_mask, propagate_masks  # noqa: E402


def _video(n=6, H=192, W=256, r=42):
    rng = np.random.RandomState(3)
    tex = cv2.GaussianBlur(rng.rand(H, W, 3).astype(np.float32), (0, 0), 4)
    tex = 0.55 + 0.45 * (tex - tex.min()) / (tex.max() - tex.min())   # bright
    imgs, gts = [], []
    for t in range(n):
        cx, cy = 70 + 18 * t, 96 + int(10 * np.sin(t))
        yy, xx = np.mgrid[:H, :W]
        m = ((xx - cx) ** 2 + (yy - cy) ** 2 < r * r)
        img = np.full((H, W, 3), 0.12, np.float32)          # dark background
        img += 0.03 * rng.rand(H, W, 3)
        img[m] = tex[m] * (0.8 + 0.2 * np.cos(t))
        imgs.append((255 * np.clip(img, 0, 1)).astype(np.uint8))
        gts.append(m)
    return imgs, gts


def _iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


def test_propagate_tracks_moving_object():
    imgs, gts = _video()
    masks = propagate_masks(imgs)
    ious = [_iou(m > 0, g) for m, g in zip(masks, gts)]
    assert min(ious) > 0.75, f"IoUs {['%.2f' % v for v in ious]}"


def test_grabcut_first_frame():
    imgs, gts = _video(n=1)
    m = grabcut_mask(imgs[0])
    assert _iou(m > 0, gts[0]) > 0.75
