"""Experiment: ORB sparse matches vs dense DIS flow as the correspondence
source for the spherical-proxy Procrustes chain, on pika (GT regenerable).
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import cv2

from exp.diag_pika_cams import gt_rots, geo_deg
from lasr_tpu.preprocess.caminit import (_lift, _mask_moments, _procrustes)


def orb_pair_rotation(img0, img1, mask0, mask1, trim_iters=3):
    orb = cv2.ORB_create(nfeatures=3000, fastThreshold=5)
    k0, d0 = orb.detectAndCompute(img0, mask0.astype(np.uint8) * 255)
    k1, d1 = orb.detectAndCompute(img1, mask1.astype(np.uint8) * 255)
    if d0 is None or d1 is None or len(k0) < 20 or len(k1) < 20:
        return np.eye(3), 0
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    matches = bf.knnMatch(d0, d1, k=2)
    good = [m for m, n in matches if m.distance < 0.75 * n.distance]
    if len(good) < 12:
        return np.eye(3), len(good)
    p0 = np.float64([k0[m.queryIdx].pt for m in good])
    p1 = np.float64([k1[m.trainIdx].pt for m in good])

    c0, r0 = _mask_moments(mask0)
    c1, r1 = _mask_moments(mask1)
    x0, w0 = _lift(p0, c0, r0)
    x1, w1 = _lift(p1, c1, r1)
    x0, x1 = x0 / r0, x1 / r1
    w = w0 * w1
    if w.sum() < 1e-6:
        return np.eye(3), len(good)
    R = _procrustes(x0, x1, w)
    for _ in range(trim_iters):
        resid = np.linalg.norm(x1 - x0 @ R.T, axis=-1)
        med = np.median(resid[w > 0])
        keep = resid <= 2.5 * max(med, 1e-9)
        if (w * keep).sum() < 1e-6:
            break
        w = w * keep
        R = _procrustes(x0, x1, w)
    return R, len(good)


def main():
    root = "database/DAVIS"
    seq = "pika"
    imgs = sorted(glob.glob(f"{root}/JPEGImages/Full-Resolution/{seq}/*.jpg"))
    msks = sorted(glob.glob(f"{root}/Annotations/Full-Resolution/{seq}/*.png"))
    n = len(imgs)
    gt = gt_rots(n)
    errs, nm = [], []
    for i in range(n - 1):
        g0 = cv2.imread(imgs[i], 0)
        g1 = cv2.imread(imgs[i + 1], 0)
        m0 = cv2.imread(msks[i], 0) > 0
        m1 = cv2.imread(msks[i + 1], 0) > 0
        R, k = orb_pair_rotation(g0, g1, m0, m1)
        errs.append(geo_deg(R, gt[i + 1] @ gt[i].T))
        nm.append(k)
    print(f"{seq} ORB: adjacent rel-rot err mean {np.mean(errs):.1f} deg "
          f"(matches median {int(np.median(nm))})")
    print("  per-pair err:", np.round(errs, 1).tolist())


if __name__ == "__main__":
    main()
