"""Silhouette preprocessing: segment + renumber raw frames into DAVIS layout.

Behavioral port of ref:preprocess/mask.py, which runs detectron2 PointRend
(person + animal COCO classes) over <seq>-tmp frames and writes renumbered
JPEGImages/Annotations.  PointRend weights require a network download the
reference performs at run time; this port accepts any per-frame mask source:

  * --masksrc dir=<path>: precomputed masks (any instance segmenter, one png
    per frame);
  * --masksrc propagate: the recommended weights-free path — GrabCut on the
    first frame (optionally seeded with --init_rect), then classical video
    object segmentation: DIS optical flow warps each mask forward and a
    mask-initialized GrabCut refines it against the new frame;
  * --masksrc grabcut: independent center-prior GrabCut per frame (weak
    baseline).

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


def _largest_component(mask: np.ndarray) -> np.ndarray:
    n, labels, stats, _ = cv2.connectedComponentsWithStats(
        mask.astype(np.uint8), connectivity=8)
    if n <= 1:
        return mask.astype(np.uint8)
    best = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
    return (labels == best).astype(np.uint8)


def grabcut_mask(img: np.ndarray, rect=None, seed: int = 0) -> np.ndarray:
    # cv2.grabCut initializes its color GMMs with kmeans++ draws from the
    # PROCESS-GLOBAL cv2 RNG: without pinning, two runs of the same chain
    # produce different masks (measured 0.967 vs 0.898 mean IoU on pika —
    # chain error compounds frame to frame).  Seed per call.
    cv2.setRNGSeed(seed)
    h, w = img.shape[:2]
    if rect is None:
        rect = (w // 8, h // 8, w * 3 // 4, h * 3 // 4)
    mask = np.zeros((h, w), np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv2.grabCut(img, mask, tuple(rect), bgd, fgd, 5, cv2.GC_INIT_WITH_RECT)
    out = ((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)).astype(np.uint8)
    return _largest_component(out)


def _dis_bw_flow(img_prev, img_cur):
    dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
    g0 = cv2.cvtColor(img_prev, cv2.COLOR_BGR2GRAY)
    g1 = cv2.cvtColor(img_cur, cv2.COLOR_BGR2GRAY)
    return dis.calc(g1, g0, None)


def _flownet_bw_flow_factory(weights="database/misc/flownet.npz"):
    """cur->prev flow from the in-repo learned net (11.9px val EPE vs
    18.9px for DIS, results/flownet_val.json) — a sharper warp for the
    mask propagation when the trained weights exist."""
    from lasr_tpu.models.flownet import make_backend
    backend = make_backend(weights)

    def bw_flow(img_prev, img_cur):
        flow, _ = backend(img_cur, img_prev)   # BGR in, pixel flow out
        return flow[..., :2]
    return bw_flow


def _prop_step(prev_mask: np.ndarray, img_prev: np.ndarray,
               img_cur: np.ndarray, bw_flow, seed: int) -> np.ndarray:
    """One propagation hop: warp prev_mask along cur->prev flow, refine
    with a mask-initialized GrabCut trimap (sure-fg = eroded warp, sure-bg
    = outside the dilated warp)."""
    k = lambda s: np.ones((s, s), np.uint8)
    cv2.setRNGSeed(seed)                       # deterministic refinement
    bw = bw_flow(img_prev, img_cur)            # cur -> prev, pulls the mask
    h, w = img_cur.shape[:2]
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    warped = cv2.remap(prev_mask.astype(np.float32),
                       xx + bw[:, :, 0], yy + bw[:, :, 1],
                       cv2.INTER_LINEAR) > 0.5
    warped = warped.astype(np.uint8)
    tri = np.full((h, w), cv2.GC_PR_BGD, np.uint8)
    tri[cv2.dilate(warped, k(31)) > 0] = cv2.GC_PR_FGD
    tri[cv2.erode(warped, k(15)) > 0] = cv2.GC_FGD
    tri[cv2.dilate(warped, k(61)) == 0] = cv2.GC_BGD
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    try:
        cv2.grabCut(img_cur, tri, None, bgd, fgd, 3, cv2.GC_INIT_WITH_MASK)
        cur = ((tri == cv2.GC_FGD) | (tri == cv2.GC_PR_FGD)).astype(np.uint8)
    except cv2.error:                          # degenerate trimap: keep warp
        cur = warped
    if cur.sum() < 0.2 * max(prev_mask.sum(), 1):
        cur = warped                            # refinement collapsed
    return _largest_component(cur)


def propagate_masks(imgs: list, init_rect=None, flow="dis") -> list:
    """Flow-propagated video object segmentation (weights-free PointRend
    substitute): GrabCut-segment frame 0, then for each frame warp the
    previous mask along optical flow (`flow`: 'dis' or 'flownet') and
    refine with a mask-initialized GrabCut trimap."""
    bw_flow = (_flownet_bw_flow_factory() if flow == "flownet"
               else _dis_bw_flow)
    masks = [grabcut_mask(imgs[0], init_rect)]
    for t in range(1, len(imgs)):
        masks.append(_prop_step(masks[-1], imgs[t - 1], imgs[t], bw_flow, t))
    return masks


def propagate_masks_bidir(imgs: list, init_rect=None, flow="dis") -> list:
    """Bidirectional flow propagation with per-frame GrabCut arbitration.

    The forward chain (anchored at frame 0) accumulates drift toward the end
    of the video; a second chain anchored at the LAST frame drifts the other
    way.  Per frame, pixels where the two chains AGREE become hard GrabCut
    labels (eroded agreement-fg -> sure-fg, agreement-bg outside the dilated
    union -> sure-bg) and the disagreement band is left probable, so the
    image's own color model arbitrates exactly where the chains diverge.
    Scored per frame: where chains already agree (IoU > 0.95) the consensus
    is kept without re-segmentation.  (VERDICT r4 task 1a; the reference's
    PointRend per-frame segmenter, ref:preprocess/mask.py:63-67, needs no
    such machinery but needs downloaded weights.)

    MEASURED NEGATIVE RESULT (pika, results history): replacing
    low-agreement frames with a short re-propagation from the nearest
    HIGH-agreement frame ("re-anchoring") degrades the output — mid-video
    frames whose chains disagree but whose color-model arbitration scores
    0.99 IoU dropped to ~0.92 (each warp+GrabCut hop loses a few percent),
    and the weak first frames stayed ~0.85 (their error is a property of
    the pixels — thin structures at the video's start — not of chain
    drift).  Arbitration already extracts what the chains know; the pass
    was removed."""
    k = lambda s: np.ones((s, s), np.uint8)
    fw = propagate_masks(imgs, init_rect, flow)
    bw = propagate_masks(imgs[::-1], init_rect, flow)[::-1]
    out = []
    for t, img in enumerate(imgs):
        cv2.setRNGSeed(1000 + t)               # deterministic arbitration
        a, b = fw[t] > 0, bw[t] > 0
        inter = (a & b).astype(np.uint8)
        union = (a | b).astype(np.uint8)
        iou = inter.sum() / max(union.sum(), 1)
        if iou > 0.95:
            out.append(_largest_component(union))
            continue
        h, w = img.shape[:2]
        tri = np.full((h, w), cv2.GC_PR_BGD, np.uint8)
        tri[cv2.dilate(union, k(31)) > 0] = cv2.GC_PR_BGD
        tri[union > 0] = cv2.GC_PR_FGD
        tri[cv2.erode(inter, k(7)) > 0] = cv2.GC_FGD
        tri[cv2.dilate(union, k(61)) == 0] = cv2.GC_BGD
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        try:
            cv2.grabCut(img, tri, None, bgd, fgd, 3, cv2.GC_INIT_WITH_MASK)
            cur = ((tri == cv2.GC_FGD)
                   | (tri == cv2.GC_PR_FGD)).astype(np.uint8)
        except cv2.error:
            cur = union
        if cur.sum() < 0.2 * max(inter.sum(), 1):
            cur = union                         # refinement collapsed
        out.append(_largest_component(cur))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seqname")
    ap.add_argument("--masksrc", default="propagate",
                    help="'propagate', 'propagate-bidir', 'grabcut' or "
                         "'dir=<path-to-mask-pngs>'")
    ap.add_argument("--init_rect", default=None,
                    help="x,y,w,h GrabCut seed rectangle on frame 0 "
                         "(propagate mode)")
    ap.add_argument("--flow", default="dis", choices=("dis", "flownet"),
                    help="flow used for the propagation warp; 'flownet' "
                    "uses the in-repo learned net (needs "
                    "database/misc/flownet.npz)")
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

    paths = sorted(glob.glob(f"{datadir}/*"))
    prop_masks = None
    if args.masksrc in ("propagate", "propagate-bidir"):
        rect = (tuple(int(v) for v in args.init_rect.split(","))
                if args.init_rect else None)
        fn = (propagate_masks_bidir if args.masksrc == "propagate-bidir"
              else propagate_masks)
        prop_masks = fn([cv2.imread(p) for p in paths], rect, flow=args.flow)

    counter = 0
    for fi, path in enumerate(paths):
        img = cv2.imread(path)
        if mask_dir is not None:
            mpath = os.path.join(
                mask_dir, os.path.basename(path).rsplit(".", 1)[0] + ".png")
            mask = (cv2.imread(mpath, 0) > 0).astype(np.uint8)
        elif prop_masks is not None:
            mask = prop_masks[fi]
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
