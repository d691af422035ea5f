"""Optical-flow preprocessing: consecutive-frame flow + occlusion maps with
median-flow frame skipping.

Behavioral port of ref:preprocess/auto_gen.py: walks a raw sequence, computes
forward flow between candidate frame pairs, skips frames whose median
object-region flow (normalized by the silhouette extent) is below
--flow_threshold, and writes the filtered r<seq> dataset: renumbered
JPEGImages/Annotations plus FlowFW/FlowBW flo-/occ- PFMs.

Flow backends: `--backend vcn --loadmodel lasr_vcn/vcn_rob.pth` runs the
reference's pretrained VCN-robust network (ref:third_party/ext_nnutils/
VCNplus.py) through the JAX/TPU port in lasr_tpu.models.vcn; since those
weights are not distributable with this repo, the default backend is OpenCV
DIS optical flow with forward-backward-consistency occlusion scores.

Usage:
  python preprocess/auto_gen.py --seqname camel --datapath \
      database/DAVIS/JPEGImages/Full-Resolution/camel --flow_threshold 0.05
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

from lasr_tpu.data.pfm import write_pfm


def dis_flow_backend(img0: np.ndarray, img1: np.ndarray):
    """(flow [H, W, 3], occ [H, W]) via DIS flow + fw/bw consistency.

    occ follows the VCN convention consumed by the dataloader
    (ref:dataloader/vidbase.py:151): occ < 10 marks valid pixels and
    sigmoid(-occ) weights the flow loss, so consistent pixels get a large
    negative score and occluded ones a large positive score.
    """
    g0 = cv2.cvtColor(img0, cv2.COLOR_RGB2GRAY)
    g1 = cv2.cvtColor(img1, cv2.COLOR_RGB2GRAY)
    dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
    fw = dis.calc(g0, g1, None)
    bw = dis.calc(g1, g0, None)

    H, W = g0.shape
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    bx = cv2.remap(bw[:, :, 0], (xx + fw[:, :, 0]).astype(np.float32),
                   (yy + fw[:, :, 1]).astype(np.float32), cv2.INTER_LINEAR)
    by = cv2.remap(bw[:, :, 1], (xx + fw[:, :, 0]).astype(np.float32),
                   (yy + fw[:, :, 1]).astype(np.float32), cv2.INTER_LINEAR)
    err = np.sqrt((fw[:, :, 0] + bx) ** 2 + (fw[:, :, 1] + by) ** 2)
    occ = np.clip(err - 1.0, -10.0, 100.0)   # consistent -> ~-10, occluded -> >0
    flow = np.concatenate([fw, np.ones((H, W, 1), np.float32)], -1)
    return flow.astype(np.float32), occ.astype(np.float32)


def vcn_flow_backend(loadmodel: str, testres: float = 1.0):
    """TPU-resident VCN-robust flow (the reference's backend,
    ref:preprocess/auto_gen.py:59-66): loads the published vcn_rob.pth
    through the torch->JAX converter and runs lasr_tpu.models.vcn."""
    from lasr_tpu.models.vcn import load_vcn, flow_inference
    params, mean_L, mean_R = load_vcn(loadmodel)

    def backend(img0, img1):
        return flow_inference(params, img0, img1, mean_L, mean_R,
                              testres=testres)
    return backend


def flownet_backend(weights: str = "database/misc/flownet.npz"):
    """In-framework flow CNN trained on generated synthetic pairs
    (models/flownet.py, scripts/train_flow.py) — the weights-free
    equivalent of the reference's pretrained VCN."""
    from lasr_tpu.models.flownet import make_backend
    return make_backend(weights)


BACKENDS = ("dis", "vcn", "flownet")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqname", required=True)
    ap.add_argument("--datapath", default=None,
                    help="raw frames (default: DAVIS layout of seqname)")
    ap.add_argument("--silpath", default=None)
    ap.add_argument("--outroot", default="database/DAVIS")
    ap.add_argument("--flow_threshold", type=float, default=0.05)
    ap.add_argument("--backend", default="dis", choices=list(BACKENDS))
    ap.add_argument("--loadmodel", default=None,
                    help="vcn_rob.pth checkpoint for --backend vcn")
    ap.add_argument("--testres", type=float, default=1.0)
    ap.add_argument("--out", default=None,
                    help="output sequence name (default r<seqname>; the "
                    "reference's second auto_gen.sh pass writes the "
                    "unfiltered flow back to <seqname> itself)")
    ap.add_argument("--force", action="store_true",
                    help="allow overwriting a synthetic fixture's GT flow")
    args = ap.parse_args()

    datapath = args.datapath or \
        f"{args.outroot}/JPEGImages/Full-Resolution/{args.seqname}"
    silpath = args.silpath or \
        f"{args.outroot}/Annotations/Full-Resolution/{args.seqname}"
    imgs = sorted(glob.glob(os.path.join(datapath, "*.jpg")))
    if len(imgs) < 2:
        ap.error(f"need >= 2 frames, found {len(imgs)} in {datapath} "
                 "(pass --datapath explicitly when --outroot is not the "
                 "input root)")
    sils = [os.path.join(silpath, os.path.basename(i).replace(".jpg", ".png"))
            for i in imgs]
    if args.backend == "vcn":
        if args.loadmodel is None:
            ap.error("--backend vcn requires --loadmodel vcn_rob.pth")
        backend = vcn_flow_backend(args.loadmodel, args.testres)
    elif args.backend == "flownet":
        backend = flownet_backend(
            args.loadmodel or "database/misc/flownet.npz")
    else:
        backend = dis_flow_backend

    out = args.out or f"r{args.seqname}"
    # Synthetic fixtures (render_syn output) carry *exact* GT flow from
    # vertex correspondence; estimated flow must never silently replace it
    # (this once clobbered syn-spot3f's GT flow and broke convergence).
    gt_meshes = f"{args.outroot}/Meshes/Full-Resolution/{out}"
    if os.path.isdir(gt_meshes) and not args.force:
        ap.error(f"{out} has GT meshes ({gt_meshes}) — it is a synthetic "
                 "fixture whose FlowFW/FlowBW are exact GT from render_syn. "
                 "Refusing to overwrite with estimated flow; pass --force "
                 "to do it anyway.")
    dirs = {k: f"{args.outroot}/{k}/Full-Resolution/{out}"
            for k in ("JPEGImages", "Annotations", "FlowFW", "FlowBW")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    # second auto_gen.sh pass (out == input seq): write flow only, don't
    # recompress the input frames in place
    write_frames = os.path.abspath(dirs["JPEGImages"]) != \
        os.path.abspath(datapath)
    # A re-run with a different backend/threshold can keep FEWER frames
    # than a previous filtering; stale leftovers past the new count make
    # the dataset inconsistent (a 26th frame with no flo-00024.pfm crashed
    # the camera chain).  Clear regenerated dirs up front — but never an
    # output dir that aliases an INPUT dir (with --out <seq> and an external
    # --datapath, dirs['Annotations'] can equal the default silpath; clearing
    # it would delete the masks before the loop reads them).
    input_dirs = {os.path.abspath(datapath), os.path.abspath(silpath)}
    for key, d in dirs.items():
        if os.path.abspath(d) in input_dirs:
            continue
        for f in glob.glob(os.path.join(d, "*")):
            if os.path.isfile(f):
                os.remove(f)

    inx, jnx, ix = 0, 1, 0
    while jnx < len(imgs):
        img0 = cv2.imread(imgs[inx])[:, :, ::-1]
        img1 = cv2.imread(imgs[jnx])[:, :, ::-1]
        mask0 = cv2.imread(sils[inx], 0) > 0
        mask1 = cv2.imread(sils[jnx], 0) > 0

        ys, xs = np.where(mask0)
        length = [max((xs.max() - xs.min()) // 2, 1),
                  max((ys.max() - ys.min()) // 2, 1)]
        flow_fw, occ_fw = backend(img0, img1)
        normed = np.stack([flow_fw[:, :, 0] / length[0],
                           flow_fw[:, :, 1] / length[1]], -1)
        medflow = np.median(np.linalg.norm(normed[mask0], axis=-1))
        print(f"{imgs[inx]} -> {imgs[jnx]}: median flow {medflow:.3f}")

        if medflow > args.flow_threshold:
            flow_bw, occ_bw = backend(img1, img0)
            write_pfm(f"{dirs['FlowFW']}/flo-{ix:05d}.pfm", flow_fw)
            write_pfm(f"{dirs['FlowFW']}/occ-{ix:05d}.pfm", occ_fw)
            write_pfm(f"{dirs['FlowBW']}/flo-{ix + 1:05d}.pfm", flow_bw)
            write_pfm(f"{dirs['FlowBW']}/occ-{ix + 1:05d}.pfm", occ_bw)
            if write_frames:
                cv2.imwrite(f"{dirs['JPEGImages']}/{ix:05d}.jpg",
                            img0[:, :, ::-1])
                cv2.imwrite(f"{dirs['JPEGImages']}/{ix + 1:05d}.jpg",
                            img1[:, :, ::-1])
                cv2.imwrite(f"{dirs['Annotations']}/{ix:05d}.png",
                            mask0.astype(np.uint8) * 128)
                cv2.imwrite(f"{dirs['Annotations']}/{ix + 1:05d}.png",
                            mask1.astype(np.uint8) * 128)
            inx = jnx
            ix += 1
        jnx += 1
    print(f"wrote filtered sequence to {dirs['JPEGImages']} ({ix + 1} frames)")


if __name__ == "__main__":
    main()
