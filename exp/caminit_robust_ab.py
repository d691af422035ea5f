"""A/B robust camera-chain estimators: plain vs occ-weighted vs IRLS.

Round-4 verdict: the pika chain's 30-deg outlier frames are what break
PCK, and rotation AVERAGING measured as a dead end (correlated sphere-proxy
errors, results/caminit_avg_ab.json).  This attacks the per-PAIR fit
instead: downweight unreliable correspondences (graded occ score) and
reject residual outliers (Tukey IRLS) before they enter the Procrustes.

Scores mean/max adjacent relative-rotation error vs the reproducible GT
camera script.  Writes results/caminit_robust_ab.json.  CPU-only.

Usage: python exp/caminit_robust_ab.py [seq]   # default rpika
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from lasr_tpu.data.pfm import read_pfm  # noqa: E402
from lasr_tpu.preprocess import caminit  # noqa: E402


def gt_rots(n):
    # render_syn.py camera script (exp/make_pika.sh provenance): rotx from
    # RandomState(0) per frame, roty orbit
    rng = np.random.RandomState(0)
    Rs = []
    for i in range(n):
        rotx = 0.0 if i == 0 else float(rng.rand())
        roty = 3 * 1.57 + 6.28 * i / n
        R, _ = cv2.Rodrigues(np.array([rotx, roty, 0.0]))
        Rs.append(R)
    return np.stack(Rs)


def geo_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def load_seq(seq):
    root = "database/DAVIS"
    mask_paths = sorted(glob.glob(
        f"{root}/Annotations/Full-Resolution/{seq}/*.png"))
    masks = np.stack([cv2.imread(p, 0) for p in mask_paths]) > 0
    flows, occs = [], []
    for i in range(len(mask_paths) - 1):
        flo, _ = read_pfm(f"{root}/FlowFW/Full-Resolution/{seq}/"
                          f"flo-{i:05d}.pfm")
        flows.append(np.ascontiguousarray(flo[..., :2]).astype(np.float32))
        op = f"{root}/FlowFW/Full-Resolution/{seq}/occ-{i:05d}.pfm"
        occ, _ = read_pfm(op)
        occs.append(np.ascontiguousarray(
            occ if occ.ndim == 2 else occ[..., 0]).astype(np.float32))
    return (masks.astype(np.float32), np.stack(flows), np.stack(occs))


def adj_err(chain, gt):
    return [geo_deg(chain[i + 1] @ chain[i].T, gt[i + 1] @ gt[i].T)
            for i in range(len(chain) - 1)]


def main():
    seq = sys.argv[1] if len(sys.argv) > 1 else "rpika"
    masks, flows, occs = load_seq(seq)
    n = masks.shape[0]
    gt = gt_rots(n)
    out = {"seq": seq, "n_frames": n}
    variants = {
        "plain": dict(),
        "occ": dict(occs_fw=occs),
        "irls2": dict(irls=2),
        "irls5": dict(irls=5),
        "occ_irls2": dict(occs_fw=occs, irls=2),
        "occ_irls5": dict(occs_fw=occs, irls=5),
    }
    for name, kw in variants.items():
        chain = caminit.chain_rotations(masks, flows, **kw)
        errs = adj_err(chain, gt)
        out[name] = {"mean_deg": float(np.mean(errs)),
                     "max_deg": float(np.max(errs)),
                     "per_pair_deg": [round(float(e), 2) for e in errs]}
        print(f"{name}: mean {out[name]['mean_deg']:.2f} deg, "
              f"max {out[name]['max_deg']:.2f} deg", flush=True)
    os.makedirs("results", exist_ok=True)
    json.dump(out, open(f"results/caminit_robust_ab.json", "w"), indent=1)


if __name__ == "__main__":
    main()
