"""A/B the camera-chain estimators: adjacent-only vs rotation-averaged.

Scores mean adjacent relative-rotation error vs the reproducible GT
camera script on the full pika sequence, for chain_rotations (what
--cam_init flow_chain uses today) and chain_rotations_averaged
(redundant skip-pair estimates via flow composition + averaging sweeps).
Writes results/caminit_avg_ab.json.  CPU-only.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import cv2
import numpy as np

from lasr_tpu.data.pfm import read_pfm
from lasr_tpu.preprocess import caminit


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
    flows = []
    for i in range(len(mask_paths) - 1):
        flo, _ = read_pfm(f"{root}/FlowFW/Full-Resolution/{seq}/"
                          f"flo-{i:05d}.pfm")
        flows.append(np.ascontiguousarray(flo[..., :2]).astype(np.float32))
    return masks.astype(np.float32), np.stack(flows)


def adj_err(chain, gt):
    return [geo_deg(chain[i + 1] @ chain[i].T, gt[i + 1] @ gt[i].T)
            for i in range(len(chain) - 1)]


def main():
    seq = sys.argv[1] if len(sys.argv) > 1 else "pika"
    masks, flows = load_seq(seq)
    n = len(masks)
    gt = gt_rots(n)

    out = {"seq": seq, "n_frames": n}
    chain = caminit.chain_rotations(masks, flows)
    e0 = adj_err(chain, gt)
    out["adjacent_only"] = {"mean_deg": float(np.mean(e0)),
                            "max_deg": float(np.max(e0))}
    print(f"adjacent-only : mean {np.mean(e0):.2f} deg, max "
          f"{np.max(e0):.1f}", flush=True)

    for skips in [(1, 2), (1, 2, 3), (1, 2, 3, 4)]:
        avg = caminit.chain_rotations_averaged(masks, flows, skips=skips)
        e1 = adj_err(avg, gt)
        key = "averaged_skips_" + "".join(map(str, skips))
        out[key] = {"mean_deg": float(np.mean(e1)),
                    "max_deg": float(np.max(e1))}
        print(f"averaged {skips}: mean {np.mean(e1):.2f} deg, max "
              f"{np.max(e1):.1f}", flush=True)

    os.makedirs("results", exist_ok=True)
    json.dump(out, open(f"results/caminit_avg_ab.json", "w"), indent=1)


if __name__ == "__main__":
    main()
