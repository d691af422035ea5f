"""Shape-accuracy evaluation: chamfer + normal consistency vs GT meshes.

Behavioral port of ref:scripts/eval_mesh.py: loads pred%d.ply (camera frame)
and GT Meshes/%05d.obj, applies the cam rotation + axis flips, normalizes
both to extent 10, ICP-aligns 10k surface samples, reports mean chamfer and
normal consistency.

Usage: python scripts/eval_mesh.py --testdir log/spot3-1 --gtdir \
    database/DAVIS/Meshes/Full-Resolution/syn-spot3f
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lasr_tpu.utils import mesheval
from lasr_tpu.utils.obj import load_obj
from lasr_tpu.utils.ply import read_ply


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--testdir", required=True)
    ap.add_argument("--gtdir", required=True)
    ap.add_argument("--n_samples", type=int, default=10000)
    ap.add_argument("--flip_gt_yz", type=int, default=1,
                    help="syn-* sequences store GT with flipped y/z")
    ap.add_argument("--remesh", type=int, default=1,
                    help="watertight-remesh predictions before sampling "
                         "(ref:scripts/eval_mesh.py:102-105 runs Manifold)")
    args = ap.parse_args()

    preds = sorted(glob.glob(os.path.join(args.testdir, "pred*.ply")),
                   key=lambda p: int(re.findall(r"pred(\d+)\.ply", p)[0]))
    cds, ncs = [], []
    for p in preds:
        i = int(re.findall(r"pred(\d+)\.ply", p)[0])
        gt_path = os.path.join(args.gtdir, f"{i:05d}.obj")
        if not os.path.exists(gt_path):
            continue
        pv, pf, _ = read_ply(p)
        gv, gf, _, _, _ = load_obj(gt_path)
        if args.remesh:
            # watertight remesh only — no simplification (the reference runs
            # `manifold` but not `simplify` here)
            from lasr_tpu.utils.remesh import remesh
            pv, pf = remesh(np.asarray(pv, np.float32),
                            np.asarray(pf), target_faces=1 << 20)
            pv, pf = np.asarray(pv), np.asarray(pf)

        campath = os.path.join(args.testdir, f"cam{i}.txt")
        if os.path.exists(campath):
            cam = np.loadtxt(campath)
            pv = pv @ cam[:3, :3]
        pv[:, 1:] *= -1
        if args.flip_gt_yz:
            gv[:, 1:] *= -1

        # normalize to extent 10 (pred extent measured on surface samples)
        psamp = mesheval.sample_points(pv, pf, args.n_samples)
        pv = mesheval.normalize_extent(pv, psamp)
        gv = mesheval.normalize_extent(gv)

        X, nX = mesheval.sample_points(pv, pf, args.n_samples,
                                       return_normals=True)
        Y, nY = mesheval.sample_points(gv, gf, args.n_samples, seed=1,
                                       return_normals=True)
        R, t, s = mesheval.icp_align(X, Y)
        Xa = s * X @ R + t
        nXa = nX @ R
        cd, nc = mesheval.chamfer_normal(Xa, nXa, Y, nY)
        cds.append(cd)
        ncs.append(1 - nc)
        print(f"frame {i}: chamfer {cd:.4f}  normal-consistency {1 - nc:.4f}")

    if cds:
        result = {"mean_chamfer": float(np.mean(cds)),
                  "mean_normal_consistency": float(np.mean(ncs)),
                  "frames": len(cds)}
        print(json.dumps(result))
        with open(os.path.join(args.testdir, "eval_mesh.json"), "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
