"""Diagnose pika: flow-chain camera quality vs the (regenerable) GT script.

The pika benchmark is built by exp/make_pika.sh from scripts/render_syn.py
--model dog --nframes 31 with a fixed seed, so the GT per-frame rotations
are reproducible here without touching the rendered data: rotx = rand()
draws from RandomState(0), roty = 3*1.57 + 6.28*i/n (render_syn.py:150-152).

Prints adjacent-frame relative-rotation error of the stored/recomputed
flow chain, compared against what the same metric was for syn-dog-15.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import cv2


def gt_rots(n):
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


def main():
    from lasr_tpu.preprocess.caminit import chain_for_sequence

    gt = gt_rots(31)
    for seq in ["pika", "rpika"]:
        try:
            chain = chain_for_sequence("database/DAVIS", seq)
        except Exception as e:
            print(f"{seq}: chain failed: {e}")
            continue
        n = len(chain)
        # rpika frames are a filtered subset; adjacent comparison only
        # valid for the unsubsampled sequence
        if seq == "pika" and n == 31:
            errs = [geo_deg(chain[i + 1] @ chain[i].T,
                            gt[i + 1] @ gt[i].T) for i in range(n - 1)]
            gt_step = [geo_deg(gt[i + 1] @ gt[i].T, np.eye(3))
                       for i in range(n - 1)]
            print(f"{seq}: {n} frames; adjacent rel-rot err "
                  f"mean {np.mean(errs):.1f} deg (GT step mean "
                  f"{np.mean(gt_step):.1f} deg)")
            print("  per-pair err:", np.round(errs, 1).tolist())
        else:
            print(f"{seq}: {n} frames (subset; skipping adjacent metric)")


if __name__ == "__main__":
    main()
