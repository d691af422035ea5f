"""Diagnose camera-hypothesis dynamics on a synthetic sequence with GT cams.

For each checkpoint in a stage-0 run dir, predicts per-frame cameras and
reports, per hypothesis:
  * relative-rotation geodesic error vs GT (absolute rotations are gauge —
    the canonical object frame is arbitrary, so compare R_i R_j^T);
  * the checkpoint's accumulated hypothesis scores (lower = better).

Usage: python scripts/diag_hypo.py --logdir log/spot3-0 --dataname spot3
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="log/spot3-0")
    ap.add_argument("--dataname", default="spot3")
    ap.add_argument("--n_bones", type=int, default=21)
    ap.add_argument("--n_hypo", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lasr_tpu.config import LasrConfig
    from lasr_tpu.data.video import VideoDataset
    from lasr_tpu.models.encoder import create_nets
    from lasr_tpu.ops import quat as quat_ops
    from lasr_tpu.training import checkpoint as ckpt

    cfg = LasrConfig(dataname=args.dataname, n_bones=args.n_bones,
                     n_hypo=args.n_hypo, symmetric=True,
                     symmetric_texture=True, only_mean_sym=True,
                     batch_size=1, num_epochs=5, checkpoint_dir="")
    # heads only — mesh topology is irrelevant for camera diagnostics.
    # The root-quat rest bias must match the run's parametrization: runs
    # trained with a camera chain (meta __cam_chain) use bias 8.
    _probe = sorted(glob.glob(os.path.join(args.logdir, "pred_net_*.npz")))
    _has_chain = False
    if _probe:
        import numpy as _np
        with _np.load(_probe[0]) as _d:
            _has_chain = "__cam_chain" in _d.files
    (encoder, code_predictor), _ = create_nets(
        0, cfg.img_size, cfg.nz_feat, cfg.n_bones, cfg.n_hypo,
        root_quat_bias=8.0 if _has_chain else 0.0)
    ds = VideoDataset(cfg, "configs")
    arrs = ds.device_arrays()
    # unique frames only (the pair list duplicates first/last and has fw+bw)
    imgs = arrs["input_imgs"]            # [NP, 2, 3, S, S]
    ids = np.stack([ds.meta["id0"], ds.meta["id1"]], 1)       # [NP, 2]
    seen, fidx = {}, []
    for p in range(ids.shape[0]):
        for s in range(2):
            fid = int(ids[p, s])
            if fid not in seen:
                seen[fid] = (p, s)
    order = sorted(seen)
    frames = np.stack([imgs[seen[f][0], seen[f][1]] for f in order])
    cams = np.stack([arrs["cams"][seen[f][0], seen[f][1]] for f in order])
    nf = len(order)
    print(f"{nf} unique frames: {order}")

    gtq_xyzw = np.concatenate([cams[:, 4:7], cams[:, 3:4]], -1)
    gtM = np.asarray(quat_ops.quat_to_rotmat_xyzw(
        quat_ops.normalize(gtq_xyzw)))                         # [nf, 3, 3]

    paths = sorted(glob.glob(os.path.join(args.logdir, "pred_net_*.npz")),
                   key=lambda p: (len(p), p))

    @jax.jit
    def predict(p, x, fid):
        feat = encoder.apply(p["encoder"], x.transpose(0, 2, 3, 1))
        if "frame_code" in p:
            feat = feat + p["frame_code"][fid]
        return code_predictor.apply(p["code_predictor"], feat)
    H = cfg.n_hypo
    pairs = [(i, j) for i in range(nf) for j in range(i + 1, nf)]

    for path in paths:
        label = re.search(r"pred_net_(.+)\.npz", path).group(1)
        flat, meta = ckpt.load_raw(path)
        params = ckpt._unflatten(flat)
        codes = predict(params, frames, np.asarray(order, np.int32))
        M = np.asarray(codes["rotmat"])[:, :, 0]               # [nf, H, 3, 3]
        if "__cam_chain" in meta:
            # compose the flow-chain pre-rotation the run trained with
            chain = np.asarray(meta["__cam_chain"])[order]     # [nf, 3, 3]
            M = M @ chain[:, None]
        scores = np.asarray(meta["__epoch_nscore"])

        def ang(R):
            return np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))

        errs, mags = np.zeros(H), np.zeros(H)
        for h in range(H):
            e, m = [], []
            for i, j in pairs:
                rel_p = M[i, h] @ M[j, h].T
                rel_g = gtM[i] @ gtM[j].T
                e.append(ang(rel_p @ rel_g.T))
                m.append(ang(rel_p))
            errs[h], mags[h] = np.mean(e), np.mean(m)
        best = int(np.argmax(-scores)) if scores.any() else -1
        print(f"[{label}] nscore={np.array2string(scores, precision=3)} "
              f"sel={best}")
        print(f"        relrot err (deg): {np.array2string(errs, precision=1)}"
              f"   pred relrot magnitude: {np.array2string(mags, precision=1)}")
        # GT relative angles for scale
        if label == "0":
            g = [ang(gtM[i] @ gtM[j].T) for i, j in pairs]
            print(f"        GT relative angles: "
                  f"{np.array2string(np.asarray(g), precision=1)}")


if __name__ == "__main__":
    main()
