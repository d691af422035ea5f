"""Energy parity check at ground truth: inject the fixture's GT mesh and GT
cameras into the LASR energy and report per-term losses.

If the conventions (flow re-warp, projection, y-flip, fw/bw pairing) are
right, mask and flow losses must be near zero at GT.  A large flow floor at
GT means the energy itself cannot reward the true cameras — which would
explain oracle-B's drift (GT-warm-started cameras walking away with the
loss DECREASING).

Also evaluates the same GT mesh with cameras slerped toward identity
(inter-frame rotation shrunk) to measure how sharply the flow term actually
penalizes wrong cameras.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from lasr_tpu.config import LasrConfig
from lasr_tpu.data.video import VideoDataset
from lasr_tpu.models.lasr import LasrModel
from lasr_tpu.ops import quat as quat_ops
from lasr_tpu.utils import obj as obj_io

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--seq", default="syn-spot3f", help="DAVIS sequence dir name")
_ap.add_argument("--dataname", default="spot3", help="configs/<name>.config")
_args = _ap.parse_args()

DAVIS = "database/DAVIS"
SEQ = _args.seq

# ---- GT object-frame mesh from frame-0 camera-space mesh ----
verts_cam, faces = obj_io.load_obj(f"{DAVIS}/Meshes/Full-Resolution/{SEQ}/00000.obj")[:2]
cam0 = np.loadtxt(f"{DAVIS}/Camera/Full-Resolution/{SEQ}/00000.txt")
q0 = cam0[3:7]  # wxyz
R0 = np.asarray(quat_ops.quat_to_rotmat_wxyz(jnp.asarray(q0[None])))[0]
T0 = np.array([cam0[1], cam0[2], cam0[7]])
overts = (verts_cam - T0) @ R0          # R^T (v - T), column convention

cfg = LasrConfig(dataname=_args.dataname, n_bones=1, n_hypo=1, symmetric=False,
                 symmetric_loss=False, only_mean_sym=False, use_gtpose=True,
                 batch_size=1, num_epochs=5, checkpoint_dir="", opt_tex=True)
ds = VideoDataset(cfg, "configs")
arrs = ds.device_arrays()
NP = arrs["imgs"].shape[0]
print(f"{NP} pairs")

model = LasrModel(cfg, mean_shape=overts, faces=np.asarray(faces, np.int32),
                  n_frames=16)
params = jax.tree.map(jnp.asarray, model.init_params)

rng = jax.random.PRNGKey(0)


def batch_for(p, cams_override=None):
    b = {}
    for k, v in arrs.items():
        x = v[p:p + 1]
        if k == "oriimg_shape":
            b[k] = jnp.asarray(np.concatenate([x[:, 0], x[:, 0]], 0))
            continue
        b[k] = jnp.asarray(np.concatenate([x[:, 0], x[:, 1]], 0))
    if cams_override is not None:
        b["cams"] = cams_override
    return b


loss_j = jax.jit(lambda pr, bt: model.loss_fn(pr, bt, rng, jnp.asarray(5.0),
                                              jnp.asarray(200.0)))

print("== GT mesh + GT cameras ==")
for p in range(NP):
    bt = batch_for(p)
    tot, aux = loss_j(params, bt)
    print(f" pair {p} (f{int(ds.meta['id0'][p])}->f{int(ds.meta['id1'][p])}): "
          f"total {float(tot):.4f} mask {float(aux['mask_loss']):.5f} "
          f"flow {float(aux['flow_rd_loss']):.5f} tex {float(aux['texture_loss']):.4f}")

# ---- shrink inter-frame rotation: slerp frame-1 rotation toward frame-0 ----
print("== GT mesh, frame-1 camera slerped toward frame-0 (fraction of true relrot kept) ==")
for keep in (1.0, 0.75, 0.5, 0.25):
    tots, flows, masks_ = [], [], []
    for p in range(NP):
        c = np.stack([arrs["cams"][p, 0], arrs["cams"][p, 1]])
        q = c[:, 3:7]  # wxyz
        # slerp q1 toward q0 by (1-keep)
        d = float(np.clip(np.abs(q[0] @ q[1]), -1, 1))
        th = np.arccos(d)
        if th > 1e-6:
            s = np.sign(q[0] @ q[1])
            t = keep
            q1 = (np.sin((1 - t) * th) * q[0] + np.sin(t * th) * s * q[1]) / np.sin(th)
        else:
            q1 = q[1]
        c[1, 3:7] = q1 / np.linalg.norm(q1)
        bt = batch_for(p, cams_override=jnp.asarray(c))
        tot, aux = loss_j(params, bt)
        tots.append(float(tot)); flows.append(float(aux["flow_rd_loss"]))
        masks_.append(float(aux["mask_loss"]))
    print(f" keep={keep:4.2f}: total {np.mean(tots):.4f} "
          f"mask {np.mean(masks_):.5f} flow {np.mean(flows):.5f}")

# ---- visual dump: rendered vs observed mask/flow at GT, pair 0 ----
import cv2
bt = batch_for(0)
tot, aux = loss_j(params, bt)
mp = np.asarray(aux["mask_pred"])[:, 0]          # [2, S, S]
mo = np.asarray(bt["masks"])                     # [2, S, S]
fr = np.asarray(aux["flow_rd"])[:, 0]            # [2, S, S, 2]
fo = np.asarray(bt["flow"])[:, :2].transpose(0, 2, 3, 1)
vm = np.asarray(aux["vis_mask"])[:, 0]
os.makedirs("exp/out", exist_ok=True)
for s in range(2):
    panel = np.concatenate([mp[s], mo[s], np.abs(mp[s] - mo[s])], 1)
    cv2.imwrite(f"exp/out/mask_{s}.png", (255 * np.clip(panel, 0, 1)).astype(np.uint8))
    for c in range(2):
        pf = np.concatenate([fr[s, ..., c] * vm[s], fo[s, ..., c] * vm[s]], 1)
        cv2.imwrite(f"exp/out/flow_{s}{'xy'[c]}.png",
                    (255 * np.clip(0.5 + pf, 0, 1)).astype(np.uint8))
    print(f"frame {s}: rendered mask area {mp[s].sum():.0f} obs {mo[s].sum():.0f}; "
          f"flow_rd range [{fr[s][vm[s]>0].min():.3f},{fr[s][vm[s]>0].max():.3f}] "
          f"obs [{fo[s][vm[s]>0].min():.3f},{fo[s][vm[s]>0].max():.3f}]")
    # centroid of masks
    def cen(m):
        yy, xx = np.mgrid[:m.shape[0], :m.shape[1]]
        return (xx * m).sum() / m.sum(), (yy * m).sum() / m.sum()
    print(f"   centroids: rend {cen(mp[s])}, obs {cen(mo[s])}")
