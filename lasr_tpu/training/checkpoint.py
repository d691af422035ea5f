"""Checkpoint save/load + stage-transition surgery.

The save format is a flat .npz of the parameter pytree plus derived
artifacts, mirroring what the reference persists
(ref:nnutils/train_utils.py:363-378): faces, the best hypothesis's
symmetrized full shape/texture, and the hypothesis scores.

`load_with_surgery` is the stage-transition mechanism
(ref:nnutils/train_utils.py:381-487):
  1. hypothesis pruning — slice the winning hypothesis out of mean_v/tex/bone
     params and the per-hypothesis quat/scale head banks;
  2. symmetric -> asymmetric handoff — swap half-mesh params for the saved
     full shape/texture;
  3. remeshing — when the target face count differs, re-topologize via the
     native remesher (texture resets to grey, as in the reference);
  4. rigid -> deformable expansion — keep only the body row of the
     quat/trans/depth heads, freshly initialize bone rows, k-means the mean
     shape into bone centers.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from ..config import LasrConfig
from ..utils.kmeans import kmeans


def _flatten(params) -> dict:
    # per-leaf np.asarray: ~8s for a 57MB tree on the tunneled TPU.  Do NOT
    # use jax.device_get(tree) here — its batched transfer path is
    # pathologically slow on the axon backend (measured 305s for the same
    # tree).
    return {"/".join(k): np.asarray(v) for k, v in
            traverse_util.flatten_dict(params).items()}


def _unflatten(flat: dict):
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): np.asarray(v) for k, v in flat.items()})


def save_checkpoint(path: str, params, model, epoch_nscore,
                    epochs_done: int = 0, opt_leaves=None) -> None:
    flat = _flatten(params)
    if opt_leaves is not None:
        # optimizer (Adam) moments + schedule counts, stored by leaf index
        # (the optax state is not a plain dict); restored on same-stage
        # resume so a supervisor restart continues with true moments
        for i, leaf in enumerate(opt_leaves):
            flat[f"__opt_leaf_{i:03d}"] = np.asarray(leaf)
    optim = int(np.argmax(-np.asarray(epoch_nscore)))
    flat["__epochs_done"] = np.asarray(epochs_done)
    # derived artifacts computed host-side (one bulk device read via
    # _flatten above; no eager device compute)
    full_shape = model.symmetrize_host(flat["mean_v"])
    flat["__faces"] = model.faces
    flat["__full_shape"] = full_shape[optim]
    # raw (pre-sigmoid) full texture of the winning hypothesis
    flat["__full_tex"] = model.symmetrize_color_host(flat["tex"])[optim]
    flat["__epoch_nscore"] = np.asarray(epoch_nscore)
    flat["__n_hypo"] = np.asarray(model.cfg.n_hypo)
    flat["__n_bones"] = np.asarray(model.cfg.n_bones)
    if getattr(model, "cam_chain", None) is not None:
        # later stages + the predictor must apply the same per-frame camera
        # pre-rotations the run was trained with
        flat["__cam_chain"] = np.asarray(model.cam_chain)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **flat)


def load_raw(path: str):
    data = dict(np.load(path if path.endswith(".npz") else path + ".npz",
                        allow_pickle=False))
    meta = {k: data.pop(k) for k in list(data) if k.startswith("__")}
    return data, meta


def load_with_surgery(path: str, cfg: LasrConfig, remesh_fn=None):
    """Returns (mean_shape [V,3] or None, faces or None, params_patch dict).

    The caller constructs the new-stage LasrModel (possibly with remeshed
    topology) and overlays params_patch onto its init params.
    """
    flat, meta = load_raw(path)
    h_old = int(meta["__n_hypo"])
    k_old = int(meta["__n_bones"])
    faces = meta["__faces"]
    scores = -meta["__epoch_nscore"]

    def head(name, comp):
        return f"code_predictor/params/{name}/{comp}"

    if cfg.n_hypo < h_old:
        optim = int(scores.argmax())
        nz = flat[head("quat", "kernel")].shape[0]
        # flax Dense kernel is [in, out]; per-hypo banks live in the out axis
        qk = flat[head("quat", "kernel")].reshape(nz, h_old, -1)
        qb = flat[head("quat", "bias")].reshape(h_old, -1)
        flat[head("quat", "kernel")] = qk[:, optim].reshape(nz, -1)
        flat[head("quat", "bias")] = qb[optim].reshape(-1)
        sk = flat[head("scale", "kernel")].reshape(nz, h_old, -1)
        sb = flat[head("scale", "bias")].reshape(h_old, -1)
        flat[head("scale", "kernel")] = sk[:, optim].reshape(nz, -1)
        flat[head("scale", "bias")] = sb[optim].reshape(-1)
        flat["mean_v"] = flat["mean_v"][optim: optim + 1]
        flat["tex"] = flat["tex"][optim: optim + 1]
        for k in ("ctl_rs", "rest_ts", "ctl_ts", "log_ctl"):
            if k in flat:
                flat[k] = flat[k][optim: optim + 1]

    # symmetric (half-mesh) checkpoint -> asymmetric stage: use full shape
    mean_shape = flat["mean_v"][0]
    tex = flat["tex"][0]
    if not cfg.symmetric and mean_shape.shape[0] <= faces.max():
        mean_shape = meta["__full_shape"]
        tex = meta["__full_tex"]

    # remesh when the target face count changed (asymmetric stages only)
    if (not cfg.symmetric) and cfg.n_faces != faces.shape[0]:
        if remesh_fn is None:
            from ..utils.remesh import remesh as remesh_fn  # noqa: PLC0415
        mean_shape, faces = remesh_fn(mean_shape, faces, cfg.n_faces)
        tex = np.zeros((mean_shape.shape[0], 3), np.float32)

    patch = {}
    if cfg.symmetric:
        patch["mean_v"] = np.asarray(flat["mean_v"])
        patch["tex"] = np.asarray(flat["tex"])
        mean_shape, faces = None, None   # model rebuilds the symmetric sphere
    else:
        patch["mean_v"] = np.asarray(mean_shape)[None]
        patch["tex"] = np.asarray(tex)[None]

    # network weights
    for key, val in flat.items():
        if key.startswith("encoder/"):
            patch.setdefault("__flat__", {})[key] = val
    if "frame_code" in flat:
        # per-frame camera codes carry across stages (camera continuity)
        patch["frame_code"] = np.asarray(flat["frame_code"])

    depth_bias = flat[head("depth", "bias")]
    if depth_bias.shape[0] == cfg.n_bones:
        # bone count unchanged: carry every head + bone params over
        for key, val in flat.items():
            if key.startswith("code_predictor/"):
                patch.setdefault("__flat__", {})[key] = val
        for k in ("ctl_rs", "rest_ts", "ctl_ts", "log_ctl"):
            if k in flat and cfg.n_bones > 1:
                patch[k] = np.asarray(flat[k])
    else:
        # rigid -> deformable (or bone-count change): keep only the body row
        # of quat/trans/depth; bone rows come from the fresh init
        # (ref:nnutils/train_utils.py:455-470).
        k_olds = depth_bias.shape[0]
        nz = flat[head("quat", "kernel")].shape[0]
        body = {}
        body[head("quat", "kernel")] = (
            flat[head("quat", "kernel")].reshape(nz, k_olds, 4)[:, :1])
        body[head("quat", "bias")] = (
            flat[head("quat", "bias")].reshape(k_olds, 4)[:1])
        body[head("trans", "kernel")] = (
            flat[head("trans", "kernel")].reshape(nz, k_olds, 2)[:, :1])
        body[head("trans", "bias")] = (
            flat[head("trans", "bias")].reshape(k_olds, 2)[:1])
        body[head("depth", "kernel")] = (
            flat[head("depth", "kernel")].reshape(nz, k_olds, 1)[:, :1])
        body[head("depth", "bias")] = flat[head("depth", "bias")][:1]
        patch.setdefault("__flat__", {})["__body_rows__"] = body
        # shared heads carry over
        for name in ("scale", "ppoint"):
            for comp in ("kernel", "bias"):
                patch.setdefault("__flat__", {})[head(name, comp)] = \
                    flat[head(name, comp)]
        if cfg.n_bones > 1:
            # k-means bone centers from the loaded mean shape (seed 18,
            # ref:nnutils/train_utils.py:473-484)
            shape_for_km = mean_shape if mean_shape is not None \
                else flat["mean_v"][0]
            if cfg.n_bones > 2:
                centers = kmeans(np.asarray(shape_for_km), cfg.n_bones - 1)
            else:
                centers = np.asarray(shape_for_km).mean(0, keepdims=True)
            patch["rest_ts"] = np.tile(np.asarray(centers)[None],
                                        (cfg.n_hypo, 1, 1))
            patch["ctl_ts"] = patch["rest_ts"]

    return mean_shape, faces, patch


def load_with_surgery_eval(path: str, cfg: LasrConfig):
    """Eval-mode loading (ref:nnutils/predictor.py:103-154): hypothesis
    selection only — the checkpoint's topology and bone count must already
    match cfg (no remesh, no head expansion)."""
    flat, meta = load_raw(path)
    h_old = int(meta["__n_hypo"])
    faces = meta["__faces"]
    scores = -meta["__epoch_nscore"]

    def head(name, comp):
        return f"code_predictor/params/{name}/{comp}"

    if cfg.n_hypo < h_old:
        optim = int(scores.argmax())
        nz = flat[head("quat", "kernel")].shape[0]
        flat[head("quat", "kernel")] = flat[head("quat", "kernel")].reshape(
            nz, h_old, -1)[:, optim].reshape(nz, -1)
        flat[head("quat", "bias")] = flat[head("quat", "bias")].reshape(
            h_old, -1)[optim].reshape(-1)
        flat[head("scale", "kernel")] = flat[head("scale", "kernel")].reshape(
            nz, h_old, -1)[:, optim].reshape(nz, -1)
        flat[head("scale", "bias")] = flat[head("scale", "bias")].reshape(
            h_old, -1)[optim].reshape(-1)
        flat["mean_v"] = flat["mean_v"][optim: optim + 1]
        flat["tex"] = flat["tex"][optim: optim + 1]
        for k in ("ctl_rs", "rest_ts", "ctl_ts", "log_ctl"):
            if k in flat:
                flat[k] = flat[k][optim: optim + 1]

    patch = {"__flat__": {k: v for k, v in flat.items()
                          if k.startswith(("encoder/", "code_predictor/"))}}
    patch["mean_v"] = np.asarray(flat["mean_v"])
    patch["tex"] = np.asarray(flat["tex"])
    for k in ("ctl_rs", "rest_ts", "ctl_ts", "log_ctl", "frame_code"):
        if k in flat:
            patch[k] = np.asarray(flat[k])
    mean_shape = None if cfg.symmetric else flat["mean_v"][0]
    return mean_shape, faces, patch


def apply_patch(init_params, patch):
    """Overlay a surgery patch onto freshly initialized stage params."""
    params = jax.tree.map(lambda x: x, init_params)
    flat_new = traverse_util.flatten_dict(params)
    flat_patch = patch.pop("__flat__", {})
    body_rows = flat_patch.pop("__body_rows__", None)
    for key, val in flat_patch.items():
        tkey = tuple(key.split("/"))
        if tkey in flat_new and flat_new[tkey].shape == val.shape:
            flat_new[tkey] = np.asarray(val)
    if body_rows is not None:
        for key, val in body_rows.items():
            tkey = tuple(key.split("/"))
            cur = np.array(flat_new[tkey])  # writable copy
            if key.endswith("bias"):
                if "quat" in key:
                    cur = cur.reshape(-1, 4)
                    cur[:1] = val
                    flat_new[tkey] = np.asarray(cur.reshape(-1))
                elif "trans" in key:
                    cur = cur.reshape(-1, 2)
                    cur[:1] = val
                    flat_new[tkey] = np.asarray(cur.reshape(-1))
                else:  # depth
                    cur[:1] = val
                    flat_new[tkey] = np.asarray(cur)
            else:
                nz = cur.shape[0]
                if "quat" in key:
                    cur = cur.reshape(nz, -1, 4)
                    cur[:, :1] = val
                    flat_new[tkey] = np.asarray(cur.reshape(nz, -1))
                elif "trans" in key:
                    cur = cur.reshape(nz, -1, 2)
                    cur[:, :1] = val
                    flat_new[tkey] = np.asarray(cur.reshape(nz, -1))
                else:
                    cur = cur.reshape(nz, -1, 1)
                    cur[:, :1] = val
                    flat_new[tkey] = np.asarray(cur.reshape(nz, -1))
    params = traverse_util.unflatten_dict(flat_new)
    for key, val in patch.items():
        if key in params and params[key].shape == val.shape:
            params[key] = val
        elif key == "frame_code" and key not in params:
            # eval-path models are built without a dataset (no n_frames);
            # the trained per-frame codes install directly from the patch
            params[key] = val
    return params
