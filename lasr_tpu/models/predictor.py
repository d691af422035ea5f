"""Inference-time mesh predictor (ref:nnutils/predictor.py behavioral port).

Loads a trained checkpoint (with best-hypothesis selection), and per frame:
runs the encoder/code heads, rebuilds the articulated mesh in the camera
frame, and renders front / right / top viewpoints plus bone/gaussian
visualization geometry.  The reference's pytorch3d Phong renderer becomes a
Lambertian-shaded hard rasterization on our own kernel.
"""

from __future__ import annotations

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..config import LasrConfig
from ..ops import geometry, quat as quat_ops
from ..ops.rasterize import RasterizeConfig, soft_rasterize
from ..training import checkpoint as ckpt
from .lasr import LasrModel

sg = jax.lax.stop_gradient


def preprocess_image(img_path: str, img_size: int = 256):
    """Mask-crop preprocessing for inference (ref:extract.py:59-97)."""
    img = cv2.imread(img_path)[:, :, ::-1] / 255.0
    mask = cv2.imread(img_path.replace("JPEGImages", "Annotations")
                      .replace(".jpg", ".png"), 0)
    if mask.shape[:2] != img.shape[:2]:
        mask = cv2.resize(mask, img.shape[:2][::-1])
    mask = mask[:, :, None]
    color = img[mask[:, :, 0].astype(bool)].mean(0)
    img = img * (mask > 0) + (1 - color)[None, None] * (1 - (mask > 0))
    img_black = img * (mask > 0) + (1 - (mask > 0))

    ys, xs = np.where(mask[:, :, 0] > 0)
    center = ((xs.max() + xs.min()) // 2, (ys.max() + ys.min()) // 2)
    length = int(1.2 * max((xs.max() - xs.min()) // 2,
                           (ys.max() - ys.min()) // 2))
    x0, y0 = np.meshgrid(range(2 * length), range(2 * length))
    x0 = (x0 + center[0] - length).astype(np.float32)
    y0 = (y0 + center[1] - length).astype(np.float32)
    img = cv2.remap(img, x0, y0, interpolation=cv2.INTER_LINEAR,
                    borderValue=tuple(1 - color))
    img_black = cv2.remap(img_black, x0, y0, interpolation=cv2.INTER_LINEAR,
                          borderValue=(1.0, 1.0, 1.0))
    img = cv2.resize(img, (img_size, img_size))
    img_black = cv2.resize(img_black, (img_size, img_size))
    alp = 2 * length / img_size
    pp = np.array([center[0] - length, center[1] - length], np.float32)
    return (np.transpose(img, (2, 0, 1)).astype(np.float32), alp,
            np.transpose(img_black, (2, 0, 1)).astype(np.float32), pp)


def _uv_sphere(radius=0.05, count=16):
    """Small UV sphere for gaussian-bone visualization."""
    lat = np.linspace(0, np.pi, count)
    lon = np.linspace(0, 2 * np.pi, count, endpoint=False)
    verts, faces = [], []
    for i, t in enumerate(lat):
        for j, p in enumerate(lon):
            verts.append([radius * np.sin(t) * np.cos(p),
                          radius * np.sin(t) * np.sin(p),
                          radius * np.cos(t)])
    for i in range(count - 1):
        for j in range(count):
            a = i * count + j
            b = i * count + (j + 1) % count
            c = (i + 1) * count + j
            d = (i + 1) * count + (j + 1) % count
            faces.append([a, b, c])
            faces.append([b, d, c])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int64)


class MeshPredictor:
    def __init__(self, cfg: LasrConfig, model_path: str | None = None):
        self.cfg = cfg
        path = model_path or os.path.join(
            cfg.save_dir, f"pred_net_{cfg.model_path or 'latest'}.npz")
        mean_shape, faces, patch = ckpt.load_with_surgery_eval(path, cfg)
        _, meta = ckpt.load_raw(path)
        cam_chain = meta.get("__cam_chain")
        if cfg.symmetric:
            self.model = LasrModel(cfg, cam_chain=cam_chain)
        else:
            self.model = LasrModel(cfg, mean_shape=mean_shape, faces=faces,
                                   cam_chain=cam_chain)
        # one up-front transfer: init_params may hold host (numpy) leaves,
        # and per-frame predict() calls should not re-upload the weights
        self.params = jax.device_put(
            ckpt.apply_patch(self.model.init_params, patch))
        self.faces = self.model.faces
        self._core = jax.jit(self._predict_core)
        self._raster = {}

    # ------------------------------------------------------------------
    def _predict_core(self, params, inp, cam_fl, frameid):
        """Jitted geometry path: codes -> camera-frame meshes + bone geometry."""
        cfg = self.cfg
        model = self.model
        K = cfg.n_bones
        codes = model.predict_codes(
            params, inp, frameid if "frame_code" in params else None)
        scale = codes["scale"][:, 0] * cam_fl                 # [1]
        depth = codes["depth"].at[:, 0].mul(cam_fl)           # [1, K]
        trans = codes["trans"]                                # [1, K, 2]
        ppoint = codes["ppoint"]                              # [1, 2]
        M = codes["rotmat"][:, 0]                             # [1, K, 3, 3]

        pred_v, tex_rgb = model.mean_shape(params)            # [1, V, 3]
        body_rot = M[:, 0]
        if model.cam_chain is not None:
            # same flow-chain pre-rotation the checkpoint was trained with
            nf = model.cam_chain.shape[0]
            chain = jnp.asarray(model.cam_chain)[
                jnp.clip(frameid, 0, nf - 1)][0]              # [3, 3]
            body_rot = body_rot @ chain
        body_trans = jnp.concatenate([trans[:, 0], depth[:, :1]], -1)

        if K > 1:
            ctl_rot = quat_ops.quat_to_rotmat_xyzw(
                quat_ops.normalize(params["ctl_rs"]))
            skin = geometry.gmm_skinning_weights(
                sg(pred_v[0]), params["ctl_ts"][0], ctl_rot[0],
                params["log_ctl"][0])[None]                   # [1, K-1, V]
            part_rot = jnp.swapaxes(M[:, 1:], -1, -2)
            raw_t = jnp.concatenate([trans[:, 1:], depth[:, 1:, None]], -1)
            _, part_trans = geometry.bone_transforms_about_pivots(
                part_rot, raw_t, params["rest_ts"][:1])
        else:
            skin = part_rot = part_trans = None

        def to_cam(extra_rot=None, to_cam=True):
            br = body_rot if extra_rot is None else body_rot @ extra_rot
            return geometry.obj_to_cam(pred_v, br, body_trans, part_rot,
                                       part_trans, skin, to_cam=to_cam)

        verts = to_cam()
        rot_right = quat_ops.quat_to_rotmat_xyzw(
            jnp.asarray([0.0, -0.707, 0.0, 0.707]))
        rot_top = quat_ops.quat_to_rotmat_xyzw(
            jnp.asarray([-0.707, 0.0, 0.0, 0.707]))
        verts_vp2 = to_cam(rot_right)
        verts_vp3 = to_cam(rot_top)

        core = {
            "verts": verts[0], "verts_vp2": verts_vp2[0],
            "verts_vp3": verts_vp3[0], "tex": tex_rgb[0],
            "scale": scale, "trans": trans, "ppoint": ppoint[0],
            "depth": depth,
            "quat": quat_ops.rotmat_to_quat_wxyz(body_rot[0]),
            "raw_scale": codes["scale"][0, 0], "raw_pp": codes["ppoint"][0],
        }
        if K > 1:
            joints_cam = geometry.rigid_transform(
                (jnp.einsum("bkij,bkj->bki", sg(part_rot),
                            params["ctl_ts"][:1], precision="highest")
                 + sg(part_trans)), body_rot, body_trans)
            core["bones_3d"] = joints_cam[0]
            core["joints"] = geometry.pinhole_project(
                joints_cam, ppoint, scale)[0]
            core["skin"] = skin[0]
            core["ctl_rot"] = ctl_rot[0]
        return core

    # ------------------------------------------------------------------
    def predict(self, img: np.ndarray, alp: float, pp: np.ndarray,
                frameid: int = 0):
        """img [3, S, S] in [0,1] -> dict of outputs (ref:predictor.py:183-353).
        The geometry path runs as one jitted call; rendering and mesh export
        happen host-side.  `frameid` selects the per-frame camera code when
        the checkpoint was trained with cfg.frame_code."""
        cfg = self.cfg
        params, K = self.params, cfg.n_bones
        from ..data.video import IMAGENET_MEAN, IMAGENET_STD
        inp = ((img.transpose(1, 2, 0) - IMAGENET_MEAN) / IMAGENET_STD
               ).transpose(2, 0, 1)[None]
        nf = params["frame_code"].shape[0] if "frame_code" in params else (
            self.model.cam_chain.shape[0]
            if self.model.cam_chain is not None else 1)
        core = jax.tree.map(np.asarray, self._core(
            params, jnp.asarray(inp), jnp.asarray(1.0 / alp),
            jnp.asarray([min(frameid, nf - 1)], jnp.int32)))

        outputs = {
            "verts": core["verts"], "verts_vp2": core["verts_vp2"],
            "verts_vp3": core["verts_vp3"], "tex": core["tex"],
            "cam_pred": np.concatenate(
                [core["scale"][None],
                 core["trans"][0, 0][None].reshape(1, -1),
                 core["quat"][None].reshape(1, -1)], -1),
            "uncrop_scale": float(core["raw_scale"]) * 128.0,
            "uncrop_pp": (core["raw_pp"] + 1) * 128.0 * alp + pp,
            "depth": float(core["depth"][0, 0]),
            "ppoint": core["ppoint"],
        }

        renders = []
        for key in ("verts", "verts_vp2", "verts_vp3"):
            renders.append(self._shaded_render(
                core[key], core["tex"], core["ppoint"],
                float(core["scale"][0])))
        outputs["texture_render"], outputs["texture_vp2"], \
            outputs["texture_vp3"] = renders
        outputs["mask_pred"] = renders[0][3]

        if K > 1:
            outputs["bones_3d"] = core["bones_3d"]
            outputs["joints"] = core["joints"]
            outputs["skin"] = core["skin"]
            sp_v, sp_f = _uv_sphere()
            gauss_v, gauss_f = [], []
            for i in range(K - 1):
                sv = sp_v / np.exp(0.5 * np.clip(
                    np.asarray(params["log_ctl"][0, i]), -2, 2))
                sv = sv @ core["ctl_rot"][i].T + np.asarray(
                    params["ctl_ts"][0, i])
                gauss_f.append(sp_f + i * len(sp_v))
                gauss_v.append(sv)
            outputs["gauss_verts"] = np.concatenate(gauss_v)
            outputs["gauss_faces"] = np.concatenate(gauss_f)
        else:
            outputs["joints"] = np.zeros((0, 3), np.float32)
        return outputs

    # ------------------------------------------------------------------
    def _shaded_render(self, verts_cam, tex, pp, fl, img_size=None):
        """Hard rasterization with Lambertian vertex shading (substitute for
        the reference's pytorch3d SoftPhong renderer, predictor.py:92-95)."""
        S = img_size or self.cfg.img_size
        proj = geometry.pinhole_project(jnp.asarray(verts_cam)[None],
                                        jnp.asarray(pp)[None],
                                        jnp.asarray([fl]))
        geom = np.array(proj[0])  # writable copy
        geom[:, 1] *= -1
        # vertex normals for shading
        fv = verts_cam[self.faces]
        fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
        fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
        vn = np.zeros_like(verts_cam)
        np.add.at(vn, self.faces.reshape(-1), np.repeat(fn, 3, 0))
        vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
        light = 0.4 + 0.6 * np.abs(vn[:, 2:3])
        colors = np.clip(tex * light, 0, 1)

        cfg = RasterizeConfig(image_size=S, sigma=1e-12, gamma=1e-4,
                              dist_func="hard", aggr_rgb="hard",
                              aggr_alpha="hard", background=(1.0, 1.0, 1.0),
                              face_chunk=64)
        fvg = geom[self.faces][None]
        ftg = colors[self.faces][None]
        z = verts_cam[:, 2]
        key = (cfg, fvg.shape)
        if key not in self._raster:
            self._raster[key] = jax.jit(
                lambda fv, ft, n, f: soft_rasterize(fv, ft, cfg, n, f,
                                                    force_ref=True))
        out = np.asarray(self._raster[key](
            jnp.asarray(fvg), jnp.asarray(ftg),
            jnp.asarray(z.min() - 1), jnp.asarray(z.max() + 1)))
        return out[0]
