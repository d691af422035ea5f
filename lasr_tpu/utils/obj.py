"""Wavefront OBJ IO with per-face texture sampling (host-side numpy).

Replaces the reference's sr.Mesh.from_obj / load_textures CUDA kernel
(ref:third_party/softras/soft_renderer/functional/load_obj.py and
cuda/load_textures_cuda_kernel.cu) for the synthetic-data generator: loads
geometry + UVs and bakes an RxR per-face texel atlas compatible with the
rasterizer's surface-texture lookup (ops/softras_ref.sample_texture)."""

from __future__ import annotations

import os

import numpy as np


def load_obj(path: str):
    """Returns (verts [V,3] f32, faces [F,3] i64, uv [T,2] or None,
    face_uv_idx [F,3] or None, texture_image [H,W,3] in [0,1] or None)."""
    verts, uvs, faces, face_uvs = [], [], [], []
    mtl_file = None
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif parts[0] == "f":
                vi, ti = [], []
                for p in parts[1:4]:
                    comps = p.split("/")
                    vi.append(int(comps[0]) - 1)
                    if len(comps) > 1 and comps[1]:
                        ti.append(int(comps[1]) - 1)
                faces.append(vi)
                if ti:
                    face_uvs.append(ti)
            elif parts[0] == "mtllib":
                mtl_file = parts[1]

    tex_img = None
    if mtl_file:
        mtl_path = os.path.join(os.path.dirname(path), mtl_file)
        if os.path.exists(mtl_path):
            with open(mtl_path) as f:
                for line in f:
                    parts = line.strip().split()
                    if parts and parts[0] == "map_Kd":
                        import cv2
                        img_path = os.path.join(os.path.dirname(path), parts[-1])
                        img = cv2.imread(img_path)
                        if img is not None:
                            tex_img = img[:, :, ::-1].astype(np.float32) / 255.0

    return (np.asarray(verts, np.float32), np.asarray(faces, np.int64),
            np.asarray(uvs, np.float32) if uvs else None,
            np.asarray(face_uvs, np.int64) if face_uvs else None,
            tex_img)


def _bilinear(img: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Sample [H,W,3] at uv in [0,1]² (v measured from the bottom, OBJ style)."""
    H, W = img.shape[:2]
    x = np.clip(u * (W - 1), 0, W - 1)
    y = np.clip((1.0 - v) * (H - 1), 0, H - 1)
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    x1, y1 = np.minimum(x0 + 1, W - 1), np.minimum(y0 + 1, H - 1)
    fx, fy = (x - x0)[..., None], (y - y0)[..., None]
    return ((1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x1])
            + fy * ((1 - fx) * img[y1, x0] + fx * img[y1, x1]))


def texel_barycentrics(res: int) -> np.ndarray:
    """[res*res, 3] barycentric centers matching the rasterizer's
    surface-texture lookup: texel t is addressed by (wx=int(w0*R),
    wy=int(w1*R)) in the lower sub-triangle, or mirrored in the upper."""
    bary = np.zeros((res * res, 3), np.float32)
    for t in range(res * res):
        wx, wy = t % res, t // res
        if wx + wy <= res - 1:                      # lower-triangle texel
            w0 = (wx + 1.0 / 3.0) / res
            w1 = (wy + 1.0 / 3.0) / res
        else:                                       # upper (mirrored address)
            wx2, wy2 = res - 1 - wx, res - 1 - wy
            w0 = (wx2 + 2.0 / 3.0) / res
            w1 = (wy2 + 2.0 / 3.0) / res
        bary[t] = (w0, w1, max(1.0 - w0 - w1, 0.0))
    return bary


def bake_face_textures(uv: np.ndarray, face_uv_idx: np.ndarray,
                       tex_img: np.ndarray, res: int = 5) -> np.ndarray:
    """[F, res*res, 3] per-face texel colors."""
    bary = texel_barycentrics(res)                      # [T, 3]
    fuv = uv[face_uv_idx]                               # [F, 3, 2]
    pts = np.einsum("tj,fjc->ftc", bary, fuv)           # [F, T, 2]
    return _bilinear(tex_img, pts[..., 0], pts[..., 1]).astype(np.float32)


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:f} {v[1]:f} {v[2]:f}\n")
        for fc in faces:
            f.write(f"f {fc[0] + 1:d} {fc[1] + 1:d} {fc[2] + 1:d}\n")
