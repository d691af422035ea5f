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


def create_texture_image(textures: np.ndarray, texture_res: int = 16):
    """Pack per-face texel colors [F, R*R, 3] into a square-tiled texture
    atlas; returns (image [th*res, tw*res, 3] flipped for OBJ v-up, uv
    [F, 3, 2] in [0,1]).

    Vectorized port of the reference CUDA atlas writer
    (ref:third_party/softras/soft_renderer/cuda/
    create_texture_image_cuda_kernel.cu:20-69, wrapper
    functional/save_obj.py:9-36): per atlas pixel, barycentric coords
    w.r.t. the face's tile triangle select the source texel, mirrored for
    the upper sub-triangle."""
    eps = 1e-5
    F = textures.shape[0]
    R = int(round(np.sqrt(textures.shape[1])))
    res = texture_res
    tile_w = int((F - 1.0) ** 0.5) + 1
    tile_h = int((F - 1.0) / tile_w) + 1

    col = np.arange(F) % tile_w
    row = np.arange(F) // tile_w
    uvs = np.zeros((F, 3, 2), np.float32)
    uvs[:, 0, 0] = col * res + res / 2.0
    uvs[:, 0, 1] = row * res + 1
    uvs[:, 1, 0] = col * res + 1
    uvs[:, 1, 1] = (row + 1) * res - 2
    uvs[:, 2, 0] = (col + 1) * res - 2
    uvs[:, 2, 1] = (row + 1) * res - 2

    H, W = tile_h * res, tile_w * res
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    fn = xs // res + (ys // res) * tile_w                 # kernel:26
    valid = fn < F
    fnc = np.minimum(fn, F - 1)

    p0, p1, p2 = uvs[fnc, 0], uvs[fnc, 1], uvs[fnc, 2]    # [H,W,2]
    face_inv = np.stack([
        p1[..., 1] - p2[..., 1], p2[..., 0] - p1[..., 0],
        p1[..., 0] * p2[..., 1] - p2[..., 0] * p1[..., 1],
        p2[..., 1] - p0[..., 1], p0[..., 0] - p2[..., 0],
        p2[..., 0] * p0[..., 1] - p0[..., 0] * p2[..., 1],
        p0[..., 1] - p1[..., 1], p1[..., 0] - p0[..., 0],
        p0[..., 0] * p1[..., 1] - p1[..., 0] * p0[..., 1]], -1)
    denom = (p2[..., 0] * (p0[..., 1] - p1[..., 1])
             + p0[..., 0] * (p1[..., 1] - p2[..., 1])
             + p1[..., 0] * (p2[..., 1] - p0[..., 1]))
    face_inv = face_inv / (denom + eps)[..., None]

    w = np.stack([face_inv[..., 3 * k] * xs + face_inv[..., 3 * k + 1] * ys
                  + face_inv[..., 3 * k + 2] for k in range(3)], -1)
    w = np.clip(w, 0.0, 1.0)
    w = w / (w.sum(-1, keepdims=True) + eps)

    wx = (w[..., 0] * R).astype(np.int32)
    wy = (w[..., 1] * R).astype(np.int32)
    lower = (w[..., 0] + w[..., 1]) * R - wx - wy <= 1    # kernel:63
    # clamp before forming the flat index: w==1.0 exactly gives wx==R,
    # which would wrap to row 1 col 0 (the ref CUDA kernel is OOB here)
    wxc = np.clip(wx, 0, R - 1)
    wyc = np.clip(wy, 0, R - 1)
    ti = np.where(lower, wyc * R + wxc,
                  (R - 1 - wyc) * R + (R - 1 - wxc))
    ti = np.clip(ti, 0, R * R - 1)
    image = np.ones((H, W, 3), np.float32)
    image[valid] = textures[fnc, ti][valid]

    uvs[..., 0] /= W - 1
    uvs[..., 1] /= H - 1
    return image[::-1].copy(), uvs


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray,
             textures: np.ndarray | None = None,
             texture_res: int = 16, texture_type: str = "surface") -> None:
    """OBJ writer (ref:functional/save_obj.py:39-100 parity): plain
    geometry, per-vertex colors (`texture_type='vertex'`, textures [V,3]),
    or a surface-texture atlas + .mtl/.png (textures [F, R*R, 3])."""
    base = os.path.basename(path)
    lines = [f"# {base}\n#\n\n"]
    if textures is not None and texture_type == "surface":
        mtl_path = path[:-4] + ".mtl"
        png_path = path[:-4] + ".png"
        image, uvs = create_texture_image(np.asarray(textures), texture_res)
        import cv2
        cv2.imwrite(png_path,
                    (np.clip(image, 0, 1) * 255).astype(np.uint8)[:, :, ::-1])
        with open(mtl_path, "w") as f:
            f.write("newmtl material_1\nmap_Kd %s\n" % os.path.basename(png_path))
        lines.append("mtllib %s\n\n" % os.path.basename(mtl_path))

    if textures is not None and texture_type == "vertex":
        for v, c in zip(verts, textures):
            lines.append("v %.8f %.8f %.8f %.8f %.8f %.8f\n"
                         % (v[0], v[1], v[2], c[0], c[1], c[2]))
        lines.append("\n")
    else:
        for v in verts:
            lines.append("v %.8f %.8f %.8f\n" % (v[0], v[1], v[2]))
        lines.append("\n")

    if textures is not None and texture_type == "surface":
        for uv in uvs.reshape(-1, 2):
            lines.append("vt %.8f %.8f\n" % (uv[0], uv[1]))
        lines.append("\nusemtl material_1\n")
        for i, fc in enumerate(faces):
            lines.append("f %d/%d %d/%d %d/%d\n"
                         % (fc[0] + 1, 3 * i + 1, fc[1] + 1, 3 * i + 2,
                            fc[2] + 1, 3 * i + 3))
    else:
        for fc in faces:
            lines.append("f %d %d %d\n" % (fc[0] + 1, fc[1] + 1, fc[2] + 1))
    with open(path, "w") as f:
        f.writelines(lines)
