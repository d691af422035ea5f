"""ASCII PLY writer with vertex colors (ref:third_party/ext_utils/fusion.py:25-62
behavioral equivalent) and a minimal reader for eval tooling."""

from __future__ import annotations

import numpy as np


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray,
              colors: np.ndarray | None = None) -> None:
    verts = np.asarray(verts)
    faces = np.asarray(faces, np.int64)
    if colors is None:
        colors = np.full((len(verts), 3), 127, np.uint8)
    colors = np.clip(np.asarray(colors), 0, 255).astype(np.uint8)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_index\nend_header\n")
        for v, c in zip(verts, colors):
            f.write(f"{v[0]:f} {v[1]:f} {v[2]:f} {c[0]:d} {c[1]:d} {c[2]:d}\n")
        for fc in faces:
            f.write(f"3 {fc[0]:d} {fc[1]:d} {fc[2]:d}\n")


def read_ply(path: str):
    """Minimal ASCII PLY reader: returns (verts [V,3], faces [F,3], colors or None)."""
    with open(path) as f:
        assert f.readline().strip() == "ply"
        n_vert = n_face = 0
        props = []
        cur_elem = None
        while True:
            line = f.readline().strip()
            if line == "end_header":
                break
            parts = line.split()
            if parts[0] == "element":
                cur_elem = parts[1]
                if parts[1] == "vertex":
                    n_vert = int(parts[2])
                elif parts[1] == "face":
                    n_face = int(parts[2])
            elif parts[0] == "property" and cur_elem == "vertex":
                props.append(parts[-1])
        verts = np.zeros((n_vert, 3), np.float32)
        colors = np.zeros((n_vert, 3), np.uint8) if "red" in props else None
        for i in range(n_vert):
            vals = f.readline().split()
            verts[i] = [float(x) for x in vals[:3]]
            if colors is not None:
                ci = props.index("red")
                colors[i] = [int(float(x)) for x in vals[ci:ci + 3]]
        faces = np.zeros((n_face, 3), np.int64)
        for i in range(n_face):
            vals = f.readline().split()
            faces[i] = [int(x) for x in vals[1:4]]
    return verts, faces, colors
