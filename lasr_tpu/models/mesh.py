"""Mesh topology core (host-side numpy, one-time per stage).

Provides the icosphere template, the symmetry canonicalization that lets the
network predict half the mesh, and topology precomputes consumed by the
gather-based regularizer losses.

Behavioral parity targets:
  * icosphere: ref:third_party/ext_utils/meshzoo.py:229-290 (subdiv 3 ->
    642 verts / 1280 faces, unit-norm vertices).
  * symmetry reorder: ref:third_party/ext_utils/mesh.py:44-181 — verts
    ordered [center | right (x>0) | left = mirror(right)], faces ordered
    [independent | right | left] with paired faces listing mirrored vertices
    in the same order so barycentric coordinates correspond.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


# ----------------------------------------------------------------------------
# Icosphere
# ----------------------------------------------------------------------------

_ICO_T = (1.0 + np.sqrt(5.0)) / 2.0

_ICO_VERTS = np.array(
    [
        [-1, _ICO_T, 0], [1, _ICO_T, 0], [-1, -_ICO_T, 0], [1, -_ICO_T, 0],
        [0, -1, _ICO_T], [0, 1, _ICO_T], [0, -1, -_ICO_T], [0, 1, -_ICO_T],
        [_ICO_T, 0, -1], [_ICO_T, 0, 1], [-_ICO_T, 0, -1], [-_ICO_T, 0, 1],
    ],
    dtype=np.float64,
)

_ICO_FACES = np.array(
    [
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ],
    dtype=np.int64,
)


def _subdivide(verts: np.ndarray, faces: np.ndarray):
    """One 4-to-1 loop-style subdivision with exact midpoints (no smoothing)."""
    edge_to_mid: dict[tuple[int, int], int] = {}
    new_verts = [v for v in verts]

    def midpoint(a: int, b: int) -> int:
        key = (a, b) if a < b else (b, a)
        idx = edge_to_mid.get(key)
        if idx is None:
            idx = len(new_verts)
            # 0.5*(va+vb): exact in fp so mirrored edges stay exactly mirrored.
            new_verts.append(0.5 * (verts[key[0]] + verts[key[1]]))
            edge_to_mid[key] = idx
        return idx

    new_faces = []
    for a, b, c in faces:
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        new_faces.extend([[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]])
    return np.asarray(new_verts), np.asarray(new_faces, dtype=np.int64)


def icosphere(subdivisions: int = 3):
    """Unit icosphere; subdiv 3 -> 642 verts / 1280 faces (ref parity)."""
    verts, faces = _ICO_VERTS.copy(), _ICO_FACES.copy()
    for _ in range(subdivisions):
        verts, faces = _subdivide(verts, faces)
    # Project onto the unit sphere; |(-x,y,z)| == |(x,y,z)| exactly in fp, so
    # mirror symmetry survives the normalization.
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    return verts.astype(np.float32), faces


# ----------------------------------------------------------------------------
# Symmetry canonicalization
# ----------------------------------------------------------------------------

@dataclass
class SymmetricMesh:
    """A mesh reordered for x-mirror symmetry.

    verts[:num_indept] lie on the symmetry plane; the next num_sym are the
    right half; the final num_sym are their exact mirrors, in pair order.
    faces[:num_indept_faces] are self-symmetric; the next num_sym_faces are
    right faces, followed by their mirrored partners with vertices listed in
    corresponding order.
    """

    verts: np.ndarray
    faces: np.ndarray
    num_indept: int
    num_sym: int
    num_indept_faces: int
    num_sym_faces: int
    new_order: np.ndarray  # original index of each reordered vertex


def make_symmetric(verts: np.ndarray, faces: np.ndarray, axis: int = 0) -> SymmetricMesh:
    """Reorder an exactly mirror-symmetric mesh into canonical symmetric form."""
    coord = verts[:, axis]
    center_ids = np.where(coord == 0)[0]
    right_ids = np.where(coord > 0)[0]
    left_ids = np.where(coord < 0)[0]
    if len(right_ids) != len(left_ids):
        raise ValueError("mesh is not mirror-symmetric about the axis")

    mirror_sign = np.ones(3)
    mirror_sign[axis] = -1.0

    # Exact-match lookup right -> mirrored left (mesh must be exactly symmetric).
    key_of = {tuple(v): i for i, v in enumerate(verts)}
    paired_left = np.array([key_of[tuple(mirror_sign * verts[r])] for r in right_ids],
                           dtype=np.int64)

    new_order = np.concatenate([center_ids, right_ids, paired_left])
    perm = np.empty(len(verts), dtype=np.int64)
    perm[new_order] = np.arange(len(verts))

    new_verts = verts[new_order]
    remapped_faces = perm[faces]

    n_center, n_sym = len(center_ids), len(right_ids)

    # vertex -> mirror-partner vertex (identity on the plane)
    vmirror = np.arange(len(verts), dtype=np.int64)
    r = np.arange(n_center, n_center + n_sym)
    l = np.arange(n_center + n_sym, n_center + 2 * n_sym)
    vmirror[r] = l
    vmirror[l] = r

    # Classify faces: a face whose mirrored vertex set equals its own set is
    # independent; otherwise it pairs with the face holding the mirrored set.
    face_of_set = {tuple(sorted(f)): i for i, f in enumerate(remapped_faces)}
    indept, right_faces, left_faces = [], [], []
    done = np.zeros(len(remapped_faces), dtype=bool)
    for fid, f in enumerate(remapped_faces):
        if done[fid]:
            continue
        mirrored = vmirror[f]
        if sorted(mirrored.tolist()) == sorted(f.tolist()):
            indept.append(f)
            done[fid] = True
            continue
        partner = face_of_set[tuple(sorted(mirrored.tolist()))]
        # `mirrored` is the partner triangle with vertices in f's order.
        changed = f != mirrored
        if np.all(new_verts[f][changed, axis] > new_verts[mirrored][changed, axis]):
            right_faces.append(f)
            left_faces.append(mirrored)
        else:
            right_faces.append(mirrored)
            left_faces.append(f)
        done[fid] = True
        done[partner] = True

    new_faces = np.vstack([indept, right_faces, left_faces]).astype(np.int64)
    return SymmetricMesh(
        verts=new_verts.astype(np.float32),
        faces=new_faces,
        num_indept=n_center,
        num_sym=n_sym,
        num_indept_faces=len(indept),
        num_sym_faces=len(right_faces),
        new_order=new_order,
    )


def symmetric_icosphere(subdivisions: int = 3, axis: int = 0) -> SymmetricMesh:
    verts, faces = icosphere(subdivisions)
    return make_symmetric(verts, faces, axis)


# ----------------------------------------------------------------------------
# Topology precomputes for the regularizer losses
# ----------------------------------------------------------------------------

def vertex_adjacency(faces: np.ndarray, num_verts: int):
    """Padded one-ring neighbor table.

    Returns (neighbors[V, maxdeg] int32, mask[V, maxdeg] float32).  Used by the
    gather-based Laplacian/ARAP losses instead of the reference's dense VxV
    matmuls (ref:third_party/ext_nnutils/loss_utils.py:34-65,
    ref:nnutils/loss_utils.py:29-64).
    """
    nbrs: list[set[int]] = [set() for _ in range(num_verts)]
    for a, b, c in faces:
        nbrs[a].update((b, c))
        nbrs[b].update((a, c))
        nbrs[c].update((a, b))
    maxdeg = max(len(s) for s in nbrs)
    idx = np.zeros((num_verts, maxdeg), dtype=np.int32)
    mask = np.zeros((num_verts, maxdeg), dtype=np.float32)
    for i, s in enumerate(nbrs):
        ns = sorted(s)
        idx[i, : len(ns)] = ns
        mask[i, : len(ns)] = 1.0
    return idx, mask


def undirected_edges(faces: np.ndarray) -> np.ndarray:
    """[E, 2] unique undirected edges."""
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], 0)
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


def flatten_quads(faces: np.ndarray) -> np.ndarray:
    """[E_int, 4] (v0, v1, v2, v3): interior edges with their two opposite
    vertices, for the dihedral flattening loss
    (ref:third_party/ext_nnutils/loss_utils.py:67-152)."""
    opp: dict[tuple[int, int], list[int]] = {}
    for a, b, c in faces:
        for (u, v, w) in ((a, b, c), (b, c, a), (c, a, b)):
            key = (u, v) if u < v else (v, u)
            opp.setdefault(key, []).append(w)
    quads = [(k[0], k[1], ws[0], ws[1]) for k, ws in opp.items() if len(ws) == 2]
    return np.asarray(sorted(quads), dtype=np.int32)
