"""Generate BADJA-format joint annotations for a synthetic sequence.

The reference evaluates keypoint transfer with the published BADJA
annotations over real DAVIS videos (ref:scripts/eval_badja.py,
ref:third_party/ext_utils/badja_data.py).  Those frames are not shipped
in-repo, so for the in-repo raw-video benchmarks (camel/pika — synthetic
sequences whose GT meshes are kept in database/gt-<seq>) this script derives
annotations with *exact* correspondence: it picks well-spread mesh vertices
as joints, projects them through the fixture camera model (camera-space
meshes, focal 10, y down — the convention scripts/render_syn.py writes), and
marks visibility with a painter's-algorithm z-buffer.  Output is the same
JSON schema as the real BADJA files (joints in (y, x) pixel coordinates,
37-slot arrays with the 20 annotated SMAL classes filled), so
scripts/eval_badja.py runs the unmodified protocol.

Usage:
    python scripts/make_badja_syn.py --seqname camel
        [--gtdir database/gt-camel] [--out camel-syn]
Then:
    python scripts/eval_badja.py --testdir log/camel-5 --seqname camel-syn
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

from lasr_tpu.data.badja import ANNOTATED_CLASSES
from lasr_tpu.utils import obj as obj_io

FOCAL = 10.0


def farthest_point_ids(verts: np.ndarray, k: int) -> np.ndarray:
    ids = [int(np.argmax(verts[:, 0]))]
    d = np.linalg.norm(verts - verts[ids[0]], axis=1)
    for _ in range(k - 1):
        ids.append(int(np.argmax(d)))
        d = np.minimum(d, np.linalg.norm(verts - verts[ids[-1]], axis=1))
    return np.asarray(ids)


def project(v: np.ndarray, img_size: int) -> np.ndarray:
    return np.stack([(v[:, 0] * FOCAL / v[:, 2] + 1) / 2 * (img_size - 1),
                     (v[:, 1] * FOCAL / v[:, 2] + 1) / 2 * (img_size - 1)], 1)


def visible(verts: np.ndarray, faces: np.ndarray, pix: np.ndarray,
            img_size: int, ids: np.ndarray, tol: float = 0.03) -> np.ndarray:
    zbuf = np.full((img_size, img_size), 1e9, np.float32)
    face_z = verts[faces, 2].mean(1)
    for fi in np.argsort(-face_z):
        tri = np.round(pix[faces[fi]]).astype(np.int32)
        cv2.fillPoly(zbuf, [tri], float(verts[faces[fi], 2].min()))
    xi = np.clip(np.round(pix[ids, 0]).astype(int), 0, img_size - 1)
    yi = np.clip(np.round(pix[ids, 1]).astype(int), 0, img_size - 1)
    return np.abs(verts[ids, 2] - zbuf[yi, xi]) < tol


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqname", required=True,
                    help="sequence under database/DAVIS (images + masks)")
    ap.add_argument("--gtdir", default=None,
                    help="GT camera-space meshes (default database/gt-<seq>)")
    ap.add_argument("--out", default=None,
                    help="output annotation name (default <seq>-syn)")
    ap.add_argument("--n_joints", type=int, default=len(ANNOTATED_CLASSES))
    args = ap.parse_args()

    gtdir = args.gtdir or f"database/gt-{args.seqname}"
    outname = args.out or f"{args.seqname}-syn"
    imgdir = f"database/DAVIS/JPEGImages/Full-Resolution/{args.seqname}"
    segdir = f"database/DAVIS/Annotations/Full-Resolution/{args.seqname}"

    v0, _, _, _, _ = obj_io.load_obj(os.path.join(gtdir, "00000.obj"))
    joint_ids = farthest_point_ids(v0, args.n_joints)

    records = []
    for fr in range(len(os.listdir(imgdir))):
        img_path = os.path.join(imgdir, "%05d.jpg" % fr)
        seg_path = os.path.join(segdir, "%05d.png" % fr)
        mesh_path = os.path.join(gtdir, "%05d.obj" % fr)
        if not (os.path.exists(img_path) and os.path.exists(seg_path)
                and os.path.exists(mesh_path)):
            continue
        img_size = max(cv2.imread(img_path).shape[:2])
        v, f, _, _, _ = obj_io.load_obj(mesh_path)
        pix = project(v, img_size)
        vis = visible(v, f, pix, img_size, joint_ids)
        inb = ((pix[joint_ids] >= 0) & (pix[joint_ids] <= img_size - 1)).all(1)

        joints = np.zeros((37, 2))
        visibility = np.zeros(37, bool)
        # BADJA stores (y, x) pixel coordinates
        joints[ANNOTATED_CLASSES[:args.n_joints]] = pix[joint_ids][:, ::-1]
        visibility[ANNOTATED_CLASSES[:args.n_joints]] = vis & inb
        records.append({
            "image_path": os.path.relpath(img_path, "database"),
            "segmentation_path": os.path.relpath(seg_path, "database"),
            "joints": joints.tolist(),
            "visibility": visibility.astype(int).tolist(),
        })

    out_path = f"database/joint_annotations/{outname}.json"
    with open(out_path, "w") as fp:
        json.dump(records, fp)
    n_vis = sum(sum(r["visibility"]) for r in records)
    print(f"{out_path}: {len(records)} frames, {n_vis} visible joints")


if __name__ == "__main__":
    main()
