"""BADJA keypoint annotation loader.

Loads the public BADJA joint annotations (Biggs et al., "Creatures Great and
SMAL"; JSON files under database/joint_annotations) — behavioral equivalent
of ref:third_party/ext_utils/badja_data.py + joint_catalog.py.  The annotated
joint subset / marker / color tables below are the published dataset facts.
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np

# The 20 annotated SMAL joints (out of 37; the rest carry no annotations).
ANNOTATED_CLASSES = np.array(
    [8, 9, 10, 12, 13, 14, 15, 18, 19, 20, 22, 23, 24, 25, 28, 31, 32, 33,
     35, 36])
ANNOTATED_MARKERS = np.array(
    [0, 2, 6, 0, 2, 6, 0, 0, 2, 6, 0, 2, 6, 0, 2, 6, 0, 2, 0, 0])
JOINT_COLORS = np.array(
    [[60, 180, 75]] * 3 + [[230, 25, 75]] * 3 + [[128, 0, 0]]
    + [[0, 130, 200]] * 3 + [[255, 255, 25]] * 3 + [[240, 50, 230]] * 3
    + [[245, 130, 48]] * 2 + [[29, 98, 115]] + [[255, 153, 204]])


class BADJAData:
    def __init__(self, seqname: str, badja_path: str = "database"):
        ann_dir = os.path.join(badja_path, "joint_annotations")
        json_path = os.path.join(ann_dir, f"{seqname}.json")
        if not os.path.exists(json_path):
            raise FileNotFoundError(json_path)
        with open(json_path) as f:
            data = json.load(f)
        self.entries = []
        for rec in data:
            img = os.path.join(badja_path, rec["image_path"])
            seg = os.path.join(badja_path, rec["segmentation_path"])
            if os.path.exists(img) and os.path.exists(seg):
                self.entries.append(
                    (img, seg,
                     np.asarray(rec["joints"])[ANNOTATED_CLASSES],
                     np.asarray(rec["visibility"])[ANNOTATED_CLASSES]))
            else:
                print(f"BADJA: missing {img if not os.path.exists(img) else seg}")

    def __iter__(self):
        for img_path, seg_path, joints, visible in self.entries:
            rgb = cv2.imread(img_path)[:, :, ::-1]
            sil = cv2.imread(seg_path, cv2.IMREAD_UNCHANGED)
            if sil.ndim == 2:
                sil = sil[:, :, None]
            sil = cv2.resize(sil, (rgb.shape[1], rgb.shape[0]),
                             interpolation=cv2.INTER_NEAREST)
            if sil.ndim == 2:
                sil = sil[:, :, None]
            yield rgb, sil, joints, visible, img_path
