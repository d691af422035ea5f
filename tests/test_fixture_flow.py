"""Synthetic-fixture integrity: stored FlowFW must equal GT vertex flow.

The fixtures under database/DAVIS/*/syn-* are rendered by scripts/render_syn.py
with *exact* optical flow from vertex correspondence (ref:scripts/render_syn.py
render_flow :49-65).  Training convergence depends on this: in round 1 the
DIS-flow preprocessing pass silently overwrote syn-spot3f's GT flow with
estimates that fail at 120 deg/frame, and the energy then preferred wrong
cameras.  This test pins the stored PFMs to the meshes, so any clobbering or
convention regression (y sign, row order, scale) fails loudly.

Protocol: project frame-a mesh vertices with the fixture camera model
(focal=10, camera y = image down, x_px=(f*X/Z+1)/2*(W-1)), keep vertices that
win a painter's-algorithm z-buffer (surface visibility), and compare the PFM
flow sampled at their pixels to pix(v_b) - pix(v_a).
"""

import os

import cv2
import numpy as np
import pytest

from lasr_tpu.data.pfm import read_pfm
from lasr_tpu.utils import obj as obj_io

DAVIS = os.path.join(os.path.dirname(__file__), "..", "database", "DAVIS")
IMG = 512


def _pix(v):
    return np.stack([(v[:, 0] * 10 / v[:, 2] + 1) / 2 * (IMG - 1),
                     (v[:, 1] * 10 / v[:, 2] + 1) / 2 * (IMG - 1)], 1)


def _gt_flow_check(seq, a, b):
    mdir = os.path.join(DAVIS, "Meshes", "Full-Resolution", seq)
    if not os.path.isdir(mdir):
        pytest.skip(f"fixture {seq} not generated")
    v0, faces, _, _, _ = obj_io.load_obj(os.path.join(mdir, f"{a:05d}.obj"))
    v1 = obj_io.load_obj(os.path.join(mdir, f"{b:05d}.obj"))[0]
    p0, p1 = _pix(v0), _pix(v1)
    gt = p1 - p0

    zbuf = np.full((IMG, IMG), 1e9, np.float32)
    face_z = v0[faces, 2].mean(1)
    for fi in np.argsort(-face_z):
        tri = np.round(p0[faces[fi]]).astype(np.int32)
        cv2.fillPoly(zbuf, [tri], float(v0[faces[fi], 2].min()))

    pfm = read_pfm(os.path.join(DAVIS, "FlowFW", "Full-Resolution", seq,
                                f"flo-{a:05d}.pfm"))[0]
    xi = np.clip(np.round(p0[:, 0]).astype(int), 0, IMG - 1)
    yi = np.clip(np.round(p0[:, 1]).astype(int), 0, IMG - 1)
    vis = np.abs(v0[:, 2] - zbuf[yi, xi]) < 0.03
    on = vis & (pfm[yi, xi, 2] > 0.5)
    assert on.sum() > 200, f"too few visible verts ({on.sum()})"
    err = np.abs(pfm[yi, xi][on, :2] - gt[on])
    med = np.median(err, 0)
    assert med[0] < 2.0 and med[1] < 2.0, (
        f"{seq} {a}->{b}: stored flow median error {med} px vs GT vertex "
        "correspondence — fixture flow is stale or convention-broken")


@pytest.mark.parametrize("pair", [(0, 1), (1, 2)])
def test_spot3_fixture_flow(pair):
    _gt_flow_check("syn-spot3f", *pair)


def test_dog15_fixture_flow():
    _gt_flow_check("syn-dog-15", 0, 1)


def test_rsyn_flow_matches_syn():
    """rsyn-spot3f keeps all 3 frames; its flow must stay the GT copy."""
    for sub in ("FlowFW", "FlowBW"):
        d_r = os.path.join(DAVIS, sub, "Full-Resolution", "rsyn-spot3f")
        d_s = os.path.join(DAVIS, sub, "Full-Resolution", "syn-spot3f")
        if not os.path.isdir(d_r):
            pytest.skip("rsyn-spot3f not present")
        for f in sorted(os.listdir(d_r)):
            if not f.endswith(".pfm"):
                continue
            a = read_pfm(os.path.join(d_r, f))[0]
            b = read_pfm(os.path.join(d_s, f))[0]
            assert np.array_equal(a, b), f"rsyn-spot3f/{f} diverged from GT"
