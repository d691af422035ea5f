"""Flow-preprocessing driver (preprocess/auto_gen.py) on tiny frames.

Covers the filtered-sequence writer: frame skipping by median flow,
renumbering, and the stale-file clearing that keeps a re-run with a
different backend/threshold consistent (a leftover 26th frame with no
matching flo-*.pfm crashed the camera chain on the first flownet-backed
pika run)."""

import glob
import importlib.util
import os
import sys

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_auto_gen():
    spec = importlib.util.spec_from_file_location(
        "auto_gen", os.path.join(REPO, "preprocess", "auto_gen.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_seq(root, n=4, size=64, shift=6):
    """n frames of a textured square translating `shift` px per frame."""
    r = np.random.RandomState(0)
    tex = (r.rand(size * 2, size * 2, 3) * 255).astype(np.uint8)
    jdir = os.path.join(root, "JPEGImages", "Full-Resolution", "seq")
    adir = os.path.join(root, "Annotations", "Full-Resolution", "seq")
    os.makedirs(jdir), os.makedirs(adir)
    for i in range(n):
        img = np.full((size, size, 3), 32, np.uint8)
        mask = np.zeros((size, size), np.uint8)
        x = 8 + i * shift
        img[16:48, x: x + 24] = tex[16:48, x: x + 24]
        mask[16:48, x: x + 24] = 128
        cv2.imwrite(os.path.join(jdir, f"{i:05d}.jpg"), img)
        cv2.imwrite(os.path.join(adir, f"{i:05d}.png"), mask)
    return jdir, adir


def _run(mod, root, argv):
    old = sys.argv
    sys.argv = ["auto_gen.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_filtered_rerun_clears_stale_files(tmp_path):
    mod = _load_auto_gen()
    root = str(tmp_path)
    _make_seq(root, n=4)
    common = ["--seqname", "seq", "--outroot", root, "--backend", "dis"]

    # pass 1: keep every moving pair -> 4 frames in rseq
    _run(mod, root, common + ["--flow_threshold", "0.01"])
    rj = os.path.join(root, "JPEGImages", "Full-Resolution", "rseq")
    rf = os.path.join(root, "FlowFW", "Full-Resolution", "rseq")
    assert len(glob.glob(os.path.join(rj, "*.jpg"))) == 4
    n_flow_1 = len(glob.glob(os.path.join(rf, "flo-*.pfm")))
    assert n_flow_1 == 3

    # pass 2: impossible threshold -> keeps only the first pair's frames;
    # every file beyond the new count must be GONE
    _run(mod, root, common + ["--flow_threshold", "99.0"])
    jpgs = sorted(glob.glob(os.path.join(rj, "*.jpg")))
    flows = sorted(glob.glob(os.path.join(rf, "flo-*.pfm")))
    assert len(jpgs) <= 1, jpgs       # nothing passed the threshold
    assert len(flows) == 0, flows
    masks = glob.glob(os.path.join(
        root, "Annotations", "Full-Resolution", "rseq", "*.png"))
    assert len(masks) == len(jpgs)


def test_flow_only_pass_preserves_input_frames(tmp_path):
    mod = _load_auto_gen()
    root = str(tmp_path)
    jdir, adir = _make_seq(root, n=3)
    _run(mod, root, ["--seqname", "seq", "--outroot", root, "--backend",
                     "dis", "--flow_threshold", "0", "--out", "seq"])
    # frames/masks untouched, flow written alongside
    assert len(glob.glob(os.path.join(jdir, "*.jpg"))) == 3
    assert len(glob.glob(os.path.join(adir, "*.png"))) == 3
    ff = os.path.join(root, "FlowFW", "Full-Resolution", "seq")
    assert len(glob.glob(os.path.join(ff, "flo-*.pfm"))) == 2
