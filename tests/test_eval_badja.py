"""End-to-end BADJA keypoint-transfer eval on synthetic GT (camel).

Self-consistency: transporting keypoints with the GT meshes themselves must
score PCK=100 under the reference protocol (ref:scripts/eval_badja.py:245-258
— mesh-pair flow transport, PCK @ 0.2*sqrt(sil area)).  Also pins the host
hard-rasterization backend against the soft rasterizer's hard mode.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
GT = os.path.join(REPO, "database", "gt-camel")
ANN = os.path.join(REPO, "database", "joint_annotations", "camel-syn.json")


def _load_eval_badja():
    spec = importlib.util.spec_from_file_location(
        "eval_badja", os.path.join(REPO, "scripts", "eval_badja.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def gt_pred_dir(tmp_path_factory):
    from lasr_tpu.utils import obj as obj_io
    from lasr_tpu.utils.ply import write_ply
    d = tmp_path_factory.mktemp("gtpred")
    img = 512
    for fr in range(4):
        v, f, _, _, _ = obj_io.load_obj(os.path.join(GT, f"{fr:05d}.obj"))
        write_ply(str(d / f"pred{fr}.ply"), v, f)
        cam = np.zeros((4, 4))
        cam[:3, :3] = np.eye(3)
        cam[3] = [10 * img / 2, 10 * img / 2, img / 2, img / 2]
        np.savetxt(str(d / f"cam{fr}.txt"), cam)
    return str(d)


@pytest.mark.skipif(not os.path.isdir(GT) or not os.path.exists(ANN),
                    reason="camel fixture not generated")
def test_gt_transport_scores_pck_100(gt_pred_dir, monkeypatch, capsys):
    eb = _load_eval_badja()
    monkeypatch.chdir(REPO)
    monkeypatch.setattr(sys, "argv",
                        ["eval_badja.py", "--testdir", gt_pred_dir,
                         "--seqname", "camel-syn"])
    eb.main()
    out = capsys.readouterr().out
    pck = float(out.strip().split()[-1])
    assert pck > 95.0, f"GT self-transport PCK {pck} (expected ~100)"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(GT), reason="camel fixture missing")
def test_host_matches_soft_hard_mode(gt_pred_dir):
    from lasr_tpu.utils.ply import read_ply
    eb = _load_eval_badja()
    v0, f0, _ = read_ply(os.path.join(gt_pred_dir, "pred0.ply"))
    v1, _, _ = read_ply(os.path.join(gt_pred_dir, "pred2.ply"))
    cam = np.loadtxt(os.path.join(gt_pred_dir, "cam0.txt"))
    fh, bh = eb.render_mesh_flow(v0, v1, f0, cam, cam, 256, "host")
    fs, bs = eb.render_mesh_flow(v0, v1, f0, cam, cam, 256, "soft")
    both = ~bh & ~bs
    assert both.sum() > 5000
    d_px = np.abs(fh[both] - fs[both]) * 256 / 2
    assert np.median(d_px) < 0.5, f"median backend divergence {np.median(d_px)} px"
