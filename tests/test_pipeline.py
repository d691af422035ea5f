"""Single-process multi-stage driver (pipeline.py) on the spot fixture.

Covers: per-stage flag parsing through optimize.py's absl schema, the
stage handoff via pred_net_latest.npz (checkpoint surgery incl. remesh +
hypothesis pruning), and dataset/device-array reuse across stages with the
same (dataname, img_size, sil_path)."""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO,
                       "database/DAVIS/JPEGImages/Full-Resolution/syn-spot3f")

pytestmark = pytest.mark.skipif(not os.path.isdir(FIXTURE),
                                reason="run scripts/render_syn.py first")


@pytest.mark.slow
def test_pipeline_two_stages(tmp_path):
    os.chdir(REPO)
    import pipeline

    ckpt = str(tmp_path)
    common = ("--checkpoint_dir %s --dataname spot3 --img_size 64 "
              "--subdivide 1 --sigval 1e-3 --batch_size 1 --num_epochs 1 "
              "--max_retries 0" % ckpt)
    s0 = (f"--name=p-0 {common} --only_mean_sym --n_bones 2 --n_hypo 2")
    s1 = (f"--name=p-1 {common} --nosymmetric --n_bones 3 --n_hypo 1 "
          f"--n_faces 80 --model_path {ckpt}/p-0/pred_net_latest.npz")
    pipeline.main(["--stage", s0, "--stage", s1,
                   "--timing_out", f"{ckpt}/walls.json",
                   "--max_retries", "0"])      # in-process, no supervisor

    for name in ("p-0", "p-1"):
        assert os.path.exists(f"{ckpt}/{name}/pred_net_latest.npz"), name
    walls = json.load(open(f"{ckpt}/walls.json"))
    assert set(walls) == {"p-0", "p-1"}
    # stage 1 consumed stage 0's checkpoint: single-hypothesis, remeshed
    final = np.load(f"{ckpt}/p-1/pred_net_latest.npz")
    assert final["mean_v"].shape[0] == 1
    assert np.isfinite(final["mean_v"]).all()


def test_supervisor_resume_plan(tmp_path):
    """Crash-restart planning: complete stages are dropped, a partial stage
    resumes from its checkpoint, untouched stages run as written."""
    os.chdir(REPO)
    import pipeline

    ckpt = str(tmp_path)
    common = f"--checkpoint_dir {ckpt} --dataname spot3 --num_epochs 4"
    stages = [f"--name=r-{i} {common}" for i in range(3)]

    # r-0 complete (4/4), r-1 partial (2/4), r-2 never started
    os.makedirs(f"{ckpt}/r-0"), os.makedirs(f"{ckpt}/r-1")
    np.savez(f"{ckpt}/r-0/pred_net_latest.npz", __epochs_done=4)
    np.savez(f"{ckpt}/r-1/pred_net_latest.npz", __epochs_done=2)

    plan = pipeline._resume_stages(stages)
    assert len(plan) == 2
    assert plan[0].startswith("--name=r-1 ")
    assert "--start_epoch=2" in plan[0]
    assert f"--model_path={ckpt}/r-1/pred_net_latest.npz" in plan[0]
    assert plan[1] == stages[2]
