"""Scanned-epoch training path (single-device + 2-device mesh, CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "database/DAVIS/JPEGImages/Full-Resolution/syn-spot3f")
pytestmark = pytest.mark.skipif(not os.path.isdir(FIXTURE),
                                reason="run scripts/render_syn.py first")

from lasr_tpu.config import LasrConfig
from lasr_tpu.training.trainer import Trainer


def cfg_for(tmp_path, **kw):
    base = dict(name="t", checkpoint_dir=str(tmp_path), dataname="spot3",
                img_size=64, subdivide=1, batch_size=1, num_epochs=1,
                use_pallas=False, sigval=1e-3, n_bones=2, n_hypo=1)
    base.update(kw)
    return LasrConfig(**base)


@pytest.mark.slow
def test_epoch_scan_runs(tmp_path):
    os.chdir(REPO)
    tr = Trainer(cfg_for(tmp_path))
    tr.reinit_bones()
    before = np.asarray(tr.params["mean_v"]).copy()
    ids_all = jnp.asarray(np.zeros((4, 1), np.int64))
    p, s, scals, nscore, images = tr.epoch_scan(
        tr.params, tr.opt_state, tr.dev_arrays, ids_all,
        jnp.asarray(0, jnp.int32), jnp.asarray(0),
        jnp.asarray(0, jnp.int32), tr.knobs())
    assert scals["total_loss"].shape == (4,)
    assert np.isfinite(np.asarray(scals["total_loss"])).all()
    assert nscore.shape == (1,)
    # params actually moved
    assert np.abs(np.asarray(p["mean_v"]) - before).max() > 0
    # step-0 image panels rode along in the carry
    assert images["mask_pred"].shape == (2, 1, 64, 64)
    assert float(jnp.abs(images["texture_render"]).max()) > 0


@pytest.mark.slow
def test_epoch_scan_sharded(tmp_path):
    os.chdir(REPO)
    assert jax.device_count() >= 2
    tr = Trainer(cfg_for(tmp_path, ngpu=2))
    tr.reinit_bones()
    from lasr_tpu.parallel import put_sharded_schedule
    ids_all = put_sharded_schedule(np.zeros((3, 2), np.int64), tr.mesh)
    p, s, scals, nscore, images = tr.epoch_scan(
        tr.params, tr.opt_state, tr.dev_arrays, ids_all,
        jnp.asarray(0, jnp.int32), jnp.asarray(0),
        jnp.asarray(0, jnp.int32), tr.knobs())
    assert np.isfinite(np.asarray(scals["total_loss"])).all()
    assert jax.tree_util.tree_leaves(p)[0].sharding.is_fully_replicated
