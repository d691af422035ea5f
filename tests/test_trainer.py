"""Trainer integration tests on the synthetic spot fixture (CPU, tiny)."""

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
from lasr_tpu.data.video import VideoDataset, gather_batch
from lasr_tpu.training import checkpoint as ckpt
from lasr_tpu.training.trainer import Trainer, clip_and_guard, make_optimizer


def small_cfg(tmp_path, **kw):
    base = dict(name="t", checkpoint_dir=str(tmp_path), dataname="spot3",
                img_size=64, subdivide=1, batch_size=1, num_epochs=1,
                use_pallas=False, sigval=1e-3, n_bones=2, n_hypo=2)
    base.update(kw)
    return LasrConfig(**base)


def test_dataset_loads():
    cfg = LasrConfig(dataname="spot3", img_size=64)
    os.chdir(REPO)
    ds = VideoDataset(cfg)
    # 3 frames -> 2 fw + 2 bw unique pairs
    assert len(ds.unique_pairs) == 4
    a = ds.device_arrays()
    assert a["imgs"].shape == (4, 2, 3, 64, 64)
    assert a["cams"].shape == (4, 2, 7)
    # GT cameras were read: focal = 10 / alp, quats unit-norm
    q = a["cams"][:, :, 3:7]
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-4)
    assert (a["depth_gt"] == 10.0).all()
    # masks nontrivial
    frac = a["masks"].mean()
    assert 0.2 < frac < 0.9
    # flow in crop NDC: finite, below a few units
    assert np.abs(a["flow"][:, :, :2]).max() < 5.0
    # batch layout
    batch = gather_batch({k: jnp.asarray(v) for k, v in a.items()},
                         jnp.asarray([0, 2]))
    assert batch["imgs"].shape == (4, 3, 64, 64)


@pytest.mark.slow
def test_two_steps_reduce_nothing_nan(tmp_path):
    os.chdir(REPO)
    cfg = small_cfg(tmp_path)
    tr = Trainer(cfg)
    tr.reinit_bones()
    ids = jnp.asarray([0])
    key = jax.random.PRNGKey(0)
    p, s = tr.params, tr.opt_state
    losses = []
    for i in range(3):
        p, s, scalars, nscore, _ = tr.update_step(
            p, s, tr.dev_arrays, ids, jax.random.fold_in(key, i),
            jnp.asarray(0), jnp.asarray(i), tr.knobs())
        losses.append(float(scalars["total_loss"]))
        assert bool(scalars["grads_finite"])
    assert all(np.isfinite(losses))
    assert nscore.shape == (2,)


@pytest.mark.slow
def test_checkpoint_roundtrip_and_surgery(tmp_path):
    os.chdir(REPO)
    cfg = small_cfg(tmp_path, n_bones=3, n_hypo=2)
    tr = Trainer(cfg)
    tr.reinit_bones()
    tr.epoch_nscore = np.array([5.0, 1.0], np.float32)  # hypo 1 wins
    tr.save("latest")
    tr.finish_saves()   # save() is async (writes overlap the next epoch)
    path = os.path.join(cfg.save_dir, "pred_net_latest.npz")
    assert os.path.exists(path)

    # next stage: asymmetric, 1 hypothesis, more bones
    cfg2 = small_cfg(tmp_path, symmetric=False, n_hypo=1, n_bones=4,
                     model_path=path, n_faces=80)
    tr2 = Trainer(cfg2)
    assert tr2.params["mean_v"].shape[0] == 1
    assert tr2.params["rest_ts"].shape == (1, 3, 3)
    # full shape was used (asymmetric model predicts all verts)
    assert tr2.params["mean_v"].shape[1] == tr2.model.num_verts
    # winning hypothesis's mean_v was carried over
    old = np.load(path)
    full_old = old["__full_shape"]
    np.testing.assert_allclose(np.asarray(tr2.params["mean_v"][0]), full_old,
                               atol=1e-5)
    # one step runs
    p, s, scalars, _, _ = tr2.update_step(
        tr2.params, tr2.opt_state, tr2.dev_arrays, jnp.asarray([0]),
        jax.random.PRNGKey(0), jnp.asarray(0), jnp.asarray(0), tr2.knobs())
    assert np.isfinite(float(scalars["total_loss"]))


@pytest.mark.slow
def test_data_parallel_step(tmp_path):
    os.chdir(REPO)
    assert jax.device_count() >= 2
    cfg = small_cfg(tmp_path, ngpu=2, batch_size=1, n_bones=1, n_hypo=1)
    tr = Trainer(cfg)
    from lasr_tpu.parallel import put_sharded_ids
    ids = put_sharded_ids(np.asarray([0, 1]), tr.mesh)
    p, s, scalars, nscore, _ = tr.update_step(
        tr.params, tr.opt_state, tr.dev_arrays, ids, jax.random.PRNGKey(0),
        jnp.asarray(0), jnp.asarray(0), tr.knobs())
    assert np.isfinite(float(scalars["total_loss"]))
    # params stay replicated across devices
    leaf = jax.tree_util.tree_leaves(p)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_trainer_hypo_sharded_epoch(tmp_path):
    """Trainer end-to-end with hypothesis sharding on the (data=1, hypo=2)
    mesh — the production epoch program, not a hand-rolled step.  Guards the
    round-2 regression where Trainer committed params/opt_state to a single
    device while the jitted step contained a multi-device shard_map
    ("incompatible devices for jitted computation"), and the matching
    reinit_bones device_put."""
    os.chdir(REPO)
    assert jax.device_count() >= 2
    cfg = small_cfg(tmp_path, n_hypo=2, hypo_shards=2, ngpu=1)
    tr = Trainer(cfg)
    tr.reinit_bones()          # second device_put path: must stay on-mesh
    from lasr_tpu.parallel import put_sharded_schedule
    ids_all = put_sharded_schedule(np.zeros((2, 1), np.int32), tr.mesh)
    p, s, scal, nscore, _ = tr.epoch_scan(
        tr.params, tr.opt_state, tr.dev_arrays, ids_all,
        jnp.asarray(0, jnp.int32), jnp.asarray(0),
        jnp.asarray(0, jnp.int32), tr.knobs())
    losses = np.asarray(scal["total_loss"])
    assert losses.shape == (2,) and np.isfinite(losses).all()
    assert np.asarray(nscore).shape == (2,)
    # jit may leave per-hypothesis leaves partitioned over `hypo`; the
    # invariant that matters is that the next epoch accepts the outputs
    # (in_shardings re-partition them) — the round-2 bug raised here.
    p, s, scal, *_ = tr.epoch_scan(
        p, s, tr.dev_arrays, ids_all, jnp.asarray(1, jnp.int32),
        jnp.asarray(1), jnp.asarray(2, jnp.int32), tr.knobs())
    assert np.isfinite(np.asarray(scal["total_loss"])).all()


def test_gather_batch_compact_matches_legacy(tmp_path):
    """device_arrays_compact + gather must reproduce the legacy batch up to
    the wire quantization (dedup itself is lossless; images ride as uint8,
    flow/occ/DTs as f16, and gather_batch restores float32 in-program).
    Per-key bounds are the quantization steps, NOT loose tolerances."""
    os.chdir(REPO)
    cfg = small_cfg(tmp_path)
    ds = VideoDataset(cfg, "configs")
    legacy = {k: jnp.asarray(v) for k, v in ds.device_arrays().items()}
    compact = {k: jnp.asarray(v)
               for k, v in ds.device_arrays_compact().items()}
    ids = jnp.asarray([0, 1])
    a = gather_batch(legacy, ids)
    b = gather_batch(compact, ids)
    assert set(a) == set(b)
    exact = ("frameid", "masks", "cams", "depth_gt", "pp", "oriimg_shape")
    for k in exact:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
    for k, tol in [("imgs", 0.51 / 255),           # uint8 rounding
                   ("input_imgs", 0.51 / 255 / 0.22),  # / min ImageNet std
                   ("ddts_barrier", 1e-3),         # f16 on [0, 1.4]
                   ("flow", 2e-3),                 # f16 on NDC ~[-2, 2]
                   ("occ", 0.05)]:                 # f16 on [-10, 100]
        av, bv = np.asarray(a[k]), np.asarray(b[k])
        assert np.abs(av - bv).max() <= tol, (
            f"{k}: {np.abs(av - bv).max()} > {tol}")
    # zero-sentinel semantics survive the f16 cast (occ==0 = outside crop,
    # flow[2]==0 = invalid)
    np.testing.assert_array_equal(np.asarray(a["occ"]) == 0,
                                  np.asarray(b["occ"]) == 0)
    np.testing.assert_array_equal(np.asarray(a["flow"])[:, 2] == 0,
                                  np.asarray(b["flow"])[:, 2] == 0)


@pytest.mark.slow
def test_train_chunked_and_resume(tmp_path):
    """Full train() loop with chunked epoch dispatch, then a mid-stage
    resume (start_epoch + model_path) as the optimize.py supervisor would
    relaunch it: the resumed run must pick up the saved epochs_done, keep
    the RNG schedule aligned, and finish with finite params."""
    os.chdir(REPO)
    cfg = small_cfg(tmp_path, num_epochs=2, scan_chunk=2, epoch_steps=4)
    tr = Trainer(cfg)
    tr.train(verbose=False)
    latest = os.path.join(cfg.save_dir, "pred_net_latest.npz")
    assert os.path.exists(latest)
    ck = np.load(latest)
    assert int(ck["__epochs_done"]) == 2
    # Adam moments persisted on the resume target
    opt_keys = [k for k in ck.files if k.startswith("__opt_leaf_")]
    assert opt_keys, "optimizer state missing from pred_net_latest"
    assert any(np.abs(ck[k]).max() > 0 for k in opt_keys)

    cfg2 = small_cfg(tmp_path, num_epochs=3, scan_chunk=2, epoch_steps=4,
                     start_epoch=2, model_path=latest)
    tr2 = Trainer(cfg2)
    # restored moments, not fresh zeros
    resumed = jax.tree_util.tree_leaves(tr2.opt_state)
    assert max(float(jnp.abs(l).max()) for l in resumed
               if l.dtype == jnp.float32) > 0
    tr2.train(verbose=False)
    ck2 = np.load(os.path.join(cfg2.save_dir, "pred_net_latest.npz"))
    assert int(ck2["__epochs_done"]) == 3
    assert np.isfinite(ck2["mean_v"]).all()
