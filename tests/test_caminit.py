"""Flow-chained camera initialization: estimator recovery on an exact
synthetic sphere, composition into the energy, and checkpoint carry."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lasr_tpu.config import LasrConfig
from lasr_tpu.models.lasr import LasrModel
from lasr_tpu.preprocess import caminit

from test_lasr_model import S, make_batch


def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis /= np.linalg.norm(axis)
    a = np.radians(deg)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def _sphere_frame(R, size=128, radius=40.0, lift_radius=None):
    """Mask + exact flow of a rotating spherical cap under orthographic
    projection.  `lift_radius` sets the depth profile: pass the estimator's
    own std-based radius (0.7071 * mask radius for a disk) to make
    pair_rotation an exact inverse; the default (true radius) produces the
    axis-exact / magnitude-calibrated regime real silhouettes live in
    (the sqrt(2)*std radius is a flatter-than-sphere depth calibration,
    measured magnitude-unbiased on syn-dog-15)."""
    lr = radius if lift_radius is None else lift_radius
    c = np.array([size / 2, size / 2])
    yy, xx = np.mgrid[:size, :size].astype(np.float64)
    u = (xx - c[0]) / lr
    v = -(yy - c[1]) / lr                # image y down -> camera y up
    d2 = u ** 2 + v ** 2
    mask = (xx - c[0]) ** 2 + (yy - c[1]) ** 2 <= radius ** 2
    z = -np.sqrt(np.clip(1.0 - d2, 0.0, None))
    pts = np.stack([u, v, z], -1)        # [H, W, 3]
    moved = pts @ R.T
    flow = np.zeros((size, size, 2), np.float32)
    flow[..., 0] = (moved[..., 0] - pts[..., 0]) * lr
    flow[..., 1] = -(moved[..., 1] - pts[..., 1]) * lr
    return mask, flow


def _geo_deg(A, B):
    return np.degrees(np.arccos(np.clip((np.trace(A.T @ B) - 1) / 2, -1, 1)))


@pytest.mark.parametrize("axis,deg", [((0, 1, 0), 18.0), ((1, 0, 0), 12.0),
                                      ((1, 1, 0.3), 20.0)])
def test_pair_rotation_recovers_consistent_lift(axis, deg):
    """Exact inverse when the depth profile matches the estimator's lift."""
    R = _rot(axis, deg)
    mask, flow = _sphere_frame(R, lift_radius=40.0 / np.sqrt(2.0))
    R_est = caminit.pair_rotation(mask, mask, flow)
    assert _geo_deg(R, R_est) < 2.0, (axis, deg, _geo_deg(R, R_est))


def test_pair_rotation_axis_exact_under_depth_mismatch():
    """With a true-sphere depth profile the magnitude is re-calibrated but
    the rotation AXIS must stay exact (what basin capture needs)."""
    R = _rot((0, 1, 0), 18.0)
    mask, flow = _sphere_frame(R)        # true-radius lift
    R_est = caminit.pair_rotation(mask, mask, flow)
    # extract axes from the skew parts
    def axis_of(M):
        w = np.array([M[2, 1] - M[1, 2], M[0, 2] - M[2, 0],
                      M[1, 0] - M[0, 1]])
        return w / np.linalg.norm(w)
    cos = abs(axis_of(R) @ axis_of(R_est))
    assert cos > 0.999, cos


def test_chain_composition():
    R = _rot((0, 1, 0), 15.0)
    mask, flow = _sphere_frame(R, lift_radius=40.0 / np.sqrt(2.0))
    masks = np.stack([mask, mask, mask]).astype(np.float32)
    flows = np.stack([flow, flow])
    Rs = caminit.chain_rotations(masks, flows)
    assert np.allclose(Rs[0], np.eye(3))
    assert _geo_deg(Rs[1], R) < 3.0
    assert _geo_deg(Rs[2], R @ R) < 5.0
    # chain entries are valid rotations
    for Ri in Rs:
        assert np.allclose(Ri @ Ri.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(Ri) > 0.9


def _with_frameid(batch):
    batch = dict(batch)
    batch["frameid"] = jnp.asarray([0, 1], jnp.int32)
    return batch


def test_init_cameras_cluster_near_chain():
    """With a chain, the root head gets a rest bias so every (frame, hypo)
    camera starts NEAR the chain estimate (moderate spread) — without it,
    normalize(gaussian) would start roots at uniform random rotations and
    the composition would destroy the init."""
    cfg = LasrConfig(img_size=S, subdivide=1, num_epochs=10, use_pallas=False,
                     sigval=1e-3, n_bones=3, n_hypo=4, symmetric=True)
    chained = LasrModel(cfg, cam_chain=np.stack([np.eye(3)] * 2))
    base = LasrModel(cfg)
    batch = _with_frameid(make_batch(0))

    def root_angles(model):
        codes = model.predict_codes(model.init_params, batch["input_imgs"])
        M = np.asarray(codes["rotmat"])[:, :, 0]      # [2b, H, 3, 3]
        tr = np.trace(M, axis1=-2, axis2=-1)
        return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))

    a_chained = root_angles(chained)
    a_base = root_angles(base)
    # deviation from the chain (= from identity, chain is I here): tight
    # for the chained parametrization, near-uniform (median ~120 deg)
    # without it
    assert a_chained.mean() < 30.0, a_chained
    assert a_chained.max() < 60.0, a_chained
    assert a_base.mean() > 60.0, a_base
    # exploration around the chain comes from the pose-noise annealing
    # (~20 deg early in every epoch), not the init spread


def test_nontrivial_chain_changes_cameras_and_stays_finite():
    cfg = LasrConfig(img_size=S, subdivide=1, num_epochs=10, use_pallas=False,
                     sigval=1e-3, n_bones=3, n_hypo=2, symmetric=True)
    chain = np.stack([np.eye(3), _rot((0, 1, 0), 40.0)]).astype(np.float32)
    batch = _with_frameid(make_batch(0))
    rng = jax.random.PRNGKey(0)
    base = LasrModel(cfg)
    chained = LasrModel(cfg, cam_chain=chain)
    l0, a0 = base.loss_fn(base.init_params, batch, rng,
                          jnp.asarray(0), jnp.asarray(0))
    l1, a1 = chained.loss_fn(chained.init_params, batch, rng,
                             jnp.asarray(0), jnp.asarray(0))
    assert np.isfinite(float(l1))
    # frame 1's camera moved, so the rendered masks must differ
    assert not np.allclose(np.asarray(a0["mask_pred"])[1],
                           np.asarray(a1["mask_pred"])[1], atol=1e-4)


def test_checkpoint_carries_chain(tmp_path):
    from lasr_tpu.training import checkpoint as ckpt

    cfg = LasrConfig(img_size=S, subdivide=1, use_pallas=False,
                     n_bones=1, n_hypo=1, symmetric=True)
    chain = np.stack([np.eye(3, dtype=np.float32),
                      _rot((0, 1, 0), 25.0).astype(np.float32)])
    model = LasrModel(cfg, cam_chain=chain)
    path = os.path.join(tmp_path, "pred_net_test.npz")
    ckpt.save_checkpoint(path, model.init_params, model, np.zeros(1))
    _, meta = ckpt.load_raw(path)
    np.testing.assert_allclose(meta["__cam_chain"], chain, atol=1e-6)


def test_compose_flow_translations_add():
    """Composing two constant translation flows sums the displacements."""
    h = w = 32
    f01 = np.zeros((h, w, 2), np.float32)
    f01[..., 0] = 3.0
    f12 = np.zeros((h, w, 2), np.float32)
    f12[..., 1] = -2.0
    f02 = caminit._compose_flow(f01, f12)
    np.testing.assert_allclose(f02[..., 0], 3.0, atol=1e-5)
    np.testing.assert_allclose(f02[..., 1], -2.0, atol=1e-5)


def test_chain_rotations_averaged_valid_and_consistent():
    """On consistent-lift synthetic frames the averaged chain returns valid
    rotations matching the adjacent-only chain (whose estimates are exact
    there, so averaging must not degrade them)."""
    size, radius = 128, 40.0
    lr = np.sqrt(2.0) * radius / 2.0       # estimator's std-based radius
    steps = [_rot((0, 1, 0), 10.0), _rot((1, 0, 0), 8.0),
             _rot((0, 1, 0), 12.0)]
    masks, flows = [], []
    R = np.eye(3)
    for Rrel in steps + [None]:
        mask, flow = _sphere_frame(np.eye(3), size, radius, lift_radius=lr)
        masks.append(mask)
        if Rrel is None:
            break
        # flow of THIS frame's pixels under the next relative rotation
        _, f = _sphere_frame(Rrel, size, radius, lift_radius=lr)
        flows.append(f)
        R = Rrel @ R
    masks = np.stack(masks).astype(np.float32)
    flows = np.stack(flows)

    chain = caminit.chain_rotations(masks, flows)
    avg = caminit.chain_rotations_averaged(masks, flows, skips=(1, 2),
                                           sweeps=5)
    for Ra in avg:
        np.testing.assert_allclose(Ra @ Ra.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(Ra) > 0.99
    for Rc, Ra in zip(chain, avg):
        assert _geo_deg(Rc, Ra) < 8.0      # no degradation vs the chain


def test_close_chain_exact_closure():
    """A drifting chain whose true closure is identity gets its endpoints
    corrected: close_chain(chain, R_c) must make R_c @ chain[-1] = chain[0]
    and leave chain[0] = I (gauge frame) unchanged."""
    # a chain with injected per-step drift about a fixed object axis
    steps = [_rot((0, 1, 0), 20.0) @ _rot((1, 0, 0), 3.0) for _ in range(8)]
    chain = [np.eye(3)]
    for Rrel in steps:
        chain.append(Rrel @ chain[-1])
    chain = np.stack(chain)
    # closure measurement: last frame really coincides with the first
    R_c = chain[0] @ chain[-1].T @ _rot((0, 0, 1), 0.0)
    # perturb the measurement away from perfection to mimic estimation
    R_c = _rot((0, 1, 0), 1.5) @ R_c
    closed = caminit.close_chain(chain, R_c)
    np.testing.assert_allclose(closed[0], chain[0], atol=1e-9)
    # residual after correction is zero: R_c @ closed[-1] == closed[0]
    assert _geo_deg(R_c @ closed[-1], closed[0]) < 1e-6
    for R in closed:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) > 0.99


def test_detect_closure_rejects_inconsistent_flow():
    """Frames with no real correspondence (random textures) must fail the
    fw/bw consistency gate and return None."""
    rng = np.random.RandomState(0)
    a = rng.randint(0, 255, (96, 96, 3), np.uint8)
    b = rng.randint(0, 255, (96, 96, 3), np.uint8)
    mask = np.zeros((96, 96), bool)
    mask[24:72, 24:72] = True
    assert caminit.detect_closure(a, b, mask, mask) is None


def test_detect_closure_accepts_identical_frames():
    """A trivially consistent pair (same image) passes the gate and yields
    a near-identity rotation."""
    img = np.zeros((96, 96, 3), np.uint8)
    import cv2
    cv2.circle(img, (48, 48), 30, (200, 180, 160), -1)
    cv2.circle(img, (38, 40), 8, (90, 60, 30), -1)
    mask = np.zeros((96, 96), bool)
    ys, xs = np.mgrid[0:96, 0:96]
    mask[(ys - 48) ** 2 + (xs - 48) ** 2 < 30 ** 2] = True
    R = caminit.detect_closure(img, img.copy(), mask, mask)
    assert R is not None
    assert _geo_deg(R, np.eye(3)) < 5.0
