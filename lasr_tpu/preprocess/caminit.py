"""Flow-chained camera initialization: weights-free relative-rotation
estimates from optical flow under a spherical shape proxy.

Why this exists: LASR's stage-0 camera search leans on the ImageNet-pretrained
encoder (ref:third_party/ext_nnutils/net_blocks.py:294) to give per-frame
features whose camera heads vary smoothly/distinctively along the video.  In
a weights-free build, sequences with small inter-frame motion (an orbit at
~24 deg/frame) are not identifiable from the energy alone: per-frame root
translation/scale plus LBS deformation reproduce the observed flow about as
well as the true rotations (measured: shrinking GT inter-frame rotation by
75% costs only ~0.02 flow loss on syn-dog-15), so optimization converges to
crumpled-shape/wrong-camera minima.

The fix is classical instead of learned: treat the silhouette as the outline
of a sphere, lift masked pixels onto the front hemisphere, use the observed
flow as 3D correspondence, and solve an orthogonal Procrustes problem per
adjacent pair.  Chaining the pairwise rotations gives per-frame camera
initializations that land inside the true basin, from which the energy can
refine.  No reference counterpart (the reference needs none); conventions
follow lasr_tpu/ops/geometry.py (v_cam = R v_obj + T, image x right/y down,
camera y up => image-to-camera y flip).
"""

from __future__ import annotations

import numpy as np


def _mask_moments(mask: np.ndarray):
    """Centroid (x, y) and std-based effective radius of a binary mask.

    The radius sqrt(2)*std matches a filled disk's profile; on syn-dog-15
    this estimator is magnitude-unbiased (mean est relrot 25.5 deg vs GT
    24.4) where a radial-second-moment radius under-estimated by ~35%.
    """
    ys, xs = np.nonzero(mask)
    c = np.array([xs.mean(), ys.mean()])
    r = float(np.sqrt(2.0 * np.sqrt(xs.var() * ys.var())))
    return c, r


def _lift(p_xy: np.ndarray, center: np.ndarray, radius: float):
    """Lift image points onto the front hemisphere of the proxy sphere,
    in physical (pixel-scaled) units.

    Image y grows downward; camera y grows upward, so the lifted y is
    negated.  Camera looks toward -z here, so the VISIBLE hemisphere gets
    z = -sqrt(.).  Returns [N, 3] points and an in-disk weight that fades
    at the rim (where the hemisphere assumption degrades)."""
    u = (p_xy - center) / radius
    u[:, 1] = -u[:, 1]
    d2 = (u ** 2).sum(-1)
    w = np.clip(1.0 - d2, 0.0, None)
    z = -np.sqrt(np.clip(1.0 - d2, 0.0, None))
    return np.concatenate([u, z[:, None]], -1) * radius, w


def pair_rotation(mask0: np.ndarray, mask1: np.ndarray, flow01: np.ndarray,
                  max_points: int = 4000, seed: int = 0,
                  occ01: np.ndarray | None = None,
                  irls: int = 0) -> np.ndarray:
    """Relative camera rotation R with  x1 ~ R @ x0  on the proxy sphere.

    mask0/mask1: [H, W] binary silhouettes; flow01: [H, W, 2] pixel flow
    from frame 0 to frame 1 (x, y).  Returns a 3x3 rotation in camera
    coordinates (right-handed, y up, z toward the scene).

    occ01: optional [H, W] graded fw/bw-consistency score in the VCN
    convention (preprocess/auto_gen.py:57) — pixels are pre-weighted by
    sigmoid(-occ), downweighting correspondences whose flow is unreliable
    (occlusions, boundary smear) before they enter the fit.
    irls: extra iteratively-reweighted rounds with a Tukey biweight on the
    per-point residual |R x0 - x1|, rejecting correspondences the current
    rotation cannot explain (flow outliers AND locally-bad sphere proxy).
    """
    c0, r0 = _mask_moments(mask0)
    c1, r1 = _mask_moments(mask1)
    ys, xs = np.nonzero(mask0)
    if len(xs) > max_points:
        sel = np.random.RandomState(seed).choice(len(xs), max_points,
                                                 replace=False)
        ys, xs = ys[sel], xs[sel]
    p0 = np.stack([xs, ys], -1).astype(np.float64)
    f = flow01[ys, xs, :2].astype(np.float64)
    p1 = p0 + f

    x0, w0 = _lift(p0, c0, r0)
    x1, w1 = _lift(p1, c1, r1)
    # scale-normalize each side (the object's apparent size changes with
    # depth; Procrustes here is rotation-only)
    x0, x1 = x0 / r0, x1 / r1
    w = w0 * w1
    if occ01 is not None:
        w = w / (1.0 + np.exp(occ01[ys, xs].astype(np.float64)))
    if w.sum() < 1e-6:
        return np.eye(3)

    def solve(w):
        # weighted orthogonal Procrustes: R = argmin sum w |R x0 - x1|^2
        H = (x0 * w[:, None]).T @ x1
        U, _, Vt = np.linalg.svd(H)
        d = np.sign(np.linalg.det(Vt.T @ U.T))
        return Vt.T @ np.diag([1.0, 1.0, d]) @ U.T

    R = solve(w)
    for _ in range(irls):
        res = np.linalg.norm(x0 @ R.T - x1, axis=-1)
        # Tukey biweight, scale = 1.4826 * weighted MAD (robust sigma)
        med = _weighted_median(res, w)
        sigma = 1.4826 * max(_weighted_median(np.abs(res - med), w), 1e-9)
        c = 4.685 * sigma
        t = np.clip(res / c, 0.0, 1.0)
        wr = (1.0 - t ** 2) ** 2
        if (w * wr).sum() < 1e-6:
            break
        R = solve(w * wr)
    return R


def _weighted_median(v: np.ndarray, w: np.ndarray) -> float:
    o = np.argsort(v)
    cw = np.cumsum(w[o])
    if cw[-1] <= 0:
        return float(np.median(v))
    return float(v[o][np.searchsorted(cw, 0.5 * cw[-1])])


def chain_rotations(masks: np.ndarray, flows_fw: np.ndarray,
                    max_points: int = 4000,
                    occs_fw: np.ndarray | None = None,
                    irls: int = 0) -> np.ndarray:
    """Per-frame camera rotations R_i (v_cam_i = R_i v_obj) with R_0 = I.

    masks: [N, H, W]; flows_fw: [N-1, H, W, 2] pixel flow i -> i+1;
    occs_fw: optional [N-1, H, W] graded occlusion scores for weighting.
    Chains pairwise Procrustes fits: R_{i+1} = R_rel(i->i+1) @ R_i.
    Returns [N, 3, 3].
    """
    n = masks.shape[0]
    Rs = [np.eye(3)]
    for i in range(n - 1):
        Rrel = pair_rotation(masks[i] > 0, masks[i + 1] > 0, flows_fw[i],
                             max_points=max_points,
                             occ01=None if occs_fw is None else occs_fw[i],
                             irls=irls)
        Rs.append(Rrel @ Rs[-1])
    return np.stack(Rs)


def _compose_flow(f01: np.ndarray, f12: np.ndarray) -> np.ndarray:
    """Flow 0->2 from adjacent flows: f02(p) = f01(p) + f12(p + f01(p))."""
    import cv2

    h, w = f01.shape[:2]
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    f12_at = cv2.remap(f12, xx + f01[..., 0], yy + f01[..., 1],
                       cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
    return f01 + f12_at


def _project_so3(M: np.ndarray) -> np.ndarray:
    U, _, Vt = np.linalg.svd(M)
    d = np.sign(np.linalg.det(U @ Vt))
    return U @ np.diag([1.0, 1.0, d]) @ Vt


def chain_rotations_averaged(masks: np.ndarray, flows_fw: np.ndarray,
                             max_points: int = 4000,
                             skips=(1, 2, 3), sweeps: int = 20) -> np.ndarray:
    """Rotation-averaged chain over redundant skip-pair estimates.

    MEASURED NEGATIVE RESULT (results/caminit_avg_ab.json): on pika the
    averaged chain scores 9.7 deg mean adjacent error for every skip set —
    identical to the adjacent-only chain.  The per-pair error is the
    spherical-proxy geometry mismatch, which is a function of each frame's
    POSE: skip estimates sharing a frame inherit the same mismatch, so the
    observations are correlated and averaging cannot cancel them (the same
    reason exact ORB correspondences measured no better in round 3 —
    exp/diag_pika_orb.py).  Kept as the documented form of the attempt;
    --cam_init flow_chain stays on chain_rotations.  A better chain needs
    a better shape model than a sphere — which is precisely what the
    optimization's later stages provide.
    """
    n = masks.shape[0]
    obs = {}                       # (i, j) -> R with x_j ~ R x_i
    for s in skips:
        for i in range(n - s):
            f = flows_fw[i]
            for k in range(1, s):
                f = _compose_flow(f, flows_fw[i + k])
            obs[(i, i + s)] = pair_rotation(
                masks[i] > 0, masks[i + s] > 0, f, max_points=max_points)

    # init: adjacent chain
    Rs = [np.eye(3)]
    for i in range(n - 1):
        Rs.append(obs[(i, i + 1)] @ Rs[-1])

    # iterative single-rotation averaging, frame 0 gauge-fixed to I
    for _ in range(sweeps):
        for i in range(1, n):
            acc = np.zeros((3, 3))
            for (a, b), R in obs.items():
                if b == i:
                    acc += R @ Rs[a]           # propagate a -> i
                elif a == i:
                    acc += R.T @ Rs[b]         # propagate b -> i
            if np.linalg.norm(acc) > 1e-9:
                Rs[i] = _project_so3(acc)
    return np.stack(Rs)


def _rotvec(R: np.ndarray) -> np.ndarray:
    import cv2

    v, _ = cv2.Rodrigues(np.ascontiguousarray(R, np.float64))
    return v.ravel()


def _rotmat(v: np.ndarray) -> np.ndarray:
    import cv2

    R, _ = cv2.Rodrigues(np.ascontiguousarray(v, np.float64))
    return R


def close_chain(chain: np.ndarray, R_c: np.ndarray) -> np.ndarray:
    """Distribute a loop-closure residual along a chained rotation estimate.

    chain: [N, 3, 3] chained per-frame rotations (R_0 = I); R_c: measured
    relative rotation of the closure pair, x_first ~ R_c @ x_last.  If the
    chain were drift-free, R_c @ chain[-1] = chain[0] = I.  The residual is
    distributed in the OBJECT frame (right-multiplied), proportional to the
    cumulative estimated step magnitude — measured on pika (a full orbit):
    right-frame distribution cuts gauge-aligned per-frame error 36.4 -> 22.0
    deg mean / 71 -> 35 max, where left-frame (world) distribution makes it
    WORSE (55 mean): the chain's drift lives in the object-facing axes.
    """
    n = chain.shape[0]
    steps = []
    for i in range(n - 1):
        tr = (np.trace(chain[i + 1] @ chain[i].T) - 1.0) / 2.0
        steps.append(np.degrees(np.arccos(np.clip(tr, -1.0, 1.0))))
    total = max(sum(steps), 1e-9)
    cum = np.concatenate([[0.0], np.cumsum(steps)]) / total
    # want chain[-1]' = R_c^{-1}: full-span correction D = chain[-1]^T R_c^T
    logD = _rotvec(chain[-1].T @ R_c.T)
    return np.stack([chain[i] @ _rotmat(cum[i] * logD) for i in range(n)])


def detect_closure(img_last: np.ndarray, img_first: np.ndarray,
                   mask_last: np.ndarray, mask_first: np.ndarray,
                   max_points: int = 4000):
    """Measure the wrap-pair (last -> first) rotation if the pixels support
    it.  Returns R_c (x_first ~ R_c x_last) or None.

    Orbit-style captures (the reference's synthetic sequences and many
    object-scan videos) end near where they started; the wrap pair is then
    a drift observation spanning the WHOLE chain.  Validity is decided from
    pixels alone: DIS flow last->first must pass (a) a fw/bw consistency
    gate inside the silhouette (median error < 5 px and >= 50% of pixels
    < 3 px — measured 1.6 px / 73% on pika) and (b) a photometric gate:
    warping the first frame by the flow must actually align it with the
    last (median masked gray residual < 20 levels) — without (b), a flow
    estimator shown two UNRELATED frames can return near-zero flow, which
    is trivially fw/bw consistent.  Sequences that do not loop fail the
    gates and the chain is left untouched.
    """
    import cv2

    def _flow(a, b):
        dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
        return dis.calc(cv2.cvtColor(a, cv2.COLOR_BGR2GRAY),
                        cv2.cvtColor(b, cv2.COLOR_BGR2GRAY), None)

    f = _flow(img_last, img_first)          # last -> first
    fb = _flow(img_first, img_last)         # first -> last
    h, w = f.shape[:2]
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    fb_at = cv2.remap(fb, xx + f[..., 0], yy + f[..., 1], cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REPLICATE)
    err = np.linalg.norm(f + fb_at, axis=-1)[mask_last]
    if err.size == 0 or np.median(err) >= 5.0 or np.mean(err < 3.0) < 0.5:
        return None
    g_last = cv2.cvtColor(img_last, cv2.COLOR_BGR2GRAY).astype(np.float32)
    g_first = cv2.cvtColor(img_first, cv2.COLOR_BGR2GRAY).astype(np.float32)
    g_first_at = cv2.remap(g_first, xx + f[..., 0], yy + f[..., 1],
                           cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
    if np.median(np.abs(g_last - g_first_at)[mask_last]) >= 20.0:
        return None
    return pair_rotation(mask_last, mask_first, f, max_points=max_points)


def chain_for_sequence(davis_root: str, seq: str,
                       max_points: int = 4000,
                       close_loop: bool = True) -> np.ndarray:
    """Load masks + forward flow for a DAVIS-layout sequence and chain.

    Reads Annotations/<seq>/*.png and FlowFW/<seq>/flo-*.pfm (pixel flow,
    channel 2 unused).  Returns [N, 3, 3] per-frame rotations.

    close_loop: additionally measure the last->first wrap pair from
    JPEGImages and, when its flow passes the consistency gate
    (detect_closure), distribute the accumulated drift along the chain
    (close_chain).  On pika the uncorrected chain's 360-deg orbit came
    back 122 deg from closed; the correction halves per-frame error.
    """
    import glob
    import os

    import cv2

    from ..data.pfm import read_pfm

    mask_paths = sorted(
        glob.glob(os.path.join(davis_root, "Annotations", "Full-Resolution",
                               seq, "*.png")))
    masks = np.stack([cv2.imread(p, 0) for p in mask_paths]) > 0
    flows = []
    for i in range(len(mask_paths) - 1):
        fp = os.path.join(davis_root, "FlowFW", "Full-Resolution", seq,
                          f"flo-{i:05d}.pfm")
        flo, _ = read_pfm(fp)
        h, w = masks.shape[1], masks.shape[2]
        if flo.shape[:2] != (h, w):
            # resolution mismatch (flow computed at a different size):
            # resize the field AND rescale the vectors to mask-pixel units
            sx, sy = w / flo.shape[1], h / flo.shape[0]
            flo = cv2.resize(flo, (w, h))
            flo = flo * np.asarray([sx, sy] + [1.0] * (flo.shape[-1] - 2),
                                   np.float32)
        flows.append(np.ascontiguousarray(flo[..., :2]))
    chain = chain_rotations(masks.astype(np.float32), np.stack(flows),
                            max_points=max_points)
    if close_loop and len(mask_paths) >= 3:
        img_paths = [p.replace("/Annotations/", "/JPEGImages/")
                      .rsplit(".", 1)[0] + ".jpg" for p in mask_paths]
        if os.path.exists(img_paths[0]) and os.path.exists(img_paths[-1]):
            R_c = detect_closure(cv2.imread(img_paths[-1]),
                                 cv2.imread(img_paths[0]),
                                 masks[-1], masks[0],
                                 max_points=max_points)
            if R_c is not None:
                res = chain[0] @ (R_c @ chain[-1]).T
                drift = np.degrees(np.arccos(np.clip(
                    (np.trace(res) - 1.0) / 2.0, -1.0, 1.0)))
                print(f"cam_init: loop closure detected for {seq}; "
                      f"distributing {drift:.1f} deg of chain drift")
                chain = close_chain(chain, R_c)
    return chain
