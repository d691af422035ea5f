"""The LASR energy, TPU-style: one jit-able function from parameters and a
frame-pair batch to (total_loss, aux).

Parity target: ref:nnutils/mesh_net.py LASR.forward (:152-556) — CNN camera /
bone prediction -> pose-noise annealing -> GMM skinning -> LBS -> soft
renders (flow fw/bw + texture) -> 8 loss groups.  All of the reference's
per-(frame, hypothesis) Python loss loops (:384-441) are batched masked
reductions here; the training-path SoftRenderer calls (flow fw, flow bw,
texture) collapse into ONE 9-channel Pallas rasterization per frame — the
per-(pixel, face) rasterizer work is texture-independent, so rendering all
three vertex-attribute sets in one pass does ~1/3 the work.

Deliberate non-ports, each inert in the reference:
  * the silhouette render with detached body rotation (:340-345) is dead code
    there — mask_pred actually comes from the texture render's alpha (:358);
  * bone_rot_l1 / bone_trans_l1 (:483-486) are computed but never added to
    total_loss;
  * the part-color render (:368-370) is TensorBoard-only; the trainer renders
    it outside the jitted step.

Batch layout: arrays are [2b, ...] with the first b entries = first frames
and the last b = second frames of each pair (the reference permutes to this
order at :154-156).  Hypotheses are an explicit axis [2b, H, ...].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LasrConfig
from ..ops import geometry, quat as quat_ops
from ..ops.chamfer import chamfer, chamfer_distance_mean
from ..ops.dt import grid_sample_border
from ..ops.laplacian import MeshTopology, arap_loss, flatten_loss, laplacian_loss
from ..ops.point_mesh import point_mesh_face_distance
from ..ops.rasterize import RasterizeConfig, soft_rasterize
from . import mesh as mesh_mod
from .encoder import CodePredictor, Encoder, create_nets
from .perceptual import PerceptualLoss

sg = jax.lax.stop_gradient


def reg_decay(step, max_steps, min_wt, max_wt):
    """Exponential weight decay schedule (ref:nnutils/mesh_net.py:106-113);
    traced-scalar friendly."""
    cur = jnp.exp(step / max_steps * (math.log(min_wt) - math.log(max_wt))) * max_wt
    return jnp.where(step > max_steps, min_wt, cur)


class LasrModel:
    """Holds static per-stage state (topology, modules, raster configs) and
    provides the pure loss function over (params, batch, ...)."""

    def __init__(self, cfg: LasrConfig, seed: int | None = None,
                 mean_shape: np.ndarray | None = None,
                 faces: np.ndarray | None = None,
                 tex_init: np.ndarray | None = None,
                 n_frames: int | None = None,
                 cam_chain: np.ndarray | None = None):
        self.cfg = cfg
        # flow-chained per-frame camera pre-rotations [n_frames, 3, 3]
        # (preprocess/caminit.py); None = reference behavior
        self.cam_chain = None if cam_chain is None \
            else np.asarray(cam_chain, np.float32)
        # init-time randomness is all host numpy — construction must not
        # touch the accelerator (see create_nets)
        ss = np.random.SeedSequence(cfg.seed if seed is None else seed)
        s_net, s_tex, s_pnet = (int(c.generate_state(1)[0])
                                for c in ss.spawn(3))

        # ---- mesh template -------------------------------------------------
        if faces is not None:
            # externally supplied (stage transition after remeshing)
            assert mean_shape is not None
            self.faces = faces.astype(np.int32)
            verts0 = mean_shape.astype(np.float32)
            self.sym = None
            if cfg.symmetric:
                raise ValueError("custom meshes are only used in asymmetric stages")
            n_param_verts = len(verts0)
            mean_v0 = verts0[None]
        elif cfg.symmetric:
            sym = mesh_mod.symmetric_icosphere(cfg.subdivide, cfg.symidx)
            self.sym = sym
            self.faces = sym.faces.astype(np.int32)
            verts0 = sym.verts
            n_param_verts = sym.num_indept + sym.num_sym
            mean_v0 = sym.verts[None, :n_param_verts]
        else:
            verts0, faces0 = mesh_mod.icosphere(cfg.subdivide)
            self.sym = None
            self.faces = faces0.astype(np.int32)
            n_param_verts = len(verts0)
            mean_v0 = verts0[None]

        self.num_verts = len(verts0)
        self.initial_full_shape = verts0
        self.topology = MeshTopology.build(self.faces, self.num_verts)

        # ---- networks -------------------------------------------------------
        # with a camera chain the root head parametrizes a deviation from
        # identity (rest bias 8), so composed cameras start near the chain;
        # the bias is part of the parametrization and must match across
        # stages — gating on chain presence keeps it consistent, since the
        # chain itself persists through checkpoints
        (self.encoder, self.code_predictor), net_params = create_nets(
            s_net, cfg.img_size, cfg.nz_feat, cfg.n_bones, cfg.n_hypo,
            root_quat_bias=8.0 if self.cam_chain is not None else 0.0)
        self.perceptual = PerceptualLoss(s_pnet)

        # ---- parameters (host numpy; the trainer device-puts them) ----------
        H, K = cfg.n_hypo, cfg.n_bones
        params = dict(net_params)
        params["mean_v"] = np.tile(np.asarray(mean_v0, np.float32), (H, 1, 1))
        if tex_init is not None:
            params["tex"] = np.asarray(tex_init, np.float32)
        else:
            # ref: tex ~ N(0, 1), sigmoid applied at use (ext_nnutils/mesh_net.py:96)
            n_tex = n_param_verts if (cfg.symmetric and cfg.symmetric_texture) \
                else self.num_verts
            tex_rng = np.random.RandomState(s_tex & 0x7FFFFFFF)
            params["tex"] = np.repeat(
                tex_rng.standard_normal((1, n_tex, 3)).astype(np.float32), H, 0)
        if K > 1:
            params["ctl_rs"] = np.tile(
                np.asarray([0.0, 0, 0, 1], np.float32), (H, K - 1, 1))
            params["rest_ts"] = np.zeros((H, K - 1, 3), np.float32)
            params["ctl_ts"] = np.zeros((H, K - 1, 3), np.float32)
            params["log_ctl"] = np.zeros((H, K - 1, 3), np.float32)
        if cfg.frame_code and n_frames is not None:
            # per-frame camera codes: independent random directions with a
            # large fixed norm, so each (frame, hypothesis) camera head
            # starts at a near-independent rotation (the diversity the
            # reference gets from pretrained per-frame features) and stays
            # individually optimizable.  Seeded like warmup_encoder's
            # targets for comparability.
            code_rng = np.random.RandomState(cfg.seed + 7)
            codes = code_rng.standard_normal(
                (n_frames, cfg.nz_feat)).astype(np.float32)
            codes *= cfg.frame_code_norm / np.maximum(
                np.linalg.norm(codes, axis=1, keepdims=True), 1e-6)
            params["frame_code"] = codes
        self.init_params = params

        # ---- rasterizer configs ----------------------------------------------
        # flow + texture renders: sigma = sigval, gamma = 1e-2
        # (ref:nnutils/mesh_net.py:136-145,312-316).  The three per-frame
        # renders (flow fw, flow bw, texture) share sigma/gamma and geometry,
        # so they run as ONE 9-channel rasterization: own-frame coords (0:3,
        # black bg), other-frame coords (3:6, black bg), RGB (6:9, white bg).
        self.merged_raster = RasterizeConfig(
            image_size=cfg.img_size, sigma=cfg.sigval, gamma=1e-2,
            background=(0.0,) * 6 + (1.0,) * 3)
        self.part_raster = RasterizeConfig(
            image_size=cfg.img_size, sigma=1e-4, gamma=1e-4)

    # ------------------------------------------------------------------
    # parameter-space helpers
    # ------------------------------------------------------------------
    def symmetrize(self, v):
        """[H, Np, 3] half-mesh params -> [H, V, 3] full mesh
        (ref:third_party/ext_nnutils/mesh_net.py:128-149)."""
        if self.sym is None:
            return v
        flip = jnp.asarray([1.0, 1, 1]).at[self.cfg.symidx].set(-1.0)
        left = v[:, self.sym.num_indept:] * flip
        out = jnp.concatenate([v, left], 1)
        return out.at[:, :self.sym.num_indept, self.cfg.symidx].set(0.0)

    def symmetrize_color(self, t):
        if self.sym is None or not self.cfg.symmetric_texture:
            return t
        return jnp.concatenate([t, t[:, self.sym.num_indept:]], 1)

    # host (numpy) twins — init/checkpoint paths must not dispatch device ops
    def symmetrize_host(self, v: np.ndarray) -> np.ndarray:
        if self.sym is None:
            return v
        flip = np.ones(3, np.float32)
        flip[self.cfg.symidx] = -1.0
        out = np.concatenate([v, v[:, self.sym.num_indept:] * flip], 1)
        out[:, :self.sym.num_indept, self.cfg.symidx] = 0.0
        return out

    def symmetrize_color_host(self, t: np.ndarray) -> np.ndarray:
        if self.sym is None or not self.cfg.symmetric_texture:
            return t
        return np.concatenate([t, t[:, self.sym.num_indept:]], 1)

    def mean_shape(self, params):
        """(pred_v [H, V, 3], tex_rgb [H, V, 3] post-sigmoid)."""
        pred_v = self.symmetrize(params["mean_v"])
        tex = jax.nn.sigmoid(self.symmetrize_color(params["tex"]))
        return pred_v, tex

    # ------------------------------------------------------------------
    # camera / bone prediction
    # ------------------------------------------------------------------
    def predict_codes(self, params, input_imgs, frameid=None):
        """input_imgs [2b, 3, S, S] (ImageNet-normalized) -> raw codes.

        When per-frame camera codes are enabled (cfg.frame_code), the
        learnable embedding for each frame id is added to the CNN features
        before the heads."""
        feat = self.encoder.apply(params["encoder"],
                                  input_imgs.transpose(0, 2, 3, 1))
        if frameid is not None and "frame_code" in params:
            feat = feat + params["frame_code"][frameid]
        return self.code_predictor.apply(params["code_predictor"], feat)

    # ------------------------------------------------------------------
    # the energy
    # ------------------------------------------------------------------
    def loss_fn(self, params, batch, rng, epoch, iters, knobs=None):
        """knobs: optional dict of TRACED scalar overrides for annealing
        hyperparameters ("noise_base", "rscale", "flow_rampup").  Threading
        them as runtime arguments (instead of baking cfg constants into the
        HLO) lets every sweep configuration share one compiled epoch
        program — a stage-0 recompile costs minutes on a tunneled TPU.
        knobs["pnet"] likewise carries the frozen perceptual-net weights as
        a traced pytree (see PerceptualLoss.__call__)."""
        cfg = self.cfg
        if knobs is None:
            knobs = {}
        noise_base = knobs.get("noise_base", cfg.noise_base)
        rscale = knobs.get("rscale", cfg.rscale)
        flow_rampup = knobs.get("flow_rampup", float(cfg.flow_rampup))
        pnet = knobs.get("pnet")
        H, K, S = cfg.n_hypo, cfg.n_bones, cfg.img_size
        n2 = batch["imgs"].shape[0]      # 2b
        b = n2 // 2
        V = self.num_verts
        F = len(self.faces)
        faces = jnp.asarray(self.faces)

        cams = batch["cams"]             # [2b, 7] (fl, tx, ty, qw, qx, qy, qz)
        pp_crop = batch["pp"]            # [2b, 2] crop offsets (pixels)
        occ = batch["occ"]               # [2b, S, S]
        masks = batch["masks"]           # [2b, S, S]
        imgs = batch["imgs"]             # [2b, 3, S, S]

        codes = self.predict_codes(params, batch["input_imgs"],
                                   batch.get("frameid"))

        # -- intrinsics fixup for the crop (ref :204-217)
        scale = cams[:, :1] * codes["scale"]                    # [2b, H]
        depth = codes["depth"].at[:, 0].mul(cams[:, 0])         # [2b, K]
        trans = codes["trans"]                                   # [2b, K, 2]
        ppoint = codes["ppoint"]                                 # [2b, 2]
        ppb = cams[:, :1] * pp_crop / (S / 2.0)
        ppa1 = ppoint[:b] + ppb[:b] + 1.0
        ppa2 = ppa1 * (cams[b:, :1] / cams[:b, :1])
        ppoint = jnp.concatenate([ppoint[:b], ppa2 - ppb[b:] - 1.0], 0)

        M = codes["rotmat"]                                      # [2b, H, K, 3, 3]

        # -- flow-chained camera init: pre-rotate the root by the per-frame
        # chain (cfg.cam_init, preprocess/caminit.py).  v_cam = M_pred
        # (R_chain v_obj): the heads learn a correction in chain-camera
        # space, starting at the chain estimate instead of near-identity.
        if self.cam_chain is not None:
            chain = jnp.asarray(self.cam_chain)[batch["frameid"]]  # [2b,3,3]
            M = M.at[:, :, 0].set(M[:, :, 0] @ chain[:, None])

        # -- pose-noise annealing (ref :220-235).  The full gate, including
        # iters > 1, is exact parity: ref:nnutils/mesh_net.py:220 reads
        # `if opts.noise and self.epoch>0 and self.iters<100 and self.iters>1`.
        k_q, k_s = jax.random.split(rng)
        decay = noise_base * jnp.power(1e-4, iters / 100.0)
        apply_noise = (jnp.asarray(cfg.noise)
                       & (epoch > 0) & (iters < 100) & (iters > 1))
        nq = quat_ops.random_quat_wxyz(k_q, n2 * H * K)
        nq = quat_ops.scale_quat_toward_identity(
            nq, jnp.full((n2 * H * K,), 1.0) * decay)
        noise_rot = quat_ops.quat_to_rotmat_wxyz(nq).reshape(n2, H, K, 3, 3)
        M = jnp.where(apply_noise, M @ noise_rot, M)
        s_noise = jnp.exp(decay * jax.random.normal(k_s, scale.shape) * rscale)
        scale = jnp.where(apply_noise, scale * s_noise, scale)

        # -- ground-truth camera override (ref :240-253)
        if cfg.use_gtpose:
            assert H == 1, "use_gtpose assumes a single hypothesis"
            pred_codes = dict(M=M, scale=scale, trans=trans, ppoint=ppoint,
                              depth=depth)
            scale = 10.0 * cams[:, :1]                           # [2b, 1]
            gtq_xyzw = jnp.concatenate([cams[:, 4:7], cams[:, 3:4]], -1)
            gtM = quat_ops.quat_to_rotmat_xyzw(quat_ops.normalize(gtq_xyzw))
            M = jnp.broadcast_to(gtM[:, None, None], (n2, H, K, 3, 3))
            trans = trans.at[:, 0].set(cams[:, 1:3])
            depth = depth.at[:, 0].set(batch["depth_gt"])
            halforisize = 0.5 * S / cams[:, :1]
            ppoint = (0.5 * batch["oriimg_shape"] - pp_crop) / halforisize - 1.0

        # -- body / part transforms (column convention; see ops/geometry.py)
        body_rot = M[:, :, 0]                                    # [2b, H, 3, 3]
        body_trans = jnp.concatenate(
            [trans[:, 0], depth[:, :1]], -1)[:, None].repeat(H, 1)  # [2b, H, 3]

        pred_v, tex_rgb = self.mean_shape(params)                # [H, V, 3]

        if K > 1:
            ctl_rot = quat_ops.quat_to_rotmat_xyzw(
                quat_ops.normalize(params["ctl_rs"]))            # [H, K-1, 3, 3]
            skin = geometry.gmm_skinning_weights(
                sg(pred_v), params["ctl_ts"], ctl_rot, params["log_ctl"])
            # [H, K-1, V] -> [2b, H, K-1, V]
            skin_b = jnp.broadcast_to(skin[None], (n2, H, K - 1, V))

            part_rot = jnp.swapaxes(M[:, :, 1:], -1, -2)         # [2b, H, K-1, 3, 3]
            part_t_raw = jnp.concatenate(
                [trans[:, 1:], depth[:, 1:, None]], -1)[:, None].repeat(H, 1)
            pivots = jnp.broadcast_to(params["rest_ts"][None],
                                      (n2, H, K - 1, 3))
            part_rot_f = part_rot.reshape(n2 * H, K - 1, 3, 3)
            _, part_trans_f = geometry.bone_transforms_about_pivots(
                part_rot_f, part_t_raw.reshape(n2 * H, K - 1, 3),
                pivots.reshape(n2 * H, K - 1, 3))
            part_trans = part_trans_f.reshape(n2, H, K - 1, 3)
        else:
            skin_b = part_rot = part_trans = None

        def transform(to_cam: bool):
            vb = jnp.broadcast_to(pred_v[None], (n2, H, V, 3)).reshape(-1, V, 3)
            out = geometry.obj_to_cam(
                vb,
                body_rot.reshape(-1, 3, 3),
                body_trans.reshape(-1, 3),
                None if K == 1 else part_rot.reshape(-1, K - 1, 3, 3),
                None if K == 1 else part_trans.reshape(-1, K - 1, 3),
                None if K == 1 else skin_b.reshape(-1, K - 1, V),
                to_cam=to_cam)
            return out.reshape(n2, H, V, 3)

        verts_cam = transform(True)       # camera-space vertices
        deform_v = transform(False)       # deformed, camera-invariant

        scale_f = scale.reshape(-1)                           # [2b*H]
        pp_f = ppoint[:, None].repeat(H, 1).reshape(-1, 2)    # [2b*H, 2]
        proj = geometry.pinhole_project(
            verts_cam.reshape(-1, V, 3), pp_f, scale_f).reshape(n2, H, V, 3)

        # dynamic near/far over the whole batch (ref :304-311)
        z = verts_cam[..., 2]
        dmin, dmax = z.min(), z.max()
        near = dmin - (dmax - dmin) / 2
        far = dmax + (dmax - dmin) / 2

        yflip = jnp.asarray([1.0, -1.0, 1.0])
        raster_geom = (proj * yflip).reshape(n2 * H, V, 3)

        # ---- merged flow + texture render (ref :318-335, :348-363) ----
        # The reference rasterizes each frame's mesh three times: with its own
        # camera-space coords as texture (flow src), with the other frame's
        # coords (flow dst), and with RGB.  The per-(pixel, face) rasterizer
        # work is texture-independent, so one 9-channel render per frame
        # replaces all three (6bH mesh rasterizations -> 2bH).
        pos0 = verts_cam[:b].reshape(b * H, V, 3)
        pos1 = verts_cam[b:].reshape(b * H, V, 3)
        own = jnp.concatenate([pos0, pos1], 0)                # [2bH, V, 3]
        oth = jnp.concatenate([pos1, pos0], 0)
        tex_b = jnp.broadcast_to(tex_rgb[None], (n2, H, V, 3)).reshape(-1, V, 3)
        mtex = jnp.concatenate([own, oth, tex_b], -1)         # [2bH, V, 9]
        # (measured: consuming the kernel's channel-last layout here ADDS a
        # third [2bH, S, S, 10] layout copy — XLA already places the two
        # channel-first copies optimally for the mixed consumers, r5 profile)
        mimg = self._raster(raster_geom, faces, mtex, self.merged_raster,
                            near, far)                        # [2bH, 10, S, S]
        src = mimg[:, 0:3].transpose(0, 2, 3, 1)              # [2bH, S, S, 3]
        dst = mimg[:, 3:6].transpose(0, 2, 3, 1)
        texture_render = mimg[:, 6:9].reshape(n2, H, 3, S, S)
        mask_pred = mimg[:, 9].reshape(n2, H, S, S)
        fgmask_tex = mask_pred

        bgmask = (src[..., 2] < 1e-9) | (dst[..., 2] < 1e-9)  # [2bH, S, S]
        src = jnp.where(bgmask[..., None], 10.0, src)
        dst = jnp.where(bgmask[..., None], 10.0, dst)

        def px_project(v, pp, fl):
            # v [2bH, S, S, 3]; pp [2bH, 2]; fl [2bH]
            x = pp[:, None, None, 0] + v[..., 0] * fl[:, None, None] / v[..., 2]
            y = pp[:, None, None, 1] + v[..., 1] * fl[:, None, None] / v[..., 2]
            return jnp.stack([x, y], -1)

        pp0, pp1 = pp_f[: b * H], pp_f[b * H:]
        fl0, fl1 = scale_f[: b * H], scale_f[b * H:]
        src_px = px_project(src, jnp.concatenate([pp0, pp1]),
                            jnp.concatenate([fl0, fl1]))
        dst_px = px_project(dst, jnp.concatenate([pp1, pp0]),
                            jnp.concatenate([fl1, fl0]))
        flow_rd = dst_px - sg(src_px)                         # [2bH, S, S, 2]
        flow_rd = jnp.where(bgmask[..., None], sg(flow_rd), flow_rd)
        flow_rd = flow_rd.reshape(n2, H, S, S, 2)
        bgmask = bgmask.reshape(n2, H, S, S)

        # ================= losses =================
        occ_valid = (occ != 0).astype(jnp.float32)            # [2b, S, S]
        fg = (masks > 0).astype(jnp.float32)

        def masked_mean(x, m, axes):
            return (x * m).sum(axes) / jnp.maximum(m.sum(axes), 1.0)

        # 1) silhouette (ref :373-390)
        mask_sub = 0.5 * masked_mean((mask_pred - masks[:, None]) ** 2,
                                     occ_valid[:, None], (2, 3))   # [2b, H]
        total = mask_sub.mean()
        aux = {"mask_loss": mask_sub.mean()}

        # 2) flow (ref :392-416)
        flow_obs = batch["flow"][:, :2].transpose(0, 2, 3, 1)     # [2b, S, S, 2]
        fmask = ((~bgmask) & (occ_valid[:, None] > 0)
                 & (fg[:, None] > 0)).astype(jnp.float32)          # [2b, H, S, S]
        # sqrt(x+eps): torch.norm has zero subgradient at 0; plain jnp sqrt
        # would NaN on exact-zero residuals (masked border pixels)
        flow_err = jnp.sqrt(((flow_rd - flow_obs[:, None]) ** 2).sum(-1) + 1e-24)
        w_flow = jax.nn.sigmoid(-occ)[:, None]                     # [2b, 1, S, S]
        denom = masked_mean(jnp.broadcast_to(w_flow, fmask.shape)
                            .reshape(n2, -1), fmask.reshape(n2, -1), 1)
        w_flow = w_flow / jnp.maximum(denom, 1e-12)[:, None, None, None]
        flow_sub = 0.5 * masked_mean(flow_err * w_flow, fmask, (2, 3))
        flow_sub = jnp.where(fmask.sum((2, 3)) == 0, 0.0, flow_sub)
        # stage-0 flow ramp (flow_rampup > 0): early flow residuals are
        # dominated by shape error and their camera gradient points toward
        # the static basin; let the silhouette term drive the camera search
        # first and phase the flow term in over the first epochs.
        flow_w = jnp.where(
            jnp.asarray(flow_rampup) > 0,
            jnp.clip(epoch / jnp.maximum(jnp.asarray(flow_rampup, jnp.float32),
                                         1e-6), 0.0, 1.0),
            1.0)
        total += flow_w * flow_sub.mean()
        aux["flow_rd_loss"] = flow_sub.mean()

        # 3) texture (ref :418-447)
        if cfg.opt_tex:
            img_obs = imgs * fg[:, None]
            img_rnd = texture_render * fgmask_tex[:, :, None]
            img_white = (1.0 - fg[:, None]) + img_obs
            l1a = masked_mean(jnp.abs(img_obs[:, None] - img_rnd).mean(2),
                              occ_valid[:, None], (2, 3))
            l1b = masked_mean(jnp.abs(img_white[:, None] - texture_render).mean(2),
                              occ_valid[:, None], (2, 3))
            tex_sub = (l1a + l1b) * 2.0 * cfg.l1tex_wt              # [2b, H]
            obspair = jnp.concatenate([
                jnp.broadcast_to(img_obs[:, None], img_rnd.shape).reshape(-1, 3, S, S),
                jnp.broadcast_to(img_white[:, None], img_rnd.shape).reshape(-1, 3, S, S),
            ], 0)
            rndpair = jnp.concatenate([img_rnd.reshape(-1, 3, S, S),
                                       texture_render.reshape(-1, 3, S, S)], 0)
            percept = self.perceptual(2 * obspair - 1, 2 * rndpair - 1,
                                      params=pnet)
            tex_sub = tex_sub + 0.005 * percept.reshape(2, n2, H).sum(0)
            tex_sub = 0.25 * tex_sub
            total += tex_sub.mean()
        else:
            tex_sub = jnp.zeros((n2, H))
        aux["texture_loss"] = tex_sub.mean()

        # 4) shape smoothness (ref :449-459)
        H_glob = cfg.n_hypo_global or H
        factor = (1.0 if H_glob > 1
                  else reg_decay(epoch, cfg.num_epochs, 0.05, 0.5))
        tri = (0.005 * laplacian_loss(pred_v, self.topology)
               * (4 ** cfg.subdivide) / 64.0
               + 5e-4 * flatten_loss(pred_v, self.topology)
               * (2 ** cfg.subdivide) / 8.0) * factor              # [H]
        total += tri.mean()
        aux["triangle_loss"] = tri.mean()

        # soft symmetry when the mesh itself is not constrained (ref :461-478)
        if (not cfg.symmetric) and cfg.symmetric_loss:
            mirror = jnp.asarray([-1.0, 1, 1])
            pa = pred_v                                            # [H, V, 3]
            pb = pa * mirror
            total += point_mesh_face_distance(pa, faces, pb)
            total += point_mesh_face_distance(pb, faces, pa)
            if cfg.opt_tex:
                pa0 = sg(pred_v[:1])
                _, _, idx1, _ = chamfer(pa0, pa0 * mirror)
                tex_raw = params["tex"][0]
                total += jnp.abs(sg(tex_raw[idx1[0]]) - tex_raw).mean() * 1e-3

        # 5) deformation (ref :480-497)
        if K > 1:
            lmotion = factor * jnp.sqrt(
                ((deform_v - pred_v[None]) ** 2).sum(-1) + 1e-24).mean(-1)  # [2b, H]
            total += lmotion.mean()
            aux["lmotion_loss"] = lmotion.mean()
            arap = arap_loss(deform_v[:b].reshape(-1, V, 3),
                             deform_v[b:].reshape(-1, V, 3),
                             self.topology) * (4 ** cfg.subdivide) / 64.0
            total += arap.mean()
            aux["arap_loss"] = arap.mean()

        # 6) bone symmetry (ref :499-503)
        if K > 1 and cfg.symmetric_loss:
            pa = params["ctl_ts"]                                  # [H, K-1, 3]
            total += 0.1 * chamfer_distance_mean(pa, pa * jnp.asarray([-1.0, 1, 1])).mean()

        # 7) camera loss (ref :505-522)
        if cfg.use_gtpose:
            cam_loss = quat_ops.geodesic_distance(
                M.reshape(-1, 3, 3), pred_codes["M"].reshape(-1, 3, 3)).mean()
            cam_loss += jnp.abs(pred_codes["scale"] - scale).mean()
            cam_loss += jnp.abs(pred_codes["trans"] - trans).mean()
            cam_loss += jnp.abs(pred_codes["depth"] - depth).mean()
            cam_loss += jnp.abs(pred_codes["ppoint"] - ppoint).mean()
            cam_loss = 0.2 * cam_loss
        else:
            cam_loss = 0.001 * quat_ops.geodesic_distance(
                M[:b].reshape(-1, 3, 3), M[b:].reshape(-1, 3, 3)).mean()
            if K > 1:
                cam_loss += 0.01 * jnp.abs(trans[:b, 1:] - trans[b:, 1:]).mean()
                cam_loss += 0.01 * jnp.abs(depth[:b, 1:] - depth[b:, 1:]).mean()
        total += cam_loss
        aux["cam_loss"] = cam_loss

        # 8) aux: camera pull + bone-in-silhouette barrier (ref :524-530)
        total += 0.02 * jax.nn.relu(2.0 - body_trans[..., 2]).mean()
        if K > 1:
            # transforms detached; gradients reach rest_ts / ctl_ts only via
            # the explicit vertex argument, as in the reference (:285-288,
            # obj_to_cam(rest_ts, Rmat.detach(), Tmat.detach(), ...)).
            def part_apply_sg(pts):
                return jnp.einsum("bhkij,bhkj->bhki", sg(part_rot), pts,
                                  precision="highest") + sg(part_trans)
            joints = part_apply_sg(pivots)                         # [2b, H, K-1, 3]
            ctl = jnp.broadcast_to(params["ctl_ts"][None], pivots.shape)
            ctl_cam_local = part_apply_sg(ctl)
            def to_screen(pts):
                flat = pts.reshape(n2 * H, K - 1, 3)
                cam = geometry.rigid_transform(
                    flat, sg(body_rot).reshape(-1, 3, 3),
                    sg(body_trans).reshape(-1, 3))
                return geometry.pinhole_project(cam, sg(pp_f), sg(scale_f))
            jp = to_screen(joints)[..., :2]                        # [2bH, K-1, 2]
            cp = to_screen(ctl_cam_local)[..., :2]
            aux = {**aux, "ctl_proj": cp.reshape(n2, H, K - 1, 2),
                   "skin": skin}                                   # [H, K-1, V]
            ddts = batch["ddts_barrier"][:, None].repeat(H, 1).reshape(n2 * H, S, S)
            bone_loc = 0.1 * grid_sample_border(ddts, jp).mean()
            ctl_loc = 0.1 * grid_sample_border(ddts, cp).mean()
            total += 100.0 * (bone_loc + ctl_loc)
            aux["bone_loc_loss"] = bone_loc + ctl_loc

        aux["total_loss"] = total
        # hypothesis score uses the same flow weighting as the energy
        # (ref:nnutils/mesh_net.py:545 with flow_w == 1)
        aux["current_nscore"] = (tex_sub.mean(0) + flow_w * flow_sub.mean(0)
                                 + mask_sub.mean(0))               # [H]
        aux["mask_pred"] = mask_pred
        aux["flow_rd"] = flow_rd
        aux["vis_mask"] = fmask
        aux["texture_render"] = texture_render
        aux["mask_sub"] = mask_sub
        aux["flow_sub"] = flow_sub
        aux["tex_sub"] = tex_sub
        # screen-space geometry for host-side vis (part render happens on the
        # CPU backend in the trainer, ref:nnutils/mesh_net.py:368-370)
        aux["verts_pre"] = raster_geom.reshape(n2, H, V, 3)
        return total, aux

    # ------------------------------------------------------------------
    def _raster(self, verts, faces, textures, rcfg, near, far,
                channel_last=False):
        """Gather + rasterize [N, V, 3] meshes sharing one face table."""
        N = verts.shape[0]
        fv = verts[:, faces]                  # [N, F, 3, 3]
        ft = textures[:, faces]               # [N, F, 3, 3]
        use_pallas = self.cfg.use_pallas
        if use_pallas is None:
            force_ref, interp = False, None
        elif use_pallas:
            force_ref, interp = False, False
        else:
            force_ref, interp = True, None
        return soft_rasterize(fv, ft, rcfg,
                              jnp.broadcast_to(near, (N,)),
                              jnp.broadcast_to(far, (N,)),
                              force_ref=force_ref, interpret=interp,
                              channel_last=channel_last)

    # ------------------------------------------------------------------
    def eval_codes(self, params, input_imgs):
        """Inference path (ref :199-200): returns the raw predicted codes."""
        return self.predict_codes(params, input_imgs)
