"""Per-video optimization driver (the reference's LASRTrainer,
ref:nnutils/train_utils.py:87-360, rebuilt TPU-style).

Key differences from the reference, by design:
  * the whole step (gather batch -> energy -> grads -> clip -> AdamW update)
    is one jitted XLA program; batches are device gathers from the
    materialized video arrays (no host dataloader);
  * data parallelism is SPMD: batches are sharded over a `data` mesh axis and
    XLA inserts the gradient reductions (replacing DDP/NCCL,
    ref:optimize.py:42-47); the k-means bone re-init is deterministic and
    replicated, removing the rank-0 broadcast (ref:train_utils.py:252-256);
  * the reference's OneCycleLR(anneal='linear', final_div_factor=1/25) is,
    numerically, a linear warmup from max_lr/25 to max_lr over 1% of a
    200-epoch horizon followed by a constant max_lr — implemented as exactly
    that.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax

from ..config import LasrConfig
from ..data.video import VideoDataset, decode_device_arrays, gather_batch
from ..models.lasr import LasrModel
from ..utils.kmeans import kmeans
from . import checkpoint as ckpt

FAST_PARAMS = ("mean_v", "tex", "ctl_rs", "rest_ts", "ctl_ts", "log_ctl")


def make_optimizer(cfg: LasrConfig, steps_per_epoch: int):
    """AdamW with 50x learning rate on the shape/texture/bone parameters
    (ref:nnutils/train_utils.py:205-225)."""
    total_horizon = 200 * steps_per_epoch
    warmup = max(int(0.01 * total_horizon), 1)

    def sched(base):
        return optax.join_schedules(
            [optax.linear_schedule(base / 25.0, base, warmup),
             optax.constant_schedule(base)], [warmup])

    def make(base_lr):
        return optax.adamw(sched(base_lr), b1=0.9, b2=0.999,
                           weight_decay=1e-4)

    def label(params):
        return {k: ("fast" if k in FAST_PARAMS else "base") for k in params}

    return optax.multi_transform(
        {"base": make(cfg.learning_rate), "fast": make(50 * cfg.learning_rate)},
        label)


def clip_and_guard(grads):
    """Reference gradient hygiene (ref:nnutils/train_utils.py:282-291):
    per-parameter clip of mean_v to norm 1, global clip of the CNN + heads to
    norm 10, and a zero-all-grads guard if any gradient is non-finite."""
    g = dict(grads)
    meanv_norm = jnp.sqrt((g["mean_v"] ** 2).sum())
    g["mean_v"] = g["mean_v"] * jnp.minimum(1.0, 1.0 / jnp.maximum(meanv_norm, 1e-12))

    cam = {k: g[k] for k in ("encoder", "code_predictor")}
    leaves = jax.tree_util.tree_leaves(cam)
    cam_norm = jnp.sqrt(sum((l ** 2).sum() for l in leaves))
    cam_scale = jnp.minimum(1.0, 10.0 / jnp.maximum(cam_norm, 1e-12))
    for k in ("encoder", "code_predictor"):
        g[k] = jax.tree.map(lambda x: x * cam_scale, g[k])

    flat = jax.flatten_util.ravel_pytree(g)[0]
    finite = jnp.isfinite(flat).all()
    g = jax.tree.map(lambda x: jnp.where(finite, x, 0.0), g)
    return g, meanv_norm, cam_norm, finite


class Trainer:
    def __init__(self, cfg: LasrConfig, configs_dir: str = "configs",
                 dataset=None, dev_arrays=None):
        """dataset/dev_arrays: pass a previous stage's VideoDataset and its
        uploaded device arrays to skip re-preprocessing and re-uploading the
        video between stages of one process (pipeline.py).  Only valid when
        (dataname, img_size, sil_path) are unchanged — the caller checks."""
        self.cfg = cfg
        self.dataset = dataset if dataset is not None else \
            VideoDataset(cfg, configs_dir)
        # Upload the compact wire dtypes (uint8 images, f16 flow/occ/DT,
        # bool masks — ~4x fewer bytes through the 3-5 MB/s tunnel), then
        # decode to float32 ON DEVICE, once, outside the training scan.
        # Keeping compact dtypes resident was measured at +40 ms/step (66
        # vs 26): the per-step gathers from sub-word arrays run as async
        # DMA that saturates HBM and stalls the rasterizer custom-calls.
        self.dev_arrays = dev_arrays if dev_arrays is not None else \
            jax.jit(decode_device_arrays)(
                {k: jnp.asarray(v) for k, v in
                 self.dataset.device_arrays_compact().items()})

        # model construction, with checkpoint surgery for stage transitions
        n_frames = int(max(self.dataset.meta["id0"].max(),
                           self.dataset.meta["id1"].max())) + 1
        cam_chain = self._build_cam_chain(n_frames)
        patch = None
        if cfg.model_path:
            mean_shape, faces, patch = ckpt.load_with_surgery(cfg.model_path, cfg)
            if not cfg.symmetric:
                self.model = LasrModel(cfg, mean_shape=mean_shape, faces=faces,
                                       n_frames=n_frames, cam_chain=cam_chain)
            else:
                self.model = LasrModel(cfg, n_frames=n_frames,
                                       cam_chain=cam_chain)
        else:
            self.model = LasrModel(cfg, n_frames=n_frames,
                                   cam_chain=cam_chain)
        self.params = self.model.init_params
        if cfg.pretrained_dir:
            self._load_pretrained(cfg.pretrained_dir)
        if patch is not None:
            self.params = ckpt.apply_patch(self.params, patch)

        steps_per_epoch = len(self.dataset.epoch_schedule(
            np.random.RandomState(0), cfg.batch_size, cfg.ngpu))
        self.optimizer = make_optimizer(cfg, steps_per_epoch)
        # opt_state is built eagerly on the host CPU (zeros_like over ~170
        # leaves — per-op dispatch to a tunneled TPU costs seconds), then
        # params + opt_state move to the accelerator in ONE device_put.
        # init_params are host numpy, so this also creates fresh device
        # buffers — required because the scanned epoch donates them.
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            opt_state = self.optimizer.init(self.params)
        # keep the host-side param tree: the pre-training save("0") snapshots
        # from it directly, avoiding a device->host read that would queue
        # behind the (slow, tunneled) initial upload of the video arrays
        self._host_params = jax.tree.map(np.asarray, self.params)
        self.mesh = build_mesh(cfg)
        self.epoch_nscore = np.zeros(cfg.n_hypo, np.float32)
        if cfg.start_epoch > 0 and cfg.model_path:
            # mid-stage resume: restore the hypothesis scores accumulated by
            # the interrupted run so selection dynamics continue seamlessly
            _, meta = ckpt.load_raw(cfg.model_path)
            if meta.get("__epoch_nscore") is not None and \
                    len(meta["__epoch_nscore"]) == cfg.n_hypo:
                self.epoch_nscore = np.asarray(
                    meta["__epoch_nscore"], np.float32).copy()
            # restore optimizer moments + schedule counts so a supervisor
            # restart continues the true Adam trajectory (same stage only:
            # shape mismatches mean a stage transition -> fresh moments)
            opt_keys = sorted(k for k in meta if k.startswith("__opt_leaf_"))
            if opt_keys:
                leaves, treedef = jax.tree_util.tree_flatten(opt_state)
                saved = [meta[k] for k in opt_keys]
                if len(saved) == len(leaves) and all(
                        s.shape == l.shape for s, l in zip(saved, leaves)):
                    opt_state = jax.tree_util.tree_unflatten(
                        treedef, [s.astype(l.dtype)
                                  for s, l in zip(saved, leaves)])
                    print("resume: optimizer state restored "
                          f"({len(saved)} leaves)")
                else:
                    print("resume: optimizer state in checkpoint does not "
                          "match this stage; starting with fresh moments")
        # placement must match the step program's mesh: arrays committed to
        # a single device conflict with a multi-device shard_map inside jit
        # ("incompatible devices for jitted computation")
        self.params, self.opt_state = jax.device_put(
            (self.params, opt_state), self._rest_sharding())
        # frozen perceptual-net weights ride along as a knobs argument (one
        # upload here, zero per-dispatch cost) instead of as HLO constants:
        # embedded, they were 39 of the epoch executable's 41 MB, and every
        # stage re-shipped + re-constant-folded them (97 s first dispatch
        # on the tunneled chip even on a persistent-cache hit)
        self._pnet_dev = jax.device_put(self.model.perceptual.params,
                                        self._rest_sharding())
        self._build_step()
        from concurrent.futures import ThreadPoolExecutor
        self._save_pool = ThreadPoolExecutor(max_workers=1,
                                             thread_name_prefix="ckpt_save")
        # image-panel logging gets its own single worker: a slow panel
        # render/transfer must not delay checkpoint persistence (and the
        # single-writer-thread-per-kind ordering keeps tensorboardX usage
        # effectively serialized per stream)
        self._img_pool = ThreadPoolExecutor(max_workers=1,
                                            thread_name_prefix="img_log")
        self._save_futures = []
        self._ravel_fn = None
        self._ravel_opt_fn = None
        self._pack_fn = None
        self.log = None
        if cfg.checkpoint_dir:
            os.makedirs(cfg.save_dir, exist_ok=True)
            with open(os.path.join(cfg.save_dir, "opts.log"), "w") as f:
                for k, v in vars(cfg).items():
                    f.write(f"{k}: {v}\n")

    # ------------------------------------------------------------------
    def _build_cam_chain(self, n_frames: int):
        """Per-frame camera pre-rotations for cfg.cam_init (or inherited
        from the previous stage's checkpoint).  Host-side, deterministic."""
        cfg = self.cfg
        if cfg.cam_init == "flow_chain":
            from ..preprocess.caminit import chain_for_sequence
            datapath = self.dataset.seq.datapath.rstrip("/")
            seqdir = os.path.basename(datapath)
            davis_root = datapath.split("/JPEGImages")[0]
            chain = chain_for_sequence(davis_root, seqdir)
            if len(chain) < n_frames:   # missing trailing flow: hold last
                pad = np.repeat(chain[-1:], n_frames - len(chain), 0)
                chain = np.concatenate([chain, pad])
            print(f"cam_init=flow_chain: {len(chain)} per-frame rotations "
                  f"from {seqdir} silhouette/flow")
            return chain[:n_frames].astype(np.float32)
        if cfg.cam_init != "none":
            raise ValueError(f"unknown cam_init '{cfg.cam_init}'")
        if cfg.model_path:
            _, meta = ckpt.load_raw(cfg.model_path)
            if "__cam_chain" in meta:
                return np.asarray(meta["__cam_chain"], np.float32)
        return None

    # ------------------------------------------------------------------
    def _rest_sharding(self):
        """Where params/opt_state live between steps: replicated over the
        training mesh, or the first device on the single-device path."""
        if self.mesh is None:
            return jax.devices()[0]
        from jax.sharding import NamedSharding, PartitionSpec
        return NamedSharding(self.mesh, PartitionSpec())

    def _build_step(self):
        programs = build_programs(self.cfg, self.model, self.optimizer,
                                  self.mesh)
        self.update_step = programs["update_step"]
        self.epoch_scan = programs["epoch_scan"]
        self._raw_step = programs["raw_step"]

    # ------------------------------------------------------------------
    def knobs(self):
        """Annealing hyperparameters as traced f32 scalars (see
        LasrModel.loss_fn): every sweep setting shares one compiled epoch
        program instead of baking constants into the HLO."""
        cfg = self.cfg
        return {"noise_base": jnp.asarray(cfg.noise_base, jnp.float32),
                "rscale": jnp.asarray(cfg.rscale, jnp.float32),
                "flow_rampup": jnp.asarray(float(cfg.flow_rampup),
                                           jnp.float32),
                "pnet": self._pnet_dev}

    # ------------------------------------------------------------------
    def _load_pretrained(self, directory: str):
        """Overlay converted pretrained weights (scripts/convert_weights.py):
        encoder.npz (ResNet18 trunk, ref:net_blocks.py:294 pretrained=True)
        onto params['encoder'], alexnet.npz into the perceptual loss
        (ref:nnutils/train_utils.py:121)."""
        from ..models import torch_convert as tc
        enc_path = os.path.join(directory, "encoder.npz")
        if os.path.exists(enc_path):
            tree = tc.encoder_flat_to_tree(np.load(enc_path))
            self.params["encoder"] = tc.apply_encoder_weights(
                self.params["encoder"], tree)
            print(f"loaded pretrained encoder trunk from {enc_path}")
        alex_path = os.path.join(directory, "alexnet.npz")
        if os.path.exists(alex_path):
            self.model.perceptual.load_torch_weights(alex_path)
            print(f"loaded pretrained perceptual net from {alex_path}")
        if not (os.path.exists(enc_path) or os.path.exists(alex_path)):
            raise FileNotFoundError(
                f"--pretrained_dir {directory}: no encoder.npz or alexnet.npz")

    # ------------------------------------------------------------------
    def warmup_encoder(self):
        """Self-supervised encoder feature warmup.

        Offline substitute for the reference's ImageNet-pretrained ResNet18
        trunk (ref:net_blocks.py:294): regress each unique frame's feature
        onto a fixed smooth-in-time random embedding, so different frames map
        to well-separated features before stage-0 starts.  Without separated
        features the per-frame camera heads cannot express distinct
        rotations and the optimization collapses into the static-camera
        minimum.  Runs as one jitted scan; costs seconds."""
        cfg = self.cfg
        if cfg.warmup_steps <= 0:
            return
        # per-frame normalized images, straight from the compact host layout
        from ..data.video import IMAGENET_MEAN, IMAGENET_STD
        f_imgs = self.dataset.device_arrays_compact()["f_imgs"]
        f_imgs = f_imgs.astype(np.float32) / 255.0      # uint8 on the wire
        mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(3, 1, 1)
        std = np.asarray(IMAGENET_STD, np.float32).reshape(3, 1, 1)
        frames = (f_imgs - mean) / std
        nf = frames.shape[0]

        # independent random targets with a large norm.  Rationale: with the
        # reference's pretrained trunk, per-frame codes are far apart and
        # LARGE relative to the quat head's bias (U(+-1/sqrt(nz))), so each
        # (frame, hypothesis) starts at a near-independent uniform rotation
        # — that initial camera diversity is what the 8-hypothesis selection
        # needs to find the ~120 deg inter-frame motions of spot3.  Smooth
        # low-norm targets (tried first) leave per-frame cameras correlated
        # and the optimization plateaus ~85 deg relative-rotation error.
        rng = np.random.RandomState(cfg.seed + 7)
        targets = rng.standard_normal((nf, cfg.nz_feat))
        targets *= 24.0 / np.maximum(
            np.linalg.norm(targets, axis=1, keepdims=True), 1e-6)

        enc = self.model.encoder
        opt = optax.adam(1e-4)
        imgs_d = jnp.asarray(frames.transpose(0, 2, 3, 1))
        tgt_d = jnp.asarray(targets.astype(np.float32))

        def warmup_scan(enc_params, imgs, tgt, n_steps):
            opt_state = opt.init(enc_params)

            def step(carry, _):
                p, s = carry
                def loss_fn(p):
                    feat = enc.apply(p, imgs)
                    return ((feat - tgt) ** 2).mean()
                loss, g = jax.value_and_grad(loss_fn)(p)
                up, s = opt.update(g, s, p)
                return (optax.apply_updates(p, up), s), loss
            (p, _), losses = jax.lax.scan(step, (enc_params, opt_state),
                                          None, length=n_steps)
            return p, losses

        t0 = time.time()
        new_enc, losses = jax.jit(warmup_scan, static_argnums=3)(
            self.params["encoder"], imgs_d, tgt_d, cfg.warmup_steps)
        losses = np.asarray(losses)
        self.params["encoder"] = new_enc
        self._host_params = None      # device params diverged from the mirror
        print(f"encoder warmup: {cfg.warmup_steps} steps in "
              f"{time.time() - t0:.1f}s, loss {losses[0]:.3f} -> "
              f"{losses[-1]:.3f}")

    # ------------------------------------------------------------------
    def reinit_bones(self):
        """Epoch-0 k-means bone placement (ref:nnutils/train_utils.py:243-251);
        deterministic, so every data-parallel replica computes the same."""
        cfg = self.cfg
        if cfg.n_bones <= 1:
            return
        # host-side symmetrize (no eager device ops at init time).  Use the
        # host mirror when params haven't been touched on device yet: a
        # device read here queues behind the async upload of the video
        # arrays, which takes minutes on the tunneled backend.
        if self._host_params is not None:
            mean_v = self._host_params["mean_v"]
        else:
            mean_v = np.asarray(self.params["mean_v"])
        full = self.model.symmetrize_host(np.asarray(mean_v))
        centers = np.stack([kmeans(full[h], cfg.n_bones - 1)
                            for h in range(cfg.n_hypo)])
        # device_put with an explicit device: plain jnp.asarray would create
        # UNCOMMITTED arrays, which key the executable cache differently from
        # the jit outputs fed back at epoch 1 — forcing a second ~40s compile
        # of the epoch program
        centers = np.asarray(centers, np.float32)
        new = {
            "rest_ts": centers,
            "ctl_ts": centers.copy(),
            "ctl_rs": np.tile(np.asarray([0.0, 0, 0, 1], np.float32),
                              (cfg.n_hypo, cfg.n_bones - 1, 1)),
            "log_ctl": np.ones((cfg.n_hypo, cfg.n_bones - 1, 3), np.float32),
        }
        self.params.update(jax.device_put(new, self._rest_sharding()))
        if self._host_params is not None:
            self._host_params.update({k: v.copy() for k, v in new.items()})

    # ------------------------------------------------------------------
    def _start_stall_watchdog(self):
        """Liveness monitor: the tunneled TPU backend can hang a device call
        forever (dead transport) with no exception to catch.  If no chunk
        completes within cfg.stall_timeout_s (generous enough for a cold
        multi-minute XLA compile), dump all thread stacks and exit 75 so the
        optimize.py supervisor can restart from the latest checkpoint."""
        import faulthandler
        import threading

        if self.cfg.stall_timeout_s <= 0 or getattr(self, "_watchdog", None):
            return
        self._heartbeat = time.time()

        def _watch():
            while True:
                time.sleep(30)
                stale = time.time() - self._heartbeat
                if stale > self.cfg.stall_timeout_s:
                    print(f"STALL: no training progress for {stale:.0f}s — "
                          "dumping stacks and exiting for supervisor restart",
                          flush=True)
                    faulthandler.dump_traceback(all_threads=True)
                    os._exit(75)

        self._watchdog = threading.Thread(target=_watch, daemon=True)
        self._watchdog.start()

    def _beat(self):
        self._heartbeat = time.time()

    # ------------------------------------------------------------------
    def train(self, log_images_fn=None, verbose: bool = True):
        cfg = self.cfg
        rng_np = np.random.RandomState(cfg.seed)
        seed_np = np.random.RandomState(cfg.seed + 1)
        writer = self._tb_writer()
        total_steps = 0
        self.save("0")
        self._start_stall_watchdog()

        if not cfg.model_path and not cfg.frame_code:
            self.warmup_encoder()     # no-op unless cfg.warmup_steps > 0
        for epoch in range(cfg.num_epochs):
            if epoch < cfg.start_epoch:
                # resume: consume the host RNG draws of completed epochs so
                # the remaining schedule matches an uninterrupted run
                skipped = self.dataset.epoch_schedule(rng_np, cfg.batch_size,
                                                      cfg.ngpu)
                seed_np.randint(0, 2 ** 31 - 1)
                total_steps += len(skipped)
                continue
            if epoch == 0:
                self.reinit_bones()
            optim_idx = int(np.argmax(-self.epoch_nscore))
            if verbose:
                print(f"epoch {epoch}: scores {self.epoch_nscore}, "
                      f"selecting hypothesis {optim_idx}", flush=True)
            self.epoch_nscore[:] = 0
            sched = self.dataset.epoch_schedule(rng_np, cfg.batch_size, cfg.ngpu)
            t0 = time.time()
            epoch_seed = jnp.asarray(seed_np.randint(0, 2 ** 31 - 1),
                                     jnp.int32)

            if self.mesh is not None:
                from ..parallel import put_sharded_schedule
                ids_all = put_sharded_schedule(sched, self.mesh)
            else:
                ids_all = jnp.asarray(sched)
            self._host_params = None  # device params diverge from the mirror

            # dispatch the epoch in k segments: bounds each device
            # execution's wall-clock (the tunneled worker dies ~2 min into
            # one execution) while keeping per-epoch dispatch count small.
            # Segments have length L except a shorter final remainder, so
            # every scheduled step runs (reference runs exactly the 200-step
            # replicated schedule, ref:dataloader/vid.py:78-80); the
            # remainder length is the same every epoch (n is fixed per
            # stage), so it costs one extra compile per stage, amortized by
            # the persistent cache.  The cap scales inversely with per-step
            # render count (a 16-hypothesis batch-3 step rasterizes 96
            # meshes, ~6x a spot3 stage-0 step) so heavy stages stay under
            # the deadline too.
            renders = 2 * cfg.batch_size * cfg.n_hypo
            chunk = max(8, min(self.cfg.scan_chunk, 1600 // max(renders, 1)))
            n = ids_all.shape[0]
            k = max(1, -(-n // chunk))
            L = n // k
            bounds = [(ci * L, (ci + 1) * L) for ci in range(k)]
            if k * L < n:
                bounds.append((k * L, n))
            # LASR_PHASE_TIMERS=1: per-epoch wall-clock split between device
            # execution and the host-side work around it, for perf triage
            phase_t = {"exec": 0.0, "scal": 0.0, "img": 0.0, "tb": 0.0,
                       "save": 0.0}
            _pt0 = time.time()
            scals_parts, images = [], None
            nscore_sum = np.zeros_like(self.epoch_nscore)
            for ci, (a, b) in enumerate(bounds):
                seg = ids_all[a:b]
                self.params, self.opt_state, scal_c, nscore_c, images_c = \
                    self.epoch_scan(self.params, self.opt_state,
                                    self.dev_arrays, seg, epoch_seed,
                                    jnp.asarray(epoch),
                                    jnp.asarray(a, jnp.int32),
                                    self.knobs())
                scals_parts.append(self._pack_scals(scal_c))
                nscore_sum += np.asarray(nscore_c)
                self._beat()
                if verbose and epoch == cfg.start_epoch and len(bounds) > 1:
                    # chunk-level liveness on the very first epoch, where a
                    # slow upload/compile makes progress otherwise invisible
                    print(f"    chunk {ci + 1}/{len(bounds)} done "
                          f"({time.time() - t0:.0f}s elapsed)", flush=True)
                if ci == 0:
                    images = images_c
            phase_t["exec"] = time.time() - _pt0
            # every scal leaf is scan-stacked with leading dim (segment len)
            _pt0 = time.time()
            scals = jax.tree.map(
                lambda *xs: np.concatenate([np.asarray(x) for x in xs], 0),
                *scals_parts)
            phase_t["scal"] = time.time() - _pt0
            self.epoch_nscore += nscore_sum
            _pt0 = time.time()
            # Panels only every img_log_freq epochs (plus first and last):
            # the device->host reads of the panel arrays measured 19-23 s
            # per epoch over the tunnel (round-3 phase timers) — 60-70% of
            # epoch wall-clock for a vis-only artifact.  The reference logs
            # every epoch (ref:train_utils.py:301-329) at ~zero local cost.
            f = cfg.img_log_freq
            log_imgs = f > 0 and (epoch % f == 0
                                  or epoch == cfg.num_epochs - 1)
            if writer is not None and log_imgs:
                # off the critical path: the panel reads + host part render
                # are vis-only.  The image arrays are scan OUTPUTS (never
                # donated), so the pool can read them while the next epoch
                # runs; _log_images swallows its own errors.
                self._save_futures.append(self._img_pool.submit(
                    self._log_images, writer, images, sched[0], optim_idx,
                    epoch))
            if log_images_fn is not None:
                log_images_fn(epoch, images, sched[0])
            phase_t["img"] = time.time() - _pt0

            _pt0 = time.time()
            scals = jax.tree.map(np.asarray, scals)
            if writer is not None:
                # every step, per-hypothesis detail included — host-side
                # numpy, cost is negligible (ref:train_utils.py:330-344)
                for k, v in scals.items():
                    if v.ndim == 2:            # [steps, H] per-hypo values
                        for h in range(v.shape[1]):
                            for j in range(len(v)):
                                writer.add_scalar(f"train/{k}_{h}",
                                                  float(v[j, h]),
                                                  total_steps + 1 + j)
                    else:
                        for j in range(len(v)):
                            writer.add_scalar(f"train/{k}", float(v[j]),
                                              total_steps + 1 + j)
            phase_t["tb"] = time.time() - _pt0
            total_steps += len(sched)
            if verbose:
                dt = time.time() - t0
                print(f"  epoch {epoch}: {len(sched)} steps in {dt:.1f}s "
                      f"({dt / len(sched) * 1e3:.0f} ms/step), "
                      f"loss {float(scals['total_loss'][-1]):.4f}", flush=True)
            if not bool(scals["grads_finite"].all()):
                print("  warning: non-finite gradients were zeroed this epoch")
            _pt0 = time.time()
            if (epoch + 1) % cfg.save_epoch_freq == 0:
                self.save("latest", str(epoch + 1), epochs_done=epoch + 1)
            phase_t["save"] = time.time() - _pt0
            if os.environ.get("LASR_PHASE_TIMERS"):
                print("    phase:", " ".join(f"{k}={v:.2f}s"
                                             for k, v in phase_t.items()),
                      flush=True)
        self.finish_saves()
        return self.params

    # ------------------------------------------------------------------
    def _pack_scals(self, scal_c):
        """Fetch a scalar dict as ONE device->host transfer.

        A dozen tiny leaves read individually cost a tunnel round trip
        each (~2-3 s/epoch measured); packing them into one flat f32 array
        on device makes it a single read."""
        leaves, treedef = jax.tree_util.tree_flatten(scal_c)
        if self._pack_fn is None:
            self._pack_fn = jax.jit(lambda t: jnp.concatenate(
                [jnp.ravel(x).astype(jnp.float32)
                 for x in jax.tree_util.tree_leaves(t)]))
        flat = np.asarray(self._pack_fn(scal_c))
        out, pos = [], 0
        for l in leaves:
            out.append(flat[pos: pos + l.size].reshape(l.shape)
                       .astype(l.dtype))
            pos += l.size
        return jax.tree_util.tree_unflatten(treedef, out)

    def _read_flat(self, flat_dev):
        """Chunked device->host read: one monolithic ~57MB transfer can
        wedge a tunneled TPU transport indefinitely (observed on the axon
        backend).  Each chunk read runs under a log-only slow-read monitor
        (_read_chunk): re-issuing a read concurrently aborts the runtime,
        so slow chunks are made visible but never raced."""
        CH = 1_000_000
        n = flat_dev.shape[0]
        if n > CH:
            return np.concatenate([self._read_chunk(flat_dev, a, CH)
                                   for a in range(0, n, CH)])
        return np.asarray(flat_dev)

    @staticmethod
    def _read_chunk(flat_dev, a, CH, warn_every_s=120.0):
        """Device->host read of flat_dev[a:a+CH] with a slow-read monitor.

        The axon tunnel serializes transfers: a read issued behind a large
        upload backlog (hundreds of MB of video arrays on real sequences)
        can legitimately take minutes.  A watchdog that re-issues the read
        concurrently ABORTS the runtime ('terminate called recursively'), so
        the monitor only logs, making slow reads visible without racing the
        transport."""
        import threading

        done = threading.Event()

        def _monitor():
            waited = 0.0
            while not done.wait(warn_every_s):
                waited += warn_every_s
                print(f"  checkpoint read in flight {waited:.0f}s "
                      f"(chunk @{a}) — tunnel transfer backlog; waiting",
                      flush=True)

        mon = threading.Thread(target=_monitor, daemon=True)
        mon.start()
        try:
            return np.asarray(flat_dev[a:a + CH])
        finally:
            done.set()

    def save(self, *labels: str, epochs_done: int = 0):
        """Checkpoint write with the device->host reads OFF the critical
        path: the main thread only ravels params and Adam moments into two
        fresh device buffers (cheap HBM->HBM), then the save pool performs
        the chunk-watched tunnel reads + npz writes while the next epoch's
        device work proceeds.

        Donation safety: epoch_scan donates params/opt_state, but the
        raveled flats are NEW buffers jit produced — donation never
        invalidates them.  The only donated leaves read here are the tiny
        non-f32 optimizer counters, read synchronously below.  The single
        pool worker serializes the reads against each other, and tunnel
        wedges stay covered by the chunk monitor + stall watchdog +
        optimize.py supervisor."""
        pre_training = self._host_params is not None
        nscore = self.epoch_nscore.copy()
        if pre_training:
            # params never reached the device; deep-copy the host mirror
            # (reinit_bones() may mutate it concurrently with the write)
            job = {"host_params": jax.tree.map(np.array, self._host_params)}
        else:
            leaves, treedef = jax.tree_util.tree_flatten(self.params)
            # ravel_pytree promotes all leaves to one dtype; a non-f32 leaf
            # would round-trip through float32 and silently corrupt.
            bad = [l.dtype for l in leaves if l.dtype != jnp.float32]
            assert not bad, f"non-float32 param leaves in snapshot: {bad}"
            if self._ravel_fn is None:
                self._ravel_fn = jax.jit(
                    lambda p: jax.flatten_util.ravel_pytree(p)[0])
            oleaves, _ = jax.tree_util.tree_flatten(self.opt_state)
            f32_idx = tuple(i for i, l in enumerate(oleaves)
                            if l.dtype == jnp.float32 and l.size > 0)
            if self._ravel_opt_fn is None:
                def _ravel(t):
                    ls = jax.tree_util.tree_leaves(t)
                    return jnp.concatenate([jnp.ravel(ls[i])
                                            for i in f32_idx])
                self._ravel_opt_fn = jax.jit(_ravel)
            job = {
                "flat_dev": self._ravel_fn(self.params),
                "meta": [(l.shape, l.size) for l in leaves],
                "treedef": treedef,
                "opt_flat_dev": self._ravel_opt_fn(self.opt_state),
                "opt_f32_idx": f32_idx,
                "opt_meta": [(l.shape, l.size) for l in oleaves],
                # non-f32 leaves (schedule counts) live in the donated
                # opt_state tree: read them now, they are scalars
                "opt_small": {i: np.asarray(l)
                              for i, l in enumerate(oleaves)
                              if i not in set(f32_idx)},
            }
        pending = []
        for f in self._save_futures:
            if f.done():
                f.result()  # surface background failures immediately
            else:
                pending.append(f)
        self._save_futures = pending
        self._save_futures.append(self._save_pool.submit(
            self._read_and_write, labels, job, nscore, epochs_done))

    def _read_and_write(self, labels, job, nscore, epochs_done):
        """Save-pool task: tunnel reads + checkpoint serialization."""
        if "host_params" in job:
            host_params, opt_leaves = job["host_params"], None
        else:
            flat = self._read_flat(job["flat_dev"])
            host_leaves, pos = [], 0
            for shape, size in job["meta"]:
                host_leaves.append(
                    flat[pos: pos + size].reshape(shape).astype(np.float32))
                pos += size
            host_params = jax.tree_util.tree_unflatten(job["treedef"],
                                                       host_leaves)
            oflat = self._read_flat(job["opt_flat_dev"])
            f32_set = set(job["opt_f32_idx"])
            opt_leaves, pos = [], 0
            for i, (shape, size) in enumerate(job["opt_meta"]):
                if i in f32_set:
                    opt_leaves.append(oflat[pos: pos + size].reshape(shape))
                    pos += size
                else:
                    opt_leaves.append(job["opt_small"][i])
        for label in labels:
            path = os.path.join(self.cfg.save_dir, f"pred_net_{label}.npz")
            # moments ride only on 'latest' (the resume target): numbered
            # epoch snapshots stay lean on disk
            ckpt.save_checkpoint(path, host_params, self.model, nscore,
                                 epochs_done,
                                 opt_leaves if label == "latest" else None)

    def finish_saves(self):
        for f in self._save_futures:
            f.result()
        self._save_futures = []

    def close(self):
        """Drain pending background work and stop the worker threads.
        Multi-stage drivers (pipeline.py) construct one Trainer per stage;
        without this each stage leaks its pool threads."""
        self.finish_saves()
        self._save_pool.shutdown(wait=True)
        self._img_pool.shutdown(wait=True)

    def _tb_writer(self):
        try:
            from tensorboardX import SummaryWriter
            return SummaryWriter(self.cfg.save_dir)
        except Exception:
            return None

    def _log_images(self, writer, images, ids, optim_idx, epoch):
        """TensorBoard image panels (ref:nnutils/train_utils.py:301-329):
        mask, flow, texture with projected control points, and the
        part-segmentation render (skin-colored mesh, rasterized host-side on
        the CPU backend — vis only, ref:nnutils/mesh_net.py:368-370)."""
        from ..data.flowvis import flow_to_image
        try:
            # slice on device, transfer only the selected panel: full-array
            # reads are 4-13MB each and large transfers can wedge the
            # tunneled TPU transport (see _snapshot_host)
            images = {k: v[0, optim_idx] if k not in ("skin",)
                      else v[optim_idx] for k, v in images.items()}
            mask_pred = np.asarray(images["mask_pred"])
            writer.add_image("train/mask", (255 * mask_pred).astype(np.uint8),
                             epoch, dataformats="HW")
            tex = np.asarray(images["texture_render"])
            tex_img = (255 * tex).astype(np.uint8).transpose(1, 2, 0).copy()
            if "ctl_proj" in images:
                import cv2
                from ..utils.colormap import label_colormap
                S = tex_img.shape[0]
                cp = np.asarray(images["ctl_proj"])                 # [K-1, 2]
                colors = label_colormap()
                for k in range(cp.shape[0]):
                    center = (S // 2 + S // 2 * cp[k]).astype(int)
                    cv2.circle(tex_img, tuple(center), 3,
                               colors[k % len(colors)].tolist(), 3)
            writer.add_image("train/texture", tex_img, epoch,
                             dataformats="HWC")
            vm = np.asarray(images["vis_mask"]).astype(bool)
            fr = np.asarray(images["flow_rd"])
            fr = fr * vm[..., None]
            writer.add_image("train/flowrd",
                             flow_to_image(np.concatenate(
                                 [fr, vm[..., None]], -1)).transpose(2, 0, 1),
                             epoch, dataformats="CHW")
            if "skin" in images:
                part = self._part_render(
                    np.asarray(images["verts_pre"]),
                    np.asarray(images["skin"]))
                if part is not None:
                    writer.add_image("train/part", part, epoch,
                                     dataformats="HWC")
        except Exception as e:          # vis must never kill a run
            print(f"image logging failed: {e}")

    def _part_render(self, verts_pre, skin):
        """Part-colored mesh panel via an exact host hard raster: painter's
        face-id buffer (far-to-near cv2.fillPoly) + barycentric color
        interpolation — same technique as eval_badja's flow transport
        (scripts/eval_badja.py:32), ~0.1 s vs ~20 s/epoch for the dense jnp
        soft reference this replaces.  Vis only (hard vs soft edges are
        indistinguishable in a part-segmentation panel).

        verts_pre [V, 3] screen-space (NDC xy, camera z); skin [K-1, V]
        -> [S, S, 3] uint8."""
        import cv2

        from ..utils.colormap import label_colormap
        S = self.cfg.img_size
        colors = label_colormap()[: skin.shape[0]].astype(np.float32)
        vcol = (skin[..., None] * colors[:, None]).sum(0) / 256.0   # [V, 3]
        faces = np.asarray(self.model.faces)
        # NDC -> pixel (inverse of softras_pallas._pixel_coords)
        x = (verts_pre[:, 0] * S + S - 1.0) / 2.0
        y = (S - 1.0 - verts_pre[:, 1] * S) / 2.0
        pix = np.stack([x, y], 1)
        z = verts_pre[:, 2]
        idbuf = np.full((S, S), -1, np.int32)
        tris = np.round(pix[faces]).astype(np.int32)
        for fi in np.argsort(-z[faces].mean(1)):    # far-to-near
            cv2.fillPoly(idbuf, [tris[fi]], int(fi))
        ys, xs = np.nonzero(idbuf >= 0)
        if len(xs) == 0:
            return None
        fid = idbuf[ys, xs]
        tri = pix[faces[fid]]                        # [N, 3, 2]
        v0, v1 = tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]
        p = np.stack([xs, ys], 1) - tri[:, 0]
        den = v0[:, 0] * v1[:, 1] - v0[:, 1] * v1[:, 0]
        den = np.where(np.abs(den) < 1e-12, 1e-12, den)
        w1 = (p[:, 0] * v1[:, 1] - p[:, 1] * v1[:, 0]) / den
        w2 = (v0[:, 0] * p[:, 1] - v0[:, 1] * p[:, 0]) / den
        w = np.clip(np.stack([1.0 - w1 - w2, w1, w2], 1), 0, 1)
        w /= w.sum(1, keepdims=True)
        vals = (vcol[faces[fid]] * w[:, :, None]).sum(1)
        out = np.zeros((S, S, 3), np.float32)
        out[ys, xs] = vals
        return (255 * np.clip(out, 0, 1)).astype(np.uint8)


def build_mesh(cfg: LasrConfig):
    """The training-step device mesh, or None for the single-device path.

    One 2D (data, hypo) mesh covers every parallel configuration: batches
    shard over `data` (XLA inserts the gradient all-reduce during jit
    partitioning) and stage-0 camera hypotheses shard over `hypo` (an
    explicit shard_map in parallel/hypo.py, with `data` left to the
    automatic partitioner via axis_names).  A degenerate axis of size 1
    costs nothing, so ngpu-only and hypo-only configs use the same mesh.
    """
    ndev = cfg.ngpu * cfg.hypo_shards
    if ndev <= 1:
        return None
    from jax.sharding import Mesh
    devs = jax.devices()
    assert len(devs) >= ndev, \
        f"ngpu={cfg.ngpu} x hypo_shards={cfg.hypo_shards} needs {ndev} " \
        f"devices, found {len(devs)}"
    return Mesh(np.asarray(devs[:ndev]).reshape(cfg.ngpu, cfg.hypo_shards),
                ("data", "hypo"))


def build_programs(cfg: LasrConfig, model, optimizer, mesh):
    """Compile-ready training programs (single step + scanned epoch).

    Module-level so the multi-chip dryrun (parallel/dryrun.py) exercises the
    PRODUCTION program construction — the same code path the Trainer runs —
    on a virtual mesh, not a hand-rolled imitation of it.
    """
    if cfg.hypo_shards > 1:
        # stage-0 hypothesis-parallelism: partition the n_hypo axis over
        # devices (parallel/hypo.py); grads come back in global layout
        # so the optimizer/checkpoint path is unchanged
        from ..parallel.hypo import hypo_value_and_grad
        vg = hypo_value_and_grad(cfg, mesh, model)
    else:
        vg = jax.value_and_grad(model.loss_fn, has_aux=True)

    def update_step(params, opt_state, dev_arrays, pair_ids, rng, epoch,
                    iters, knobs):
            # dev_arrays passed as an argument: closure-captured device
            # arrays would be embedded in the HLO as constants and stall
            # compilation with constant folding
            batch = gather_batch(dev_arrays, pair_ids)
            (loss, aux), grads = vg(params, batch, rng, epoch, iters, knobs)
            grads, gv, gc, finite = clip_and_guard(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            scalars = {k: aux[k] for k in aux
                       if k in ("total_loss", "mask_loss", "flow_rd_loss",
                                "texture_loss", "triangle_loss",
                                "lmotion_loss", "arap_loss", "cam_loss",
                                "bone_loc_loss")}
            scalars["grad_meanv_norm"] = gv
            scalars["grad_cam_norm"] = gc
            scalars["grads_finite"] = finite
            images = {k: aux[k] for k in
                      ("mask_pred", "flow_rd", "vis_mask", "texture_render")}
            return params, opt_state, scalars, aux["current_nscore"], images

    if mesh is not None:
        from ..parallel import shard_step
        update_step_c = shard_step(update_step, mesh)
    else:
        update_step_c = jax.jit(update_step)

    IMAGE_KEYS = ["mask_pred", "flow_rd", "vis_mask", "texture_render",
                  "verts_pre"]
    if cfg.n_bones > 1:
        IMAGE_KEYS += ["skin", "ctl_proj"]

    def epoch_scan(params, opt_state, dev_arrays, ids_all, epoch_seed,
                   epoch, iter0, knobs):
            """One XLA program per epoch SEGMENT: lax.scan over a slice of
            the step schedule.  Collapses per-step host dispatch (expensive
            on a tunneled TPU) and lets XLA keep params/optimizer state
            resident via donation.  The epoch is dispatched in bounded
            segments (train() slices the schedule) because a single
            multi-minute device execution can exceed the tunnel's worker
            deadline — observed as 'TPU worker process crashed' ~2 min into
            a 16-hypothesis full-epoch program.  `iter0` is the global step
            index of the segment's first step, so annealing (iters<100),
            nscore gating (i>100) and the i==0 image capture keep reference
            semantics across segments.  The step-0 image panels (ref logs at
            i==0) ride along as a scan carry selected at i==0.  The PRNG
            key is built from a host int INSIDE the traced program: eager
            PRNGKey/split ops at the host level each pay a tiny-program
            compile + round-trip on the tunneled backend."""
            key = jax.random.PRNGKey(epoch_seed)

            def step(carry, inp):
                params, opt_state, images = carry
                ids, i = inp
                rng = jax.random.fold_in(key, i)
                batch = gather_batch(dev_arrays, ids)
                (loss, aux), grads = vg(params, batch, rng, epoch, i, knobs)
                grads, gv, gc, finite = clip_and_guard(grads)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                scal = {k: aux[k] for k in
                        ("total_loss", "mask_loss", "flow_rd_loss",
                         "texture_loss", "triangle_loss", "cam_loss",
                         "lmotion_loss", "arap_loss", "bone_loc_loss")
                        if k in aux}
                scal["grads_finite"] = finite.astype(jnp.float32)
                scal["grad_meanv_norm"] = gv
                scal["grad_cam_norm"] = gc
                # per-hypothesis sub-losses (ref:train_utils.py:335-339)
                scal["mask_hypo"] = aux["mask_sub"].mean(0)      # [H]
                scal["flow_hypo"] = aux["flow_sub"].mean(0)
                scal["tex_hypo"] = aux["tex_sub"].mean(0)
                nscore = jnp.where(i > 100, aux["current_nscore"], 0.0)
                images = {k: jnp.where(i == 0, aux[k], images[k])
                          for k in IMAGE_KEYS}
                return (params, opt_state, images), (scal, nscore)

            n2 = 2 * ids_all.shape[1]
            H, S = cfg.n_hypo, cfg.img_size
            K, V = cfg.n_bones, model.num_verts
            images0 = {
                "mask_pred": jnp.zeros((n2, H, S, S)),
                "flow_rd": jnp.zeros((n2, H, S, S, 2)),
                "vis_mask": jnp.zeros((n2, H, S, S)),
                "texture_render": jnp.zeros((n2, H, 3, S, S)),
                "verts_pre": jnp.zeros((n2, H, V, 3)),
            }
            if K > 1:
                images0["skin"] = jnp.zeros((H, K - 1, V))
                images0["ctl_proj"] = jnp.zeros((n2, H, K - 1, 2))
            iters = iter0 + jnp.arange(ids_all.shape[0])
            (params, opt_state, images), (scals, nscores) = jax.lax.scan(
                step, (params, opt_state, images0), (ids_all, iters))
            return params, opt_state, scals, nscores.sum(0), images

    if mesh is not None:
        from ..parallel import shard_epoch_scan
        epoch_scan_c = shard_epoch_scan(epoch_scan, mesh)
    else:
        epoch_scan_c = jax.jit(epoch_scan, donate_argnums=(0, 1))
    return {"update_step": update_step_c, "epoch_scan": epoch_scan_c,
            "raw_step": update_step}
