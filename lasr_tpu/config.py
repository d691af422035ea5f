"""Run configuration.

Mirrors the reference's absl flags (ref:optimize.py:33-36,
ref:nnutils/train_utils.py:58-68, ref:nnutils/mesh_net.py:54-73,
ref:dataloader/vid.py:34-35) plus the per-sequence INI configs
(ref:configs/*.config)."""

from __future__ import annotations

import configparser
import dataclasses
import os


@dataclasses.dataclass
class LasrConfig:
    # experiment / io
    name: str = "exp_name"
    checkpoint_dir: str = "log"
    model_path: str = ""
    dataname: str = "spot3"
    sil_path: str = "none"
    save_epoch_freq: int = 1
    # TB image panels every k epochs (always epoch 0 and the last epoch).
    # The reference logs panels every epoch (ref:train_utils.py:301-329) but
    # pays ~nothing for it on a local GPU; over the tunneled TPU the panel
    # device->host reads measured 19-23 s/epoch (60-70% of epoch wall,
    # round-3 phase timers), so the default here is sparse.
    img_log_freq: int = 5
    seed: int = 0

    # optimization
    num_epochs: int = 1000
    learning_rate: float = 1e-4
    batch_size: int = 8          # frame pairs per device
    ngpu: int = 1                # data-parallel devices
    hypo_shards: int = 1         # SPMD shards over the hypothesis axis
    # set by the hypothesis-sharding wrapper on the per-shard model so
    # global-H-dependent behavior (regularizer decay gating) is preserved
    # when the local n_hypo is a slice; 0 = use n_hypo
    n_hypo_global: int = 0

    # model / topology
    img_size: int = 256
    nz_feat: int = 200
    subdivide: int = 3
    symidx: int = 0
    n_bones: int = 1
    n_faces: int = 1280
    n_hypo: int = 1
    symmetric: bool = True
    symmetric_loss: bool = True
    symmetric_texture: bool = True
    # accepted for reference CLI parity but inert: the reference plumbs
    # only_mean_sym into num_output without consuming it for LASR
    # (ref:third_party/ext_nnutils/mesh_net.py:80-123)
    only_mean_sym: bool = False
    opt_tex: bool = True
    texture: bool = True

    # energy knobs
    use_gtpose: bool = False
    noise: bool = True
    rscale: float = 1.0
    # epoch-start pose-noise magnitude (ref:nnutils/mesh_net.py:222 uses
    # 0.2); exposed as a runtime knob for annealing experiments
    noise_base: float = 0.2
    l1tex_wt: float = 1.0
    sigval: float = 1e-4

    # encoder feature warmup (offline substitute for the reference's
    # ImageNet-pretrained trunk, ref:net_blocks.py:294 pretrained=True):
    # a short self-supervised phase that separates per-frame features
    # before stage-0 optimization.  0 = off.
    warmup_steps: int = 0
    # max steps per scanned-epoch dispatch: bounds one device execution's
    # wall-clock (long executions can exceed the tunneled worker's deadline)
    scan_chunk: int = 66
    # optimizer steps per epoch x batch x ngpu (the reference's 200-step
    # replication, ref:dataloader/vid.py:78-80); lower only for smoke tests
    epoch_steps: int = 200
    # resume: first epoch to run (earlier epochs' RNG draws are consumed so
    # the schedule matches an uninterrupted run); set by the optimize.py
    # supervisor from the checkpoint's __epochs_done on restart
    start_epoch: int = 0
    # liveness: exit(75) if no chunk completes for this long (0 = disabled)
    stall_timeout_s: float = 1200.0

    # per-frame learnable camera codes: a [n_frames, nz_feat] embedding
    # added to the encoder features.  Guarantees well-separated per-frame
    # features at init (what the reference gets from its pretrained trunk)
    # and decouples per-frame camera optimization from the shared CNN —
    # gradients can move one frame's camera without dragging the others.
    frame_code: bool = False
    frame_code_norm: float = 24.0

    # stage-0 flow-loss ramp: epochs until the flow term reaches full
    # weight (0 = off, reference behavior).  Early in stage 0 the flow
    # residual is dominated by shape error and its gradient pulls camera
    # rotations toward the static basin; the mask term ranks camera
    # hypotheses correctly from the start (measured on spot3).
    flow_rampup: int = 0

    # directory of converted pretrained weights (scripts/convert_weights.py):
    # encoder.npz overlays the ResNet trunk, alexnet.npz the perceptual net.
    pretrained_dir: str = ""

    # camera initialization: "flow_chain" pre-rotates each frame's root
    # camera by a rotation chained from silhouette+flow Procrustes fits
    # (preprocess/caminit.py).  Weights-free substitute for the camera
    # coherence the reference inherits from its pretrained encoder; on
    # small-inter-frame-motion sequences the energy alone cannot identify
    # cameras (deformation absorbs the motion).  "none" = reference
    # behavior.  Later stages inherit the chain from the checkpoint.
    cam_init: str = "none"

    # runtime
    n_data_workers: int = 1
    use_pallas: bool | None = None   # None = auto (TPU yes, CPU interpret off)

    @property
    def save_dir(self) -> str:
        return os.path.join(self.checkpoint_dir, self.name)


@dataclasses.dataclass
class SequenceConfig:
    """Per-sequence data descriptor (ref:configs/spot3.config)."""
    datapath: str
    dframe: int = 1
    init_frame: int = 0
    end_frame: int = -1
    can_frame: int = 0

    @staticmethod
    def load(path: str) -> "SequenceConfig":
        cp = configparser.RawConfigParser()
        if not cp.read(path):
            raise FileNotFoundError(path)
        d = cp["data"]
        return SequenceConfig(
            datapath=str(d["datapath"]),
            dframe=int(d["dframe"]),
            init_frame=int(d["init_frame"]),
            end_frame=int(d["end_frame"]),
            can_frame=int(d["can_frame"]),
        )

    @staticmethod
    def load_name(dataname: str, configs_dir: str = "configs") -> "SequenceConfig":
        return SequenceConfig.load(os.path.join(configs_dir, f"{dataname}.config"))
