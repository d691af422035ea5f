"""Per-video optimization entry point (parity-shaped with ref:optimize.py).

Usage mirrors the reference:
  python optimize.py --name=spot3-0 --checkpoint_dir log --dataname spot3 \
      --n_bones 21 --n_hypo 8 --num_epochs 5 --batch_size 1 --opt_tex yes

Distributed launch flags (--local_rank, torch.distributed) are gone: data
parallelism is SPMD inside one process (--ngpu N shards batches over N
devices of the jax mesh).
"""

from __future__ import annotations

import faulthandler
import signal
import sys

import os

# `kill -USR1 <pid>` dumps all thread stacks — the TPU tunnel can wedge a
# device->host transfer indefinitely, and this makes such stalls diagnosable
# without killing the run.
faulthandler.register(signal.SIGUSR1, all_threads=True)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# the container pre-imports jax (sitecustomize), so JAX_PLATFORMS from the
# environment is ignored; LASR_PLATFORM=cpu forces a hermetic CPU run
if os.environ.get("LASR_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["LASR_PLATFORM"])

from absl import app, flags

from lasr_tpu.config import LasrConfig
from lasr_tpu.training.trainer import Trainer

flags.DEFINE_string("name", "exp_name", "Experiment Name")
flags.DEFINE_string("checkpoint_dir", "log", "Root directory for output files")
flags.DEFINE_string("model_path", "", "load model path")
flags.DEFINE_string("dataname", "spot3", "name of the sequence config")
flags.DEFINE_string("sil_path", "none", "additional silhouette path")
flags.DEFINE_integer("num_epochs", 1000, "Number of epochs to train")
flags.DEFINE_float("learning_rate", 1e-4, "learning rate")
flags.DEFINE_integer("batch_size", 8, "frame pairs per device")
flags.DEFINE_integer("ngpu", 1, "number of data-parallel devices")
flags.DEFINE_integer("hypo_shards", 1,
                     "SPMD shards over the camera-hypothesis axis "
                     "(stage-0 scaling: n_hypo must divide evenly)")
flags.DEFINE_integer("save_epoch_freq", 1, "save model every k epochs")
flags.DEFINE_integer("img_log_freq", 5,
                     "TB image panels every k epochs (0 = never; epoch 0 "
                     "and the final epoch are always logged)")
flags.DEFINE_integer("img_size", 256, "image size")
flags.DEFINE_integer("nz_feat", 200, "Encoded feature size")
flags.DEFINE_integer("subdivide", 3, "icosphere subdivisions")
flags.DEFINE_integer("symidx", 0, "symmetry axis: 0-x 1-y 2-z")
flags.DEFINE_integer("n_bones", 1, "number of bones (incl. body)")
flags.DEFINE_string("n_faces", "1280", "target faces for remeshing")
flags.DEFINE_integer("n_hypo", 1, "number of camera hypotheses")
flags.DEFINE_boolean("symmetric", True, "symmetric mesh parametrization")
flags.DEFINE_boolean("symmetric_loss", True, "use symmetry losses")
flags.DEFINE_boolean("only_mean_sym", False, "only the mean shape is symmetric")
flags.DEFINE_string("opt_tex", "yes", "optimize texture")
flags.DEFINE_boolean("use_gtpose", False, "use GT cameras (camera still trained)")
flags.DEFINE_boolean("noise", True, "pose-noise annealing")
flags.DEFINE_float("rscale", 1.0, "scale noise variance")
flags.DEFINE_float("noise_base", 0.2, "epoch-start pose-noise magnitude "
                   "(ref:nnutils/mesh_net.py:222)")
flags.DEFINE_float("l1tex_wt", 1.0, "weight of L1 texture loss")
flags.DEFINE_float("sigval", 1e-4, "rasterizer blur sigma")
flags.DEFINE_integer("seed", 0, "rng seed")
flags.DEFINE_integer("scan_chunk", 66,
                     "max steps per scanned-epoch device dispatch")
flags.DEFINE_integer("warmup_steps", 0,
                     "encoder feature-warmup steps before stage optimization "
                     "(offline substitute for an ImageNet-pretrained trunk)")
flags.DEFINE_string("pretrained_dir", "",
                    "directory of converted pretrained weights "
                    "(scripts/convert_weights.py: encoder.npz, alexnet.npz)")
flags.DEFINE_boolean("frame_code", False,
                     "learnable per-frame camera codes added to the encoder "
                     "features (offline substitute for pretrained per-frame "
                     "feature diversity)")
flags.DEFINE_float("frame_code_norm", 24.0, "init norm of per-frame codes")
flags.DEFINE_string("cam_init", "none",
                    "per-frame camera initialization: none | flow_chain "
                    "(silhouette+flow Procrustes chain, preprocess/caminit.py)")
flags.DEFINE_integer("flow_rampup", 0,
                     "epochs until the flow loss reaches full weight "
                     "(0 = always full weight, reference behavior)")
flags.DEFINE_integer("local_rank", 0, "ignored (single-process SPMD)")
flags.DEFINE_integer("start_epoch", 0,
                     "resume: first epoch to run (set by the supervisor)")
flags.DEFINE_integer("max_retries", 2,
                     "restart a crashed/stalled run from the latest "
                     "checkpoint up to this many times (0 = no supervisor)")
flags.DEFINE_float("stall_timeout_s", 1200.0,
                   "exit for supervisor restart if no training progress "
                   "for this long (0 = disabled)")
flags.DEFINE_string("profile_dir", "", "capture a jax.profiler trace of the "
                    "first epoch into this directory")

FLAGS = flags.FLAGS


def config_from_flags() -> LasrConfig:
    return LasrConfig(
        name=FLAGS.name,
        checkpoint_dir=FLAGS.checkpoint_dir,
        model_path=FLAGS.model_path,
        dataname=FLAGS.dataname,
        sil_path=FLAGS.sil_path,
        num_epochs=FLAGS.num_epochs,
        learning_rate=FLAGS.learning_rate,
        batch_size=FLAGS.batch_size,
        ngpu=FLAGS.ngpu,
        hypo_shards=FLAGS.hypo_shards,
        save_epoch_freq=FLAGS.save_epoch_freq,
        img_log_freq=FLAGS.img_log_freq,
        img_size=FLAGS.img_size,
        nz_feat=FLAGS.nz_feat,
        subdivide=FLAGS.subdivide,
        symidx=FLAGS.symidx,
        n_bones=FLAGS.n_bones,
        n_faces=int(FLAGS.n_faces),
        n_hypo=FLAGS.n_hypo,
        symmetric=FLAGS.symmetric,
        symmetric_loss=FLAGS.symmetric_loss,
        only_mean_sym=FLAGS.only_mean_sym,
        opt_tex=FLAGS.opt_tex == "yes",
        use_gtpose=FLAGS.use_gtpose,
        noise=FLAGS.noise,
        rscale=FLAGS.rscale,
        noise_base=FLAGS.noise_base,
        l1tex_wt=FLAGS.l1tex_wt,
        sigval=FLAGS.sigval,
        seed=FLAGS.seed,
        warmup_steps=FLAGS.warmup_steps,
        scan_chunk=FLAGS.scan_chunk,
        start_epoch=FLAGS.start_epoch,
        stall_timeout_s=FLAGS.stall_timeout_s,
        pretrained_dir=FLAGS.pretrained_dir,
        frame_code=FLAGS.frame_code,
        frame_code_norm=FLAGS.frame_code_norm,
        cam_init=FLAGS.cam_init,
        flow_rampup=FLAGS.flow_rampup,
    )


def _supervise() -> int:
    """Elastic recovery (the reference has none — resume is manual via
    --model_path, ref:nnutils/train_utils.py:357-360): re-run the training
    child from its latest checkpoint when it crashes (TPU worker death) or
    stalls (dead tunnel transport -> watchdog exit 75).  The parent never
    touches the device, so the child owns the chip exclusively."""
    import subprocess
    import time as _time

    import numpy as np

    tries = 0
    while True:
        extra = []
        latest = os.path.join(FLAGS.checkpoint_dir, FLAGS.name,
                              "pred_net_latest.npz")
        if tries and os.path.exists(latest):
            try:
                done = int(np.load(latest)["__epochs_done"])
            except Exception:
                done = 0
            if done >= FLAGS.num_epochs:
                return 0
            if done > 0:
                # absl: later duplicate flags override earlier ones
                extra = [f"--start_epoch={done}", f"--model_path={latest}"]
        env = dict(os.environ, LASR_CHILD="1")
        rc = subprocess.call([sys.executable] + sys.argv + extra, env=env)
        if rc == 0:
            return 0
        tries += 1
        if tries > FLAGS.max_retries:
            return rc
        print(f"supervisor: attempt {tries} exited rc={rc}; restarting "
              f"from {'epoch ' + extra[0].split('=')[1] if extra else 'scratch'}",
              flush=True)
        _time.sleep(20)


def main(_):
    if FLAGS.max_retries > 0 and not os.environ.get("LASR_CHILD"):
        sys.exit(_supervise())
    cfg = config_from_flags()
    trainer = Trainer(cfg)
    if FLAGS.profile_dir:
        from lasr_tpu.utils.profiling import trace
        epochs = cfg.num_epochs
        cfg.num_epochs = 1
        with trace(FLAGS.profile_dir):
            trainer.train()
        cfg.num_epochs = epochs - 1
        if cfg.num_epochs > 0:
            trainer.train()
    else:
        trainer.train()


if __name__ == "__main__":
    app.run(main)
