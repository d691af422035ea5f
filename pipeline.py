"""Single-process multi-stage optimization driver.

The reference's coarse-to-fine schedule is six separate optimize.py
processes chained by a shell script (ref:scripts/template.sh:15-31); each
pays process start, video preprocessing, device upload, and compile-cache
load again.  This driver runs the same stage schedule inside ONE process:
the preprocessed video and its uploaded device arrays are reused across
stages that share (dataname, img_size, sil_path), and XLA programs stay in
the in-memory compile cache.

Each --stage takes exactly the optimize.py flag string the shell scripts
would pass, so stage semantics (checkpoint surgery, remeshing, hypothesis
pruning via --model_path) are unchanged — stages still hand off through
pred_net_latest.npz on disk.

Usage:
  python pipeline.py \
    --stage "--name=spot3-0 --checkpoint_dir log --only_mean_sym ..." \
    --stage "--name=spot3-1 --checkpoint_dir log --nosymmetric ..."

Per-stage wall-clocks are printed and written to
<checkpoint_dir>/<last name>_stage_walls.json.

Elastic recovery: with --max_retries > 0 (default 2) a supervisor parent
reruns the pipeline child on crash or stall-watchdog exit, dropping stages
whose checkpoints are complete and resuming the in-progress stage from its
pred_net_latest.npz — same recovery semantics as optimize.py's per-stage
supervisor, but across the whole schedule.
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# the container pre-imports jax (sitecustomize), so JAX_PLATFORMS from the
# environment is ignored; LASR_PLATFORM=cpu forces a hermetic CPU run
if os.environ.get("LASR_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["LASR_PLATFORM"])

import optimize  # noqa: E402  (registers the shared absl flag schema)


def _stage_status(stage_flags):
    """(epochs done, epochs wanted, latest-checkpoint path) for one stage."""
    import numpy as np

    FLAGS = optimize.flags.FLAGS
    FLAGS.unparse_flags()
    FLAGS(["pipeline.py"] + shlex.split(stage_flags))
    latest = os.path.join(FLAGS.checkpoint_dir, FLAGS.name,
                          "pred_net_latest.npz")
    done = 0
    if os.path.exists(latest):
        try:
            done = int(np.load(latest)["__epochs_done"])
        except Exception:       # noqa: BLE001  (corrupt partial write)
            done = 0
    return done, FLAGS.num_epochs, latest


def _resume_stages(stage_list):
    """Restart plan after a crash: drop stages whose checkpoints are
    complete, resume a partially-done stage from its latest checkpoint."""
    out = []
    for s in stage_list:
        done, total, latest = _stage_status(s)
        if done >= total:
            continue
        if done > 0:
            # absl: later duplicate flags override earlier ones
            s = f"{s} --start_epoch={done} --model_path={latest}"
        out.append(s)
    return out


def _supervise(args) -> int:
    """Pipeline-level elastic recovery, mirroring optimize.py's supervisor:
    on child crash (TPU worker death) or stall-watchdog exit, restart the
    pipeline with completed stages dropped and the in-progress stage resumed
    from its latest checkpoint (stage hand-off is via files on disk, so a
    dropped stage's successor still finds its pred_net_latest.npz)."""
    import subprocess

    tries = 0
    while True:
        # resume-aware on the FIRST attempt too: a previous invocation that
        # crashed after exhausting retries leaves checkpoints behind, and
        # re-running completed stages from epoch 0 would discard them
        # (_resume_stages is a no-op when no checkpoints exist)
        stages = _resume_stages(args.stage)
        if stages != args.stage:
            print(f"pipeline supervisor: resuming from existing checkpoints "
                  f"({len(args.stage) - len(stages)} stage(s) already "
                  "complete; delete the checkpoint dir or use a fresh "
                  "--name to retrain from scratch)", flush=True)
        if not stages:
            return 0
        cmd = [sys.executable, os.path.abspath(__file__)]
        for s in stages:
            cmd += ["--stage", s]
        if args.timing_out:
            cmd += ["--timing_out", args.timing_out]
        cmd += ["--max_retries", "0"]
        rc = subprocess.call(cmd, env=dict(os.environ, LASR_CHILD="1"))
        if rc == 0:
            return 0
        tries += 1
        if tries > args.max_retries:
            return rc
        print(f"pipeline supervisor: attempt {tries} exited rc={rc}; "
              "restarting from latest checkpoints", flush=True)
        time.sleep(20)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", action="append", required=True,
                    metavar="FLAGS", help="optimize.py flag string; repeat "
                    "once per stage, in execution order")
    ap.add_argument("--timing_out", default="",
                    help="optional json path for per-stage wall-clocks")
    ap.add_argument("--max_retries", type=int, default=2,
                    help="elastic restarts on crash/stall (0 = run inline)")
    args = ap.parse_args(argv)

    if args.max_retries > 0 and not os.environ.get("LASR_CHILD"):
        rc = _supervise(args)
        if rc:
            sys.exit(rc)
        return

    from lasr_tpu.training.trainer import Trainer

    FLAGS = optimize.flags.FLAGS
    walls = {}
    reuse_key, dataset, dev_arrays = None, None, None
    cfg = None
    for i, stage in enumerate(args.stage):
        FLAGS.unparse_flags()
        FLAGS(["pipeline.py"] + shlex.split(stage))
        cfg = optimize.config_from_flags()
        key = (cfg.dataname, cfg.img_size, cfg.sil_path)
        if key != reuse_key:
            dataset, dev_arrays = None, None
        t0 = time.time()
        trainer = Trainer(cfg, dataset=dataset, dev_arrays=dev_arrays)
        trainer.train()
        reuse_key = key
        dataset, dev_arrays = trainer.dataset, trainer.dev_arrays
        trainer.close()  # drain saves, stop pool threads (one pair/stage)
        del trainer     # free device params/opt_state before the next stage
        walls[cfg.name] = round(time.time() - t0, 1)
        print(f"pipeline: stage {i} ({cfg.name}) done in "
              f"{walls[cfg.name]:.0f}s", flush=True)

    out = args.timing_out or os.path.join(
        cfg.checkpoint_dir, f"{cfg.name}_stage_walls.json")
    with open(out, "w") as f:
        json.dump(walls, f, indent=1)
    print(f"pipeline: stage walls -> {out}", flush=True)


if __name__ == "__main__":
    main()
