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

No elastic supervisor here (use per-stage optimize.py --max_retries for
long unattended runs); this is the low-overhead path for short pipelines.
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


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", action="append", required=True,
                    metavar="FLAGS", help="optimize.py flag string; repeat "
                    "once per stage, in execution order")
    ap.add_argument("--timing_out", default="",
                    help="optional json path for per-stage wall-clocks")
    args = ap.parse_args(argv)

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
