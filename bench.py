"""Benchmark entry point: prints ONE JSON line with the headline metric.

Metric: end-to-end training throughput on the spot3 stage-0 workload (the
heavy stage: 8 camera hypotheses, 21 bones, 256² rasterization, batch 1 —
ref:scripts/spot3.sh).  Baseline: the reference runs scripts/spot3.sh
(3000 steps total) in ~20 min on a Titan Xp (ref README.md:96)
=> 2.5 steps/s average; the stage-0 configuration dominates its cost.
vs_baseline > 1 means faster than the reference.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
os.chdir(REPO)

BASELINE_STEPS_PER_SEC = 2.5


def main():
    from lasr_tpu.config import LasrConfig
    from lasr_tpu.training.trainer import Trainer

    fixture = "database/DAVIS/JPEGImages/Full-Resolution/syn-spot3f"
    if not os.path.isdir(fixture):
        import subprocess
        subprocess.run(["python", "scripts/render_syn.py", "--outdir",
                        "syn-spot3f", "--nframes", "3"], check=True)

    cfg = LasrConfig(name="bench", checkpoint_dir="/tmp/lasr_bench",
                     dataname="spot3", n_bones=21, n_hypo=8, batch_size=1,
                     num_epochs=5, symmetric=True, only_mean_sym=True,
                     opt_tex=True)
    tr = Trainer(cfg)
    tr.reinit_bones()

    # the production path: one scanned XLA program over the step schedule
    n = 50
    ids_all = jnp.zeros((n, 1), jnp.int32)
    p, s = tr.params, tr.opt_state
    # warmup / compile
    p, s, *_ = tr.epoch_scan(p, s, tr.dev_arrays, ids_all,
                             jnp.asarray(0, jnp.int32), jnp.asarray(0))
    jax.block_until_ready(p)

    t0 = time.time()
    p, s, *_ = tr.epoch_scan(p, s, tr.dev_arrays, ids_all,
                             jnp.asarray(1, jnp.int32), jnp.asarray(1))
    jax.block_until_ready(p)
    dt = time.time() - t0
    sps = n / dt

    print(json.dumps({
        "metric": "spot3_stage0_train_throughput",
        "value": round(sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
