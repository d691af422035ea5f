"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: end-to-end training throughput on the spot3 stage-0 workload (the
heavy stage: 8 camera hypotheses, 21 bones, 256² rasterization, batch 1 —
ref:scripts/spot3.sh).  Baseline: the reference runs scripts/spot3.sh
(3000 steps total) in ~20 min on a Titan Xp (ref README.md:96)
=> 2.5 steps/s average; the stage-0 configuration dominates its cost.
vs_baseline > 1 means faster than the reference.

Structure (hang-proofing): the orchestrator process NEVER imports jax —
backend init on the tunneled axon device has been observed to hang
indefinitely (BENCH_r03 was rc=124 with zero output).  Every stage that
touches a device runs in a subprocess with a hard timeout; whatever was
measured is reported, and any failure lands in extra.errors instead of
killing the run.  `python bench.py` always emits its JSON line:
  * tunnel healthy, warm cache: ~2-4 min;
  * tunnel healthy, cold cache: < 10 min (stage timeouts bound it);
  * tunnel dead: < ~60 s (probe timeout), value falls back to the last
    recorded good measurement (marked stale) or 0.0.

The "extra" field carries the secondary metrics BASELINE.json asks for:
  * steady_ms_per_step — post-compile stage-0 step latency;
  * raster_fwd_fps / raster_fwdbwd_fps — soft-rasterizer renders/s at
    256 px, 1280 faces;
  * compile_s — wall-clock of the first epoch-program dispatch;
plus published per-config eval metrics read from results/ artifacts
(no device needed for those).

Timing honesty: every stage stops its clock only after a host read of a
value data-dependent on the computation (np.asarray of the result), not
block_until_ready — the tunneled backend has been observed to return from
block_until_ready before execution completes (the bogus 3218 steps/s
BENCH_r02 headline).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
os.chdir(REPO)

BASELINE_STEPS_PER_SEC = 2.5
HISTORY_PATH = os.path.join(REPO, "results", "bench_history.json")

def _t(env_key, default):
    try:
        return float(os.environ.get(env_key, default))
    except ValueError:
        return default


PROBE_TIMEOUT_S = _t("LASR_BENCH_PROBE_TIMEOUT", 50)    # dead tunnel: < ~60 s
TRAIN_TIMEOUT_S = _t("LASR_BENCH_TRAIN_TIMEOUT", 480)   # cold epoch compile
RASTER_TIMEOUT_S = _t("LASR_BENCH_RASTER_TIMEOUT", 150)


# ----------------------------------------------------------------------
# device stages — each runs in its own subprocess (python bench.py --stage X)
# and prints ONE JSON line on success.  jax is imported only here.
# ----------------------------------------------------------------------
def _stage_env_setup():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _sync(x):
    """End-of-timing barrier that cannot lie: a host read of a value
    data-dependent on the computation (see module docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.sum(jnp.ravel(leaf)[:8])))


def stage_probe():
    jax = _stage_env_setup()
    d = jax.devices()[0]
    print(json.dumps({"platform": d.platform, "device": str(d)}))


def stage_train():
    _stage_env_setup()
    import jax.numpy as jnp
    import numpy as np
    from lasr_tpu.config import LasrConfig
    from lasr_tpu.training.trainer import Trainer

    fixture = "database/DAVIS/JPEGImages/Full-Resolution/syn-spot3f"
    if not os.path.isdir(fixture):
        subprocess.run([sys.executable, "scripts/render_syn.py", "--outdir",
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
    t0 = time.time()
    p, s, *_ = tr.epoch_scan(p, s, tr.dev_arrays, ids_all,
                             jnp.asarray(0, jnp.int32), jnp.asarray(0),
                             jnp.asarray(0, jnp.int32), tr.knobs())
    _sync(p)   # host read of the updated params: execution provably done
    compile_s = time.time() - t0

    t0 = time.time()
    p, s, scal, *_ = tr.epoch_scan(p, s, tr.dev_arrays, ids_all,
                                   jnp.asarray(1, jnp.int32), jnp.asarray(1),
                                   jnp.asarray(0, jnp.int32), tr.knobs())
    # stop the clock only after a host read of the LAST step's loss — a value
    # data-dependent on every step in the scan chain.
    last_loss = float(np.asarray(scal["total_loss"])[-1])
    dt = time.time() - t0
    assert np.isfinite(last_loss), f"bench run diverged: loss={last_loss}"
    print(json.dumps({"steps_per_s": round(n / dt, 3),
                      "compile_s": round(compile_s, 1)}))


def stage_raster(image_size=256, n_faces=1280, batch=16, iters=5):
    """Renders/s of the soft rasterizer alone (fwd and fwd+bwd)."""
    _stage_env_setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lasr_tpu.models.mesh import icosphere
    from lasr_tpu.ops.rasterize import RasterizeConfig, soft_rasterize

    cfg = RasterizeConfig(image_size=image_size, sigma=1e-4, gamma=1e-2)
    r = np.random.RandomState(0)
    verts = (r.randn(batch, 642, 3) * 0.5).astype(np.float32)
    verts[:, :, 2] += 10.0
    _, faces = icosphere(3)
    faces = faces[:n_faces]
    fv = jnp.asarray(verts[:, faces])                    # [B, F, 3, 3]
    ft = jnp.asarray(r.rand(batch, len(faces), 3, 3).astype(np.float32))
    near = jnp.full((batch,), 8.0)
    far = jnp.full((batch,), 12.0)

    fwd = jax.jit(lambda v, t: soft_rasterize(v, t, cfg, near, far))
    bwd = jax.jit(jax.grad(
        lambda v, t: soft_rasterize(v, t, cfg, near, far).sum(),
        argnums=(0, 1)))

    _sync(fwd(fv, ft))                                   # compile
    t0 = time.time()
    for _ in range(iters):
        out = fwd(fv, ft)
    _sync(out)
    fwd_fps = batch * iters / (time.time() - t0)

    _sync(bwd(fv, ft))
    t0 = time.time()
    for _ in range(iters):
        g = bwd(fv, ft)
    _sync(g)
    bwd_fps = batch * iters / (time.time() - t0)
    print(json.dumps({"raster_fwd_fps": round(fwd_fps, 1),
                      "raster_fwdbwd_fps": round(bwd_fps, 1)}))


# ----------------------------------------------------------------------
# orchestrator — no jax, cannot hang
# ----------------------------------------------------------------------
def _run_stage(name, timeout_s, extra_env=None):
    """Run a stage subprocess; return (parsed-last-JSON-line | None, error)."""
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--stage", name],
                           capture_output=True, text=True,
                           timeout=timeout_s, env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        return None, f"{name}: timeout after {timeout_s}s"
    except Exception as e:                          # noqa: BLE001
        return None, f"{name}: {e!r}"
    for line in reversed(r.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), None
            except json.JSONDecodeError:
                continue
    tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
    return None, f"{name}: rc={r.returncode} no JSON ({' | '.join(tail)})"


def _collect_artifacts():
    """Per-round evidence from results/ + run logs — device-free."""
    e2e = {}
    wt_path = os.path.join("log", "matrix_walltime.jsonl")
    if os.path.exists(wt_path):
        for line in open(wt_path):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            # only completed runs count as results; a crashed run's elapsed
            # time is not a wall-clock (BENCH_r02 published camel's rc=134
            # crash at 326 s as if it had finished)
            if rec.get("rc", 1) == 0:
                e2e[f"{rec['run']}_wall_s"] = rec["wall_s"]
    for path, fn in [
        ("results/spot3_warm.json", lambda d: e2e.update(d)),
        ("results/tpu_kernel_parity.json",
         lambda d: e2e.__setitem__("kernel_parity_gv_rel",
                                   d["gv_rel_maxerr"])),
        ("results/flownet_val.json",
         lambda d: e2e.__setitem__("flownet_epe_px",
                                   round(d["mean_epe_mask"], 2))),
        ("results/mask_quality_pika.json",
         lambda d: e2e.__setitem__("mask_substitute_iou_pika",
                                   round(d["mean_iou"], 3))),
        ("results/mask_quality_camel.json",
         lambda d: e2e.__setitem__("mask_substitute_iou_camel",
                                   round(d["mean_iou"], 3))),
    ]:
        try:
            fn(json.load(open(path)))
        except Exception:                           # noqa: BLE001
            pass
    try:
        published = json.load(open("BASELINE.json")).get("published", {})
        for k, v in published.items():
            if isinstance(v, dict) and "mean_chamfer" in v:
                e2e[f"{k}_chamfer"] = v["mean_chamfer"]
            if isinstance(v, dict) and "pck" in v:
                e2e[f"{k}_pck"] = v["pck"]
    except Exception:                               # noqa: BLE001
        pass
    return e2e


def main():
    errors = []
    extra = {"raster_image_size": 256, "raster_faces": 1280}

    probe, err = _run_stage("probe", PROBE_TIMEOUT_S)
    if not probe:
        # one retry: the first backend init after the chip was released by
        # another process has been observed to take >50 s once and 12 s on
        # the immediate retry; a dead tunnel fails both (~100 s total,
        # still far under any driver timeout)
        errors.append(err)
        probe, err = _run_stage("probe", PROBE_TIMEOUT_S)
    if probe:
        extra["backend"] = probe.get("device", "?")
    else:
        errors.append(err)

    value = None
    if probe:
        train, err = _run_stage("train", TRAIN_TIMEOUT_S)
        if train:
            value = train["steps_per_s"]
            extra["steady_ms_per_step"] = round(1e3 / value, 2)
            extra["compile_s"] = train["compile_s"]
        else:
            errors.append(err)
        raster, err = _run_stage("raster", RASTER_TIMEOUT_S)
        if raster:
            extra.update(raster)
        else:
            errors.append(err)

    measured_now = value is not None
    if measured_now:
        try:
            os.makedirs("results", exist_ok=True)
            json.dump({"date": time.strftime("%Y-%m-%d %H:%M"),
                       "steps_per_s": value,
                       "extra": {k: v for k, v in extra.items()
                                 if k != "backend"}},
                      open(HISTORY_PATH, "w"), indent=1)
        except OSError:
            pass
    else:
        # tunnel dead / stage failed: report the last recorded good
        # measurement, explicitly marked stale, so the record still
        # carries a throughput datum + the failure reason.
        try:
            hist = json.load(open(HISTORY_PATH))
            value = hist["steps_per_s"]
            extra["stale_measurement_from"] = hist["date"]
        except Exception:                           # noqa: BLE001
            value = 0.0

    extra.update(_collect_artifacts())
    if errors:
        extra["errors"] = errors

    print(json.dumps({
        "metric": "spot3_stage0_train_throughput",
        "value": round(value, 3),
        "unit": "steps/s",
        "vs_baseline": round(value / BASELINE_STEPS_PER_SEC, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        {"probe": stage_probe, "train": stage_train,
         "raster": stage_raster}[sys.argv[2]]()
    else:
        main()
