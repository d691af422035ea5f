"""Op-level attribution of the stage-0 training step (VERDICT r4 task 2).

Captures a jax.profiler trace of the production scanned-epoch program on the
bench workload (same setup as bench.py's stage_train), parses the XPlane
device timeline, and publishes per-op / per-component shares of the step
budget to results/profile_r5.json.

The reference has no analogue (its profiling is commented-out wall-clock
probes, ref:nnutils/train_utils.py:271-272); the per-op budget here is what
its nvprof runs would have shown.

Usage:
  python exp/profile_step.py              # capture on the real chip + parse
  python exp/profile_step.py --parse-only /tmp/lasr_profile   # re-parse
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ----------------------------------------------------------------- capture
def capture(logdir: str, steps: int = 50) -> dict:
    import jax
    import jax.numpy as jnp

    from lasr_tpu.config import LasrConfig
    from lasr_tpu.training.trainer import Trainer

    cfg = LasrConfig(name="prof", checkpoint_dir="/tmp/lasr_prof",
                     dataname="spot3", n_bones=21, n_hypo=8, batch_size=1,
                     num_epochs=5, symmetric=True, only_mean_sym=True,
                     opt_tex=True)
    tr = Trainer(cfg)
    tr.reinit_bones()

    ids_all = jnp.zeros((steps, 1), jnp.int32)
    p, s = tr.params, tr.opt_state
    knobs = tr.knobs()
    args = (tr.dev_arrays, ids_all, jnp.asarray(0, jnp.int32),
            jnp.asarray(0), jnp.asarray(0, jnp.int32), knobs)

    # warm: compile + one full scan so the trace sees only steady execution
    p, s, *rest = tr.epoch_scan(p, s, *args)
    jax.block_until_ready(rest)
    t0 = time.time()
    p, s, *rest = tr.epoch_scan(p, s, *args)
    jax.block_until_ready(rest)
    wall_per_step_ms = (time.time() - t0) / steps * 1e3

    jax.profiler.start_trace(logdir)
    p, s, *rest = tr.epoch_scan(p, s, *args)
    jax.block_until_ready(rest)
    jax.profiler.stop_trace()
    return {"steps": steps, "wall_per_step_ms": round(wall_per_step_ms, 3),
            "backend": jax.devices()[0].device_kind}


# ------------------------------------------------------------------- parse
COMPONENT_PATTERNS = [
    # pallas rasterizer custom-calls keep their kernel symbol in the op name
    ("rasterizer", ("softras", "raster", "tpu_custom_call")),
    ("conv_encoder", ("convolution", "conv_general")),
    ("matmul", ("dot",)),
    ("scatter_gather", ("scatter", "gather", "dynamic-slice",
                        "dynamic_slice", "dynamic-update-slice")),
    ("sort_topk", ("sort", "top-k", "topk")),
    ("data_movement", ("copy", "transpose", "bitcast", "reshape", "pad",
                       "concatenate", "slice", "reverse", "broadcast")),
    ("reduce", ("reduce", "all-reduce")),
    ("elementwise_fusion", ("fusion", "loop_", "input_", "output_",
                            "multiply", "add", "subtract", "divide", "exp",
                            "log", "select", "compare", "convert", "rsqrt",
                            "tanh", "maximum", "minimum", "power", "iota")),
]


def classify(name: str) -> str:
    low = name.lower()
    for comp, pats in COMPONENT_PATTERNS:
        if any(p in low for p in pats):
            return comp
    return "other"


def parse(logdir: str) -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    planes = {p.name: p for p in space.planes}
    dev = None
    for name, p in planes.items():
        if "TPU" in name and "XLA" not in name:
            dev = p
            break
    if dev is None:  # CPU fallback: XLA modules run on the host plane
        for name, p in planes.items():
            if name.startswith("/device:") or "Host Threads" in name:
                dev = p
                break
    if dev is None:
        raise SystemExit(f"no device plane; planes = {list(planes)}")

    ev_meta = {m.id: m.name for m in dev.event_metadata.values()}
    # self-time per op-name: XLA op lines nest (module -> op); use only the
    # deepest line named "XLA Ops" when present, else all lines
    op_lines = [ln for ln in dev.lines if "XLA Ops" in ln.name] or dev.lines
    agg: dict[str, float] = {}
    for ln in op_lines:
        for ev in ln.events:
            name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
            agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e9  # -> ms
    total_ms = sum(agg.values())

    comps: dict[str, float] = {}
    for name, ms in agg.items():
        comps[classify(name)] = comps.get(classify(name), 0.0) + ms
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    return {
        "plane": dev.name,
        "device_total_ms": round(total_ms, 3),
        "components_ms": {k: round(v, 3)
                          for k, v in sorted(comps.items(),
                                             key=lambda kv: -kv[1])},
        "components_pct": {k: round(100 * v / max(total_ms, 1e-9), 2)
                           for k, v in sorted(comps.items(),
                                              key=lambda kv: -kv[1])},
        "top_ops_ms": [[n, round(v, 3)] for n, v in top],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/lasr_profile")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--out", default="results/profile_r5.json")
    args = ap.parse_args()

    out = {}
    if not args.parse_only:
        os.makedirs(args.logdir, exist_ok=True)
        out.update(capture(args.logdir, args.steps))
    out.update(parse(args.logdir))
    if not args.parse_only and out.get("steps"):
        out["device_ms_per_step"] = round(
            out["device_total_ms"] / args.steps, 3)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "top_ops_ms"},
                     indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
