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
def classify(name: str, category: str, source: str) -> str:
    if "softras_pallas" in source or "tpu_custom_call" in name:
        return ("rasterizer_bwd" if "transpose" in name.lower()
                else "rasterizer_fwd")
    low = name.lower()
    if category in ("convolution",) or "conv" in low:
        return "conv_encoder"
    if category == "custom-call":
        return "custom_call_other"
    if category in ("copy", "transpose", "reshape", "all-to-all"):
        return "data_movement"
    if "gather" in category or "scatter" in category or \
            "dynamic" in category:
        return "scatter_gather"
    if "sort" in category or "sort" in low:
        return "sort_topk"
    if category in ("fusion", "loop fusion", "input fusion",
                    "output fusion", "elementwise"):
        return "fusion"
    return category or "other"


def parse(logdir: str) -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    dev = None
    for p in space.planes:
        if p.name.startswith("/device:TPU") or \
                (p.name.startswith("/device:") and dev is None):
            dev = p
            if "TPU" in p.name:
                break
    if dev is None:
        raise SystemExit(f"no device plane; planes = "
                         f"{[p.name for p in space.planes]}")

    smeta = {m.id: m.name for m in dev.stat_metadata.values()}
    info = {}                  # metadata id -> (name, category, source)
    for m in dev.event_metadata.values():
        cat = src = ""
        for st in m.stats:
            nm = smeta.get(st.metadata_id)
            if nm == "hlo_category":
                cat = st.str_value or st.bytes_value.decode()
            elif nm == "source":
                src = st.str_value or st.bytes_value.decode()
        info[m.id] = (m.name, cat, src)

    # SELF time per op via a nesting stack: "XLA Ops" events nest
    # (fusion parents contain child op events); naive duration sums
    # double-count ~2x.  Events on one line either nest or are disjoint.
    op_line = next(ln for ln in dev.lines if ln.name == "XLA Ops")
    evs = sorted((ev.offset_ps, ev.duration_ps, ev.metadata_id)
                 for ev in op_line.events)
    self_ms: dict[int, float] = {}
    stack: list[tuple[int, int]] = []   # (end_ps, metadata_id)
    for off, dur, mid in evs:
        while stack and off >= stack[-1][0]:
            stack.pop()
        if stack:
            pmid = stack[-1][1]
            self_ms[pmid] = self_ms.get(pmid, 0.0) - dur / 1e9
        self_ms[mid] = self_ms.get(mid, 0.0) + dur / 1e9
        stack.append((off + dur, mid))
    total_ms = sum(self_ms.values())

    # module wall (the scan's actual device occupancy) + async DMA context
    mod_line = next((ln for ln in dev.lines if ln.name == "XLA Modules"),
                    None)
    module_ms = (sum(ev.duration_ps for ev in mod_line.events) / 1e9
                 if mod_line else None)
    dma_line = next((ln for ln in dev.lines if ln.name == "Async XLA Ops"),
                    None)
    dma_ms = (sum(ev.duration_ps for ev in dma_line.events) / 1e9
              if dma_line else None)

    comps: dict[str, float] = {}
    named: dict[str, float] = {}
    for mid, ms in self_ms.items():
        name, cat, src = info.get(mid, (str(mid), "", ""))
        comps[classify(name, cat, src)] = \
            comps.get(classify(name, cat, src), 0.0) + ms
        named[name] = named.get(name, 0.0) + ms
    top = sorted(named.items(), key=lambda kv: -kv[1])[:40]
    return {
        "plane": dev.name,
        "device_total_self_ms": round(total_ms, 3),
        "module_wall_ms": round(module_ms, 3) if module_ms else None,
        "async_dma_ms_overlapped": round(dma_ms, 3) if dma_ms else None,
        "components_ms": {k: round(v, 3)
                          for k, v in sorted(comps.items(),
                                             key=lambda kv: -kv[1])},
        "components_pct": {k: round(100 * v / max(total_ms, 1e-9), 2)
                           for k, v in sorted(comps.items(),
                                              key=lambda kv: -kv[1])},
        "top_ops_ms": [[n[:120], round(v, 3)] for n, v in top],
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
            out["device_total_self_ms"] / args.steps, 3)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "top_ops_ms"},
                     indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
