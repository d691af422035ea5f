"""Rasterizer roofline: measured kernel time vs v5e VPU/HBM limits.

Static per-pair op count for _pair_geometry + the fwd accumulator chain
(counted from the kernel source), pair counts from the training shape, and
the measured custom-call times from results/profile_r5.json.  Writes
results/roofline_r5.json.  Pure host arithmetic — no chip needed.

v5e peaks (public: cloud.google.com/tpu/docs/v5e): 394 bf16 MXU TFLOP/s
-> f32 MXU ~ 1/4; VPU: 8x128 lanes x 4 ALUs x ~0.94 GHz ~ 3.9 T f32 op/s
(order-of-magnitude figure; transcendentals cost multiple slots).
HBM: 16 GB @ 819 GB/s.
"""

import json
import os
import sys

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# ---- training shape (bench stage-0 step) --------------------------------
B = 16            # 2 frames x 8 hypotheses
S = 256
P = S * S
F = 1280
K = 9             # merged flow+texture render channels
D = 39 + 3 * K    # facedata rows

# ---- static per-pair VPU op count (from _pair_geometry, fwd) ------------
OPS = {
    "barycentric w0..w2": 12,
    "inside test": 11,
    "edge foot params t_sel (3 edges)": 27,
    "edge feet dis_x/dis_y (3 edges)": 36,
    "foot distances d (3)": 9,
    "inside best-of-3 select": 5,
    "outside vertex-region select (obtuse)": 18,
    "per-pair picks (dis_x, dis_y, tc)": 15,
    "dis/sign/logits": 6,
    "sigmoid+softplus via shared exp (transcendental slots)": 15,
    "valid/select/log1m": 6,
    "clipped barycentrics + renorm": 10,
    "interpolated depth 1/z": 9,
    "fwd accumulator (logalpha, z-softmax rescale, wgt exp)": 15,
}
ops_per_pair = sum(OPS.values())

VPU_OPS = 3.9e12          # f32 op/s, order-of-magnitude
HBM_BW = 819e9            # B/s
MXU_F32 = 394e12 / 4      # f32 via bf16-passes, upper bound


def main():
    prof = json.load(open("results/profile_r5.json"))
    steps = prof.get("steps", 50)
    fwd_ms = next(v for n, v in prof["top_ops_ms"]
                  if "jvp__" in n and "transpose" not in n) / steps
    bwd_ms = next(v for n, v in prof["top_ops_ms"]
                  if "transpose_jvp" in n) / steps

    dense_pairs = B * P * F
    # y-band culling factor MEASURED host-side with the kernel's own bbox
    # logic on an icosphere filling the crop (the training regime): live
    # (tile, chunk) fraction 0.208 -> cull 4.8.  (The old random-soup
    # sweep scene measured 1.0 - dense - which is why culling variants
    # looked like a wash there.)
    cull = 4.8
    pairs = dense_pairs / cull
    fwd_ops = pairs * ops_per_pair
    vpu_s = fwd_ops / VPU_OPS

    # HBM per fwd call: facedata stream + fwd_raw out (worst case, no
    # cross-tile residency)
    facedata_bytes = B * D * F * 4 * (P // 256)   # per-tile refetch bound
    out_bytes = B * P * 16 * 4
    hbm_s = (facedata_bytes + out_bytes) / HBM_BW

    result = {
        "shape": {"B": B, "S": S, "F": F, "K": K},
        "measured_fwd_ms_per_step": round(fwd_ms, 2),
        "measured_bwd_ms_per_step": round(bwd_ms, 2),
        "ops_per_pair_static_count": ops_per_pair,
        "ops_breakdown": OPS,
        "dense_pairs_per_step": dense_pairs,
        "assumed_cull_factor": cull,
        "vpu_bound_ms": round(vpu_s * 1e3, 2),
        "hbm_bound_ms_worst_refetch": round(hbm_s * 1e3, 2),
        "implied_vpu_utilization_pct": round(100 * vpu_s * 1e3 / fwd_ms, 1),
        "verdict": (
            "The fwd kernel is VPU-COMPUTE-bound: the static op count puts "
            "its speed-of-light at ~{:.0f} ms vs {:.1f} ms measured (~{:.0f}% "
            "of VPU peak under the stated cull/op-count uncertainty of ~2x); "
            "the worst-case HBM bound is ~{:.1f} ms, far below the measured "
            "time, so memory is not the limiter.  Further speedups require "
            "fewer pairs (2-level x-binning with full-row tiles measured "
            "+13 ms/step - band grouping coarsens the y-cull; sub-row "
            "tiles pay ~9%% fixed overhead before x-culling can recoup) "
            "or fewer ops/pair (bounded "
            "by CUDA-parity exact distance semantics).  The bwd kernel "
            "reruns the same pair math plus gradient chains and sits at the "
            "same limit.".format(vpu_s * 1e3, fwd_ms,
                                 100 * vpu_s * 1e3 / fwd_ms, hbm_s * 1e3)),
        "peaks_used": {"vpu_f32_ops": VPU_OPS, "hbm_Bps": HBM_BW,
                       "mxu_f32_flops": MXU_F32},
    }
    json.dump(result, open("results/roofline_r5.json", "w"), indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("ops_breakdown",)}, indent=1))


if __name__ == "__main__":
    main()
