"""Real-TPU Pallas kernel check: non-interpreted fwd+bwd vs jnp reference.

Run standalone (holds the TPU for ~1 min):  python exp/tpu_kernel_check.py
Driven by tests/test_pallas_tpu.py (marked `tpu`, skipped when the chip is
busy, unhealthy, or absent).  Prints one line:
  PALLAS-TPU-OK fwd=<maxerr> gv=<maxerr> gt=<maxerr>
and exits nonzero on any failure.

This is the only test-path that exercises the kernel with interpret=False on
hardware (ref parity: the CUDA kernel's tests run on-device too,
ref:third_party/softras/soft_renderer/cuda/soft_rasterize_cuda.cpp).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpus:
        print("NO-TPU")
        return 2

    from lasr_tpu.ops.softras_ref import RasterizeConfig, soft_rasterize_ref
    from lasr_tpu.ops.softras_pallas import soft_rasterize_pallas

    cfg = RasterizeConfig(image_size=64, sigma=1e-4, gamma=1e-2)
    r = np.random.RandomState(7)
    B, F, K = 2, 256, 3
    fv = (r.randn(B, F, 3, 3) * 0.6).astype(np.float32)
    fv[..., 2] += 10.0
    tex = r.rand(B, F, 3, K).astype(np.float32)
    near, far = 8.0, 12.0
    g_out = r.randn(B, K + 1, 64, 64).astype(np.float32)

    # reference on host CPU
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref_out = np.asarray(soft_rasterize_ref(
            jnp.asarray(fv), jnp.asarray(tex), cfg, near, far))
        _, ref_vjp = jax.vjp(
            lambda v, t: soft_rasterize_ref(v, t, cfg, near, far),
            jnp.asarray(fv), jnp.asarray(tex))
        ref_gv, ref_gt = (np.asarray(x) for x in ref_vjp(jnp.asarray(g_out)))

    # kernel on the chip, non-interpreted
    dev = tpus[0]
    fv_d = jax.device_put(jnp.asarray(fv), dev)
    tex_d = jax.device_put(jnp.asarray(tex), dev)
    g_d = jax.device_put(jnp.asarray(g_out), dev)
    out = np.asarray(soft_rasterize_pallas(fv_d, tex_d, near, far, cfg))
    _, vjp = jax.vjp(
        lambda v, t: soft_rasterize_pallas(v, t, near, far, cfg),
        fv_d, tex_d)
    gv, gt = (np.asarray(x) for x in vjp(g_d))

    e_fwd = float(np.abs(out - ref_out).max())
    scale_v = float(np.abs(ref_gv).max()) + 1e-12
    scale_t = float(np.abs(ref_gt).max()) + 1e-12
    e_gv = float(np.abs(gv - ref_gv).max()) / scale_v
    e_gt = float(np.abs(gt - ref_gt).max()) / scale_t

    ok = e_fwd < 5e-3 and e_gv < 5e-3 and e_gt < 5e-3
    print(f"PALLAS-TPU-{'OK' if ok else 'FAIL'} "
          f"fwd={e_fwd:.2e} gv={e_gv:.2e} gt={e_gt:.2e}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
