"""Time the Pallas soft rasterizer across workload shapes on the chip.

Writes results/raster_sweep.json: per-(image_size, faces, K, batch) renders/s
forward and forward+backward, for the shapes the training stages actually use
(stage-0 merged 9-channel render at 1280 faces; later stages up to 2880) and
the BASELINE.json secondary metric shape (256 px, 1280 f, K=3).

Run while nothing else holds the TPU:  python exp/raster_sweep.py
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def _sync(x):
    """Force actual execution: a 4-byte host read of a data-dependent scalar.

    block_until_ready alone has been observed to return before execution
    completes on the tunneled axon backend (bogus BENCH_r02 headline); a host
    read of a value computed from the result cannot lie.
    """
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].ravel()[:1]))


def one(S, F, K, B, iters=8):
    from lasr_tpu.ops.rasterize import RasterizeConfig, soft_rasterize

    cfg = RasterizeConfig(image_size=S, sigma=1e-4, gamma=1e-2,
                          background=(0.0,) * K)
    r = np.random.RandomState(0)
    fv = jnp.asarray((r.randn(B, F, 3, 3) * 0.5).astype(np.float32))
    fv = fv.at[..., 2].add(10.0)
    tex = jnp.asarray(r.rand(B, F, 3, K).astype(np.float32))
    near = jnp.full((B,), 8.0)
    far = jnp.full((B,), 12.0)

    fwd = jax.jit(lambda v, t: soft_rasterize(v, t, cfg, near, far))
    bwd = jax.jit(jax.grad(
        lambda v, t: soft_rasterize(v, t, cfg, near, far).sum(),
        argnums=(0, 1)))

    _sync(fwd(fv, tex))
    t0 = time.time()
    for _ in range(iters):
        out = fwd(fv, tex)
    _sync(out)
    f_fps = B * iters / (time.time() - t0)

    _sync(bwd(fv, tex))
    t0 = time.time()
    for _ in range(iters):
        g = bwd(fv, tex)
    _sync(g)
    fb_fps = B * iters / (time.time() - t0)
    return round(f_fps, 1), round(fb_fps, 1)


def main():
    dev = jax.devices()[0].platform
    rows = []
    for (S, F, K, B) in [
        (256, 1280, 3, 16),   # BASELINE.json secondary metric shape
        (256, 1280, 9, 8),    # stage-0 merged model render (per hypothesis)
        (256, 1600, 9, 1),    # stage-1
        (256, 2880, 9, 1),    # final template stage
    ]:
        f_fps, fb_fps = one(S, F, K, B)
        rows.append(dict(image_size=S, faces=F, K=K, batch=B,
                         fwd_fps=f_fps, fwdbwd_fps=fb_fps))
        print(rows[-1])
    os.makedirs("results", exist_ok=True)
    json.dump(dict(platform=dev, rows=rows),
              open("results/raster_sweep.json", "w"), indent=1)


if __name__ == "__main__":
    main()
