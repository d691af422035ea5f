"""Sweep the Pallas rasterizer's tile geometry (PT, C) on the chip.

Times the BASELINE secondary-metric shape (256 px, 1280 faces, K=3,
batch 16) forward and forward+backward for each (LASR_RASTER_PT,
LASR_RASTER_C) combination, each in a fresh subprocess (the env vars are
read at module import).  Writes results/raster_tile_sweep.json.

Run while nothing else holds the TPU:  python exp/raster_tile_sweep.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)

CHILD = r"""
import os, sys, time
sys.path.insert(0, %r)
os.chdir(%r)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
from lasr_tpu.models.mesh import icosphere
from lasr_tpu.ops.rasterize import RasterizeConfig, soft_rasterize

def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.sum(jnp.ravel(leaf)[:8])))

cfg = RasterizeConfig(image_size=256, sigma=1e-4, gamma=1e-2)
r = np.random.RandomState(0)
batch = 16
# a REAL mesh filling the crop, like training frames: the previous random
# triangle soup (centers uniform +-0.9, offsets 0.15) had a measured
# (tile, chunk) cull factor of 1.0 - the DENSE regime - which made every
# culling-geometry variant look like a wash.  The icosphere-fill scene
# culls 4.8x with y-only chunks (measured host-side with the kernel's own
# bbox logic), matching training.
v0, faces = icosphere(3)
verts = np.tile((v0 * 0.7)[None], (batch, 1, 1)).astype(np.float32)
verts += (r.randn(batch, 1, 3) * 0.05).astype(np.float32)
verts[:, :, 2] += 10.0
fv = jnp.asarray(verts[:, faces])
ft = jnp.asarray(r.rand(batch, len(faces), 3, 3).astype(np.float32))
near = jnp.full((batch,), 8.0); far = jnp.full((batch,), 12.0)
fwd = jax.jit(lambda v, t: soft_rasterize(v, t, cfg, near, far))
bwd = jax.jit(jax.grad(lambda v, t: soft_rasterize(v, t, cfg, near, far).sum(),
                       argnums=(0, 1)))
iters = 5
sync(fwd(fv, ft))
t0 = time.time()
for _ in range(iters): out = fwd(fv, ft)
sync(out)
f_fps = batch * iters / (time.time() - t0)
sync(bwd(fv, ft))
t0 = time.time()
for _ in range(iters): g = bwd(fv, ft)
sync(g)
b_fps = batch * iters / (time.time() - t0)
print(__import__("json").dumps({"fwd_fps": round(f_fps, 1),
                                "fwdbwd_fps": round(b_fps, 1)}))
""" % (REPO, REPO)


COMBOS = [
    # (PT, C, XG): XG = chunks per y super-band for 2-level (y, x) binning;
    # XG=0 is the round-4 y-only culling baseline.  x-culling needs PT < S.
    (256, 128, 0),
    (256, 128, 2),
    (128, 128, 0),
    (128, 128, 1),
    (128, 128, 2),
    (128, 128, 4),
    (64, 128, 2),
    (64, 128, 4),
    (128, 256, 1),
    (64, 256, 2),
]


def main():
    rows = []
    for pt, c, xg in COMBOS:
            env = dict(os.environ, LASR_RASTER_PT=str(pt),
                       LASR_RASTER_C=str(c), LASR_RASTER_XG=str(xg))
            try:
                r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                                   capture_output=True, text=True,
                                   timeout=600)
                line = [l for l in r.stdout.splitlines()
                        if l.startswith("{")][-1]
                row = {"PT": pt, "C": c, "XG": xg, **json.loads(line)}
            except Exception as e:                      # noqa: BLE001
                row = {"PT": pt, "C": c, "XG": xg, "error": str(e)[:120]}
            rows.append(row)
            print(row, flush=True)
    json.dump({"shape": "256px 1280f K3 batch16 icosphere-fill", "rows": rows},
              open("results/raster_tile_sweep.json", "w"), indent=1)


if __name__ == "__main__":
    main()
