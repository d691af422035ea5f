"""Train the in-framework flow net (models/flownet.py) on generated pairs.

Usage:
  python scripts/gen_flow_data.py --n 1600 --device tpu
  python scripts/train_flow.py --iters 4000 [--device tpu]
  python scripts/train_flow.py --validate-only   # EPE vs GT on syn-dog-15

Saves weights to database/misc/flownet.npz (the auto_gen backend default)
and records validation EPE to results/flownet_val.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

if "--device" in sys.argv:
    _dev = sys.argv[sys.argv.index("--device") + 1]
else:
    _dev = next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith("--device=")), "tpu")
if _dev == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from lasr_tpu.models import flownet  # noqa: E402

WEIGHTS = "database/misc/flownet.npz"


def load_shards(outdir):
    ims0, ims1, flows, masks = [], [], [], []
    for p in sorted(glob.glob(os.path.join(outdir, "shard-*.npz"))):
        d = np.load(p)
        ims0.append(d["im0"])
        ims1.append(d["im1"])
        flows.append(d["flow"].astype(np.float32))
        masks.append(d["mask"])
    return (np.concatenate(ims0), np.concatenate(ims1),
            np.concatenate(flows), np.concatenate(masks))


def validate(seq="syn-dog-15"):
    """EPE vs exact GT flow on the benchmark fixture (same protocol as
    exp/flow_epe.py measures for DIS)."""
    import cv2

    from lasr_tpu.data.pfm import read_pfm

    backend = flownet.make_backend(WEIGHTS)
    root = "database/DAVIS"
    imgs = sorted(glob.glob(
        f"{root}/JPEGImages/Full-Resolution/{seq}/*.jpg"))
    epes, mags = [], []
    for i in range(len(imgs) - 1):
        im0, im1 = cv2.imread(imgs[i]), cv2.imread(imgs[i + 1])
        mask = cv2.imread(
            f"{root}/Annotations/Full-Resolution/{seq}/{i:05d}.png", 0) > 0
        gt, _ = read_pfm(
            f"{root}/FlowFW/Full-Resolution/{seq}/flo-{i:05d}.pfm")
        flow, _ = backend(im0, im1)
        err = np.linalg.norm(flow[..., :2] - gt[..., :2], axis=-1)
        epes.append(float(err[mask].mean()))
        mags.append(float(np.linalg.norm(gt[..., :2], axis=-1)[mask].mean()))
    out = dict(seq=seq, mean_epe_mask=float(np.mean(epes)),
               mean_gt_mag=float(np.mean(mags)),
               per_pair_epe=[round(e, 2) for e in epes],
               dis_reference="results/flow_epe_syn-dog-15.json")
    os.makedirs("results", exist_ok=True)
    json.dump(out, open("results/flownet_val.json", "w"), indent=1)
    print(f"flownet val: mean EPE {out['mean_epe_mask']:.2f}px on "
          f"{out['mean_gt_mag']:.2f}px motion (DIS: 18.88px)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="database/flow_syn")
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--validate-only", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.validate_only:
        validate()
        return

    im0, im1, flow, mask = load_shards(args.data)
    n = len(im0)
    print(f"{n} pairs loaded")
    net = flownet.FlowNet()
    r = np.random.RandomState(args.seed)
    params = net.init(jax.random.PRNGKey(args.seed),
                      jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 256, 256, 3)))
    sched = optax.cosine_decay_schedule(args.lr, args.iters, 0.05)
    opt = optax.adamw(sched, weight_decay=1e-5)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, a, b, f, m):
        def loss_fn(p):
            outs = net.apply(p, a, b)
            return flownet.multiscale_loss(outs, f, m)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, loss

    t0 = time.time()
    losses = []
    for it in range(args.iters):
        idx = r.randint(0, n, args.batch)
        a = jnp.asarray(im0[idx], jnp.float32) / 255.0
        b = jnp.asarray(im1[idx], jnp.float32) / 255.0
        f = jnp.asarray(flow[idx])
        m = jnp.asarray(mask[idx], jnp.float32)
        # photometric augmentation: channel gains + brightness, same for
        # both frames (appearance constancy) half the time, separate half
        if r.rand() < 0.5:
            gain = jnp.asarray(r.uniform(0.8, 1.2, (args.batch, 1, 1, 3)),
                               jnp.float32)
            a, b = jnp.clip(a * gain, 0, 1), jnp.clip(b * gain, 0, 1)
        params, opt_state, loss = step(params, opt_state, a, b, f, m)
        losses.append(float(loss))
        if (it + 1) % 200 == 0:
            rate = (it + 1) / (time.time() - t0)
            print(f"iter {it + 1}/{args.iters} loss {np.mean(losses[-200:]):.3f} "
                  f"({rate:.1f} it/s)", flush=True)

    os.makedirs(os.path.dirname(WEIGHTS), exist_ok=True)
    flownet.save_params(WEIGHTS, jax.tree.map(np.asarray, params))
    print(f"saved {WEIGHTS}")
    validate()


if __name__ == "__main__":
    main()
