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
import faulthandler
import glob
import json
import os
import signal
import sys
import time

# `kill -USR1 <pid>` dumps stacks instead of (the default) terminating —
# tunnel stalls during the long device upload are otherwise undiagnosable
faulthandler.register(signal.SIGUSR1, all_threads=True)

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

    # TPU-first data path: the whole training set lives device-resident
    # (uint8 images + f32 flow, ~1.5 GB — fits HBM comfortably) and batches
    # are gathered ON DEVICE by index.  The original host-side feed pushed
    # ~5 MB/iter through the tunneled transport and measured 1.1 it/s with
    # the chip >95% idle.
    dev = {
        "im0": jnp.asarray(im0),                      # uint8 [N, S, S, 3]
        "im1": jnp.asarray(im1),
        # f16 at rest (the shards' storage dtype): halves the one-time
        # tunnel upload; cast to f32 per-batch on device
        "flow": jnp.asarray(flow.astype(np.float16)),
        "mask": jnp.asarray(mask.astype(np.uint8)),   # [N, S, S]
    }
    del im0, im1, flow, mask

    net = flownet.FlowNet()
    r = np.random.RandomState(args.seed)
    params = net.init(jax.random.PRNGKey(args.seed),
                      jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 256, 256, 3)))
    sched = optax.cosine_decay_schedule(args.lr, args.iters, 0.05)
    opt = optax.adamw(sched, weight_decay=1e-5)
    opt_state = opt.init(params)

    # one dispatch = CHUNK optimizer steps (lax.scan): removes the per-step
    # tunnel round trip (~0.5-1 s each) from the critical path
    CHUNK = 100

    @jax.jit
    def run_chunk(params, opt_state, data, idx, gain):
        def one(carry, sg):
            p, s = carry
            ids, g8 = sg

            def loss_fn(p):
                a = data["im0"][ids].astype(jnp.float32) / 255.0
                b = data["im1"][ids].astype(jnp.float32) / 255.0
                # photometric augmentation: channel gains shared by both
                # frames (appearance constancy); gain 1 = off
                a = jnp.clip(a * g8, 0, 1)
                b = jnp.clip(b * g8, 0, 1)
                outs = net.apply(p, a, b)
                return flownet.multiscale_loss(
                    outs, data["flow"][ids].astype(jnp.float32),
                    data["mask"][ids].astype(jnp.float32))

            loss, grads = jax.value_and_grad(loss_fn)(p)
            up, s = opt.update(grads, s, p)
            return (optax.apply_updates(p, up), s), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), (idx, gain))
        return params, opt_state, losses

    # fixed training batch for an interpretable progress metric: full-res
    # in-mask EPE (the multiscale loss hides whether the net is learning
    # flow or collapsing to the zero-flow basin)
    epe_ids = np.arange(0, n, max(1, n // 8))[:8]
    epe_m = np.asarray(dev["mask"][epe_ids]) > 0
    epe_gt = np.asarray(dev["flow"][epe_ids]).astype(np.float32)

    @jax.jit
    def train_epe(params, data):
        a = data["im0"][epe_ids].astype(jnp.float32) / 255.0
        b = data["im1"][epe_ids].astype(jnp.float32) / 255.0
        outs = net.apply(params, a, b)
        return flownet.full_res_flow(outs, a.shape[1:3])

    t0 = time.time()
    done = 0
    while done < args.iters:
        k = min(CHUNK, args.iters - done)
        idx = r.randint(0, n, (k, args.batch)).astype(np.int32)
        gain = np.ones((k, args.batch, 1, 1, 3), np.float32)
        aug = r.rand(k) < 0.5
        gain[aug] = r.uniform(0.8, 1.2,
                              (int(aug.sum()), args.batch, 1, 1, 3))
        params, opt_state, losses = run_chunk(
            params, opt_state, dev, jnp.asarray(idx), jnp.asarray(gain))
        losses = np.asarray(losses)       # host read: chunk provably done
        done += k
        rate = done / (time.time() - t0)
        err = np.linalg.norm(
            np.asarray(train_epe(params, dev)) - epe_gt, axis=-1)
        print(f"iter {done}/{args.iters} loss {losses.mean():.3f} "
              f"train-EPE {err[epe_m].mean():.2f}px ({rate:.1f} it/s)",
              flush=True)
        # periodic persistence: a crash/timeout keeps the latest weights
        os.makedirs(os.path.dirname(WEIGHTS), exist_ok=True)
        flownet.save_params(WEIGHTS, jax.tree.map(np.asarray, params))

    print(f"saved {WEIGHTS}")
    validate()


if __name__ == "__main__":
    main()
