"""Multi-chip dry-run worker: jit the FULL training step over an
n-device data-parallel mesh and run one step on tiny shapes.

Invoked by `__graft_entry__.dryrun_multichip` in a subprocess that forces
`JAX_PLATFORMS=cpu` + `--xla_force_host_platform_device_count=N` *before*
jax is imported, so the result is independent of the host's TPU state
(a libtpu mismatch on the host killed the in-process variant in round 1).

Replaces the reference's DDP launch (ref:optimize.py:42-47) with SPMD
sharding over a `data` mesh axis.
"""

from __future__ import annotations

import numpy as np


def run(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from lasr_tpu.config import LasrConfig
    from lasr_tpu.data.video import gather_batch
    from lasr_tpu.models.lasr import LasrModel
    from lasr_tpu.parallel import data_mesh, put_sharded_ids, shard_step
    from lasr_tpu.training.trainer import clip_and_guard

    ndev = len(jax.devices())
    if ndev < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, found {ndev} "
            f"(platform={jax.default_backend()})")

    img = 64
    cfg = LasrConfig(dataname="spot3", img_size=img, subdivide=1,
                     n_bones=3, n_hypo=2, batch_size=1,
                     num_epochs=5, use_pallas=False, sigval=1e-3,
                     ngpu=n_devices, checkpoint_dir="")
    model = LasrModel(cfg)
    params = model.init_params
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)

    # fake per-pair arrays (shape [NP, 2, ...]) standing in for the video
    b = 1
    n2 = 2 * n_devices * b
    r = np.random.RandomState(0)
    mask = np.zeros((n2, img, img), np.float32)
    mask[:, img // 4: 3 * img // 4, img // 4: 3 * img // 4] = 1.0
    flat = {
        "input_imgs": r.randn(n2, 3, img, img).astype(np.float32),
        "imgs": r.rand(n2, 3, img, img).astype(np.float32),
        "masks": mask,
        "cams": np.tile(np.array([1.0, 0, 0, 1, 0, 0, 0], np.float32),
                        (n2, 1)),
        "depth_gt": np.full((n2,), 10.0, np.float32),
        "flow": (r.randn(n2, 3, img, img) * 0.01).astype(np.float32),
        "occ": np.full((n2, img, img), -1.0, np.float32),
        "ddts_barrier": r.rand(n2, img, img).astype(np.float32),
        "pp": np.zeros((n2, 2), np.float32),
        "oriimg_shape": np.full((n2, 2), float(img), np.float32),
    }
    npairs = max(n_devices * b, 2)
    dev_arrays = {}
    for k, v in flat.items():
        two = np.stack([v[: v.shape[0] // 2], v[v.shape[0] // 2:]], 1)
        reps = [two] * ((npairs + len(two) - 1) // len(two))
        dev_arrays[k] = jnp.asarray(np.concatenate(reps)[:npairs])
    dev_arrays["oriimg_shape"] = dev_arrays["oriimg_shape"][:, 0]

    def step(params, opt_state, dev_arrays, pair_ids, rng, epoch, iters,
             knobs):
        batch = gather_batch(dev_arrays, pair_ids)
        (loss, aux), grads = jax.value_and_grad(
            model.loss_fn, has_aux=True)(params, batch, rng, epoch, iters,
                                         knobs)
        grads, *_ = clip_and_guard(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    mesh = data_mesh(n_devices)
    step_sharded = shard_step(step, mesh)
    ids = put_sharded_ids(np.arange(n_devices * b) % npairs, mesh)
    knobs = {"noise_base": jnp.asarray(0.2), "rscale": jnp.asarray(1.0),
             "flow_rampup": jnp.asarray(0.0),
             # perceptual weights as an argument, as in production (keeps
             # the dryrun HLO free of the 39 MB constant block too)
             "pnet": jax.tree.map(jnp.asarray, model.perceptual.params)}
    params, opt_state, loss = step_sharded(
        params, opt_state, dev_arrays, ids, jax.random.PRNGKey(0),
        jnp.asarray(0), jnp.asarray(0), knobs)
    jax.block_until_ready(loss)
    assert np.isfinite(float(loss)), "multichip dry run produced NaN"
    print(f"dryrun_multichip({n_devices}): loss={float(loss):.4f} OK")

    # hypothesis-parallel stage-0 step: n_hypo sharded over every device
    # (parallel/hypo.py) — the batch-1 multi-hypothesis workload that
    # data-parallelism cannot split
    import dataclasses

    from lasr_tpu.parallel.hypo import hypo_mesh, hypo_value_and_grad

    hcfg = dataclasses.replace(cfg, n_hypo=n_devices,
                               hypo_shards=n_devices, ngpu=1)
    hmodel = LasrModel(hcfg)
    hparams = hmodel.init_params
    hopt_state = optimizer.init(hparams)
    vg = hypo_value_and_grad(hcfg, hypo_mesh(n_devices), hmodel)

    def hstep(params, opt_state, dev_arrays, pair_ids, rng, epoch, iters,
              knobs):
        batch = gather_batch(dev_arrays, pair_ids)
        (loss, aux), grads = vg(params, batch, rng, epoch, iters, knobs)
        grads, *_ = clip_and_guard(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux["current_nscore"]

    hparams, hopt_state, hloss, nscore = jax.jit(hstep)(
        hparams, hopt_state, dev_arrays, jnp.zeros((1,), jnp.int32),
        jax.random.PRNGKey(1), jnp.asarray(0), jnp.asarray(0), knobs)
    jax.block_until_ready(hloss)
    assert np.isfinite(float(hloss)), "hypo-sharded dry run produced NaN"
    assert nscore.shape == (n_devices,)
    print(f"dryrun_multichip({n_devices}): hypo-sharded "
          f"loss={float(hloss):.4f} OK")

    # 2D (data x hypo) mesh over the PRODUCTION scanned-epoch program: the
    # exact code path Trainer dispatches (training.trainer.build_programs),
    # batch sharded over `data`, hypotheses shard_map'ed over `hypo`
    from lasr_tpu.training.trainer import build_mesh, build_programs, \
        make_optimizer

    assert n_devices % 2 == 0, "2D mesh dryrun wants an even device count"
    dp = n_devices // 2
    cfg2 = dataclasses.replace(cfg, n_hypo=4, hypo_shards=2, ngpu=dp,
                               batch_size=b)
    mesh2 = build_mesh(cfg2)
    assert dict(zip(mesh2.axis_names, mesh2.devices.shape)) == \
        {"data": dp, "hypo": 2}
    model2 = LasrModel(cfg2)
    opt2 = make_optimizer(cfg2, steps_per_epoch=4)
    params2 = model2.init_params
    with jax.default_device(jax.devices()[0]):
        opt_state2 = opt2.init(params2)
    programs = build_programs(cfg2, model2, opt2, mesh2)

    from lasr_tpu.parallel import put_sharded_schedule
    steps = 3
    sched = np.zeros((steps, dp * b), np.int32)
    ids2 = put_sharded_schedule(sched, mesh2)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh2, P())
    params2, opt_state2 = jax.device_put((params2, opt_state2), repl)
    params2, opt_state2, scals, nscore2, _ = programs["epoch_scan"](
        params2, opt_state2, dev_arrays, ids2,
        jnp.asarray(0, jnp.int32), jnp.asarray(0),
        jnp.asarray(0, jnp.int32), knobs)
    losses = np.asarray(scals["total_loss"])
    assert losses.shape == (steps,) and np.isfinite(losses).all(), losses
    assert np.asarray(nscore2).shape == (cfg2.n_hypo,)
    print(f"dryrun_multichip({n_devices}): 2D mesh (data={dp} x hypo=2) "
          f"scanned-epoch loss={losses[-1]:.4f} OK")

    # scaling sanity-check (BASELINE.md projection input): steady per-step
    # wall of the SAME scanned-epoch program on the n-device mesh vs one
    # device.  Absolute CPU times say nothing about TPU throughput, but the
    # RATIO exposes any sharding overhead that would also tax real chips
    # (per-step collectives, resharding, host sync).  Opt-in: it costs
    # minutes of virtual-CPU compute the driver's compile-check dryrun
    # doesn't need (LASR_DRYRUN_TIMING=1 to enable).
    import os as _os
    if not _os.environ.get("LASR_DRYRUN_TIMING"):
        return
    import time as _time

    def _steady_ms(programs_, cfg_, mesh_, params_, opt_state_, steps_=8):
        sched_ = np.zeros((steps_, cfg_.ngpu * cfg_.batch_size), np.int32)
        ids_ = put_sharded_schedule(sched_, mesh_) if mesh_ is not None \
            else jnp.asarray(sched_)
        args = (dev_arrays, ids_, jnp.asarray(0, jnp.int32),
                jnp.asarray(0), jnp.asarray(0, jnp.int32), knobs)
        p_, s_, sc, *_ = programs_["epoch_scan"](params_, opt_state_, *args)
        np.asarray(sc["total_loss"])                    # compile + settle
        t0 = _time.time()
        p_, s_, sc, *_ = programs_["epoch_scan"](p_, s_, *args)
        np.asarray(sc["total_loss"])                    # host read barrier
        return (_time.time() - t0) * 1e3 / steps_

    ms_mesh = _steady_ms(programs, cfg2, mesh2, params2, opt_state2)
    # same GLOBAL work on one device: the mesh step consumes
    # ngpu*batch_size pairs, so the single-device reference must too
    cfg1 = dataclasses.replace(cfg2, ngpu=1, hypo_shards=1,
                               batch_size=cfg2.ngpu * cfg2.batch_size)
    model1 = LasrModel(cfg1)
    opt1 = make_optimizer(cfg1, steps_per_epoch=4)
    params1 = model1.init_params
    with jax.default_device(jax.devices()[0]):
        opt_state1 = opt1.init(params1)
    programs1 = build_programs(cfg1, model1, opt1, None)
    ms_one = _steady_ms(programs1, cfg1, None, params1, opt_state1)
    print(f"dryrun_multichip({n_devices}): scanned-epoch steady "
          f"{ms_mesh:.0f} ms/step on the {n_devices}-device mesh vs "
          f"{ms_one:.0f} ms/step single-device "
          f"(x{ms_one / max(ms_mesh, 1e-9):.2f} speedup, "
          f"{n_devices // 2}-way data x 2-way hypo, CPU devices)")


if __name__ == "__main__":
    import sys
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
