"""SPMD data parallelism over a `data` mesh axis.

Replaces the reference's DDP/NCCL process group (ref:optimize.py:42-47,
ref:nnutils/train_utils.py:104-109): parameters are replicated, frame-pair
batches are sharded over `data`, and XLA inserts the gradient all-reduce over
ICI during jit partitioning — no explicit collectives in user code.  The
rank-0 k-means broadcast (ref:train_utils.py:252-256) disappears: bone
re-init is deterministic, so every replica computes identical values.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(ndev: int | None = None) -> Mesh:
    devs = jax.devices()
    if ndev is not None:
        devs = devs[:ndev]
    return Mesh(np.asarray(devs), ("data",))


def shard_step(step_fn, mesh: Mesh):
    """jit a training step with (params, opt_state) replicated and the
    pair-id batch sharded over `data`.

    step_fn(params, opt_state, dev_arrays, pair_ids, rng, epoch, iters,
    knobs) -> pytrees.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, shard, repl, repl, repl, repl),
        # replicated outputs: on a (data, hypo) mesh, letting GSPMD choose
        # leaves per-hypothesis param leaves partitioned over `hypo`; the
        # committed sharding then MISMATCHES the next dispatch's replicated
        # in_shardings, which raises (donated args are never re-sharded).
        # Forcing repl keeps every epoch's outputs in the rest sharding.
        out_shardings=repl,
    )


def put_sharded_ids(ids: np.ndarray, mesh: Mesh):
    import jax.numpy as jnp
    return jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("data")))


def put_sharded_schedule(ids: np.ndarray, mesh: Mesh):
    """[steps, ndev*b] epoch schedule, sharded over the batch axis."""
    import jax.numpy as jnp
    return jax.device_put(jnp.asarray(ids),
                          NamedSharding(mesh, P(None, "data")))


def shard_epoch_scan(scan_fn, mesh: Mesh):
    """jit the scanned-epoch step: params/opt replicated, schedule sharded
    over `data` on its batch axis.

    scan_fn(params, opt_state, dev_arrays, ids_all, key, epoch, iter0,
    knobs)."""
    repl = NamedSharding(mesh, P())
    sched = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        scan_fn,
        in_shardings=(repl, repl, repl, sched, repl, repl, repl, repl),
        # repl outputs for the same reason as shard_step: epoch N+1 re-feeds
        # epoch N's params/opt_state, and a GSPMD-chosen `hypo` partition on
        # them would clash with the replicated in_shardings at dispatch.
        out_shardings=repl,
        donate_argnums=(0, 1),
    )
