"""Hypothesis-parallel SPMD over a `hypo` mesh axis.

Stage 0 of every schedule optimizes n_hypo (8-16) camera hypotheses at
batch_size 1 — there is no batch axis to data-parallelize, but the
hypothesis axis is embarrassingly parallel: hypotheses interact only at
score selection (an epoch-boundary host decision) and through shared
parameters (encoder trunk, trans/depth/ppoint heads).  The reference cannot
split this axis at all (its hypotheses live inside one CUDA module,
ref:nnutils/mesh_net.py:152-235); here a `shard_map` partitions every
per-hypothesis tensor — including the Pallas rasterizer calls, which run
per-shard at local size by construction — so a v4-8 runs stage 0 ~n_dev
times faster.

Sharding is spec-only, no layout changes: the per-hypothesis parameter banks
are either leading-axis-H (mean_v, tex, ctl_*) or H-major in a folded Dense
output dim (quat kernel [nz, 4*K*H], scale kernel [nz, H] — see
models/encoder.py CodePredictor), so contiguous shard_map splits land on
whole hypotheses.

Gradient semantics: global loss = mean over shards of the per-shard loss
(every energy term means over its hypothesis axis, models/lasr.py:385-520),
so shared-parameter grads are `pmean`ed across shards and per-hypothesis
grads are scaled by 1/n_shards.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved to the public namespace in newer jax
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

AXIS = "hypo"

# parameter leaves with a leading hypothesis axis
_HYPO_TOP = ("mean_v", "tex", "ctl_rs", "rest_ts", "ctl_ts", "log_ctl")
# CodePredictor heads with H folded (H-major) into the output dim
_HYPO_HEADS = ("quat", "scale")

# aux entries by hypothesis-axis position (everything else is a pmean scalar)
_AUX_H_AX0 = ("current_nscore", "skin")
_AUX_H_AX1 = ("mask_pred", "flow_rd", "vis_mask", "texture_render",
              "verts_pre", "ctl_proj", "mask_sub", "flow_sub", "tex_sub")


def hypo_mesh(nshards: int) -> Mesh:
    devs = jax.devices()
    assert len(devs) >= nshards, \
        f"hypo_shards={nshards} but only {len(devs)} devices"
    return Mesh(np.asarray(devs[:nshards]), (AXIS,))


def param_specs(params):
    """PartitionSpec tree marking the hypothesis axis of each param leaf."""
    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if path[0] in _HYPO_TOP:
            return P(AXIS, *([None] * (tree.ndim - 1)))
        if path[0] == "code_predictor" and len(path) >= 2 \
                and path[-2] in _HYPO_HEADS:
            return P(None, AXIS) if path[-1] == "kernel" else P(AXIS)
        return P()
    return walk(params, ())


def _is_sharded(spec) -> bool:
    return any(s is not None for s in spec)


def hypo_value_and_grad(cfg, mesh: Mesh, model):
    """Build vg(params, batch, rng, epoch, iters, knobs) ->
    ((loss, aux), grads) with the hypothesis axis partitioned over `mesh`.

    `model` is the global-H LasrModel (used only to discover the aux
    structure); compute runs on a per-shard model with n_hypo/H_shards
    hypotheses.  Results are bit-compatible with the unsharded step up to
    f32 reduction order (tests/test_hypo_shard.py).
    """
    from ..models.lasr import LasrModel

    n = mesh.shape[AXIS]
    H = cfg.n_hypo
    assert H % n == 0 and H > 1, f"n_hypo={H} not divisible by shards={n}"
    # the cross-hypothesis texture-symmetry pull (models/lasr.py:454-457)
    # reads hypothesis 0 from every shard; it only arises in asymmetric
    # stages, which run with n_hypo == 1
    assert cfg.symmetric or not cfg.symmetric_loss, \
        "asymmetric symmetric_loss stage cannot shard hypotheses"
    assert not cfg.use_gtpose, "use_gtpose implies a single hypothesis"
    lcfg = dataclasses.replace(cfg, n_hypo=H // n, n_hypo_global=H,
                               hypo_shards=1, ngpu=1)
    lmodel = LasrModel(lcfg)

    cache = {}

    def vg(params, batch, rng, epoch, iters, knobs):
        pspecs = param_specs(params)
        if "f" not in cache:
            _, aux_shape = jax.eval_shape(
                model.loss_fn, params, batch, rng, epoch, iters, knobs)
            aspecs = {k: (P(AXIS) if k in _AUX_H_AX0 else
                          P(None, AXIS) if k in _AUX_H_AX1 else P())
                      for k in aux_shape}

            def body(params, batch, rng, epoch, iters, knobs):
                rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS))
                (loss, aux), grads = jax.value_and_grad(
                    lmodel.loss_fn, has_aux=True)(params, batch, rng, epoch,
                                                  iters, knobs)
                loss = jax.lax.pmean(loss, AXIS)

                def scale(g, s):
                    # PartitionSpec is a tuple subclass, so jax.tree.map
                    # would recurse into it; walk the dicts by hand
                    if isinstance(g, dict):
                        return {k: scale(g[k], s[k]) for k in g}
                    return g / n if _is_sharded(s) else jax.lax.pmean(g, AXIS)

                grads = scale(grads, pspecs)
                aux = {k: (v if _is_sharded(aspecs[k])
                           else jax.lax.pmean(v, AXIS))
                       for k, v in aux.items()}
                return (loss, aux), grads

            cache["f"] = _shard_map(
                body, mesh=mesh,
                in_specs=(pspecs, P(), P(), P(), P(), P()),
                out_specs=((P(), aspecs), pspecs),
                # only the hypo axis is manual: on a 2D (data, hypo) mesh the
                # data axis stays with the automatic partitioner, so batch
                # sharding + its gradient all-reduce compose with this map
                axis_names={AXIS},
                # vma tracking chokes on mixed carries inside the
                # rasterizer's lax.scan; replicated outputs are explicitly
                # pmean'ed above, so the check adds nothing here
                check_vma=False)
        return cache["f"](params, batch, rng, epoch, iters, knobs)

    return vg
