"""Hypothesis-sharded SPMD step == unsharded step (loss, grads, nscore).

Noise is off at epoch 0 / iters 0 (models/lasr.py apply_noise gate), so the
sharded and unsharded paths are deterministic and must agree to f32
reduction-order tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from lasr_tpu.parallel.hypo import hypo_mesh, hypo_value_and_grad


def _flat(tree, pre=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, pre + k + "."))
        else:
            out[pre + k] = np.asarray(v)
    return out


@pytest.mark.slow
@pytest.mark.parametrize("nshards", [2, 4])
def test_hypo_shard_matches_unsharded(nshards):
    cfg, model = ge._small_model(use_pallas=False, n_hypo=4)
    params = model.init_params
    batch = ge._fake_batch(1, cfg.img_size)
    rng = jax.random.PRNGKey(3)
    epoch = jnp.asarray(0)
    iters = jnp.asarray(0)
    knobs = {"noise_base": jnp.asarray(0.2), "rscale": jnp.asarray(1.0),
             "flow_rampup": jnp.asarray(0.0)}

    (loss_ref, aux_ref), grads_ref = jax.jit(jax.value_and_grad(
        model.loss_fn, has_aux=True))(params, batch, rng, epoch, iters, knobs)

    mesh = hypo_mesh(nshards)
    vg = hypo_value_and_grad(cfg, mesh, model)
    (loss_sh, aux_sh), grads_sh = jax.jit(vg)(params, batch, rng, epoch,
                                              iters, knobs)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(aux_sh["current_nscore"]),
                               np.asarray(aux_ref["current_nscore"]),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux_sh["mask_sub"]),
                               np.asarray(aux_ref["mask_sub"]),
                               rtol=2e-4, atol=1e-6)

    fr, fs = _flat(grads_ref), _flat(grads_sh)
    assert fr.keys() == fs.keys()
    for k in fr:
        # floor the scale: leaves with ~1e-10 grads at init (ctl_rs) are
        # pure reduction-order dust with no meaningful relative error.  The
        # flow loss backprops 0.5/sqrt(r+1e-24) through masked zero
        # residuals, so regrouped f32 reductions legitimately wiggle small
        # grads by ~1e-3 of leaf scale (sh2/sh4/ref all mutually differ at
        # that scale); semantic bugs (missing pmean, wrong 1/n) show as O(1)
        scale = max(np.abs(fr[k]).max(), 1e-5)
        np.testing.assert_allclose(fs[k] / scale, fr[k] / scale,
                                   atol=3e-3, err_msg=k)
