"""End-to-end energy smoke tests: finite loss + grads across config variants
(small images, jnp rasterizer, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lasr_tpu.config import LasrConfig
from lasr_tpu.models.lasr import LasrModel

S = 64
B = 1  # pairs


def make_batch(rng, b=B, s=S):
    n2 = 2 * b
    r = np.random.RandomState(rng)
    mask = np.zeros((n2, s, s), np.float32)
    mask[:, s // 4: 3 * s // 4, s // 4: 3 * s // 4] = 1.0
    return {
        "input_imgs": jnp.asarray(r.randn(n2, 3, s, s).astype(np.float32)),
        "imgs": jnp.asarray(r.rand(n2, 3, s, s).astype(np.float32)),
        "masks": jnp.asarray(mask),
        "cams": jnp.asarray(
            np.tile(np.array([1.0, 0, 0, 1, 0, 0, 0], np.float32), (n2, 1))),
        "depth_gt": jnp.full((n2,), 10.0),
        "flow": jnp.asarray((r.randn(n2, 3, s, s) * 0.01).astype(np.float32)),
        "occ": jnp.full((n2, s, s), -1.0),
        "ddts_barrier": jnp.asarray(r.rand(n2, s, s).astype(np.float32)),
        "pp": jnp.zeros((n2, 2)),
        "oriimg_shape": jnp.full((n2, 2), float(s)),
    }


CONFIGS = {
    "rigid-sym": dict(n_bones=1, n_hypo=1, symmetric=True),
    "bones-hypo": dict(n_bones=3, n_hypo=2, symmetric=True),
    "asym": dict(n_bones=3, n_hypo=1, symmetric=False),
    "gtpose": dict(n_bones=1, n_hypo=1, symmetric=False, use_gtpose=True),
}


@pytest.mark.parametrize("name", list(CONFIGS))
@pytest.mark.slow
def test_energy_finite(name):
    cfg = LasrConfig(img_size=S, subdivide=1, num_epochs=10, use_pallas=False,
                     sigval=1e-3, **CONFIGS[name])
    model = LasrModel(cfg)
    params = model.init_params
    batch = make_batch(0)
    rng = jax.random.PRNGKey(0)

    loss, aux = model.loss_fn(params, batch, rng, jnp.asarray(0), jnp.asarray(0))
    assert np.isfinite(float(loss)), name
    assert np.isfinite(float(aux["mask_loss"]))
    assert aux["current_nscore"].shape == (cfg.n_hypo,)
    assert aux["mask_pred"].shape == (2 * B, cfg.n_hypo, S, S)
    a = float(aux["mask_pred"].max())
    assert 0.0 < a <= 1.0 + 1e-5

    grads = jax.grad(lambda p: model.loss_fn(p, batch, rng, jnp.asarray(1),
                                             jnp.asarray(5))[0])(params)
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all(), name
    # shape and camera parameters both get gradient signal
    assert float(jnp.abs(grads["mean_v"]).max()) > 0
    enc_leaves = jax.tree_util.tree_leaves(grads["encoder"])
    assert any(float(jnp.abs(g).max()) > 0 for g in enc_leaves)


def test_energy_jits_and_noise_path():
    cfg = LasrConfig(img_size=S, subdivide=1, num_epochs=10, n_bones=3,
                     n_hypo=2, use_pallas=False, sigval=1e-3)
    model = LasrModel(cfg)
    params = model.init_params
    batch = make_batch(1)

    step = jax.jit(lambda p, b, r, e, i: model.loss_fn(p, b, r, e, i)[0])
    l0 = step(params, batch, jax.random.PRNGKey(0), jnp.asarray(0), jnp.asarray(0))
    # same compiled fn on the noise path (epoch>0, 1<iters<100)
    l1 = step(params, batch, jax.random.PRNGKey(1), jnp.asarray(2), jnp.asarray(50))
    l2 = step(params, batch, jax.random.PRNGKey(2), jnp.asarray(2), jnp.asarray(50))
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    # noise actually perturbs the energy
    assert abs(float(l1) - float(l2)) > 1e-7
    # no-noise iters are deterministic in the rng
    l3 = step(params, batch, jax.random.PRNGKey(1), jnp.asarray(2), jnp.asarray(150))
    l4 = step(params, batch, jax.random.PRNGKey(2), jnp.asarray(2), jnp.asarray(150))
    assert float(l3) == float(l4)


@pytest.mark.slow
def test_pnet_as_argument_matches_closure_and_shrinks_hlo():
    """The frozen perceptual weights may arrive via knobs["pnet"] (how the
    trainer ships them — one upload, not 39 MB of HLO constants per stage
    executable).  The two paths must be bit-identical, and the argument
    path's lowering must actually be free of the weight constants."""
    cfg = LasrConfig(img_size=S, subdivide=1, num_epochs=10, n_bones=3,
                     n_hypo=2, use_pallas=False, sigval=1e-3, opt_tex=True)
    model = LasrModel(cfg)
    params = model.init_params
    batch = make_batch(2)
    rng = jax.random.PRNGKey(0)
    e = jnp.asarray(0)

    l_closure, _ = model.loss_fn(params, batch, rng, e, e)
    pnet = jax.tree.map(jnp.asarray, model.perceptual.params)
    l_arg, _ = model.loss_fn(params, batch, rng, e, e, {"pnet": pnet})
    assert float(l_closure) == float(l_arg)

    low_closure = jax.jit(
        lambda p, b: model.loss_fn(p, b, rng, e, e)[0]).lower(params, batch)
    low_arg = jax.jit(
        lambda p, b, k: model.loss_fn(p, b, rng, e, e, k)[0]).lower(
            params, batch, {"pnet": pnet})
    n_closure = len(low_closure.as_text())
    n_arg = len(low_arg.as_text())
    # at 64px the closure path embeds ~9.6 MB of conv filters; the argument
    # path must not (topology tables etc. stay well under 1 MB)
    assert n_closure > 5 * n_arg, (n_closure, n_arg)


import jax.flatten_util  # noqa: E402  (used above)
