"""The MXU scatter-add VJP of render_mesh's face gather must match the
plain gather's autodiff transpose (results/profile_r5.json motivated the
custom path: XLA's scatter lowering cost 9.3 ms/step, 16% of the step)."""

import jax
import jax.numpy as jnp
import numpy as np

from lasr_tpu.ops.rasterize import _gather


def _plain(attr, faces):
    return jax.vmap(lambda a, f: a[f])(attr, faces)


def test_gather_forward_parity():
    r = np.random.RandomState(0)
    attr = jnp.asarray(r.randn(2, 7, 5).astype(np.float32))
    faces = jnp.asarray(r.randint(0, 7, (2, 11, 3)))
    np.testing.assert_array_equal(np.asarray(_gather(attr, faces)),
                                  np.asarray(_plain(attr, faces)))


def test_gather_vjp_matches_autodiff_scatter():
    r = np.random.RandomState(1)
    attr = jnp.asarray(r.randn(3, 13, 12).astype(np.float32))
    faces = jnp.asarray(r.randint(0, 13, (3, 40, 3)))
    g = jnp.asarray(r.randn(3, 40, 3, 12).astype(np.float32))
    d_plain = jax.grad(lambda a: (_plain(a, faces) * g).sum())(attr)
    d_custom = jax.grad(lambda a: (_gather(a, faces) * g).sum())(attr)
    np.testing.assert_allclose(np.asarray(d_plain), np.asarray(d_custom),
                               rtol=1e-5, atol=1e-5)


def test_gather_vjp_under_jit_and_vmap():
    r = np.random.RandomState(2)
    attr = jnp.asarray(r.randn(2, 9, 3).astype(np.float32))
    faces = jnp.asarray(r.randint(0, 9, (2, 17, 3)))

    @jax.jit
    def loss(a):
        fv = _gather(a, faces)
        return (fv ** 2).sum()

    d = jax.grad(loss)(attr)
    d_ref = jax.grad(
        lambda a: (_plain(a, faces) ** 2).sum())(attr)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)
