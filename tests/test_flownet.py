"""In-framework flow net: warp/correlation primitives + learnability."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lasr_tpu.models import flownet


def test_warp_recovers_shift():
    r = np.random.RandomState(0)
    img = jnp.asarray(r.rand(1, 32, 32, 3).astype(np.float32))
    # flow of (+3, +2) everywhere: out(p) = img(p + flow)
    flow = jnp.broadcast_to(jnp.asarray([3.0, 2.0]), (1, 32, 32, 2))
    out = np.asarray(flownet.warp(img, flow))
    np.testing.assert_allclose(out[0, :-2, :-3], np.asarray(img)[0, 2:, 3:],
                               atol=1e-5)


def test_local_corr_peaks_at_true_offset():
    r = np.random.RandomState(1)
    f = r.rand(1, 24, 24, 8).astype(np.float32)
    shifted = np.roll(f, (2, -1), axis=(1, 2))
    corr = np.asarray(flownet.local_corr(jnp.asarray(f),
                                         jnp.asarray(shifted), radius=4))
    # displacement (dy=2, dx=-1) of f1 content relative to f0 means the
    # matching patch sits at window index (dy+r, dx+r)
    interior = corr[0, 8:-8, 8:-8]
    win = interior.reshape(-1, 81).mean(0)
    assert win.argmax() == (2 + 4) * 9 + (-1 + 4)


def test_flownet_learns_constant_flow():
    """A few Adam steps on one synthetic pair with uniform motion must cut
    the loss substantially (sanity of grads through warp + corr + pyramid)."""
    r = np.random.RandomState(2)
    base = r.rand(80, 80, 3).astype(np.float32)
    im0 = base[8:72, 8:72][None]
    im1 = base[4:68, 8:72][None]         # content moved down by 4 px
    gt = np.zeros((1, 64, 64, 2), np.float32)
    gt[..., 1] = -4.0

    net = flownet.FlowNet(radius=2)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(im0),
                      jnp.asarray(im1))
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            outs = net.apply(p, jnp.asarray(im0), jnp.asarray(im1))
            return flownet.multiscale_loss(outs, jnp.asarray(gt))
        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    losses = []
    for _ in range(30):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], losses[::10]


def test_full_res_flow_scaling():
    outs = [jnp.ones((1, 4, 4, 2)), jnp.ones((1, 8, 8, 2)),
            jnp.ones((1, 16, 16, 2))]
    full = np.asarray(flownet.full_res_flow(outs, (64, 64)))
    assert full.shape == (1, 64, 64, 2)
    np.testing.assert_allclose(full, 4.0)    # 1/4-res flow of 1px -> 4px


def test_full_res_flow_nonsquare_per_axis_scaling():
    # 1px of flow at 16x8 upsampled to 64x64 is x2 horizontal, x4 vertical
    outs = [jnp.ones((1, 16, 8, 2))]
    full = np.asarray(flownet.full_res_flow(outs, (64, 64)))
    np.testing.assert_allclose(full[..., 0], 8.0)   # x: 64/8
    np.testing.assert_allclose(full[..., 1], 4.0)   # y: 64/16


def test_backend_occ_sign_convention(tmp_path, monkeypatch):
    """The flow loss weights pixels by sigmoid(-occ) (lasr.py, matching
    ref:mesh_net.py:403-406): CONSISTENT pixels must carry a NEGATIVE occ
    score.  Round-3 advisor found the flownet backend emitting the inverted
    convention; round 4's fix was binary (±10), which threw away the error
    magnitude — the score is now GRADED, clip(err_px - 1, -10, 100),
    matching the DIS backend (preprocess/auto_gen.py:57) so the two
    backends' scores are interchangeable downstream."""
    net = flownet.FlowNet()            # default radius: must match make_backend
    im = jnp.zeros((1, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(0), im, im)
    wpath = str(tmp_path / "w.npz")
    flownet.save_params(wpath, params)

    backend = flownet.make_backend(wpath, infer_size=32)
    img = (np.random.RandomState(3).rand(32, 32, 3) * 255).astype(np.uint8)
    # identical frames -> fw and bw flow agree (both ~the same small field),
    # so forward-backward consistency holds everywhere
    flow, occ = backend(img, img)
    assert flow.shape == (32, 32, 3)
    # DIS-matching graded score: err ~ 0 px -> occ ~ -1 -> weight ~ 0.73,
    # same as a perfectly consistent DIS pixel
    assert np.median(occ) < -0.5, (
        f"consistent pixels must score ~clip(0 - 1) = -1, got median "
        f"{np.median(occ):.2f}")
    assert occ.min() >= -10.0 and occ.max() <= 100.0  # DIS clip range
    w = 1.0 / (1.0 + np.exp(occ))            # sigmoid(-occ)
    assert np.median(w) > 0.6, (
        f"consistent pixels must get the DIS-consistent flow-loss weight, "
        f"got median {np.median(w):.3f}")
    # channel 2 of the written flow is the validity indicator (all-ones,
    # like DIS) — the graded score must live in occ only
    np.testing.assert_array_equal(flow[..., 2], 1.0)
