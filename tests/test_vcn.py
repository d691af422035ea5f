"""Numerical parity of the JAX VCN flow net against the reference torch
implementation (ref:third_party/ext_nnutils/VCNplus.py), eval mode, random
weights converted through `convert_torch_state`.

The torch reference's eval-mode corrf requires the coarsest (1/64) feature
map to be larger than maxdisp=4, so inputs must be >= 320 px per side.
"""

import os
import sys
import types

import numpy as np
import pytest

# torch-parity tests are integration-weight
pytestmark = pytest.mark.slow

REFERENCE = "/root/reference/third_party"


def _load_torch_vcn():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not available")
    # The reference imports kornia at module scope but the eval path never
    # touches it; stub it out rather than requiring the package.
    sys.modules.setdefault("kornia", types.ModuleType("kornia"))
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from ext_nnutils.VCNplus import VCN  # noqa: E402
    return torch, VCN


@pytest.fixture(scope="module")
def vcn_pair():
    torch, VCN = _load_torch_vcn()
    H, W = 320, 384
    torch.manual_seed(7)
    model = VCN([1, W, H], md=[4, 4, 4, 4, 4], fac=1)
    model.eval()

    from lasr_tpu.models.vcn import convert_torch_state
    params = convert_torch_state(model.state_dict())
    return torch, model, params, H, W


def test_vcn_forward_parity(vcn_pair):
    torch, model, params, H, W = vcn_pair
    rng = np.random.RandomState(0)
    im = rng.randn(2, 3, H, W).astype(np.float32) * 0.2

    with torch.no_grad():
        flow_t, occ_t = model(torch.from_numpy(im))
    flow_t = flow_t.numpy()          # [1, 2, H, W]
    occ_t = occ_t.numpy()            # [H/4, W/4]

    import jax.numpy as jnp
    from lasr_tpu.models.vcn import vcn_forward
    flow_j, occ_j = vcn_forward(params, jnp.asarray(im.transpose(0, 2, 3, 1)))
    flow_j = np.asarray(flow_j[0]).transpose(2, 0, 1)
    occ_j = np.asarray(occ_j[0])

    assert flow_j.shape == flow_t.shape[1:]
    assert occ_j.shape == occ_t.shape
    scale = np.abs(flow_t).mean() + 1e-3
    assert np.abs(flow_j - flow_t[0]).max() / scale < 2e-2
    np.testing.assert_allclose(occ_j, occ_t, rtol=1e-3, atol=5e-4)


def test_pspnet_parity(vcn_pair):
    torch, model, params, H, W = vcn_pair
    rng = np.random.RandomState(1)
    im = rng.randn(1, 3, H, W).astype(np.float32) * 0.3

    with torch.no_grad():
        feats_t = model.pspnet(torch.from_numpy(im))

    import jax.numpy as jnp
    from lasr_tpu.models.vcn import pspnet
    feats_j = pspnet(params["pspnet"], jnp.asarray(im.transpose(0, 2, 3, 1)))
    for ft, fj in zip(feats_t, feats_j):
        fj = np.asarray(fj).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(fj, ft.numpy(), rtol=1e-3, atol=2e-4)
