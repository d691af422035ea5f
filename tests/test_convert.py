"""Torch -> flax weight-conversion parity tests.

The real pretrained weights (torchvision ResNet18 / AlexNet) are not
available offline, so the converters are proven on randomly-initialized
torch replicas built with torchvision's exact module/parameter naming:
convert random torch weights, run both nets on the same input, and require
numerical agreement.  This is the same strategy tests/test_vcn.py uses for
the VCN flow net.

Replica fidelity notes: the replica below reproduces torchvision resnet18's
state_dict key names (conv1, bn1, layerL.B.convN/bnN/downsample) and the
reference Encoder wrapper's names (resnet_conv.resnet.*, enc_conv1.*,
enc_fc.*, ref:third_party/ext_nnutils/net_blocks.py:291-339) exactly —
that's what the converter keys on.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lasr_tpu.models import torch_convert as tc  # noqa: E402
from lasr_tpu.models.encoder import Encoder  # noqa: E402
from lasr_tpu.models.perceptual import PerceptualLoss  # noqa: E402

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------------------
# torch replicas with torchvision-exact naming
# ---------------------------------------------------------------------------
class _BasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


class _ResNet18(tnn.Module):
    """torchvision.models.resnet18 replica (trunk only, fc unused)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(_BasicBlock(64, 64), _BasicBlock(64, 64))
        self.layer2 = tnn.Sequential(_BasicBlock(64, 128, 2), _BasicBlock(128, 128))
        self.layer3 = tnn.Sequential(_BasicBlock(128, 256, 2), _BasicBlock(256, 256))
        self.layer4 = tnn.Sequential(_BasicBlock(256, 512, 2), _BasicBlock(512, 512))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class _RefEncoder(tnn.Module):
    """Reference Encoder replica (ref:net_blocks.py:316-339): trunk ->
    4x4/2 conv+BN+LeakyReLU -> two (Linear+BN1d+LeakyReLU) fc layers."""

    class _Wrap(tnn.Module):
        def __init__(self):
            super().__init__()
            self.resnet = _ResNet18()

    def __init__(self, img=256, nz=200):
        super().__init__()
        self.resnet_conv = self._Wrap()
        self.enc_conv1 = tnn.Sequential(
            tnn.Conv2d(512, 256, 4, 2, 1, bias=True),
            tnn.BatchNorm2d(256), tnn.LeakyReLU(0.2, inplace=True))
        nc = 256 * (img // 64) * (img // 64)
        self.enc_fc = tnn.Sequential(
            tnn.Sequential(tnn.Linear(nc, nz), tnn.BatchNorm1d(nz),
                           tnn.LeakyReLU(0.2, inplace=True)),
            tnn.Sequential(tnn.Linear(nz, nz), tnn.BatchNorm1d(nz),
                           tnn.LeakyReLU(0.2, inplace=True)))

    def forward(self, x):
        x = self.resnet_conv.resnet(x)
        x = self.enc_conv1(x)
        x = x.reshape(x.size(0), -1)
        return self.enc_fc(x)


def _randomize_bn_stats(model, gen):
    """Give BN layers non-trivial running stats so the folding is tested."""
    for m in model.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.running_mean.copy_(torch.randn(
                m.running_mean.shape, generator=gen) * 0.5)
            m.running_var.copy_(torch.rand(
                m.running_var.shape, generator=gen) * 2 + 0.1)


def _np_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
@pytest.mark.parametrize("img", [128])
def test_encoder_conversion_parity(img):
    gen = torch.Generator().manual_seed(0)
    ref = _RefEncoder(img=img, nz=200)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        _randomize_bn_stats(ref, gen)
    ref.eval()

    x = torch.randn(2, 3, img, img, generator=gen)
    with torch.no_grad():
        want = ref(x).numpy()

    converted = tc.convert_reference_encoder(_np_state(ref),
                                             spatial=img // 64)
    enc = Encoder(nz_feat=200)
    shapes = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, img, img, 3))),
        jax.ShapeDtypeStruct((2,), jnp.uint32))
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    params = tc.apply_encoder_weights(params, converted)
    # every leaf overwritten? (full-encoder conversion covers the whole tree)
    got = enc.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_trunk_only_conversion_covers_trunk_modules():
    gen = torch.Generator().manual_seed(1)
    net = _ResNet18()
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        _randomize_bn_stats(net, gen)
    tree = tc.convert_resnet18_trunk(_np_state(net))
    mods = set(tree)
    assert mods == {"Conv_0", "AffineNorm_0"} | {
        f"BasicBlock_{i}" for i in range(8)}
    # npz round trip (recursive: BasicBlocks nest one level deeper)
    flat = tc.encoder_tree_to_flat(tree)
    back = tc.encoder_flat_to_tree(flat)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(np.array_equal(a, b)), tree, back))
    # overlaying the trunk onto real Encoder params leaves head params alone
    enc = Encoder(nz_feat=200)
    shapes = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 128, 128, 3))),
        jax.ShapeDtypeStruct((2,), jnp.uint32))
    params = jax.tree.map(lambda s: np.full(s.shape, 7.0, np.float32), shapes)
    merged = tc.apply_encoder_weights(params, back)
    np.testing.assert_array_equal(
        merged["params"]["BasicBlock_0"]["Conv_0"]["kernel"],
        tree["BasicBlock_0"]["Conv_0"]["kernel"])
    assert (merged["params"]["Dense_0"]["kernel"] == 7.0).all()


def test_alexnet_conversion_parity():
    gen = torch.Generator().manual_seed(2)
    feats = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(inplace=True),
    )
    with torch.no_grad():
        for p in feats.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    feats.eval()

    state = {f"features.{k}": v.detach().numpy()
             for k, v in feats.state_dict().items()}
    out = tc.convert_alexnet_features(state)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "alex.npz")
        np.savez(path, **out)
        ploss = PerceptualLoss(seed=0)
        ploss.load_torch_weights(path)

    x = torch.randn(1, 3, 64, 64, generator=gen)
    with torch.no_grad():
        want = feats(x).numpy()     # final slice
    # apply the raw feature net (bypassing the loss's input normalization)
    # on the identical input and compare the final feature slice
    slices = ploss.net.apply(ploss.params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(slices[-1]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_perceptual_distance_with_converted_weights_is_finite():
    ploss = PerceptualLoss(seed=3)
    a = jnp.asarray(np.random.RandomState(0).rand(2, 3, 64, 64), jnp.float32)
    b = jnp.asarray(np.random.RandomState(1).rand(2, 3, 64, 64), jnp.float32)
    d = np.asarray(ploss(2 * a - 1, 2 * b - 1))
    assert d.shape == (2,) and np.isfinite(d).all() and (d > 0).all()
