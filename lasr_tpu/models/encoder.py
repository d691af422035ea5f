"""CNN encoder + camera/bone code predictor (flax).

Behavioral parity with ref:third_party/ext_nnutils/net_blocks.py:
  * Encoder: ResNet18-topology conv trunk -> stride-2 4x4 conv (512->256) ->
    two fc layers -> nz_feat code (Encoder:316-339).
  * CodePredictor heads with the reference's parametrization quirks:
    +10 rest-quaternion bias on non-body bones (QuatPredictor:353),
    +20 depth offset with ReLU floor (DepthPredictor:372-382),
    /10 scalings of trans/ppoint/bone-depth (CodePredictor:438-450),
    per-hypothesis banks for quat and scale only.

Substitution (documented in docs/DESIGN.md): no ImageNet-pretrained weights
are available offline, so the trunk is deterministically He-initialized and
all norm layers are affine-only ("frozen") — functionally what the reference
runs, since it forces every BatchNorm to eval() from step 0
(ref:nnutils/mesh_net.py:190-195).

Layout: images are NHWC float32 in [-2.5, 2.5]-ish (ImageNet-normalized).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quat as quat_ops


class AffineNorm(nn.Module):
    """Frozen-BatchNorm equivalent: y = x * scale + bias (per channel)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False)(x)
        y = AffineNorm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        y = AffineNorm()(y)
        if self.stride != 1 or identity.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False)(x)
            identity = AffineNorm()(identity)
        return nn.relu(y + identity)


class Encoder(nn.Module):
    """Image [B, S, S, 3] -> code [B, nz_feat]."""

    nz_feat: int = 200

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False)(x)
        x = nn.relu(AffineNorm()(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for feats, stride in ((64, 1), (128, 2), (256, 2), (512, 2)):
            x = BasicBlock(feats, stride)(x)
            x = BasicBlock(feats, 1)(x)
        # ref enc_conv1: 4x4 stride-2 conv 512->256 + norm + leaky relu
        x = nn.Conv(256, (4, 4), (2, 2), padding=1,
                    kernel_init=nn.initializers.normal(0.02))(x)
        x = nn.leaky_relu(AffineNorm()(x), 0.2)
        x = x.reshape(x.shape[0], -1)
        for _ in range(2):
            x = nn.Dense(self.nz_feat,
                         kernel_init=nn.initializers.normal(0.02))(x)
            x = nn.leaky_relu(AffineNorm()(x), 0.2)
        return x


class CodePredictor(nn.Module):
    """Code [B, nz] -> camera/bone parameters.

    Returns dict:
      scale  [B, H]          focal multiplier, relu(x+20)+eps
      rotmat [B, H, K, 3, 3] R(q) with +10 rest bias on bones
      trans  [B, K, 2]       shared across hypotheses
      depth  [B, K]          body ~ relu(x+20), bones (relu(x+20)-20)/10
      ppoint [B, 2]          principal point offset /10
    """

    n_bones: int = 1
    n_hypo: int = 1
    # rest bias on the ROOT quaternion's w component.  0 (reference
    # behavior): normalize(small gaussian) makes every (frame, hypothesis)
    # root start at a near-uniform random rotation — the search diversity
    # stage 0 needs when cameras come from nothing.  Nonzero (set when a
    # flow-chain camera init is active): the root starts near identity so
    # the composed camera starts near the chain estimate, with the
    # residual gaussian providing a moderate spread around it (and the
    # pose-noise annealing still exploring beyond it).
    root_quat_bias: float = 0.0

    @nn.compact
    def __call__(self, feat):
        B = feat.shape[0]
        K, H = self.n_bones, self.n_hypo
        init = nn.initializers.normal(0.02)

        q = nn.Dense(4 * K * H, kernel_init=init, name="quat")(feat)
        q = q.reshape(B, H, K, 4)
        q = q.at[:, :, 1:, 3].add(10.0)
        if self.root_quat_bias:
            q = q.at[:, :, 0, 3].add(self.root_quat_bias)
        q = quat_ops.normalize(q)
        rotmat = quat_ops.quat_to_rotmat_xyzw(q)

        scale = nn.Dense(H, kernel_init=init, name="scale")(feat)
        scale = jax.nn.relu(scale + 20.0) + 1e-12

        trans = nn.Dense(2 * K, kernel_init=init, name="trans")(feat)
        trans = trans.reshape(B, K, 2) / 10.0

        depth = nn.Dense(K, kernel_init=init, name="depth")(feat)
        depth = jax.nn.relu(depth + 20.0) + 1e-12
        if K > 1:
            depth = jnp.concatenate(
                [depth[:, :1], (depth[:, 1:] - 20.0) / 10.0], axis=1)

        ppoint = nn.Dense(2, kernel_init=init, name="ppoint")(feat) / 10.0

        return dict(scale=scale, rotmat=rotmat, quat=q, trans=trans,
                    depth=depth, ppoint=ppoint)


def _host_init(shapes, seed: int) -> dict:
    """numpy initialization matching the flax module definitions above.

    Initializing through XLA (jitted enc.init/pred.init) costs a full
    compile of the init program — measured ~17s on the tunneled TPU backend
    and ~90s on this host's XLA-CPU — for what is just RNG sampling.
    `shapes` comes from jax.eval_shape (tracing only, no compile); rules:
      * AffineNorm: scale -> ones, bias -> zeros;
      * code_predictor heads: torch nn.Linear default U(±1/sqrt(nz_feat))
        for weight and bias;
      * fc-stack Dense + the 4x4 enc_conv1 (Encoder's Conv_1): N(0, 0.02)
        (ref:third_party/ext_nnutils/net_blocks.py:236-249), zero bias;
      * ResNet trunk convs: kaiming_normal(fan_out, relu) — torchvision's
        unpretrained resnet18 init (the closest offline stand-in for the
        reference's pretrained=True trunk).
    """
    rng = np.random.RandomState(seed & 0x7FFFFFFF)

    def init_leaf(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        last = names[-1]
        shape = tuple(leaf.shape)
        root = names[0]                      # "encoder" | "code_predictor"
        if "AffineNorm" in names[-2]:
            fill = np.ones if last == "scale" else np.zeros
            return fill(shape, np.float32)
        if root == "code_predictor":
            # torch nn.Linear default: U(±1/sqrt(fan_in)) for weight AND
            # bias (the reference heads are NOT net_init-ed,
            # ref:net_blocks.py:424-436).  The random per-hypothesis bias
            # gives each camera hypothesis a distinct base rotation that
            # survives early feature collapse.
            bound = 1.0 / math.sqrt(200.0)
            return rng.uniform(-bound, bound, shape).astype(np.float32)
        if last == "bias":
            return np.zeros(shape, np.float32)
        assert last == "kernel", f"unknown param {names}"
        mods = names[2:-1]                   # module chain under "params"
        if mods[0] in ("Conv_1", "Dense_0", "Dense_1"):
            # net_init: N(0, 0.02) (ref:net_blocks.py:236-249)
            return (0.02 * rng.standard_normal(shape)).astype(np.float32)
        # ResNet trunk convs: torchvision's kaiming_normal(fan_out, relu)
        # (the unpretrained torch init).  Variance-preserving through the
        # ReLU stack — the previous lecun-normal decayed activation
        # variance ~0.5x per layer, leaving near-identical features for
        # different frames and letting the camera heads collapse to a
        # static-camera minimum.  flax conv kernels are [kh, kw, cin, cout].
        fan_out = shape[-1] * int(np.prod(shape[:-2]))
        std = math.sqrt(2.0 / fan_out)
        return (std * rng.standard_normal(shape)).astype(np.float32)

    return jax.tree_util.tree_map_with_path(init_leaf, shapes)


def create_nets(seed: int, img_size: int, nz_feat: int, n_bones: int,
                n_hypo: int, root_quat_bias: float = 0.0):
    """Initialize encoder + predictor; returns (modules, host params).

    Shapes come from jax.eval_shape (pure tracing); values are sampled with
    numpy on the host.  No XLA compile and no device op whatsoever: even a
    single tiny eager op at init time can stall minutes on a cold tunneled
    TPU backend (first-op compile + transport round-trip).  The trainer
    device-puts the params where it wants them."""
    enc = Encoder(nz_feat=nz_feat)
    pred = CodePredictor(n_bones=n_bones, n_hypo=n_hypo,
                         root_quat_bias=root_quat_bias)

    def _init(key):
        k1, k2 = jax.random.split(key)
        dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        return {"encoder": enc.init(k1, dummy),
                "code_predictor": pred.init(
                    k2, jnp.zeros((1, nz_feat), jnp.float32))}

    shapes = jax.eval_shape(_init, jax.ShapeDtypeStruct((2,), jnp.uint32))
    return (enc, pred), _host_init(shapes, int(seed))
