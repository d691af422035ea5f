"""Torch state_dict -> lasr_tpu parameter conversion.

The reference runs on an ImageNet-pretrained torchvision ResNet18 trunk
(ref:third_party/ext_nnutils/net_blocks.py:294 ``pretrained=True``) and an
ImageNet AlexNet for the perceptual texture loss
(ref:nnutils/train_utils.py:121 -> PerceptualSimilarity 'net' mode).  Those
weights are not distributable with this repo, so the conversion path is:

    # on any machine with torchvision:
    python -c "import torch, torchvision; torch.save(
        torchvision.models.resnet18(weights='IMAGENET1K_V1').state_dict(),
        'resnet18.pth')"
    python -c "import torch, torchvision; torch.save(
        torchvision.models.alexnet(weights='IMAGENET1K_V1').state_dict(),
        'alexnet.pth')"
    # here:
    python scripts/convert_weights.py --resnet18 resnet18.pth \
        --alexnet alexnet.pth --out pretrained/
    python optimize.py ... --pretrained_dir pretrained/

Frozen BatchNorm folding: the reference forces every BatchNorm to eval()
from step 0 (ref:nnutils/mesh_net.py:190-195), so a converted BN is exactly
an affine map y = x * scale + bias with scale = gamma / sqrt(var + eps),
bias = beta - mean * scale — which is our AffineNorm module.

All functions take plain dicts of numpy arrays (call ``.numpy()`` on torch
tensors first, or use :func:`load_torch_pth`); no torch import here.
"""

from __future__ import annotations

import numpy as np

BN_EPS = 1e-5


def load_torch_pth(path: str) -> dict:
    """Load a torch .pth state_dict into {name: np.ndarray} (requires torch)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state.items()
            if hasattr(v, "detach")}


def fold_bn(state: dict, prefix: str) -> tuple[np.ndarray, np.ndarray]:
    """BatchNorm (eval mode) -> (scale, bias) of the equivalent affine map."""
    gamma = state[f"{prefix}.weight"].astype(np.float64)
    beta = state[f"{prefix}.bias"].astype(np.float64)
    mean = state[f"{prefix}.running_mean"].astype(np.float64)
    var = state[f"{prefix}.running_var"].astype(np.float64)
    scale = gamma / np.sqrt(var + BN_EPS)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv weight -> flax HWIO kernel."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0)).astype(np.float32)


def convert_resnet18_trunk(state: dict, prefix: str = "") -> dict:
    """torchvision resnet18 state_dict -> flax param subtree for the
    Encoder's conv trunk (Conv_0 + AffineNorm_0 + BasicBlock_0..7).

    `prefix` handles nested checkpoints (e.g. ``resnet_conv.resnet.`` inside
    the reference Encoder, or ``encoder.resnet_conv.resnet.`` inside a full
    LASR checkpoint).  Returns {flax_module: {param: array}}.
    """
    p = prefix
    out = {
        "Conv_0": {"kernel": _conv_kernel(state[f"{p}conv1.weight"])},
    }
    s, b = fold_bn(state, f"{p}bn1")
    out["AffineNorm_0"] = {"scale": s, "bias": b}
    blk = 0
    for layer in range(1, 5):
        for sub in range(2):
            q = f"{p}layer{layer}.{sub}"
            mod = {
                "Conv_0": {"kernel": _conv_kernel(state[f"{q}.conv1.weight"])},
                "Conv_1": {"kernel": _conv_kernel(state[f"{q}.conv2.weight"])},
            }
            s, b = fold_bn(state, f"{q}.bn1")
            mod["AffineNorm_0"] = {"scale": s, "bias": b}
            s, b = fold_bn(state, f"{q}.bn2")
            mod["AffineNorm_1"] = {"scale": s, "bias": b}
            if f"{q}.downsample.0.weight" in state:
                mod["Conv_2"] = {
                    "kernel": _conv_kernel(state[f"{q}.downsample.0.weight"])}
                s, b = fold_bn(state, f"{q}.downsample.1")
                mod["AffineNorm_2"] = {"scale": s, "bias": b}
            out[f"BasicBlock_{blk}"] = mod
            blk += 1
    return out


def convert_reference_encoder(state: dict, prefix: str = "",
                              spatial: int = 4) -> dict:
    """Full reference-Encoder state_dict -> complete flax Encoder params.

    Covers the trunk plus enc_conv1 (4x4 stride-2 conv + BN2d,
    ref:net_blocks.py:325) and the two enc_fc layers (Linear + BN1d,
    ref:net_blocks.py:49-69).  ``spatial`` is the trunk's output H=W
    (img_size // 64); the Linear->Dense remap must account for torch
    flattening NCHW (c, h, w) vs flax flattening NHWC (h, w, c).
    """
    p = prefix
    out = convert_resnet18_trunk(state, prefix=f"{p}resnet_conv.resnet.")
    out["Conv_1"] = {
        "kernel": _conv_kernel(state[f"{p}enc_conv1.0.weight"]),
        "bias": state[f"{p}enc_conv1.0.bias"].astype(np.float32),
    }
    s, b = fold_bn(state, f"{p}enc_conv1.1")
    out["AffineNorm_1"] = {"scale": s, "bias": b}

    for i in range(2):
        w = state[f"{p}enc_fc.{i}.0.weight"].astype(np.float32)  # [out, in]
        bias = state[f"{p}enc_fc.{i}.0.bias"].astype(np.float32)
        if i == 0:
            nout = w.shape[0]
            # torch flattens [B, C, H, W] -> (c, h, w); flax [B, H, W, C]
            # -> (h, w, c): permute the input axis accordingly
            w = (w.reshape(nout, -1, spatial, spatial)
                 .transpose(0, 2, 3, 1).reshape(nout, -1))
        out[f"Dense_{i}"] = {"kernel": np.ascontiguousarray(w.T),
                             "bias": bias}
        s, b = fold_bn(state, f"{p}enc_fc.{i}.1")
        out[f"AffineNorm_{i + 2}"] = {"scale": s, "bias": b}
    return out


def convert_alexnet_features(state: dict, prefix: str = "features.") -> dict:
    """torchvision alexnet state_dict -> the {conv{i}_w, conv{i}_b} npz
    layout consumed by PerceptualLoss.load_torch_weights (torch OIHW kept —
    the loader transposes)."""
    idxs = [0, 3, 6, 8, 10]   # conv layer indices in alexnet.features
    out = {}
    for i, j in enumerate(idxs):
        out[f"conv{i}_w"] = state[f"{prefix}{j}.weight"].astype(np.float32)
        out[f"conv{i}_b"] = state[f"{prefix}{j}.bias"].astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# npz round-trip for the encoder subtree
# ---------------------------------------------------------------------------
def encoder_tree_to_flat(tree: dict) -> dict:
    """Nested param tree -> flat {'a/b/c': arr} for np.savez (recursive)."""
    flat = {}

    def walk(prefix, node):
        for name, val in node.items():
            key = f"{prefix}/{name}" if prefix else name
            if isinstance(val, dict):
                walk(key, val)
            else:
                flat[key] = val

    walk("", tree)
    return flat


def encoder_flat_to_tree(flat) -> dict:
    tree: dict = {}
    for key in flat.keys() if hasattr(flat, "keys") else flat:
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(flat[key])
    return tree


def apply_encoder_weights(enc_params: dict, converted: dict) -> dict:
    """Overlay converted weights onto a flax Encoder param tree.

    ``converted`` may cover the trunk only (pretrained ResNet18: the heads
    stay at their reference init, exactly like the reference which
    net_init's enc_conv1/enc_fc, ref:net_blocks.py:326,331) or the full
    encoder.  Shapes are checked leaf by leaf."""
    def overlay(cur: dict, over: dict, path: str) -> dict:
        out = dict(cur)
        for name, val in over.items():
            here = f"{path}/{name}" if path else name
            if name not in cur:
                raise KeyError(f"converted entry {here} not in encoder "
                               f"params (have {sorted(cur)})")
            if isinstance(val, dict):
                out[name] = overlay(cur[name], val, here)
            else:
                if tuple(cur[name].shape) != tuple(val.shape):
                    raise ValueError(f"{here}: shape {val.shape} != "
                                     f"expected {cur[name].shape}")
                out[name] = np.asarray(val, np.float32)
        return out

    return {"params": overlay(enc_params["params"], converted, "")}
