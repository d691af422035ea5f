"""Convert torch pretrained checkpoints to lasr_tpu npz layouts.

The reference depends on three sets of pretrained torch weights that cannot
ship with this repo:
  * torchvision ResNet18 (encoder trunk, ref:net_blocks.py:294)
  * torchvision AlexNet (perceptual texture loss, ref:train_utils.py:121)
  * VCN-robust optical flow (lasr_vcn/vcn_rob.pth, ref:preprocess/auto_gen.py)

Obtain the .pth files on any machine with torchvision / the LASR release,
then run:

    python scripts/convert_weights.py --resnet18 resnet18.pth \
        --alexnet alexnet.pth --vcn vcn_rob.pth --out pretrained/

and point training at the directory:

    python optimize.py ... --pretrained_dir pretrained/

Each converter is unit-tested against a randomly-initialized torch replica
of the source network (tests/test_convert.py, tests/test_vcn.py), so the
conversion is proven even though the ImageNet weights themselves are not
present in this environment.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lasr_tpu.models import torch_convert as tc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resnet18", help="torchvision resnet18 state_dict .pth")
    ap.add_argument("--alexnet", help="torchvision alexnet state_dict .pth")
    ap.add_argument("--vcn", help="LASR vcn_rob.pth checkpoint")
    ap.add_argument("--out", default="pretrained")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.resnet18:
        state = tc.load_torch_pth(args.resnet18)
        tree = tc.convert_resnet18_trunk(state)
        path = os.path.join(args.out, "encoder.npz")
        np.savez(path, **tc.encoder_tree_to_flat(tree))
        print(f"wrote {path} ({len(tree)} modules)")

    if args.alexnet:
        state = tc.load_torch_pth(args.alexnet)
        out = tc.convert_alexnet_features(state)
        path = os.path.join(args.out, "alexnet.npz")
        np.savez(path, **out)
        print(f"wrote {path}")

    if args.vcn:
        import torch

        from lasr_tpu.models.vcn import convert_torch_state

        raw = torch.load(args.vcn, map_location="cpu", weights_only=False)
        state = raw.get("state_dict", raw)
        state = {k.replace("module.", ""): np.asarray(v.cpu().numpy())
                 for k, v in state.items()}
        params = convert_torch_state(state)
        path = os.path.join(args.out, "vcn.npz")
        flat = {}

        def flatten(prefix, tree):
            for k, v in tree.items():
                key = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    flatten(key, v)
                else:
                    flat[key] = np.asarray(v)

        flatten("", params)
        np.savez(path, **flat)
        mean = raw.get("mean_L"), raw.get("mean_R")
        if mean[0] is not None:
            np.savez(os.path.join(args.out, "vcn_mean.npz"),
                     mean_L=np.asarray(mean[0]), mean_R=np.asarray(mean[1]))
        print(f"wrote {path}")

    if not (args.resnet18 or args.alexnet or args.vcn):
        ap.error("nothing to convert: pass --resnet18/--alexnet/--vcn")


if __name__ == "__main__":
    main()
