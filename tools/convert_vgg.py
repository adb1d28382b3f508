#!/usr/bin/env python
"""One-time LPIPS weight conversion: torchvision VGG16 + vgg.pth lin heads
-> papr_tpu/assets/lpips_vgg.npz (HWIO kernels).

Run in any environment with torchvision + network access (or a cached
torchvision checkpoint). This repo's runtime does not require torchvision.

The lin heads alone (the 6.7 KB vgg.pth the reference distributes) ship
pre-converted as papr_tpu/assets/lpips_lin.npz; only the torchvision
backbone needs this one-time conversion.

Usage:
  python tools/convert_vgg.py --lin-weights /path/to/vgg.pth \
      --out papr_tpu/assets/lpips_vgg.npz
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lin-weights", required=True,
                    help="vgg.pth with lin{0..4}.model.1.weight tensors")
    ap.add_argument("--out", default="papr_tpu/assets/lpips_vgg.npz")
    args = ap.parse_args()

    import torch
    from torchvision import models as tv

    vgg = tv.vgg16(weights=tv.VGG16_Weights.IMAGENET1K_V1).features.eval()
    convs = [m for m in vgg if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 13

    out = {}
    for i, conv in enumerate(convs):
        out[f"conv{i}.w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}.b"] = conv.bias.detach().numpy()

    lin = torch.load(args.lin_weights, map_location="cpu")
    for i in range(5):
        w = lin[f"lin{i}.model.1.weight"].detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}.w"] = w.reshape(-1)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print("wrote", args.out, "with", len(out), "arrays")


if __name__ == "__main__":
    main()
