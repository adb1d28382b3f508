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


def extract_vgg_arrays(features, lin_state) -> dict:
    """Extract the npz array dict from a torch VGG16 ``features`` Sequential
    (torchvision layout: 13 Conv2d interleaved with ReLU/MaxPool) plus the
    reference vgg.pth lin-head state dict (lin{0..4}.model.1.weight).

    Conv kernels are transposed OIHW -> HWIO for jax NHWC convolutions
    (papr_tpu/model/lpips_jax.py). Importable so the conversion logic is
    testable without torchvision (tests/test_lpips_converters.py builds a
    random-weight features module in plain torch)."""
    import torch

    convs = [m for m in features if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 13, f"expected 13 VGG16 convs, got {len(convs)}"

    out = {}
    for i, conv in enumerate(convs):
        out[f"conv{i}.w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}.b"] = conv.bias.detach().numpy()
    for i in range(5):
        w = lin_state[f"lin{i}.model.1.weight"].detach().numpy()  # (1,C,1,1)
        out[f"lin{i}.w"] = w.reshape(-1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lin-weights", required=True,
                    help="vgg.pth with lin{0..4}.model.1.weight tensors")
    ap.add_argument("--out", default="papr_tpu/assets/lpips_vgg.npz")
    args = ap.parse_args()

    import torch
    from torchvision import models as tv

    vgg = tv.vgg16(weights=tv.VGG16_Weights.IMAGENET1K_V1).features.eval()
    lin = torch.load(args.lin_weights, map_location="cpu")
    out = extract_vgg_arrays(vgg, lin)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print("wrote", args.out, "with", len(out), "arrays")


if __name__ == "__main__":
    main()
