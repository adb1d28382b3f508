#!/usr/bin/env python
"""One-time LPIPS-AlexNet conversion (for the test.py lpips_alex metric,
reference test.py:188): torchvision AlexNet features + the `lpips` package's
v0.1 alex lin heads -> papr_tpu/assets/lpips_alex.npz (HWIO kernels).

Run in any environment with torchvision + the `lpips` pip package (or a local
copy of its weights/v0.1/alex.pth).

Usage:
  python tools/convert_alexnet.py --out papr_tpu/assets/lpips_alex.npz \
      [--lin-weights /path/to/alex.pth]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="papr_tpu/assets/lpips_alex.npz")
    ap.add_argument("--lin-weights", default="",
                    help="lpips alex.pth (default: from the lpips package)")
    args = ap.parse_args()

    import torch
    from torchvision import models as tv

    net = tv.alexnet(weights=tv.AlexNet_Weights.IMAGENET1K_V1).features.eval()
    convs = [m for m in net if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5

    out = {}
    for i, conv in enumerate(convs):
        out[f"conv{i}.w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}.b"] = conv.bias.detach().numpy()
        out[f"conv{i}.stride"] = np.asarray(conv.stride)
        out[f"conv{i}.padding"] = np.asarray(conv.padding)

    if args.lin_weights:
        lin_path = args.lin_weights
    else:
        import lpips as lpips_pkg
        lin_path = os.path.join(os.path.dirname(lpips_pkg.__file__),
                                "weights", "v0.1", "alex.pth")
    lin = torch.load(lin_path, map_location="cpu")
    for i in range(5):
        w = lin[f"lin{i}.model.1.weight"].detach().numpy()
        out[f"lin{i}.w"] = w.reshape(-1)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print("wrote", args.out, "with", len(out), "arrays")


if __name__ == "__main__":
    main()
