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


def extract_alexnet_arrays(features, lin_state) -> dict:
    """Extract the npz array dict from a torch AlexNet ``features`` Sequential
    (torchvision layout: 5 Conv2d) plus LPIPS v0.1 alex lin heads. Conv
    kernels transposed OIHW -> HWIO; per-conv stride/padding recorded so
    lpips_jax.lpips_alex_apply replays the exact geometry. Importable for
    torchvision-free testing (tests/test_lpips_converters.py)."""
    import torch

    convs = [m for m in features if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, f"expected 5 AlexNet convs, got {len(convs)}"

    out = {}
    for i, conv in enumerate(convs):
        out[f"conv{i}.w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}.b"] = conv.bias.detach().numpy()
        out[f"conv{i}.stride"] = np.asarray(conv.stride)
        out[f"conv{i}.padding"] = np.asarray(conv.padding)
    for i in range(5):
        w = lin_state[f"lin{i}.model.1.weight"].detach().numpy()
        out[f"lin{i}.w"] = w.reshape(-1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="papr_tpu/assets/lpips_alex.npz")
    ap.add_argument("--lin-weights", default="",
                    help="lpips alex.pth (default: from the lpips package)")
    args = ap.parse_args()

    import torch
    from torchvision import models as tv

    net = tv.alexnet(weights=tv.AlexNet_Weights.IMAGENET1K_V1).features.eval()

    if args.lin_weights:
        lin_path = args.lin_weights
    else:
        import lpips as lpips_pkg
        lin_path = os.path.join(os.path.dirname(lpips_pkg.__file__),
                                "weights", "v0.1", "alex.pth")
    lin = torch.load(lin_path, map_location="cpu")
    out = extract_alexnet_arrays(net, lin)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print("wrote", args.out, "with", len(out), "arrays")


if __name__ == "__main__":
    main()
