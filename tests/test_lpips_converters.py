"""End-to-end oracle tests for the LPIPS weight converters.

torchvision (the pretrained-weight source) is not installed here, but torch
is — so we build backbones with torchvision's exact module LAYOUT in plain
torch with random weights, run the REAL converter extraction
(tools/convert_vgg.py:extract_vgg_arrays, tools/convert_alexnet.py:
extract_alexnet_arrays), load the produced .npz through the production
loaders, and assert lpips_apply / lpips_alex_apply match a torch
re-implementation of the reference LPNet.forward semantics
(reference models/lpips.py:103-125) running on the SAME torch modules.

This proves the whole conversion path (conv indexing, OIHW->HWIO transpose,
stride/padding capture, slice boundaries, pool placement) — the only missing
piece in this environment is the pretrained download itself.
"""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import convert_alexnet  # noqa: E402
import convert_vgg  # noqa: E402

from papr_tpu.model.lpips_jax import (SCALE, SHIFT, load_lpips_alex_params,  # noqa: E402
                                      load_lpips_params, lpips_alex_apply,
                                      lpips_apply)


def _vgg16_features_layout(gen):
    """torchvision.models.vgg16().features with random weights: 13 3x3 convs
    (pad 1) interleaved with ReLU, MaxPool2d(2,2) after conv idx 1,3,6,9,12."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            conv = nn.Conv2d(in_c, v, 3, padding=1)
            with torch.no_grad():
                conv.weight.copy_(torch.from_numpy(
                    gen.standard_normal(tuple(conv.weight.shape)) * 0.05))
                conv.bias.copy_(torch.from_numpy(
                    gen.standard_normal(tuple(conv.bias.shape)) * 0.05))
            layers += [conv, nn.ReLU()]
            in_c = v
    return nn.Sequential(*layers).eval()


def _alexnet_features_layout(gen):
    """torchvision.models.alexnet().features with random weights."""
    seq = nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(), nn.MaxPool2d(3, 2))
    with torch.no_grad():
        for m in seq:
            if isinstance(m, nn.Conv2d):
                m.weight.copy_(torch.from_numpy(
                    gen.standard_normal(tuple(m.weight.shape)) * 0.05))
                m.bias.copy_(torch.from_numpy(
                    gen.standard_normal(tuple(m.bias.shape)) * 0.05))
    return seq.eval()


def _random_lin_state(gen, chans):
    return {f"lin{i}.model.1.weight":
            torch.from_numpy(np.abs(gen.standard_normal((1, c, 1, 1)))
                             .astype(np.float32))
            for i, (c) in enumerate(chans)}


def _torch_lpnet_forward(features, slice_bounds, lin_state, in0, in1):
    """Reference LPNet.forward (models/lpips.py:103-125) on a torch features
    Sequential sliced at `slice_bounds` ((start, end) module index pairs).
    Inputs NHWC float32 in [0, 1]."""
    def prep(x):
        t = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())
        t = 2.0 * t - 1.0
        shift = torch.from_numpy(SHIFT.copy()).view(1, 3, 1, 1)
        scale = torch.from_numpy(SCALE.copy()).view(1, 3, 1, 1)
        return (t - shift) / scale

    def slices(t):
        outs = []
        h = t
        for (a, b) in slice_bounds:
            for idx in range(a, b):
                h = features[idx](h)
            outs.append(h)
        return outs

    with torch.no_grad():
        f0, f1 = slices(prep(in0)), slices(prep(in1))
        total = torch.zeros(())
        for k in range(5):
            def unit(f):
                n = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True) + 1e-10)
                return f / (n + 1e-10)
            diff = (unit(f0[k]) - unit(f1[k])) ** 2
            w = lin_state[f"lin{k}.model.1.weight"].view(1, -1, 1, 1)
            val = torch.sum(w * diff, dim=1, keepdim=True)
            total = total + val.mean(dim=(2, 3)).squeeze().mean()
    return float(total)


# Reference models/lpips.py:18-27 — slice1=[0,4), slice2=[4,9), slice3=[9,16),
# slice4=[16,23), slice5=[23,30) (each ends at a ReLU output).
VGG_SLICES = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
# pip lpips v0.1 alexnet slices (reference test.py:188 uses LPIPS(net='alex')).
ALEX_SLICES = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)]


def test_convert_vgg_end_to_end(tmp_path):
    gen = np.random.default_rng(11)
    features = _vgg16_features_layout(gen)
    lin_state = _random_lin_state(gen, (64, 128, 256, 512, 512))

    arrays = convert_vgg.extract_vgg_arrays(features, lin_state)
    path = str(tmp_path / "vgg.npz")
    np.savez_compressed(path, **arrays)
    params = load_lpips_params(path)

    # Odd sizes exercise the floor-cropping maxpool parity.
    a = gen.random((2, 33, 31, 3), np.float32)
    b = gen.random((2, 33, 31, 3), np.float32)
    ours = float(lpips_apply(params, a, b))
    want = _torch_lpnet_forward(features, VGG_SLICES, lin_state, a, b)
    assert ours == pytest.approx(want, abs=1e-5), (ours, want)


def test_convert_alexnet_end_to_end(tmp_path):
    gen = np.random.default_rng(12)
    features = _alexnet_features_layout(gen)
    lin_state = _random_lin_state(gen, (64, 192, 384, 256, 256))

    arrays = convert_alexnet.extract_alexnet_arrays(features, lin_state)
    path = str(tmp_path / "alex.npz")
    np.savez_compressed(path, **arrays)
    params = load_lpips_alex_params(path)

    a = gen.random((2, 67, 61, 3), np.float32)
    b = gen.random((2, 67, 61, 3), np.float32)
    ours = float(lpips_alex_apply(params, a, b))
    want = _torch_lpnet_forward(features, ALEX_SLICES, lin_state, a, b)
    assert ours == pytest.approx(want, abs=1e-5), (ours, want)


def test_extractors_reject_wrong_layout():
    gen = np.random.default_rng(13)
    wrong = nn.Sequential(nn.Conv2d(3, 8, 3), nn.ReLU())
    with pytest.raises(AssertionError):
        convert_vgg.extract_vgg_arrays(wrong, {})
    with pytest.raises(AssertionError):
        convert_alexnet.extract_alexnet_arrays(wrong, {})
