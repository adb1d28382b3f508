"""LPIPS(VGG16) module vs an independently built torch conv stack with the
same (random) weights — validates the slice plan, scaling constants, unit
normalization, lin heads, and spatial averaging without needing torchvision."""

import jax
import numpy as np
import torch
import torch.nn.functional as tF

from papr_tpu.model.lpips_jax import (SCALE, SHIFT, SLICE_ENDS, VGG16_CONVS,
                                      lpips_apply, random_lpips_params)


def torch_lpips(params, in0, in1):
    """Reference formula (models/lpips.py:103-125) in torch, NCHW."""
    def vgg_slices(x):
        outs = []
        h = x
        for i, (out_c, pool_before) in enumerate(VGG16_CONVS):
            if pool_before:
                h = tF.max_pool2d(h, 2)
            w = torch.from_numpy(
                np.asarray(params["convs"][i]["w"]).transpose(3, 2, 0, 1).copy())
            b = torch.from_numpy(np.asarray(params["convs"][i]["b"]).copy())
            h = tF.relu(tF.conv2d(h, w, b, padding=1))
            if i in SLICE_ENDS:
                outs.append(h)
        return outs

    def prep(img):  # NHWC [0,1] -> NCHW scaled
        t = torch.from_numpy(np.asarray(img).transpose(0, 3, 1, 2).copy())
        t = 2 * t - 1
        shift = torch.from_numpy(SHIFT.copy()).view(1, 3, 1, 1)
        scale = torch.from_numpy(SCALE.copy()).view(1, 3, 1, 1)
        return (t - shift) / scale

    f0, f1 = vgg_slices(prep(in0)), vgg_slices(prep(in1))
    total = 0.0
    for k in range(5):
        def norm(f):
            n = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True) + 1e-10)
            return f / (n + 1e-10)
        diff = (norm(f0[k]) - norm(f1[k])) ** 2
        w = torch.from_numpy(np.asarray(params["lins"][k]).copy()).view(1, -1, 1, 1)
        val = torch.sum(w * diff, dim=1, keepdim=True)
        total = total + val.mean(dim=(2, 3), keepdim=True)
    return float(total.squeeze().mean())


def test_lpips_matches_torch_formula():
    params = random_lpips_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a = rng.random((1, 32, 32, 3)).astype(np.float32)
    b = rng.random((1, 32, 32, 3)).astype(np.float32)
    ours = float(lpips_apply(params, a, b))
    want = torch_lpips(params, a, b)
    np.testing.assert_allclose(ours, want, rtol=2e-3)


def test_lpips_zero_for_identical():
    params = random_lpips_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    a = rng.random((1, 16, 16, 3)).astype(np.float32)
    assert float(lpips_apply(params, a, a)) == 0.0
