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


def test_lpips_gradient_matches_torch_autograd():
    """d(LPIPS)/d(pred) vs torch autograd on the same random weights — the
    training loss path (reference trains with mse + 1e-2*lpips,
    configs/default.yml:170-173) needs correct gradients, not just forwards."""
    params = random_lpips_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    a = rng.random((1, 24, 24, 3)).astype(np.float32)
    b = rng.random((1, 24, 24, 3)).astype(np.float32)

    ours = np.asarray(jax.grad(lambda x: lpips_apply(params, x, b))(a))

    # torch side: same formula, differentiable input
    t_in = torch.from_numpy(a.transpose(0, 3, 1, 2).copy()).requires_grad_(True)

    def vgg_slices(h):
        outs = []
        for i, (out_c, pool_before) in enumerate(VGG16_CONVS):
            if pool_before:
                h = tF.max_pool2d(h, 2)
            w = torch.from_numpy(
                np.asarray(params["convs"][i]["w"]).transpose(3, 2, 0, 1).copy())
            bb = torch.from_numpy(np.asarray(params["convs"][i]["b"]).copy())
            h = tF.relu(tF.conv2d(h, w, bb, padding=1))
            if i in SLICE_ENDS:
                outs.append(h)
        return outs

    shift = torch.from_numpy(SHIFT.copy()).view(1, 3, 1, 1)
    scale = torch.from_numpy(SCALE.copy()).view(1, 3, 1, 1)
    prep = lambda t: (2 * t - 1 - shift) / scale
    t_b = torch.from_numpy(b.transpose(0, 3, 1, 2).copy())
    f0, f1 = vgg_slices(prep(t_in)), vgg_slices(prep(t_b))
    total = 0.0
    for k in range(5):
        def norm(f):
            n = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True) + 1e-10)
            return f / (n + 1e-10)
        diff = (norm(f0[k]) - norm(f1[k])) ** 2
        w = torch.from_numpy(np.asarray(params["lins"][k]).copy()).view(1, -1, 1, 1)
        total = total + torch.sum(w * diff, dim=1, keepdim=True).mean(dim=(2, 3))
    total.mean().backward()
    want = t_in.grad.numpy().transpose(0, 2, 3, 1)

    assert np.abs(ours).max() > 0
    # atol covers max-pool tie-breaking on ReLU zeros: equal window maxima
    # route subgradients differently between torch and the reshape-max here.
    np.testing.assert_allclose(ours, want, rtol=5e-3, atol=3e-5)


def test_train_step_with_lpips_loss():
    """Full jitted train step with losses {mse: 1, lpips: 1e-2} (random VGG
    weights stand in for the unavailable pretrained ones — identical compute
    path). Reference recipe: train.py:171 + configs/default.yml:170-173."""
    import sys
    sys.path.insert(0, "tests")
    from test_round2_fixes import _rays, tiny_cfg

    from papr_tpu.train.losses import get_loss
    from papr_tpu.train.step import make_opt_state, make_train_step
    from papr_tpu.model.papr import create_model
    from papr_tpu.nn.mlp import policy_from_config

    cfg = tiny_cfg(training={"losses": {"mse": 1.0, "lpips": 1e-2,
                                        "lpips_alex": 0.0}})
    lp = random_lpips_params(jax.random.PRNGKey(3))
    loss_fn = get_loss(cfg.training.losses, lpips_params=lp,
                       policy=policy_from_config(cfg))
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    opt = make_opt_state(cfg, params)
    rayo, rayd, c2w = _rays(H=16, W=16)
    target = np.random.default_rng(0).random((1, 16, 16, 3), np.float32)

    step_fn, _ = make_train_step(cfg, loss_fn=loss_fn, donate=False)
    p1, o1, l1, _ = step_fn(params, opt, state, rayo, rayd, target, c2w, 0)
    p2, o2, l2, _ = step_fn(p1, o1, state, rayo, rayd, target, c2w, 1)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)  # optimizes through the lpips term
    # the lpips term contributes: composite loss != plain MSE on the same pred
    from papr_tpu.model.papr import forward
    from papr_tpu.nn.activations import build_activation
    pred = build_activation(cfg.models.last_act)(
        forward(params, state, cfg, rayo, rayd, c2w))
    assert float(loss_fn(pred, target)) != float(jnp_mse(pred, target))


def jnp_mse(p, t):
    import jax.numpy as jnp
    return jnp.mean((p - jnp.asarray(t)) ** 2)


def test_lpips_zero_for_identical():
    params = random_lpips_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    a = rng.random((1, 16, 16, 3)).astype(np.float32)
    assert float(lpips_apply(params, a, a)) == 0.0


def test_lpips_alex_matches_torch_formula():
    """AlexNet-backbone LPIPS vs an independent torch build (random weights)."""
    import torch.nn as nn
    from papr_tpu.model.lpips_jax import lpips_alex_apply

    rng = np.random.default_rng(3)
    plan = [  # (in, out, k, stride, pad) — torchvision AlexNet features
        (3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
        (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
    params = {"convs": [], "lins": []}
    tconvs = []
    for (ci, co, k, s, p) in plan:
        w = (rng.normal(size=(k, k, ci, co)) * 0.03).astype(np.float32)
        b = (rng.normal(size=(co,)) * 0.03).astype(np.float32)
        params["convs"].append({"w": w, "b": b, "stride": (s, s),
                                "padding": (p, p)})
        conv = nn.Conv2d(ci, co, k, stride=s, padding=p)
        conv.weight.data = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
        conv.bias.data = torch.from_numpy(b.copy())
        tconvs.append(conv)
        params["lins"].append(rng.random(co).astype(np.float32))

    def torch_alex(in0, in1):
        def prep(img):
            t = torch.from_numpy(np.asarray(img).transpose(0, 3, 1, 2).copy())
            t = 2 * t - 1
            return (t - torch.from_numpy(SHIFT).view(1, 3, 1, 1)) / \
                torch.from_numpy(SCALE).view(1, 3, 1, 1)

        def slices(x):
            outs = []
            h = x
            for i, conv in enumerate(tconvs):
                if i in (1, 2):
                    h = tF.max_pool2d(h, 3, stride=2)
                h = tF.relu(conv(h))
                outs.append(h)
            return outs

        f0, f1 = slices(prep(in0)), slices(prep(in1))
        total = 0.0
        for k in range(5):
            def norm(f):
                n = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True) + 1e-10)
                return f / (n + 1e-10)
            diff = (norm(f0[k]) - norm(f1[k])) ** 2
            w = torch.from_numpy(params["lins"][k].copy()).view(1, -1, 1, 1)
            total = total + torch.sum(w * diff, dim=1,
                                      keepdim=True).mean(dim=(2, 3))
        return float(total.mean())

    a = rng.random((1, 64, 64, 3)).astype(np.float32)
    b = rng.random((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_alex(a, b)
    got = float(lpips_alex_apply(
        jax.tree.map(lambda x: x, params), a, b))
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_loss_params_ride_as_runtime_args():
    """get_loss exposes the LPIPS backbone on loss_fn.params and routes a
    per-call loss_params pytree to the backbone — so jitted train steps can
    pass the 59 MB of VGG weights as runtime arguments instead of closure
    constants (inlined constants pushed the remote TPU compile to ~28 min)."""
    from papr_tpu.config import Config
    from papr_tpu.train.losses import get_loss

    losses = Config({"mse": 1.0, "lpips": 0.01})
    lp_a = random_lpips_params(jax.random.PRNGKey(3))
    lp_b = random_lpips_params(jax.random.PRNGKey(4))
    fn_a = get_loss(losses, lpips_params=lp_a)
    fn_b = get_loss(losses, lpips_params=lp_b)
    assert set(fn_a.params) == {"lpips"}

    rng = np.random.default_rng(0)
    p = rng.random((1, 16, 16, 3), np.float32)
    t = rng.random((1, 16, 16, 3), np.float32)

    closure_a = float(fn_a(p, t))
    # 3-arg call with B's weights through A's function == B's closure value
    np.testing.assert_allclose(float(fn_a(p, t, {"lpips": lp_b})),
                               float(fn_b(p, t)), rtol=1e-6)
    # and the 2-arg fallback still uses the build-time weights
    np.testing.assert_allclose(float(fn_a(p, t, fn_a.params)), closure_a,
                               rtol=1e-6)
    assert abs(closure_a - float(fn_b(p, t))) > 1e-9


def test_shipped_lin_asset_matches_reference_vgg_pth():
    """assets/lpips_lin.npz is the reference's distributed vgg.pth lin heads
    (reference models/lpips.py:95-101), converted to flat fp32 vectors."""
    import os
    from papr_tpu.model.lpips_jax import DEFAULT_LIN_WEIGHTS, load_lin_params

    lins = load_lin_params()
    assert lins is not None, f"missing shipped asset {DEFAULT_LIN_WEIGHTS}"
    assert [int(l.shape[0]) for l in lins] == [64, 128, 256, 512, 512]
    assert all(float(l.min()) >= 0.0 for l in lins)  # relu'd lin weights

    ref_pth = "/root/reference/vgg.pth"
    if os.path.exists(ref_pth):
        ref = torch.load(ref_pth, map_location="cpu")
        for i, l in enumerate(lins):
            np.testing.assert_allclose(
                np.asarray(l),
                ref[f"lin{i}.model.1.weight"].numpy().reshape(-1),
                rtol=0, atol=0)


def test_random_lin_fallback_modes():
    """'random' stays fully random (bit-stable for resumed runs);
    'random-lin' swaps in the shipped learned lin heads."""
    from papr_tpu.model.lpips_jax import load_lin_params, random_lpips_params

    plain = random_lpips_params(jax.random.PRNGKey(0))
    with_lin = random_lpips_params(jax.random.PRNGKey(0), use_real_lins=True)
    # identical random backbone either way
    np.testing.assert_array_equal(np.asarray(plain["convs"][0]["w"]),
                                  np.asarray(with_lin["convs"][0]["w"]))
    real = load_lin_params()
    for l_got, l_real in zip(with_lin["lins"], real):
        np.testing.assert_array_equal(np.asarray(l_got), np.asarray(l_real))
    assert not np.allclose(np.asarray(plain["lins"][0]),
                           np.asarray(real[0]))
