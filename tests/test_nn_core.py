"""Unit tests for core nn ops: posenc, layernorm quirk, activations, MLP
layer plumbing, and conv/convT equivalence against torch (torch is the
numerics oracle for standard ops; no reference code involved)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from papr_tpu.nn.activations import build_activation
from papr_tpu.nn.mlp import feedforward_apply, feedforward_init, mlp_apply, mlp_init
from papr_tpu.nn.norm import layernorm_apply, layernorm_init
from papr_tpu.nn.posenc import posenc
from papr_tpu.nn import unet as U
from papr_tpu.config import Config


def test_posenc_interleaved_layout():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32))
    out = posenc(x, L_embed=2, factor=2.0)
    assert out.shape == (5, 3 * 5)
    # Per input dim d the block is [x_d, sin(x_d), cos(x_d), sin(2x_d), cos(2x_d)].
    np.testing.assert_allclose(out[:, 0], x[:, 0], rtol=1e-6)
    np.testing.assert_allclose(out[:, 1], np.sin(x[:, 0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 2], np.cos(x[:, 0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 3], np.sin(2 * x[:, 0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 5], x[:, 1], rtol=1e-6)
    # without_self drops the identity component
    out2 = posenc(x, L_embed=2, without_self=True)
    assert out2.shape == (5, 3 * 4)
    np.testing.assert_allclose(out2[:, 0], np.sin(x[:, 0]), rtol=1e-5, atol=1e-6)


def test_layernorm_unbiased_std_quirk():
    x = np.random.default_rng(1).normal(size=(7, 16)).astype(np.float32)
    p = layernorm_init(16)
    got = np.asarray(layernorm_apply(p, jnp.asarray(x), eps=1e-6))
    t = torch.from_numpy(x)
    # The quirk formula: (x - mean) / (unbiased_std + eps)
    want = ((t - t.mean(-1, keepdim=True)) / (t.std(-1, keepdim=True) + 1e-6)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # and it differs from standard layernorm
    std_ln = tF.layer_norm(t, (16,), eps=1e-6).numpy()
    assert np.abs(std_ln - got).max() > 1e-3


@pytest.mark.parametrize("name,tfn", [
    ("relu", torch.relu),
    ("leakyrelu", lambda x: tF.leaky_relu(x, 0.2)),
    ("gelu", tF.gelu),
    ("sigmoid", torch.sigmoid),
    ("tanh", torch.tanh),
    ("relu+1", lambda x: torch.relu(x) + 1),
    ("softplus_2.0_1.5_0.5", lambda x: 2.0 * tF.softplus(1.5 * x + 0.5)),
])
def test_activations_match_torch(name, tfn):
    x = np.random.default_rng(2).normal(size=(64,)).astype(np.float32)
    got = np.asarray(build_activation(name)(jnp.asarray(x)))
    want = tfn(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-6)


def test_mlp_skip_and_half_layers_shapes():
    key = jax.random.PRNGKey(0)
    # 8-layer value-MLP shape with skip at layer 5 (drums/lego configs)
    p = mlp_init(key, 78, 8, 256, 32, skip_layers=(5,))
    x = jnp.ones((4, 78))
    out = mlp_apply(p, x, act_type="relu", skip_layers=(5,))
    assert out.shape == (4, 32)
    assert p["layers"][5]["w"].shape == (256, 256 + 78)
    # half layers: layer boundary i..i+1 runs at half width
    p2 = mlp_init(key, 16, 4, 64, 8, half_layers=(2,))
    assert p2["layers"][1]["w"].shape == (32, 64)
    assert p2["layers"][2]["w"].shape == (64, 32)
    out2 = mlp_apply(p2, jnp.ones((3, 16)), act_type="relu")
    assert out2.shape == (3, 8)


def test_mlp_matches_torch_linear_stack():
    """Same weights -> same outputs as a torch Linear/ReLU stack."""
    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(1)
    p = mlp_init(key, 10, 3, 32, 5)
    x = rng.normal(size=(6, 10)).astype(np.float32)

    tlayers = []
    dims = [(10, 32), (32, 32), (32, 5)]
    for i, (di, do) in enumerate(dims):
        lin = torch.nn.Linear(di, do)
        lin.weight.data = torch.from_numpy(np.asarray(p["layers"][i]["w"]))
        lin.bias.data = torch.from_numpy(np.asarray(p["layers"][i]["bias"]))
        tlayers.append(lin)
    h = torch.from_numpy(x)
    for i, lin in enumerate(tlayers):
        h = lin(h)
        if i < 2:
            h = torch.relu(h)
    want = h.detach().numpy()
    got = np.asarray(mlp_apply(p, jnp.asarray(x), act_type="relu"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_feedforward_residual_and_norm():
    cfg = Config({
        "d_ff": 16, "d_ff_out": 8, "n_ff_layer": 2, "ff_act": "relu",
        "ff_act_a": 1.0, "ff_act_b": 1.0, "ff_act_trainable": False,
        "ff_last_act": "none", "norm": "layernorm", "dropout_ff": 0.0,
        "use_wn": False, "residual_ff": False, "skip_layers": [],
        "half_layers": [], "residual_layers": [], "residual_dims": []})
    p = feedforward_init(jax.random.PRNGKey(2), 8, 8, cfg)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(5, 8)).astype(np.float32))
    out = feedforward_apply(p, x, cfg, 8)
    assert out.shape == (5, 8)
    assert "innorm" in p and "outnorm" in p


def test_conv_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    p = U.conv_init(jax.random.PRNGKey(3), 8, 4, 3)
    got = np.asarray(U.conv_apply(p, jnp.asarray(x)))
    w = np.asarray(p["w"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
    want = tF.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(w), torch.from_numpy(np.asarray(p["b"])),
                     padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_convT_matches_torch():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 7, 9, 6)).astype(np.float32)
    p = U.convT2x2_init(jax.random.PRNGKey(4), 6, 3)
    got = np.asarray(U.convT2x2_apply(p, jnp.asarray(x)))
    w = np.asarray(p["w"]).transpose(2, 3, 0, 1)  # HWIO -> (in, out, kh, kw)
    want = tF.conv_transpose2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                               torch.from_numpy(w),
                               torch.from_numpy(np.asarray(p["b"])),
                               stride=2).numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (1, 14, 18, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_maxpool_and_bilinear_upsample_match_torch():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
    got = np.asarray(U.maxpool2(jnp.asarray(x)))
    want = tF.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1), atol=1e-6)

    up = np.asarray(U.upsample_bilinear_align_corners(jnp.asarray(x)))
    want_up = tF.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             scale_factor=2, mode="bilinear",
                             align_corners=True)
    np.testing.assert_allclose(up, want_up.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)
