"""Fused embedder MLP kernel (ops/fused_mlp.py) vs the unfused reference
path — forward and gradients, fp32 and bf16, kernel-level and model-level."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

from papr_tpu.nn.mlp import BF16, F32
from papr_tpu.ops.fused_mlp import fused_mlp


def _stack(key, dims):
    ks = jax.random.split(key, len(dims) - 1)
    ws, bs = [], []
    for i in range(len(dims) - 1):
        k1, k2 = jax.random.split(ks[i])
        ws.append(jax.random.normal(k1, (dims[i], dims[i + 1]),
                                    jnp.float32) / np.sqrt(dims[i]))
        bs.append(jax.random.normal(k2, (dims[i + 1],), jnp.float32) * 0.1)
    return tuple(ws), tuple(bs)


def _ref_mlp(x, ws, bs, act, last_act, dtype):
    h = x.astype(dtype)
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = jnp.dot(h, w.astype(dtype)) + b.astype(dtype)
        kind = last_act if i == len(ws) - 1 else act
        h = jnp.maximum(h, 0) if kind == "relu" else h
    return h.astype(jnp.float32)


@pytest.mark.parametrize("dims,T", [
    ((117, 256, 256, 256, 256, 256), 700),   # key-embedder shape (5 layers)
    ((78, 256, 256, 256, 256, 256, 256, 256, 32), 513),  # value (8 layers)
    ((39, 64, 16), 100),                      # odd dims, tiny T
])
def test_fused_forward_matches_unfused_fp32(dims, T):
    ws, bs = _stack(jax.random.PRNGKey(0), dims)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, dims[0]), jnp.float32)
    got = fused_mlp(x, ws, bs, None, None, "relu", "none", True)
    want = _ref_mlp(x, ws, bs, "relu", "none", jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_matches_unfused_bf16():
    dims = (117, 256, 256, 256)
    ws, bs = _stack(jax.random.PRNGKey(2), dims)
    x = jax.random.normal(jax.random.PRNGKey(3), (600, dims[0]),
                          jnp.float32).astype(jnp.bfloat16)
    got = np.asarray(fused_mlp(x, ws, bs, None, None, "relu", "none", True))
    want = np.asarray(_ref_mlp(x.astype(jnp.float32), ws, bs, "relu", "none",
                               jnp.bfloat16))
    # bf16 rounding points differ (kernel accumulates fp32, rounds per layer)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_fused_gradients_match_unfused_fp32():
    dims = (40, 128, 128, 64)
    ws, bs = _stack(jax.random.PRNGKey(4), dims)
    x = jax.random.normal(jax.random.PRNGKey(5), (300, dims[0]), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(6), (300, dims[-1]))

    def loss_fused(x, ws, bs):
        return jnp.mean((fused_mlp(x, ws, bs, None, None, "relu", "none", True) - tgt) ** 2)

    def loss_ref(x, ws, bs):
        return jnp.mean((_ref_mlp(x, ws, bs, "relu", "none", jnp.float32)
                         - tgt) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("norm,T,d_in", [("layernorm", 300, 117),
                                         ("none", 517, 78)])
def test_fused_block_matches_feedforward_with_grads(norm, T, d_in):
    """[LN]->MLP->[LN] block: fused kernel vs nn.mlp.feedforward_apply
    (the exact reference formula incl. the unbiased-std+eps LN quirk),
    forward AND gradients wrt params and input, fp32."""
    from papr_tpu.config import load_config
    from papr_tpu.nn.mlp import feedforward_apply, feedforward_init
    from papr_tpu.ops.fused_mlp import fused_feedforward_apply

    cfg = load_config(overrides={"models": {"attn": {"embed": {"key": {
        "d_ff": 64, "d_ff_out": 64, "n_ff_layer": 3, "norm": norm}}}}})
    ff_cfg = cfg.models.attn.embed.key
    params = feedforward_init(jax.random.PRNGKey(0), d_in, 64, ff_cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, d_in), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (T, 64), jnp.float32)

    def loss(p, x, fused):
        if fused:
            y = fused_feedforward_apply(p, x, ff_cfg, 1e-6, F32,
                                        interpret=True)
        else:
            y = feedforward_apply(p, x, ff_cfg, 64, 1e-6, F32)
        return jnp.mean((y - tgt) ** 2)

    lf, gf = jax.value_and_grad(loss, argnums=(0, 1))(params, x, True)
    lr, gr = jax.value_and_grad(loss, argnums=(0, 1))(params, x, False)
    assert float(lf) == pytest.approx(float(lr), rel=1e-5)
    fl, _ = jax.tree.flatten(gf)
    rl, _ = jax.tree.flatten(gr)
    for a, b in zip(fl, rl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_fused_attention_matches_unfused_model_level():
    """Whole forward() with tpu.fused_attn on vs off (interpret on CPU)."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model, forward

    cfg_off = tiny_cfg(tpu={"fused_attn": False})
    cfg_on = tiny_cfg(tpu={"fused_attn": True})
    params, state = create_model(cfg_off, jax.random.PRNGKey(0))
    rayo, rayd, c2w = _rays(H=8, W=8)

    base = np.asarray(forward(params, state, cfg_off, rayo, rayd, c2w))
    fused = np.asarray(forward(params, state, cfg_on, rayo, rayd, c2w))
    np.testing.assert_allclose(fused, base, rtol=1e-4, atol=1e-5)


def test_fused_train_step_gradients_model_level():
    """One train step fused vs unfused: same loss, same updated params."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import make_opt_state, make_train_step

    rayo, rayd, c2w = _rays(H=8, W=8)
    target = np.random.default_rng(0).random((1, 8, 8, 3), np.float32)

    results = {}
    for name, fa in (("off", False), ("on", True)):
        cfg = tiny_cfg(tpu={"fused_attn": fa})
        params, state = create_model(cfg, jax.random.PRNGKey(0))
        opt = make_opt_state(cfg, params)
        step_fn, _ = make_train_step(cfg, donate=False)
        p1, _, loss, _ = step_fn(params, opt, state, rayo, rayd, target,
                                 c2w, 0)
        results[name] = (float(loss), p1)

    assert results["on"][0] == pytest.approx(results["off"][0], rel=1e-5)
    for a, b in zip(jax.tree.leaves(results["on"][1]),
                    jax.tree.leaves(results["off"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
