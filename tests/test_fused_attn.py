"""Fused score->softmax kernel (ops/fused_attn.py) vs the unfused XLA math —
forward and gradients, overhang tiles, lane padding, dead-point masking."""

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

from papr_tpu.ops.fused_attn import fused_scores

NEG_BIG = -1e30


def _ref(ek, eq, wk, bk, wq, bq, influ, alive, score_act="relu", bkg=5.0):
    """Pure-XLA reference: attention.py score math + papr.py softmax.

    ek is K-major (K, T, Dk) like the kernel input; influ/alive are (T, K).
    """
    dm = wk.shape[0]
    kk = jnp.einsum("ktd,md->ktm", ek, wk) + bk
    qq = jnp.einsum("td,md->tm", eq, wq) + bq
    raw = jnp.einsum("ktm,tm->tk", kk, qq) / math.sqrt(dm)
    s = jnp.maximum(raw, 0.0) if score_act == "relu" else raw
    s = s * influ
    s = jnp.where(alive > 0.5, s, NEG_BIG)
    allsc = jnp.concatenate([s, jnp.full(s.shape[:-1] + (1,), bkg)], -1)
    return jax.nn.softmax(allsc, axis=-1)


def _inputs(key, T, K, Dk=48, Dq=40, dm=32, dead_frac=0.2):
    ks = jax.random.split(key, 8)
    ek = jax.random.normal(ks[0], (K, T, Dk), jnp.float32)
    eq = jax.random.normal(ks[1], (T, Dq), jnp.float32)
    wk = jax.random.normal(ks[2], (dm, Dk)) / np.sqrt(Dk)
    bk = jax.random.normal(ks[3], (dm,)) * 0.1
    wq = jax.random.normal(ks[4], (dm, Dq)) / np.sqrt(Dq)
    bq = jax.random.normal(ks[5], (dm,)) * 0.1
    influ = jax.random.normal(ks[6], (T, K)) * 0.5 + 1.0
    alive = (jax.random.uniform(ks[7], (T, K)) > dead_frac).astype(jnp.float32)
    return ek, eq, wk, bk, wq, bq, influ, alive


@pytest.mark.parametrize("T,K,tile,act,Dk", [
    (64, 20, 32, "relu", 48),
    (100, 20, 32, "relu", 48),       # overhang rows (100 % 32 != 0)
    (64, 7, 64, "relu", 128),        # already lane-aligned Dk
    (48, 5, 16, "none", 33),         # identity score act, odd Dk
])
def test_forward_matches_reference(T, K, tile, act, Dk):
    args = _inputs(jax.random.PRNGKey(0), T, K, Dk=Dk)
    got = fused_scores(*args, score_act=act, bkg_score=5.0, tile=tile,
                       interpret=True)
    want = _ref(*args, score_act=act, bkg=5.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T,K,tile", [
    (64, 20, 32),
    (90, 11, 32),                    # overhang rows exercise dW row-masking
    (64, 6, 64),
])
def test_gradients_match_reference(T, K, tile):
    args = _inputs(jax.random.PRNGKey(1), T, K)
    ev = jax.random.normal(jax.random.PRNGKey(2), (K, T, 16))
    tgt_f = jax.random.normal(jax.random.PRNGKey(3), (T, 16))
    tgt_a = jax.random.normal(jax.random.PRNGKey(4), (T, 1))

    def loss(attn_fn, *a):
        attn = attn_fn(*a)
        # The renorm+fuse epilogue exactly as papr.py applies it, so the
        # kernel's d_attn cotangent carries both the fused-feature chain
        # and the bkg-attn column used by compositing.
        topk = attn[:, :-1]
        topk = topk / jnp.sum(topk, axis=-1, keepdims=True)
        fused = jnp.einsum("tk,ktc->tc", topk, ev)
        return jnp.mean((fused - tgt_f) ** 2) + \
            jnp.mean((attn[:, -1:] - tgt_a) ** 2)

    fused_fn = lambda *a: fused_scores(*a, tile=tile, interpret=True)

    argnums = tuple(range(7))  # everything differentiable except alive
    gf = jax.grad(lambda *a: loss(fused_fn, *a), argnums)(*args)
    gr = jax.grad(lambda *a: loss(_ref, *a), argnums)(*args)
    names = ["ek", "eq", "wk", "bk", "wq", "bq", "influ"]
    for n, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6, err_msg=n)


def test_all_dead_ray_attn():
    """A ray whose selected points are all dead: softmax collapses onto the
    background token (same as the unfused path)."""
    args = list(_inputs(jax.random.PRNGKey(4), 8, 5))
    alive = np.ones((8, 5), np.float32)
    alive[3] = 0.0
    args[7] = jnp.asarray(alive)
    attn = np.asarray(fused_scores(*args, tile=8, interpret=True))
    assert np.isfinite(attn).all()
    np.testing.assert_allclose(attn[3, -1], 1.0, atol=1e-6)
    np.testing.assert_allclose(attn[3, :-1], 0.0, atol=1e-6)


def test_bf16_compute_close_to_fp32():
    args = _inputs(jax.random.PRNGKey(5), 64, 10)
    f32 = fused_scores(*args, tile=32, interpret=True)
    bargs = [args[0].astype(jnp.bfloat16),
             args[1].astype(jnp.bfloat16)] + list(args[2:])
    b16 = fused_scores(*bargs, tile=32, interpret=True, compute="bfloat16")
    np.testing.assert_allclose(np.asarray(b16), np.asarray(f32),
                               rtol=5e-2, atol=2e-2)
