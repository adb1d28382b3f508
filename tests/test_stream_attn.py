"""Streamed key-attention kernel (ops/stream_attn.py) vs the unfused XLA
math — forward and gradients, kernel-level and model-level, fp32 and bf16."""

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

from papr_tpu.config import load_config
from papr_tpu.model.attention import _encode
from papr_tpu.nn.mlp import F32, feedforward_apply, feedforward_init
from papr_tpu.ops.fused_mlp import _ff_lns
from papr_tpu.ops.stream_attn import key_stream_scores

NEG_BIG = -1e30

LS = (2, 2, 2)
PE = (2.0, 1.0)  # pe_factor, pe_mult_factor


def _ff_cfg(d_ff, d_out, n_layer, norm):
    cfg = load_config(overrides={"models": {"attn": {"embed": {"key": {
        "d_ff": d_ff, "d_ff_out": d_out, "n_ff_layer": n_layer,
        "norm": norm}}}}})
    return cfg.models.attn.embed.key


def _setup(key, T, K, d_ff=32, d_out=32, n_layer=3, dm=16, norm="none"):
    ks = jax.random.split(key, 6)
    ff_cfg = _ff_cfg(d_ff, d_out, n_layer, norm)
    d_in = sum(3 + 3 * 2 * l for l in LS)   # embed_type 1
    ff = feedforward_init(ks[0], d_in, d_out, ff_cfg)
    xk = jax.random.normal(ks[1], (K, T, 9), jnp.float32)
    qq = jax.random.normal(ks[2], (T, dm), jnp.float32)
    wk = jax.random.normal(ks[3], (dm, d_out)) / np.sqrt(d_out)
    bk = jax.random.normal(ks[4], (dm,)) * 0.1
    influ = jax.random.normal(ks[5], (T, K)) * 0.5 + 1.0
    alive = (jax.random.uniform(ks[0], (T, K)) > 0.2).astype(jnp.float32)
    return ff_cfg, ff, xk, qq, wk, bk, influ, alive


def _ref(ff_cfg, ff, xk, qq, wk, bk, influ, alive, score_act="relu",
         bkg=5.0):
    """Unfused oracle: nn posenc + feedforward + score + bkg softmax."""
    feats = [xk[..., 0:3], xk[..., 3:6], xk[..., 6:9]]
    enc = _encode(feats, LS, 1, PE[0], PE[1], None)
    ek = feedforward_apply(ff, enc, ff_cfg, ff_cfg.d_ff_out, 1e-6, F32)
    kk = jnp.einsum("ktd,md->ktm", ek, wk) + bk
    raw = jnp.einsum("ktm,tm->tk", kk.astype(jnp.float32), qq) \
        / math.sqrt(wk.shape[0])
    s = jnp.maximum(raw, 0.0) if score_act == "relu" else raw
    s = s * influ
    s = jnp.where(alive > 0.5, s, NEG_BIG)
    allsc = jnp.concatenate([s, jnp.full(s.shape[:-1] + (1,), bkg)], -1)
    return jax.nn.softmax(allsc, axis=-1)


def _stream(ff_cfg, ff, xk, qq, wk, bk, influ, alive, score_act="relu",
            bkg=5.0, tile=32, compute=None):
    ws = tuple(l["w"].T for l in ff["mlp"]["layers"])
    bs = tuple(l["bias"] for l in ff["mlp"]["layers"])
    ln_in, ln_out = _ff_lns(ff)
    pe_desc = ((3, 3, 3), LS, 1, PE[0], PE[1], 0)
    return key_stream_scores(
        xk, qq, ws, bs, ln_in, ln_out, wk, bk, influ, alive, pe_desc,
        ff_cfg.ff_act, ff_cfg.ff_last_act, score_act, bkg, tile, True,
        compute)


@pytest.mark.parametrize("T,K,tile,norm", [
    (64, 7, 32, "none"),
    (100, 5, 32, "layernorm"),       # overhang rows (100 % 32 != 0)
    (40, 1, 40, "none"),             # K=1: first and last k step coincide
    (48, 11, 16, "layernorm"),
])
def test_forward_matches_reference(T, K, tile, norm):
    a = _setup(jax.random.PRNGKey(0), T, K, norm=norm)
    got = _stream(*a, tile=tile)
    want = _ref(*a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T,K,tile,norm", [
    (64, 6, 32, "layernorm"),
    (90, 5, 32, "none"),             # overhang rows exercise dW row-masking
])
def test_gradients_match_reference(T, K, tile, norm):
    ff_cfg, ff, xk, qq, wk, bk, influ, alive = _setup(
        jax.random.PRNGKey(1), T, K, norm=norm)
    ev = jax.random.normal(jax.random.PRNGKey(2), (K, T, 8))
    tgt_f = jax.random.normal(jax.random.PRNGKey(3), (T, 8))
    tgt_a = jax.random.normal(jax.random.PRNGKey(4), (T, 1))

    def loss(attn_fn, ff, xk, qq, wk, bk, influ):
        attn = attn_fn(ff_cfg, ff, xk, qq, wk, bk, influ, alive)
        topk = attn[:, :-1]
        topk = topk / jnp.sum(topk, axis=-1, keepdims=True)
        fused = jnp.einsum("tk,ktc->tc", topk, ev)
        return jnp.mean((fused - tgt_f) ** 2) + \
            jnp.mean((attn[:, -1:] - tgt_a) ** 2)

    st = lambda *a_: _stream(*a_, tile=tile)
    argnums = tuple(range(6))
    gf = jax.grad(lambda *a_: loss(st, *a_), argnums)(
        ff, xk, qq, wk, bk, influ)
    gr = jax.grad(lambda *a_: loss(_ref, *a_), argnums)(
        ff, xk, qq, wk, bk, influ)
    for name, a_, b_ in zip(["ff", "xk", "qq", "wk", "bk", "influ"], gf, gr):
        for la, lb in zip(jax.tree.leaves(a_), jax.tree.leaves(b_)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-4, atol=1e-6, err_msg=name)


def test_all_dead_ray_attn():
    a = list(_setup(jax.random.PRNGKey(4), 8, 5))
    alive = np.ones((8, 5), np.float32)
    alive[3] = 0.0
    a[7] = jnp.asarray(alive)
    attn = np.asarray(_stream(*a, tile=8))
    assert np.isfinite(attn).all()
    np.testing.assert_allclose(attn[3, -1], 1.0, atol=1e-6)
    np.testing.assert_allclose(attn[3, :-1], 0.0, atol=1e-6)


def test_bf16_compute_close_to_fp32():
    a = _setup(jax.random.PRNGKey(5), 64, 6)
    f32 = _stream(*a, tile=32)
    b16 = _stream(*a, tile=32, compute="bfloat16")
    np.testing.assert_allclose(np.asarray(b16), np.asarray(f32),
                               rtol=5e-2, atol=2e-2)


# ----------------------------------------------------------- value stream ----

from papr_tpu.ops.stream_attn import value_stream_fuse

VLS = (2, 2)


def _vsetup(key, T, K, d_ff=32, d_out=24, n_layer=3, norm="layernorm"):
    ks = jax.random.split(key, 3)
    ff_cfg = _ff_cfg(d_ff, d_out, n_layer, norm)
    d_in = sum(3 + 3 * 2 * l for l in VLS)
    ff = feedforward_init(ks[0], d_in, d_out, ff_cfg)
    xv = jax.random.normal(ks[1], (K, T, 6), jnp.float32)
    attn = jax.nn.softmax(
        jax.random.normal(ks[2], (T, K + 1), jnp.float32), axis=-1)
    return ff_cfg, ff, xv, attn


def _vref(ff_cfg, ff, xv, attn, normalize=True):
    feats = [xv[..., 0:3], xv[..., 3:6]]
    enc = _encode(feats, VLS, 1, PE[0], PE[1], None)
    ev = feedforward_apply(ff, enc, ff_cfg, ff_cfg.d_ff_out, 1e-6, F32)
    topk = attn[:, :-1]
    if normalize:
        topk = topk / jnp.sum(topk, axis=-1, keepdims=True)
    return jnp.einsum("tk,ktc->tc", topk, ev.astype(jnp.float32))


def _vstream(ff_cfg, ff, xv, attn, normalize=True, tile=32, compute=None):
    ws = tuple(l["w"].T for l in ff["mlp"]["layers"])
    bs = tuple(l["bias"] for l in ff["mlp"]["layers"])
    ln_in, ln_out = _ff_lns(ff)
    pe_desc = ((3, 3), VLS, 1, PE[0], PE[1], 0)
    return value_stream_fuse(xv, attn, ws, bs, ln_in, ln_out, pe_desc,
                             ff_cfg.ff_act, ff_cfg.ff_last_act, normalize,
                             tile, True, compute)


@pytest.mark.parametrize("T,K,tile,norm,renorm", [
    (64, 7, 32, "layernorm", True),
    (100, 5, 32, "none", True),      # overhang rows
    (40, 1, 40, "layernorm", False), # K=1, no renormalization
    (48, 11, 16, "none", False),
])
def test_value_forward_matches_reference(T, K, tile, norm, renorm):
    ff_cfg, ff, xv, attn = _vsetup(jax.random.PRNGKey(7), T, K, norm=norm)
    got = _vstream(ff_cfg, ff, xv, attn, normalize=renorm, tile=tile)
    want = _vref(ff_cfg, ff, xv, attn, normalize=renorm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T,K,tile,renorm", [
    (64, 6, 32, True),
    (90, 5, 32, False),              # overhang rows exercise dW row-masking
    (90, 5, 32, True),               # overhang + renorm: 0/0 fuse weights on
                                     # masked rows must not poison dW
])
def test_value_gradients_match_reference(T, K, tile, renorm):
    ff_cfg, ff, xv, attn = _vsetup(jax.random.PRNGKey(8), T, K)
    tgt = jax.random.normal(jax.random.PRNGKey(9), (T, ff_cfg.d_ff_out))

    def loss(fuse_fn, ff, xv, attn):
        fused = fuse_fn(ff_cfg, ff, xv, attn, normalize=renorm)
        # attn cotangent must combine the fuse chain with a direct use of
        # the bkg column (compositing does the same in papr.py).
        return jnp.mean((fused - tgt) ** 2) + jnp.mean(attn[:, -1] ** 2)

    args = (ff, xv, attn)
    gf = jax.grad(lambda *a: loss(lambda *b, **kw: _vstream(*b, tile=tile,
                                                            **kw), *a),
                  (0, 1, 2))(*args)
    gr = jax.grad(lambda *a: loss(_vref, *a), (0, 1, 2))(*args)
    for name, a_, b_ in zip(["ff", "xv", "attn"], gf, gr):
        for la, lb in zip(jax.tree.leaves(a_), jax.tree.leaves(b_)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-4, atol=1e-6, err_msg=name)


# ------------------------------------------------------- rec-native (v2) ----

from papr_tpu.ops.stream_attn import (key_stream_scores_rec,
                                      value_stream_fuse_rec)

EPS = 1e-6


def _rec_setup(key, T, K, extra_dim=0, rec_pad=128, dm=16, d_out=32,
               norm="layernorm", n_layer=3):
    ks = jax.random.split(key, 8)
    ff_cfg = _ff_cfg(32, d_out, n_layer, norm)
    rec = np.zeros((K, T, rec_pad), np.float32)
    rec[..., 0:3] = np.asarray(jax.random.normal(ks[0], (K, T, 3))) * 2.0
    rec[..., 3] = np.asarray(jax.random.normal(ks[1], (K, T))) * 0.5 + 1.0
    rec[..., 4] = np.asarray(
        jax.random.uniform(ks[2], (K, T)) > 0.2).astype(np.float32)
    if extra_dim:
        rec[..., 5:5 + extra_dim] = np.asarray(
            jax.random.normal(ks[3], (K, T, extra_dim)))
    rayo = jax.random.normal(ks[4], (T, 3), jnp.float32) * 3.0
    rayd = jax.random.normal(ks[5], (T, 3), jnp.float32)
    rays = rayd / jnp.linalg.norm(rayd, axis=-1, keepdims=True)
    qq = jax.random.normal(ks[6], (T, dm), jnp.float32)
    d_in = sum(3 + 3 * 2 * l for l in LS) + extra_dim
    ff = feedforward_init(ks[7], d_in, d_out, ff_cfg)
    wk = jax.random.normal(ks[0], (dm, d_out)) / np.sqrt(d_out)
    bk = jax.random.normal(ks[1], (dm,)) * 0.1
    return ff_cfg, ff, jnp.asarray(rec), rayo, rays, qq, wk, bk


def _geometry(rec, rayo, rays):
    sel = rec[..., 0:3]
    v = sel - rayo
    t_al = jnp.sum(v * rays, axis=-1, keepdims=True)
    dd = jnp.sum(rays * rays, axis=-1, keepdims=True)
    proj = rays * (t_al / (dd + EPS))
    perp = v - proj
    return sel, proj, perp


def _rec_ref(ff_cfg, ff, rec, rayo, rays, qq, wk, bk, extra_dim=0,
             score_act="relu", bkg=5.0):
    """Oracle: XLA geometry + posenc + feedforward + score + softmax with
    the reference's detached position feature."""
    sel, proj, perp = _geometry(rec, rayo, rays)
    feats = [jax.lax.stop_gradient(sel), proj, perp]
    extras = [rec[..., 5:5 + extra_dim]] if extra_dim else None
    enc = _encode(feats, LS, 1, PE[0], PE[1], extras)
    ek = feedforward_apply(ff, enc, ff_cfg, ff_cfg.d_ff_out, 1e-6, F32)
    kk = jnp.einsum("ktd,md->ktm", ek, wk) + bk
    raw = jnp.einsum("ktm,tm->tk", kk.astype(jnp.float32), qq) \
        / math.sqrt(wk.shape[0])
    s = jnp.maximum(raw, 0.0) if score_act == "relu" else raw
    s = s * rec[..., 3].T
    s = jnp.where(rec[..., 4].T > 0.5, s, NEG_BIG)
    allsc = jnp.concatenate([s, jnp.full(s.shape[:-1] + (1,), bkg)], -1)
    return jax.nn.softmax(allsc, axis=-1)


def _rec_stream(ff_cfg, ff, rec, rayo, rays, qq, wk, bk, extra_dim=0,
                tile=32, compute=None):
    ws = tuple(l["w"].T for l in ff["mlp"]["layers"])
    bs = tuple(l["bias"] for l in ff["mlp"]["layers"])
    ln_in, ln_out = _ff_lns(ff)
    return key_stream_scores_rec(
        rec, rayo, rays, qq, ws, bs, ln_in, ln_out, wk, bk,
        (LS, 1, PE[0], PE[1], extra_dim), ff_cfg.ff_act,
        ff_cfg.ff_last_act, "relu", 5.0, EPS, tile, True, compute)


@pytest.mark.parametrize("T,K,tile,norm,extra", [
    (64, 7, 32, "layernorm", 0),
    (100, 5, 32, "none", 0),         # overhang rows
    (48, 6, 16, "layernorm", 8),     # pc-feats extras in the record
])
def test_rec_key_forward_matches_reference(T, K, tile, norm, extra):
    a = _rec_setup(jax.random.PRNGKey(10), T, K, extra_dim=extra, norm=norm)
    got = _rec_stream(*a, extra_dim=extra, tile=tile)
    want = _rec_ref(*a, extra_dim=extra)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T,K,tile,extra", [
    (64, 6, 32, 0),
    (90, 5, 32, 4),                  # overhang + extras
])
def test_rec_key_gradients_match_reference(T, K, tile, extra):
    ff_cfg, ff, rec, rayo, rays, qq, wk, bk = _rec_setup(
        jax.random.PRNGKey(11), T, K, extra_dim=extra)
    ev = jax.random.normal(jax.random.PRNGKey(12), (K, T, 8))
    tgt_f = jax.random.normal(jax.random.PRNGKey(13), (T, 8))
    tgt_a = jax.random.normal(jax.random.PRNGKey(14), (T, 1))

    def loss(attn_fn, ff, rec, rayo, rays, qq, wk, bk):
        attn = attn_fn(ff_cfg, ff, rec, rayo, rays, qq, wk, bk,
                       extra_dim=extra)
        topk = attn[:, :-1]
        topk = topk / jnp.sum(topk, axis=-1, keepdims=True)
        fused = jnp.einsum("tk,ktc->tc", topk, ev)
        return jnp.mean((fused - tgt_f) ** 2) + \
            jnp.mean((attn[:, -1:] - tgt_a) ** 2)

    st = lambda *a_, **kw: _rec_stream(*a_, tile=tile, **kw)
    argnums = tuple(range(7))
    args = (ff, rec, rayo, rays, qq, wk, bk)
    gf = jax.grad(lambda *a_: loss(st, *a_), argnums)(*args)
    gr = jax.grad(lambda *a_: loss(_rec_ref, *a_), argnums)(*args)
    for name, a_, b_ in zip(["ff", "rec", "rayo", "rays", "qq", "wk", "bk"],
                            gf, gr):
        for la, lb in zip(jax.tree.leaves(a_), jax.tree.leaves(b_)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-4, atol=1e-6, err_msg=name)


def _vrec_ref(ff_cfg, ff, rec, rayo, rays, attn, extra_dim=0,
              normalize=True):
    _, proj, perp = _geometry(rec, rayo, rays)
    feats = [proj, perp]
    extras = [rec[..., 5:5 + extra_dim]] if extra_dim else None
    enc = _encode(feats, VLS, 1, PE[0], PE[1], extras)
    ev = feedforward_apply(ff, enc, ff_cfg, ff_cfg.d_ff_out, 1e-6, F32)
    topk = attn[:, :-1]
    if normalize:
        topk = topk / jnp.sum(topk, axis=-1, keepdims=True)
    return jnp.einsum("tk,ktc->tc", topk, ev.astype(jnp.float32))


def _vrec_stream(ff_cfg, ff, rec, rayo, rays, attn, extra_dim=0,
                 normalize=True, tile=32, compute=None):
    ws = tuple(l["w"].T for l in ff["mlp"]["layers"])
    bs = tuple(l["bias"] for l in ff["mlp"]["layers"])
    ln_in, ln_out = _ff_lns(ff)
    return value_stream_fuse_rec(
        rec, rayo, rays, attn, ws, bs, ln_in, ln_out,
        (VLS, 1, PE[0], PE[1], extra_dim), ff_cfg.ff_act,
        ff_cfg.ff_last_act, normalize, EPS, tile, True, compute)


def _vrec_setup(key, T, K, extra_dim=0, norm="layernorm"):
    ff_cfg0, ff0, rec, rayo, rays, qq, wk, bk = _rec_setup(
        key, T, K, extra_dim=extra_dim, norm=norm)
    d_in = sum(3 + 3 * 2 * l for l in VLS) + extra_dim
    ff_cfg = _ff_cfg(32, 24, 3, norm)
    ff = feedforward_init(jax.random.split(key)[0], d_in, 24, ff_cfg)
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.split(key)[1], (T, K + 1)), axis=-1)
    return ff_cfg, ff, rec, rayo, rays, attn


@pytest.mark.parametrize("T,K,tile,norm,extra,renorm", [
    (64, 7, 32, "layernorm", 0, True),
    (100, 5, 32, "none", 6, False),  # overhang + extras, no renorm
])
def test_rec_value_forward_matches_reference(T, K, tile, norm, extra,
                                             renorm):
    a = _vrec_setup(jax.random.PRNGKey(15), T, K, extra_dim=extra,
                    norm=norm)
    got = _vrec_stream(*a, extra_dim=extra, normalize=renorm, tile=tile)
    want = _vrec_ref(*a, extra_dim=extra, normalize=renorm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T,K,tile,extra,renorm", [
    (64, 6, 32, 0, True),
    (90, 5, 32, 4, False),
    (90, 5, 32, 0, True),            # overhang + renorm (see value test)
])
def test_rec_value_gradients_match_reference(T, K, tile, extra, renorm):
    ff_cfg, ff, rec, rayo, rays, attn = _vrec_setup(
        jax.random.PRNGKey(16), T, K, extra_dim=extra)
    tgt = jax.random.normal(jax.random.PRNGKey(17), (T, ff_cfg.d_ff_out))

    def loss(fn, ff, rec, rayo, rays, attn):
        fused = fn(ff_cfg, ff, rec, rayo, rays, attn, extra_dim=extra,
                   normalize=renorm)
        return jnp.mean((fused - tgt) ** 2) + jnp.mean(attn[:, -1] ** 2)

    args = (ff, rec, rayo, rays, attn)
    gf = jax.grad(lambda *a: loss(
        lambda *b, **kw: _vrec_stream(*b, tile=tile, **kw), *a),
        tuple(range(5)))(*args)
    gr = jax.grad(lambda *a: loss(_vrec_ref, *a), tuple(range(5)))(*args)
    for name, a_, b_ in zip(["ff", "rec", "rayo", "rays", "attn"], gf, gr):
        for la, lb in zip(jax.tree.leaves(a_), jax.tree.leaves(b_)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-4, atol=1e-6, err_msg=name)


# ----------------------------------------------------- query-folded (recq) ----

from papr_tpu.ops.stream_attn import key_stream_scores_recq

QLS = (2,)


def _recq_setup(key, T, K, extra_dim=0, dm=16, norm="layernorm"):
    ff_cfg, kff, rec, rayo, rays, _, wk, bk = _rec_setup(
        key, T, K, extra_dim=extra_dim, dm=dm, norm=norm)
    ks = jax.random.split(key, 4)
    rayd = jax.random.normal(ks[0], (T, 3), jnp.float32)
    q_in = sum(3 + 3 * 2 * l for l in QLS)
    qff_cfg = _ff_cfg(32, 24, 2, norm)
    qff = feedforward_init(ks[1], q_in, 24, qff_cfg)
    wq = jax.random.normal(ks[2], (dm, 24)) / np.sqrt(24)
    bq = jax.random.normal(ks[3], (dm,)) * 0.1
    return ff_cfg, qff_cfg, kff, qff, rec, rayo, rays, rayd, wk, bk, wq, bq


def _recq_ref(ff_cfg, qff_cfg, kff, qff, rec, rayo, rays, rayd, wk, bk, wq,
              bq, extra_dim=0):
    enc_q = _encode([rayd], QLS, 1, PE[0], PE[1], None)
    eq = feedforward_apply(qff, enc_q, qff_cfg, qff_cfg.d_ff_out, 1e-6, F32)
    qq = (jnp.einsum("td,md->tm", eq, wq) + bq).astype(jnp.float32)
    return _rec_ref(ff_cfg, kff, rec, rayo, rays, qq, wk, bk,
                    extra_dim=extra_dim)


def _recq_stream(ff_cfg, qff_cfg, kff, qff, rec, rayo, rays, rayd, wk, bk,
                 wq, bq, extra_dim=0, tile=32, compute=None):
    kws = tuple(l["w"].T for l in kff["mlp"]["layers"])
    kbs = tuple(l["bias"] for l in kff["mlp"]["layers"])
    kln_in, kln_out = _ff_lns(kff)
    qws = tuple(l["w"].T for l in qff["mlp"]["layers"])
    qbs = tuple(l["bias"] for l in qff["mlp"]["layers"])
    qln_in, qln_out = _ff_lns(qff)
    return key_stream_scores_recq(
        rec, rayo, rays, rayd, kws, kbs, kln_in, kln_out, wk, bk,
        qws, qbs, qln_in, qln_out, wq, bq,
        (LS, 1, PE[0], PE[1], extra_dim), (QLS, 1, PE[0], PE[1]),
        ff_cfg.ff_act, ff_cfg.ff_last_act, qff_cfg.ff_act,
        qff_cfg.ff_last_act, "relu", 5.0, EPS, tile, True, compute)


@pytest.mark.parametrize("T,K,tile,norm,extra", [
    (64, 7, 32, "layernorm", 0),
    (100, 5, 32, "none", 0),         # overhang rows
    (48, 1, 16, "layernorm", 8),     # K=1: query fwd/bwd on the same step
])
def test_recq_forward_matches_reference(T, K, tile, norm, extra):
    a = _recq_setup(jax.random.PRNGKey(20), T, K, extra_dim=extra,
                    norm=norm)
    got = _recq_stream(*a, extra_dim=extra, tile=tile)
    want = _recq_ref(*a, extra_dim=extra)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T,K,tile,extra", [
    (64, 6, 32, 0),
    (90, 5, 32, 4),                  # overhang + extras
    (48, 1, 16, 0),                  # K=1: query fwd AND bwd on the same
                                     # grid step (init == accumulate)
])
def test_recq_gradients_match_reference(T, K, tile, extra):
    (ff_cfg, qff_cfg, kff, qff, rec, rayo, rays, rayd, wk, bk, wq,
     bq) = _recq_setup(jax.random.PRNGKey(21), T, K, extra_dim=extra)
    ev = jax.random.normal(jax.random.PRNGKey(22), (K, T, 8))
    tgt_f = jax.random.normal(jax.random.PRNGKey(23), (T, 8))
    tgt_a = jax.random.normal(jax.random.PRNGKey(24), (T, 1))

    def loss(fn, kff, qff, rec, rayo, rays, rayd, wk, bk, wq, bq):
        attn = fn(ff_cfg, qff_cfg, kff, qff, rec, rayo, rays, rayd, wk,
                  bk, wq, bq, extra_dim=extra)
        topk = attn[:, :-1]
        topk = topk / jnp.sum(topk, axis=-1, keepdims=True)
        fused = jnp.einsum("tk,ktc->tc", topk, ev)
        return jnp.mean((fused - tgt_f) ** 2) + \
            jnp.mean((attn[:, -1:] - tgt_a) ** 2)

    st = lambda *a_, **kw: _recq_stream(*a_, tile=tile, **kw)
    args = (kff, qff, rec, rayo, rays, rayd, wk, bk, wq, bq)
    argnums = tuple(range(10))
    gf = jax.grad(lambda *a_: loss(st, *a_), argnums)(*args)
    gr = jax.grad(lambda *a_: loss(_recq_ref, *a_), argnums)(*args)
    names = ["kff", "qff", "rec", "rayo", "rays", "rayd", "wk", "bk",
             "wq", "bq"]
    for name, a_, b_ in zip(names, gf, gr):
        for la, lb in zip(jax.tree.leaves(a_), jax.tree.leaves(b_)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-4, atol=1e-6, err_msg=name)


# ------------------------------------------------------------ model level ----

@pytest.mark.parametrize("mode", ["stream", "streamrec"])
def test_stream_forward_matches_unfused_model_level(mode):
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model, forward

    cfg_off = tiny_cfg(tpu={"fused_attn": False})
    cfg_on = tiny_cfg(tpu={"fused_attn": mode})
    params, state = create_model(cfg_off, jax.random.PRNGKey(0))
    rayo, rayd, c2w = _rays(H=8, W=8)

    base = np.asarray(forward(params, state, cfg_off, rayo, rayd, c2w))
    fused = np.asarray(forward(params, state, cfg_on, rayo, rayd, c2w))
    np.testing.assert_allclose(fused, base, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["stream", "streamrec"])
def test_stream_forward_with_point_feats_ink(mode):
    """pc_feats with use_ink: extras ride the key stream as pass-through."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model, forward

    over = {"geoms": {"point_feats": {"use_ink": True, "use_inv": True}}}
    cfg_off = tiny_cfg(tpu={"fused_attn": False}, **over)
    cfg_on = tiny_cfg(tpu={"fused_attn": mode}, **over)
    params, state = create_model(cfg_off, jax.random.PRNGKey(0))
    rayo, rayd, c2w = _rays(H=8, W=8)

    base = np.asarray(forward(params, state, cfg_off, rayo, rayd, c2w))
    fused = np.asarray(forward(params, state, cfg_on, rayo, rayd, c2w))
    np.testing.assert_allclose(fused, base, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["stream", "streamrec"])
def test_stream_train_step_gradients_model_level(mode):
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import make_opt_state, make_train_step

    rayo, rayd, c2w = _rays(H=8, W=8)
    target = np.random.default_rng(0).random((1, 8, 8, 3), np.float32)

    results = {}
    for name, fa in (("off", False), ("stream", mode)):
        cfg = tiny_cfg(tpu={"fused_attn": fa})
        params, state = create_model(cfg, jax.random.PRNGKey(0))
        opt = make_opt_state(cfg, params)
        step_fn, _ = make_train_step(cfg, donate=False)
        p1, _, loss, _ = step_fn(params, opt, state, rayo, rayd, target,
                                 c2w, 0)
        results[name] = (float(loss), p1)

    assert results["stream"][0] == pytest.approx(results["off"][0], rel=1e-5)
    for a, b in zip(jax.tree.leaves(results["stream"][1]),
                    jax.tree.leaves(results["off"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_rec_key_kernel_matches_reference_under_mxu_reduce(monkeypatch):
    """Full rec-native key kernel (fwd + grads) with the MXU lane-reduce
    branches active — helper-level parity (test_round3_fixes) composed
    through the real pallas kernel in interpret mode."""
    import papr_tpu.ops.fused_mlp as fm
    monkeypatch.setattr(fm, "_MXU_REDUCE", True)

    T, K, tile, extra = 64, 6, 32, 4
    ff_cfg, ff, rec, rayo, rays, qq, wk, bk = _rec_setup(
        jax.random.PRNGKey(21), T, K, extra_dim=extra)
    got = _rec_stream(ff_cfg, ff, rec, rayo, rays, qq, wk, bk,
                      extra_dim=extra, tile=tile)
    want = _rec_ref(ff_cfg, ff, rec, rayo, rays, qq, wk, bk,
                    extra_dim=extra)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    ev = jax.random.normal(jax.random.PRNGKey(22), (K, T, 8))
    tgt_f = jax.random.normal(jax.random.PRNGKey(23), (T, 8))

    def loss(attn_fn, ff, rec, rayo, rays, qq, wk, bk):
        attn = attn_fn(ff_cfg, ff, rec, rayo, rays, qq, wk, bk,
                       extra_dim=extra)
        topk = attn[:, :-1]
        topk = topk / jnp.sum(topk, axis=-1, keepdims=True)
        fused = jnp.einsum("tk,ktc->tc", topk, ev)
        return jnp.mean((fused - tgt_f) ** 2)

    st = lambda *a_, **kw: _rec_stream(*a_, tile=tile, **kw)
    argnums = tuple(range(7))
    args = (ff, rec, rayo, rays, qq, wk, bk)
    gf = jax.grad(lambda *a_: loss(st, *a_), argnums)(*args)
    gr = jax.grad(lambda *a_: loss(_rec_ref, *a_), argnums)(*args)
    for name, a_, b_ in zip(["ff", "rec", "rayo", "rays", "qq", "wk", "bk"],
                            gf, gr):
        for la, lb in zip(jax.tree.leaves(a_), jax.tree.leaves(b_)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=3e-4, atol=1e-6, err_msg=name)


# --------------------------------------------------- query fold (model) ----

def test_query_fold_forward_matches_unfused_model_level():
    """tpu.query_fold routes streamrec through key_stream_scores_recq."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model, forward

    cfg_off = tiny_cfg(tpu={"fused_attn": False})
    cfg_on = tiny_cfg(tpu={"fused_attn": "streamrec", "query_fold": True})
    params, state = create_model(cfg_off, jax.random.PRNGKey(0))
    rayo, rayd, c2w = _rays(H=8, W=8)

    base = np.asarray(forward(params, state, cfg_off, rayo, rayd, c2w))
    fused = np.asarray(forward(params, state, cfg_on, rayo, rayd, c2w))
    np.testing.assert_allclose(fused, base, rtol=1e-4, atol=1e-5)


def test_query_fold_train_step_gradients_model_level():
    """One full train step: query-fold kernels vs unfused XLA oracle.

    Covers the folded query walk's backward (w_q / query-embedder /
    ray-direction grads) composed with the full loss + optimizer."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import make_opt_state, make_train_step

    rayo, rayd, c2w = _rays(H=8, W=8)
    target = np.random.default_rng(0).random((1, 8, 8, 3), np.float32)

    results = {}
    for name, tpu in (("off", {"fused_attn": False}),
                      ("qfold", {"fused_attn": "streamrec",
                                 "query_fold": True})):
        cfg = tiny_cfg(tpu=tpu)
        params, state = create_model(cfg, jax.random.PRNGKey(0))
        opt = make_opt_state(cfg, params)
        step_fn, _ = make_train_step(cfg, donate=False)
        p1, _, loss, _ = step_fn(params, opt, state, rayo, rayd, target,
                                 c2w, 0)
        results[name] = (float(loss), p1)

    assert results["qfold"][0] == pytest.approx(results["off"][0], rel=1e-5)
    for a, b in zip(jax.tree.leaves(results["qfold"][1]),
                    jax.tree.leaves(results["off"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("normalize", [True, False])
def test_attend_stream_eval_matches_two_kernel_path(normalize):
    """The fused eval kernel (attend_stream_eval: one dispatch, shared
    geometry, online-softmax fusion) must match the two-kernel eval path
    (key_stream_scores_rec + value_stream_fuse_rec) through the real
    ``evaluate`` surface, for both renormalize settings and with per-point
    value features active (default use_inv)."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model, evaluate

    kern = {"fused_attn": "streamrec"}
    cfg_one = tiny_cfg(models={"normalize_topk_attn": normalize},
                       tpu={**kern, "eval_fused": True})
    cfg_two = tiny_cfg(models={"normalize_topk_attn": normalize},
                       tpu={**kern, "eval_fused": False})
    params, state = create_model(cfg_one, jax.random.PRNGKey(0))
    rayo, rayd, _ = _rays(H=9, W=11)        # odd shape: row-overhang masks

    one = evaluate(params, state, cfg_one, rayo, rayd, with_selected=True)
    two = evaluate(params, state, cfg_two, rayo, rayd, with_selected=True)
    for a, b, name in zip(one, two, ("fused", "attn", "selected")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6, err_msg=name)


def test_attend_stream_eval_forward_only_not_in_train_path():
    """eval_mode gating: the one-shot kernel serves only exact_select
    (eval/render) traces — the differentiable forward() keeps the two
    bwd-capable kernels, so a train step on the same config still works."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import make_opt_state, make_train_step

    cfg = tiny_cfg(tpu={"fused_attn": "streamrec", "eval_fused": True})
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    rayo, rayd, c2w = _rays(H=8, W=8)
    target = np.random.default_rng(0).random((1, 8, 8, 3), np.float32)
    opt = make_opt_state(cfg, params)
    step_fn, _ = make_train_step(cfg, donate=False)
    _, _, loss, _ = step_fn(params, opt, state, rayo, rayd, target, c2w, 0)
    assert np.isfinite(float(loss))
