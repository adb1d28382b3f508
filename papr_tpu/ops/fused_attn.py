"""Fused score->softmax Pallas kernel with a custom VJP (k-major layout).

The attention tail between the k/q/v embedder outputs and feature fusion:

    kk = embedk @ w_k + b_k          (per selected point, MXU)
    qq = embedq @ w_q + b_q          (per ray, MXU)
    raw = <qq, kk> / sqrt(d_model)   (scaled dot, reference models/attn.py:224)
    s   = score_act(raw) * influ     (influence reweighting, models/model.py:524)
    s   = where(alive, s, NEG_BIG)   (padded/dead points drop out)
    attn = softmax([s, bkg_score])   (background token, models/model.py:528-529)

runs as ONE VMEM-resident dispatch per ray tile. Executed op-by-op by XLA
these stages round-trip (T*K, d_model) tensors through HBM several times per
step (and again in the backward); worse, the pallas boundary of the fused
embedder kernels (ops/fused_mlp.py) stops XLA from fusing the chain into the
surrounding matmuls, which made the embedder kernels a net loss on the full
step. The renormalize+fuse epilogue (models/model.py:533-534) stays in XLA:
it is a tiny contraction with exact unfused numerics.

LAYOUT. The key embeddings enter K-MAJOR as (K, T, Dk): token order is
(k, ray), so the tensor is the plain 2D (K*T, Dk) embedder output viewed 3D
— a free reshape, because XLA tiles the trailing (T, Dk) dims identically
in both views when T is a sublane multiple. The kernel slices (tile, Dk)
planes per k by leading-dim indexing (`ref[k]`), which Mosaic supports with
no relayout (unlike middle-dim slicing of ray-major (T, K, Dk), which needs
3D shape casts it rejects). papr.py builds the geometric features k-major
for the same reason — no big-tensor transpose or layout copy exists
anywhere on the fused path.

The backward is flash-style: each grid step re-runs the tile's forward in
VMEM, then walks the chain in reverse, emitting per-token gradients
(d_embedk/q, d_influ) and accumulating the w_k/w_q/bias gradients in fp32
VMEM accumulators across the (sequential) TPU grid.

Numerics match attention.py score math: scores and softmax in fp32; the
w_k/w_q matmuls in the policy compute dtype (bf16 under use_amp) with the
bias add in compute dtype (mirroring nn/mlp.py linear_apply).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_BIG = -1e30


def _row_mask(x, tile, T):
    """Zero rows past T (grid-overhang blocks read undefined memory)."""
    if T % tile == 0:
        return x
    row = pl.program_id(0) * tile + jax.lax.broadcasted_iota(
        jnp.int32, x.shape, 0)
    return jnp.where(row < T, x, 0)


def _score_act_fwd(raw, kind):
    if kind == "relu":
        return jnp.maximum(raw, 0.0)
    if kind == "none":
        return raw
    raise NotImplementedError(kind)


def _score_act_mask(sact, kind):
    if kind == "relu":
        return (sact > 0).astype(jnp.float32)
    if kind == "none":
        return None
    raise NotImplementedError(kind)


def _linear(x_cdt, w_ref, b_ref, cdt):
    """nn/mlp.py linear_apply semantics: matmul + bias in compute dtype,
    promoted to fp32 after (attention.py casts scores fp32)."""
    y = jnp.dot(x_cdt, w_ref[:], preferred_element_type=jnp.float32)
    y = y.astype(cdt) + b_ref[:].astype(cdt)
    return y.astype(jnp.float32)


def _fwd_tile(cfg, ek_ref, eq_ref, influ_ref, alive_ref, wk_ref, bk_ref,
              wq_ref, bq_ref, masked: bool):
    """Shared forward walk -> (qq, sact, influ, alive, attn_fg, attn_bkg)."""
    (K, dm, tile, T, score_act, bkg_score, cdt) = cfg
    rsqrt_dm = 1.0 / math.sqrt(dm)

    def load(x):
        return _row_mask(x, tile, T) if masked else x

    eq = load(eq_ref[:]).astype(cdt)
    qq = _linear(eq, wq_ref, bq_ref, cdt)                       # (R, dm)

    raw_cols = []
    for k in range(K):
        ek = load(ek_ref[k]).astype(cdt)                        # (R, Dk)
        kk = _linear(ek, wk_ref, bk_ref, cdt)                   # (R, dm)
        raw_cols.append(jnp.sum(qq * kk, axis=1, keepdims=True) * rsqrt_dm)
    raw = jnp.concatenate(raw_cols, axis=1)                     # (R, K)

    sact = _score_act_fwd(raw, score_act)
    influ = load(influ_ref[:]).astype(jnp.float32)
    alive = load(alive_ref[:]) > 0.5
    s = jnp.where(alive, sact * influ, NEG_BIG)

    m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), bkg_score)
    e = jnp.exp(s - m)                                          # (R, K)
    eb = jnp.exp(bkg_score - m)                                 # (R, 1)
    z = jnp.sum(e, axis=1, keepdims=True) + eb
    return qq, sact, influ, alive, e / z, eb / z


def _fwd_kernel(cfg, ek_ref, eq_ref, influ_ref, alive_ref, wk_ref, bk_ref,
                wq_ref, bq_ref, attn_ref):
    (_, _, _, _, attn_fg, attn_bkg) = _fwd_tile(
        cfg, ek_ref, eq_ref, influ_ref, alive_ref, wk_ref, bk_ref, wq_ref,
        bq_ref, masked=False)
    attn_ref[:] = jnp.concatenate([attn_fg, attn_bkg], axis=1).astype(
        attn_ref.dtype)


def _bwd_kernel(cfg, ek_ref, eq_ref, influ_ref, alive_ref, wk_ref, bk_ref,
                wq_ref, bq_ref, dattn_ref,
                dek_ref, deq_ref, dinflu_ref, dwk_ref, dbk_ref, dwq_ref,
                dbq_ref):
    (K, dm, tile, T, score_act, bkg_score, cdt) = cfg
    rsqrt_dm = 1.0 / math.sqrt(dm)
    first = pl.program_id(0) == 0

    def accum(ref, val):
        @pl.when(first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] += val

    (qq, sact, influ, alive, attn_fg, attn_bkg) = _fwd_tile(
        cfg, ek_ref, eq_ref, influ_ref, alive_ref, wk_ref, bk_ref, wq_ref,
        bq_ref, masked=True)

    dattn = _row_mask(dattn_ref[:], tile, T).astype(jnp.float32)  # (R, K+1)
    d_fg = dattn[:, :K]
    d_bkg = dattn[:, K:K + 1]

    # Softmax (with background token) backward; bkg score is a constant.
    inner = (jnp.sum(attn_fg * d_fg, axis=1, keepdims=True)
             + attn_bkg * d_bkg)
    ds = attn_fg * (d_fg - inner)                                # (R, K)
    ds = jnp.where(alive, ds, 0.0)

    dinflu_ref[:] = (ds * sact).astype(dinflu_ref.dtype)
    d_sact = ds * influ
    amask = _score_act_mask(sact, score_act)
    d_raw = (d_sact * amask if amask is not None else d_sact) * rsqrt_dm

    # Score backward: per-k chain through w_k; qq chain accumulated.
    dqq = jnp.zeros_like(qq)
    dwk = jnp.zeros(dwk_ref.shape, jnp.float32)
    dbk = jnp.zeros(dbk_ref.shape, jnp.float32)
    for k in range(K):
        ek = _row_mask(ek_ref[k], tile, T).astype(cdt)
        kk = _linear(ek, wk_ref, bk_ref, cdt)
        dr = d_raw[:, k:k + 1]
        dkk = dr * qq                                            # (R, dm)
        dqq += dr * kk
        dkk_c = dkk.astype(cdt)
        dek = jax.lax.dot_general(dkk_c, wk_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dek_ref[k] = dek.astype(dek_ref.dtype)
        dwk += jax.lax.dot_general(ek, dkk_c, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dbk += jnp.sum(dkk, axis=0, keepdims=True)
    accum(dwk_ref, dwk)
    accum(dbk_ref, dbk)

    dqq_c = dqq.astype(cdt)
    eq = _row_mask(eq_ref[:], tile, T).astype(cdt)
    deq = jax.lax.dot_general(dqq_c, wq_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    deq_ref[:] = deq.astype(deq_ref.dtype)
    accum(dwq_ref, jax.lax.dot_general(eq, dqq_c, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
    accum(dbq_ref, jnp.sum(dqq, axis=0, keepdims=True))


# -------------------------------------------------------------- dispatch ----

def _cdt_of(x, compute):
    if compute is not None:
        return jnp.dtype(compute)
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32


def _prep(wk, bk, wq, bq, cdt):
    """Transpose score projections to (in, out) and cast."""
    return (wk.astype(cdt).T, bk.astype(jnp.float32)[None, :],
            wq.astype(cdt).T, bq.astype(jnp.float32)[None, :])


def _specs(K, Dk, Dq, dm, tile):
    const = lambda t: (0, 0)
    row = lambda t: (t, 0)
    in_specs = [
        pl.BlockSpec((K, tile, Dk), lambda t: (0, t, 0)),  # embedk (k-major)
        pl.BlockSpec((tile, Dq), row),                     # embedq
        pl.BlockSpec((tile, K), row),                      # influ
        pl.BlockSpec((tile, K), row),                      # alive
        pl.BlockSpec((Dk, dm), const),                     # wkT
        pl.BlockSpec((1, dm), const),                      # bk
        pl.BlockSpec((Dq, dm), const),                     # wqT
        pl.BlockSpec((1, dm), const),                      # bq
    ]
    return in_specs, const, row


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_scores(embedk, embedq, wk, bk, wq, bq, influ, alive,
                 score_act="relu", bkg_score=5.0, tile=256, interpret=False,
                 compute=None):
    """Fused attention scores. See module docstring.

    Args:
      embedk: (K, T, Dk) key embeddings, K-MAJOR token order (the embedder
        output over k-major tokens viewed 3D; a free reshape).
      embedq: (T, Dq) query embeddings.
      wk/bk, wq/bq: score projections, torch layout w=(d_model, D).
      influ: (T, K) fp32 influence scores (gathered per selection).
      alive: (T, K) {0,1} float mask of live selected points.
    Returns:
      attn (T, K+1) fp32 softmax weights, background token last.
    """
    out, _ = _fs_fwd(embedk, embedq, wk, bk, wq, bq, influ, alive,
                     score_act, bkg_score, tile, interpret, compute)
    return out


def _fs_fwd(embedk, embedq, wk, bk, wq, bq, influ, alive, score_act,
            bkg_score, tile, interpret, compute):
    K, T, Dk = embedk.shape
    Dq = embedq.shape[-1]
    dm = wk.shape[0]
    tile = min(tile, max(8, T))
    cdt = _cdt_of(embedk, compute)
    wkT, bk2, wqT, bq2 = _prep(wk, bk, wq, bq, cdt)
    cfg = (K, dm, tile, T, score_act, float(bkg_score), cdt)
    in_specs, const, row = _specs(K, Dk, Dq, dm, tile)
    alive_f = alive.astype(jnp.float32)

    attn = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(-(-T // tile),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, K + 1), row),
        out_shape=jax.ShapeDtypeStruct((T, K + 1), jnp.float32),
        interpret=interpret,
    )(embedk, embedq, influ, alive_f, wkT, bk2, wqT, bq2)
    return attn, (embedk, embedq, wk, bk, wq, bq, influ, alive)


def _fs_bwd(score_act, bkg_score, tile, interpret, compute, res, dattn):
    embedk, embedq, wk, bk, wq, bq, influ, alive = res
    K, T, Dk = embedk.shape
    Dq = embedq.shape[-1]
    dm = wk.shape[0]
    # The backward holds d_embedk/d_w accumulators on top of the forward's
    # working set; half the forward tile keeps it inside the 16MB VMEM.
    tile = min(max(8, tile // 2), max(8, T))
    cdt = _cdt_of(embedk, compute)
    wkT, bk2, wqT, bq2 = _prep(wk, bk, wq, bq, cdt)
    cfg = (K, dm, tile, T, score_act, float(bkg_score), cdt)
    in_specs, const, row = _specs(K, Dk, Dq, dm, tile)
    alive_f = alive.astype(jnp.float32)

    out_specs = [
        pl.BlockSpec((K, tile, Dk), lambda t: (0, t, 0)),  # d_embedk
        pl.BlockSpec((tile, Dq), row),                     # d_embedq
        pl.BlockSpec((tile, K), row),                      # d_influ
        pl.BlockSpec((Dk, dm), const),                     # d_wkT (accum)
        pl.BlockSpec((1, dm), const),                      # d_bk
        pl.BlockSpec((Dq, dm), const),                     # d_wqT
        pl.BlockSpec((1, dm), const),                      # d_bq
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((K, T, Dk), embedk.dtype),
        jax.ShapeDtypeStruct((T, Dq), embedq.dtype),
        jax.ShapeDtypeStruct((T, K), jnp.float32),
        jax.ShapeDtypeStruct((Dk, dm), jnp.float32),
        jax.ShapeDtypeStruct((1, dm), jnp.float32),
        jax.ShapeDtypeStruct((Dq, dm), jnp.float32),
        jax.ShapeDtypeStruct((1, dm), jnp.float32),
    ]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=(-(-T // tile),),
        in_specs=in_specs + [pl.BlockSpec((tile, K + 1), row)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(embedk, embedq, influ, alive_f, wkT, bk2, wqT, bq2, dattn)

    dek, deq, dinflu, dwkT, dbk, dwqT, dbq = outs
    return (dek, deq,
            dwkT.T.astype(wk.dtype), dbk[0].astype(bk.dtype),
            dwqT.T.astype(wq.dtype), dbq[0].astype(bq.dtype),
            dinflu.astype(influ.dtype), jnp.zeros_like(alive))


fused_scores.defvjp(_fs_fwd, _fs_bwd)


def score_fusible(attn_cfg) -> bool:
    """True when the config's attention tail is covered by this kernel."""
    return (attn_cfg.score_act in ("relu", "none")
            and attn_cfg.get("kernel_type", "scaled-dot") == "scaled-dot")
