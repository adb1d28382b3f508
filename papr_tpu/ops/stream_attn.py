"""Streamed key-attention Pallas kernel: key embedder + score projection +
influence masking + background-token softmax in ONE dispatch (custom VJP).

The key stream is the training step's dominant token load: K (=select_k)
embedder tokens per ray, each pushed through posenc -> [LN] -> dense stack ->
[LN] -> w_k, dotted against the ray's query, then softmaxed over K
(reference models/attn.py:165-226 + models/model.py:524-529). The round-1
split kernels (ops/fused_mlp.py embedders + ops/fused_attn.py score tail)
still ship the (K*T, d_ff_out) key embeddings through HBM between the two
dispatches — and again backward — and pay two kernels' boundary relayouts.

This kernel never materializes the key embeddings. Grid = (ray_tile, k)
with k innermost: each step runs ONE embedder walk for slice (tile, k)
entirely in VMEM (small body, fast Mosaic compile), writes its score column
into a VMEM-resident (tile, K) block, and on the last k step computes the
influence/alive-masked background-token softmax for the whole tile. The
query side (T tokens, 1/K-th of the load) stays on the existing fused
embedder kernel and plain XLA, composed via autodiff.

Backward is flash-style per slice: the saved (tile, K) raw scores make
d_raw local to each step (softmax backward recomputed per step from
VMEM-resident blocks, no cross-k barrier), so each grid step re-runs just
its own walk and back-propagates it, accumulating parameter gradients in
fp32 VMEM across the sequential grid and streaming d_qq into a
block-resident accumulator.

Numerics match the split-kernel path exactly: walks via ops/fused_mlp.py
walk_fwd/walk_bwd (nn/norm.py LayerNorm quirk, nn/posenc.py interleaved
layout), score projection via ops/fused_attn.py _linear (nn/mlp.py
linear_apply semantics), scores and softmax in fp32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_attn import NEG_BIG, _linear, _score_act_fwd, _score_act_mask
from .fused_mlp import (_cfg_tuple, _layout, _pad2, _round_up, _split_refs,
                        _zero_lanes, walk_bwd, walk_fwd)

_LANE = 128


def _zero_rows(x, tile, T):
    """Zero rows past T (last-tile overhang reads undefined memory)."""
    if T % tile == 0:
        return x
    row = pl.program_id(0) * tile + jax.lax.broadcasted_iota(
        jnp.int32, x.shape, 0)
    return jnp.where(row < T, x, 0)


def _col_select(block, k):
    """Column k of a (rows, K) block as (rows, 1) (k is a traced scalar)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    return jnp.sum(jnp.where(lane == k, block, 0.0), axis=1, keepdims=True)


def _col_update(block, col, k):
    lane = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    return jnp.where(lane == k, col, block)


def _softmax_parts(raw, influ, alive, score_act, bkg):
    """score-act -> influence -> alive mask -> bkg-token softmax (fp32)."""
    sact = _score_act_fwd(raw, score_act)
    s = jnp.where(alive, sact * influ, NEG_BIG)
    m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), bkg)
    e = jnp.exp(s - m)
    eb = jnp.exp(bkg - m)
    z = jnp.sum(e, axis=1, keepdims=True) + eb
    return sact, e / z, eb / z


def _walk_slice(meta, xk_ref, pe_refs, w_refs, b_refs, ln_refs, masked):
    (kcfg, K, dm, score_act, bkg, cdt, tile, T) = meta
    x = _zero_lanes(xk_ref[0], kcfg[4])
    if masked:
        x = _zero_rows(x, tile, T)
    return walk_fwd(kcfg, x.astype(jnp.float32), pe_refs, w_refs, b_refs,
                    ln_refs)


def _ks_fwd_kernel(meta, xk_ref, qq_ref, influ_ref, alive_ref, *refs):
    (kcfg, K, dm, score_act, bkg, cdt, tile, T) = meta
    pe_refs, w_refs, b_refs, ln_refs, rest = _split_refs(kcfg, refs)
    wk_ref, bk_ref, attn_ref, raw_ref = rest
    k = pl.program_id(1)

    y, _, _, _, _ = _walk_slice(meta, xk_ref, pe_refs, w_refs, b_refs,
                                ln_refs, masked=False)
    kk = _linear(y.astype(cdt), wk_ref, bk_ref, cdt)        # (tile, dm_pad)
    qq = _zero_lanes(qq_ref[:], dm).astype(jnp.float32)
    col = jnp.sum(qq * kk, axis=1, keepdims=True) / math.sqrt(dm)

    base = jnp.where(k == 0, 0.0, raw_ref[:])
    raw = _col_update(base, col, k)
    raw_ref[:] = raw

    @pl.when(k == K - 1)
    def _():
        influ = influ_ref[:].astype(jnp.float32)
        alive = alive_ref[:] > 0.5
        _, attn_fg, attn_bkg = _softmax_parts(raw, influ, alive, score_act,
                                              bkg)
        attn_ref[:] = jnp.concatenate([attn_fg, attn_bkg], axis=1).astype(
            attn_ref.dtype)


def _ks_bwd_kernel(meta, xk_ref, qq_ref, influ_ref, alive_ref, raw_ref,
                   dattn_ref, *refs):
    (kcfg, K, dm, score_act, bkg, cdt, tile, T) = meta
    n = kcfg[0]
    pe_refs, w_refs, b_refs, ln_refs, rest = _split_refs(kcfg, refs)
    wk_ref, bk_ref = rest[0], rest[1]
    (dxk_ref, dqq_ref, dinflu_ref, dwk_ref, dbk_ref) = rest[2:7]
    grads = rest[7:]
    dw_refs, db_refs, dln_refs = grads[:n], grads[n:2 * n], grads[2 * n:]
    k = pl.program_id(1)
    first = jnp.logical_and(pl.program_id(0) == 0, k == 0)

    def accum(ref, val):
        @pl.when(first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] += val

    # Softmax backward, recomputed per step from VMEM-resident blocks
    # (cheap: (tile, K) elementwise). Row masking keeps overhang garbage
    # out of the cross-row dW/db reductions.
    raw = _zero_rows(raw_ref[:].astype(jnp.float32), tile, T)
    influ = _zero_rows(influ_ref[:].astype(jnp.float32), tile, T)
    alive = _zero_rows(alive_ref[:], tile, T) > 0.5
    sact, attn_fg, attn_bkg = _softmax_parts(raw, influ, alive, score_act,
                                             bkg)
    dattn = _zero_rows(dattn_ref[:], tile, T).astype(jnp.float32)
    d_fg, d_bkg = dattn[:, :K], dattn[:, K:K + 1]
    inner = jnp.sum(attn_fg * d_fg, axis=1, keepdims=True) + attn_bkg * d_bkg
    ds = jnp.where(alive, attn_fg * (d_fg - inner), 0.0)

    @pl.when(k == 0)
    def _():
        dinflu_ref[:] = (ds * sact).astype(dinflu_ref.dtype)

    amask = _score_act_mask(sact, score_act)
    d_raw = (ds * influ * amask if amask is not None
             else ds * influ) / math.sqrt(dm)
    dr = _col_select(d_raw, k)                              # (tile, 1)

    # Recompute this slice's walk; backprop score projection + walk.
    y, hs, pe, li, lo = _walk_slice(meta, xk_ref, pe_refs, w_refs, b_refs,
                                    ln_refs, masked=True)
    y_c = y.astype(cdt)
    kk = _linear(y_c, wk_ref, bk_ref, cdt)
    qq = _zero_lanes(_zero_rows(qq_ref[:], tile, T), dm).astype(jnp.float32)

    contrib = dr * kk
    dqq_ref[:] = jnp.where(k == 0, contrib, dqq_ref[:] + contrib).astype(
        dqq_ref.dtype)

    dkk = dr * qq
    dkk_c = dkk.astype(cdt)
    accum(dwk_ref, jax.lax.dot_general(
        y_c, dkk_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    accum(dbk_ref, jnp.sum(dkk, axis=0, keepdims=True))
    g = jax.lax.dot_general(dkk_c, wk_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    def acc(kind, i, val):
        accum({"w": dw_refs, "b": db_refs, "ln": dln_refs}[kind][i], val)

    g = walk_bwd(kcfg, g, hs, pe, li, lo, pe_refs, w_refs, acc)
    dxk_ref[0] = g.astype(dxk_ref.dtype)


# -------------------------------------------------------------- dispatch ----

def _prep(xk, ws, bs, ln_in, ln_out, wk, bk, pe_desc, tile, compute):
    K, T, d_feat = xk.shape
    cdt = (jnp.dtype(compute) if compute
           else (jnp.bfloat16 if xk.dtype == jnp.bfloat16 else jnp.float32))
    (d_raw, d_enc, d_in_pad, dims, pdims, pe, wsp, bsp, lns) = _layout(
        xk.reshape(K * T, d_feat), ws, bs, ln_in, ln_out, pe_desc, cdt)
    kcfg = _cfg_tuple(xk.reshape(K * T, d_feat), ws, ln_in, ln_out,
                      "_", "_", tile, d_raw, d_enc, dims, pe_desc, cdt)
    dm = wk.shape[0]
    dm_pad = _round_up(dm, _LANE)
    wkT = _pad2(wk.astype(cdt).T, pdims[-1], dm_pad)
    bk2 = _pad2(bk.astype(jnp.float32)[None, :], 1, dm_pad)
    return (cdt, d_raw, d_in_pad, dims, pdims, pe, wsp, bsp, lns, dm, dm_pad,
            wkT, bk2, kcfg)


def _param_specs(n, pdims, pe, lns, dm_pad, const):
    pe_specs = [pl.BlockSpec(p.shape, const) for p in pe]
    w_specs = [pl.BlockSpec((pdims[i], pdims[i + 1]), const)
               for i in range(n)]
    b_specs = [pl.BlockSpec((1, pdims[i + 1]), const) for i in range(n)]
    ln_specs = [pl.BlockSpec(l.shape, const) for l in lns]
    wk_specs = [pl.BlockSpec((pdims[-1], dm_pad), const),
                pl.BlockSpec((1, dm_pad), const)]
    return pe_specs + w_specs + b_specs + ln_specs + wk_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15,
                                                    16, 17))
def key_stream_scores(xk, qq, ws, bs, ln_in, ln_out, wk, bk, influ, alive,
                      pe_desc=None, act="relu", last_act="none",
                      score_act="relu", bkg_score=5.0, tile=256,
                      interpret=False, compute=None):
    """attn = softmax_k([score(embed(xk[k]), qq), bkg]) in one dispatch.

    Args:
      xk: (K, T, d_raw) RAW key features, k-major (posenc happens in-kernel
        per ``pe_desc``; extras pass through — see fused_embedder_apply).
      qq: (T, d_model) fp32 projected query (w_q @ embed_q, done outside so
        the query chain stays on the existing kernels via autodiff).
      ws/bs/ln_in/ln_out: key embedder stack (input-major weights).
      wk/bk: key score projection, torch layout w=(d_model, d_ff_out).
      influ/alive: (T, K) fp32 influence scores / {0,1} live mask.
    Returns:
      attn (T, K+1) fp32 softmax weights, background token last.
    """
    out, _ = _ks_fwd(xk, qq, ws, bs, ln_in, ln_out, wk, bk, influ, alive,
                     pe_desc, act, last_act, score_act, bkg_score, tile,
                     interpret, compute)
    return out


def _ks_fwd(xk, qq, ws, bs, ln_in, ln_out, wk, bk, influ, alive, pe_desc,
            act, last_act, score_act, bkg_score, tile, interpret, compute):
    K, T, _ = xk.shape
    tile = min(tile, max(8, T))
    (cdt, d_raw, d_in_pad, dims, pdims, pe, wsp, bsp, lns, dm, dm_pad, wkT,
     bk2, kcfg) = _prep(xk, ws, bs, ln_in, ln_out, wk, bk, pe_desc, tile,
                        compute)
    kcfg = kcfg[:1] + (act, last_act) + kcfg[3:]
    meta = (kcfg, K, dm, score_act, float(bkg_score), cdt, tile, T)
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    in_specs = ([pl.BlockSpec((1, tile, d_in_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, dm_pad), trow),
                 pl.BlockSpec((tile, K), trow),
                 pl.BlockSpec((tile, K), trow)]
                + _param_specs(len(ws), pdims, pe, lns, dm_pad, const))

    attn, raw = pl.pallas_call(
        functools.partial(_ks_fwd_kernel, meta),
        grid=(_round_up(T, tile) // tile, K),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((tile, K + 1), trow),
                   pl.BlockSpec((tile, K), trow)],
        out_shape=[jax.ShapeDtypeStruct((T, K + 1), jnp.float32),
                   jax.ShapeDtypeStruct((T, K), jnp.float32)],
        interpret=interpret,
    )(xk, qq, influ, alive.astype(jnp.float32), *pe, *wsp, *bsp, *lns,
      wkT, bk2)
    return attn, (xk, qq, ws, bs, ln_in, ln_out, wk, bk, influ, alive, raw)


def _ks_bwd(pe_desc, act, last_act, score_act, bkg_score, tile, interpret,
            compute, res, dattn):
    xk, qq, ws, bs, ln_in, ln_out, wk, bk, influ, alive, raw = res
    K, T, d_feat = xk.shape
    n = len(ws)
    tile = min(tile, max(8, T))
    (cdt, d_raw, d_in_pad, dims, pdims, pe, wsp, bsp, lns, dm, dm_pad, wkT,
     bk2, kcfg) = _prep(xk, ws, bs, ln_in, ln_out, wk, bk, pe_desc, tile,
                        compute)
    kcfg = kcfg[:1] + (act, last_act) + kcfg[3:]
    meta = (kcfg, K, dm, score_act, float(bkg_score), cdt, tile, T)
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    in_specs = ([pl.BlockSpec((1, tile, d_in_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, dm_pad), trow),
                 pl.BlockSpec((tile, K), trow),
                 pl.BlockSpec((tile, K), trow),
                 pl.BlockSpec((tile, K), trow),
                 pl.BlockSpec((tile, K + 1), trow)]
                + _param_specs(n, pdims, pe, lns, dm_pad, const))

    out_specs = ([pl.BlockSpec((1, tile, d_in_pad), lambda t, k: (k, t, 0)),
                  pl.BlockSpec((tile, dm_pad), trow),
                  pl.BlockSpec((tile, K), trow),
                  pl.BlockSpec((pdims[-1], dm_pad), const),
                  pl.BlockSpec((1, dm_pad), const)]
                 + [pl.BlockSpec((pdims[i], pdims[i + 1]), const)
                    for i in range(n)]
                 + [pl.BlockSpec((1, pdims[i + 1]), const) for i in range(n)]
                 + [pl.BlockSpec(l.shape, const) for l in lns])
    out_shapes = ([jax.ShapeDtypeStruct((K, T, d_in_pad), xk.dtype),
                   jax.ShapeDtypeStruct((T, dm_pad), jnp.float32),
                   jax.ShapeDtypeStruct((T, K), jnp.float32),
                   jax.ShapeDtypeStruct((pdims[-1], dm_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, dm_pad), jnp.float32)]
                  + [jax.ShapeDtypeStruct((pdims[i], pdims[i + 1]),
                                          jnp.float32) for i in range(n)]
                  + [jax.ShapeDtypeStruct((1, pdims[i + 1]), jnp.float32)
                     for i in range(n)]
                  + [jax.ShapeDtypeStruct(l.shape, jnp.float32)
                     for l in lns])

    outs = pl.pallas_call(
        functools.partial(_ks_bwd_kernel, meta),
        grid=(_round_up(T, tile) // tile, K),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xk, qq, influ, alive.astype(jnp.float32), raw, dattn, *pe, *wsp,
      *bsp, *lns, wkT, bk2)

    dxk = outs[0][:, :, :d_feat].astype(xk.dtype)
    dqq = outs[1][:, :dm].astype(qq.dtype)
    dinflu = outs[2].astype(influ.dtype)
    dwk = outs[3][:dims[-1], :dm].T.astype(wk.dtype)
    dbk = outs[4][0, :dm].astype(bk.dtype)
    dws = tuple(outs[5 + i][:dims[i], :dims[i + 1]].astype(ws[i].dtype)
                for i in range(n))
    dbs = tuple(outs[5 + n + i][0, :dims[i + 1]].astype(bs[i].dtype)
                for i in range(n))
    j = 5 + 2 * n
    dln_in = dln_out = None
    if ln_in is not None:
        dln_in = (outs[j][0, :dims[0]].astype(ln_in[0].dtype),
                  outs[j + 1][0, :dims[0]].astype(ln_in[1].dtype))
        j += 2
    if ln_out is not None:
        dln_out = (outs[j][0, :dims[-1]].astype(ln_out[0].dtype),
                   outs[j + 1][0, :dims[-1]].astype(ln_out[1].dtype))
    return (dxk, dqq, dws, dbs, dln_in, dln_out, dwk, dbk, dinflu,
            jnp.zeros_like(alive))


key_stream_scores.defvjp(_ks_fwd, _ks_bwd)


# ----------------------------------------------------- value stream fuse ----
#
# fused = sum_k topk_attn[:, k] * value_embed(xv[k]) — the value embedder
# (the deepest stack, reference models/attn.py:108-117 value branch) plus the
# renormalize+fuse epilogue (models/model.py:533-534), streamed per
# (ray-tile, k) slice exactly like the key kernel: value embeddings never
# materialize in HBM, the fused-feature accumulator and d_attn columns live
# in VMEM-resident out blocks across the k steps.

def _vs_fwd_kernel(meta, xv_ref, attn_ref, *refs):
    (vcfg, K, normalize, cdt, tile, T) = meta
    pe_refs, w_refs, b_refs, ln_refs, rest = _split_refs(vcfg, refs)
    fused_ref = rest[0]
    k = pl.program_id(1)

    x = _zero_lanes(xv_ref[0], vcfg[4])
    y, _, _, _, _ = walk_fwd(vcfg, x.astype(jnp.float32), pe_refs, w_refs,
                             b_refs, ln_refs)
    # Round-trip through the compute dtype: the split path materializes the
    # value embeddings in cdt before the fp32 fuse einsum.
    yc = y.astype(cdt).astype(jnp.float32)

    attn = attn_ref[:].astype(jnp.float32)
    fg = attn[:, :K]
    w = _col_select(fg, k)
    if normalize:
        w = w / jnp.sum(fg, axis=1, keepdims=True)
    contrib = w * yc
    fused_ref[:] = jnp.where(k == 0, contrib,
                             fused_ref[:] + contrib).astype(fused_ref.dtype)


def _vs_bwd_kernel(meta, xv_ref, attn_ref, dfused_ref, *refs):
    (vcfg, K, normalize, cdt, tile, T) = meta
    n = vcfg[0]
    pe_refs, w_refs, b_refs, ln_refs, rest = _split_refs(vcfg, refs)
    dxv_ref, dattn_ref = rest[0], rest[1]
    grads = rest[2:]
    dw_refs, db_refs, dln_refs = grads[:n], grads[n:2 * n], grads[2 * n:]
    k = pl.program_id(1)
    first = jnp.logical_and(pl.program_id(0) == 0, k == 0)

    def accum(ref, val):
        @pl.when(first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] += val

    dfused = _zero_lanes(
        _zero_rows(dfused_ref[:], tile, T).astype(jnp.float32), vcfg[6])
    attn = _zero_rows(attn_ref[:], tile, T).astype(jnp.float32)
    fg = attn[:, :K]
    S = jnp.sum(fg, axis=1, keepdims=True)
    w = _col_select(fg, k)
    if normalize:
        w = w / S

    x = _zero_rows(_zero_lanes(xv_ref[0], vcfg[4]), tile, T)
    y, hs, pe, li, lo = walk_fwd(vcfg, x.astype(jnp.float32), pe_refs,
                                 w_refs, b_refs, ln_refs)
    yc = y.astype(cdt).astype(jnp.float32)

    # d wrt this slice's fuse weight, stashed raw into column k; the final
    # k step applies the renormalization jacobian across the full row.
    dw_col = jnp.sum(yc * dfused, axis=1, keepdims=True)
    base = jnp.where(k == 0, 0.0, dattn_ref[:])
    datt = _col_update(base, dw_col, k)
    dattn_ref[:] = datt

    @pl.when(k == K - 1)
    def _():
        # Full-width (tile, K+1): the bkg column of datt stays 0 (never
        # col-updated), so the renorm jacobian can run without reshapes.
        lane = jax.lax.broadcasted_iota(jnp.int32, datt.shape, 1)
        if normalize:
            fg_full = jnp.where(lane < K, attn, 0.0)
            inner = jnp.sum(datt * fg_full, axis=1, keepdims=True) / S
            dfg = jnp.where(lane < K, (datt - inner) / S, 0.0)
        else:
            dfg = datt
        dattn_ref[:] = dfg

    g = (w * dfused).astype(jnp.float32)

    def acc(kind, i, val):
        accum({"w": dw_refs, "b": db_refs, "ln": dln_refs}[kind][i], val)

    g = walk_bwd(vcfg, g, hs, pe, li, lo, pe_refs, w_refs, acc)
    dxv_ref[0] = g.astype(dxv_ref.dtype)


def _vs_prep(xv, ws, bs, ln_in, ln_out, pe_desc, act, last_act, tile,
             compute):
    K, T, d_feat = xv.shape
    cdt = (jnp.dtype(compute) if compute
           else (jnp.bfloat16 if xv.dtype == jnp.bfloat16 else jnp.float32))
    (d_raw, d_enc, d_in_pad, dims, pdims, pe, wsp, bsp, lns) = _layout(
        xv.reshape(K * T, d_feat), ws, bs, ln_in, ln_out, pe_desc, cdt)
    vcfg = _cfg_tuple(xv.reshape(K * T, d_feat), ws, ln_in, ln_out,
                      act, last_act, tile, d_raw, d_enc, dims, pe_desc, cdt)
    return cdt, d_in_pad, dims, pdims, pe, wsp, bsp, lns, vcfg


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def value_stream_fuse(xv, attn, ws, bs, ln_in, ln_out, pe_desc=None,
                      act="relu", last_act="none", normalize=True, tile=256,
                      interpret=False, compute=None):
    """fused = sum_k renorm(attn)[:, k] * value_embed(xv[k]), one dispatch.

    Args:
      xv: (K, T, d_raw) RAW value features, k-major.
      attn: (T, K+1) fp32 softmax weights (background token last).
      ws/bs/ln_in/ln_out: value embedder stack (input-major weights).
      normalize: renormalize the foreground columns to sum 1
        (cfg.models.normalize_topk_attn; reference models/model.py:533).
    Returns:
      fused (T, d_out) fp32 features.
    """
    out, _ = _vs_fwd(xv, attn, ws, bs, ln_in, ln_out, pe_desc, act,
                     last_act, normalize, tile, interpret, compute)
    return out


def _vs_fwd(xv, attn, ws, bs, ln_in, ln_out, pe_desc, act, last_act,
            normalize, tile, interpret, compute):
    K, T, _ = xv.shape
    tile = min(tile, max(8, T))
    (cdt, d_in_pad, dims, pdims, pe, wsp, bsp, lns, vcfg) = _vs_prep(
        xv, ws, bs, ln_in, ln_out, pe_desc, act, last_act, tile, compute)
    meta = (vcfg, K, bool(normalize), cdt, tile, T)
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    in_specs = ([pl.BlockSpec((1, tile, d_in_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, K + 1), trow)]
                + [pl.BlockSpec(p.shape, const) for p in pe]
                + [pl.BlockSpec((pdims[i], pdims[i + 1]), const)
                   for i in range(len(ws))]
                + [pl.BlockSpec((1, pdims[i + 1]), const)
                   for i in range(len(ws))]
                + [pl.BlockSpec(l.shape, const) for l in lns])

    fused = pl.pallas_call(
        functools.partial(_vs_fwd_kernel, meta),
        grid=(_round_up(T, tile) // tile, K),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, pdims[-1]), trow),
        out_shape=jax.ShapeDtypeStruct((T, pdims[-1]), jnp.float32),
        interpret=interpret,
    )(xv, attn, *pe, *wsp, *bsp, *lns)
    return fused[:, :dims[-1]], (xv, attn, ws, bs, ln_in, ln_out)


def _vs_bwd(pe_desc, act, last_act, normalize, tile, interpret, compute,
            res, dfused):
    xv, attn, ws, bs, ln_in, ln_out = res
    K, T, d_feat = xv.shape
    n = len(ws)
    tile = min(tile, max(8, T))
    (cdt, d_in_pad, dims, pdims, pe, wsp, bsp, lns, vcfg) = _vs_prep(
        xv, ws, bs, ln_in, ln_out, pe_desc, act, last_act, tile, compute)
    meta = (vcfg, K, bool(normalize), cdt, tile, T)
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    in_specs = ([pl.BlockSpec((1, tile, d_in_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, K + 1), trow),
                 pl.BlockSpec((tile, pdims[-1]), trow)]
                + [pl.BlockSpec(p.shape, const) for p in pe]
                + [pl.BlockSpec((pdims[i], pdims[i + 1]), const)
                   for i in range(n)]
                + [pl.BlockSpec((1, pdims[i + 1]), const) for i in range(n)]
                + [pl.BlockSpec(l.shape, const) for l in lns])

    out_specs = ([pl.BlockSpec((1, tile, d_in_pad), lambda t, k: (k, t, 0)),
                  pl.BlockSpec((tile, K + 1), trow)]
                 + [pl.BlockSpec((pdims[i], pdims[i + 1]), const)
                    for i in range(n)]
                 + [pl.BlockSpec((1, pdims[i + 1]), const) for i in range(n)]
                 + [pl.BlockSpec(l.shape, const) for l in lns])
    out_shapes = ([jax.ShapeDtypeStruct((K, T, d_in_pad), xv.dtype),
                   jax.ShapeDtypeStruct((T, K + 1), jnp.float32)]
                  + [jax.ShapeDtypeStruct((pdims[i], pdims[i + 1]),
                                          jnp.float32) for i in range(n)]
                  + [jax.ShapeDtypeStruct((1, pdims[i + 1]), jnp.float32)
                     for i in range(n)]
                  + [jax.ShapeDtypeStruct(l.shape, jnp.float32)
                     for l in lns])

    # dfused lanes beyond d_out overhang the block (undefined reads); the
    # kernel zero-masks them, so no host-side pad copy is needed.
    outs = pl.pallas_call(
        functools.partial(_vs_bwd_kernel, meta),
        grid=(_round_up(T, tile) // tile, K),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xv, attn, dfused, *pe, *wsp, *bsp, *lns)

    dxv = outs[0][:, :, :d_feat].astype(xv.dtype)
    dattn = outs[1].astype(attn.dtype)
    dws = tuple(outs[2 + i][:dims[i], :dims[i + 1]].astype(ws[i].dtype)
                for i in range(n))
    dbs = tuple(outs[2 + n + i][0, :dims[i + 1]].astype(bs[i].dtype)
                for i in range(n))
    j = 2 + 2 * n
    dln_in = dln_out = None
    if ln_in is not None:
        dln_in = (outs[j][0, :dims[0]].astype(ln_in[0].dtype),
                  outs[j + 1][0, :dims[0]].astype(ln_in[1].dtype))
        j += 2
    if ln_out is not None:
        dln_out = (outs[j][0, :dims[-1]].astype(ln_out[0].dtype),
                   outs[j + 1][0, :dims[-1]].astype(ln_out[1].dtype))
    return dxv, dattn, dws, dbs, dln_in, dln_out


value_stream_fuse.defvjp(_vs_fwd, _vs_bwd)
