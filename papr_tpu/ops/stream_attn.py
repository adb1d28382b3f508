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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_attn import NEG_BIG, _linear, _score_act_fwd, _score_act_mask
from . import fused_mlp as _fm
from .fused_mlp import (_bsum, _cfg_tuple, _layout, _pad2,
                        _pe_freq, _pe_freq_bwd, _posenc_plan, _round_up,
                        _row_mask_fix as _zero_rows, _split_refs,
                        _zero_lanes, walk_body_bwd, walk_body_fwd,
                        walk_body_fwd_q, walk_bwd, walk_fwd)

_LANE = 128

from jax.experimental.pallas import tpu as _pltpu


def _validate_mb(val, source):
    """Scoped-VMEM budgets past the chip's 128 MB VMEM crash the TPU worker
    at runtime instead of erroring (the tile-768 probe, docs/status); fail
    loudly here instead. 100 MB leaves headroom for Mosaic's own buffers."""
    mb = int(val or 0)
    if mb < 0 or mb > 100:
        raise ValueError(
            f"{source}={mb} MB is outside [0, 100]; v5e has 128 MB VMEM "
            "total and scoped budgets near it crash the worker at runtime.")
    return mb


# Read once at import (a mid-process env change after the first trace would
# silently do nothing anyway — jit caches pin the traced value).
_VMEM_ENV_MB = _validate_mb(os.environ.get("PAPR_VMEM_MB", "0"),
                            "PAPR_VMEM_MB")


def _cp(interpret, floor_mb=0, vmem_mb=0):
    """compiler_params kwargs for a stream-kernel pallas_call.

    Mosaic defaults the scoped-VMEM budget to 16 MB (of the chip's 128 MB
    VMEM); ``vmem_mb`` (the cfg knob ``tpu.vmem_mb``, threaded as a static
    arg) or the import-time PAPR_VMEM_MB env default raises it — the A/B
    knob for ray tiles past 512, whose backwards outgrow 16 MB.
    ``floor_mb`` is a per-kernel minimum (the query-folded backward
    computes it from its tile). Returns {} when the default budget applies
    (bit-identical lowering to the unannotated call).
    """
    mb = max(_validate_mb(vmem_mb, "tpu.vmem_mb") or _VMEM_ENV_MB, floor_mb)
    if interpret or mb <= 0:
        return {}
    return {"compiler_params":
            _pltpu.CompilerParams(vmem_limit_bytes=mb << 20)}


def _dot_col(x, y, n_true, scale=1.0):
    """scale * sum(x*y) as a (rows, 1) column, where the product is already
    zero past lane n_true. MXU-reduced when enabled (fused_mlp._bsum), the
    original VPU shuffle-reduce otherwise."""
    if _fm._MXU_REDUCE:
        return _bsum(x * y, n_true, scale)[:, :1]
    s = jnp.sum(x * y, axis=1, keepdims=True)
    return s * scale if scale != 1.0 else s


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
    col = _dot_col(qq, kk, dm) / math.sqrt(dm)

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
                                                    16, 17, 18, 19))
def key_stream_scores(xk, qq, ws, bs, ln_in, ln_out, wk, bk, influ, alive,
                      pe_desc=None, act="relu", last_act="none",
                      score_act="relu", bkg_score=5.0, tile=256,
                      interpret=False, compute=None, mxu_reduce=None,
                      vmem_mb=0):
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
                     interpret, compute, mxu_reduce, vmem_mb)
    return out


def _ks_fwd(xk, qq, ws, bs, ln_in, ln_out, wk, bk, influ, alive, pe_desc,
            act, last_act, score_act, bkg_score, tile, interpret, compute,
            mxu_reduce=None, vmem_mb=0):
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

    with _fm._mxu_scope(mxu_reduce):
        attn, raw = pl.pallas_call(
            functools.partial(_ks_fwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((tile, K + 1), trow),
                       pl.BlockSpec((tile, K), trow)],
            out_shape=[jax.ShapeDtypeStruct((T, K + 1), jnp.float32),
                       jax.ShapeDtypeStruct((T, K), jnp.float32)],
            interpret=interpret,
            **_cp(interpret, vmem_mb=vmem_mb),
        )(xk, qq, influ, alive.astype(jnp.float32), *pe, *wsp, *bsp, *lns,
          wkT, bk2)
    return attn, (xk, qq, ws, bs, ln_in, ln_out, wk, bk, influ, alive, raw)


def _ks_bwd(pe_desc, act, last_act, score_act, bkg_score, tile, interpret,
            compute, mxu_reduce, vmem_mb, res, dattn):
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

    with _fm._mxu_scope(mxu_reduce):
        outs = pl.pallas_call(
            functools.partial(_ks_bwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            **_cp(interpret, vmem_mb=vmem_mb),
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
        # All-dead rays (foreground mass exactly 0: every selected slot is
        # padding) divide by 1 instead of 0/0 — fused stays 0 there and
        # the composite is pure background (matches the unfused path).
        S = jnp.sum(fg, axis=1, keepdims=True)
        w = w / jnp.where(S > 0, S, 1.0)
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
    # Safe denominator: overhang rows AND genuinely all-dead rays have
    # foreground mass exactly 0 — divide by 1 there (w = 0, zero gradient
    # contribution) instead of 0/0 (matches the guarded unfused path).
    S = jnp.sum(fg, axis=1, keepdims=True)
    S = jnp.where(S > 0, S, 1.0)
    w = _col_select(fg, k)
    if normalize:
        w = w / S

    x = _zero_rows(_zero_lanes(xv_ref[0], vcfg[4]), tile, T)
    y, hs, pe, li, lo = walk_fwd(vcfg, x.astype(jnp.float32), pe_refs,
                                 w_refs, b_refs, ln_refs)
    yc = y.astype(cdt).astype(jnp.float32)

    # d wrt this slice's fuse weight, stashed raw into column k; the final
    # k step applies the renormalization jacobian across the full row.
    dw_col = _dot_col(yc, dfused, vcfg[6])
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

    # The S guard above makes overhang and all-dead rows w = 0 (no NaN);
    # the re-mask stays as defense for the dW/db/dLN accumulators.
    g = _zero_rows((w * dfused).astype(jnp.float32), tile, T)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12,
                                                    13, 14))
def value_stream_fuse(xv, attn, ws, bs, ln_in, ln_out, pe_desc=None,
                      act="relu", last_act="none", normalize=True, tile=256,
                      interpret=False, compute=None, mxu_reduce=None,
                      vmem_mb=0):
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
                     last_act, normalize, tile, interpret, compute,
                     mxu_reduce, vmem_mb)
    return out


def _vs_fwd(xv, attn, ws, bs, ln_in, ln_out, pe_desc, act, last_act,
            normalize, tile, interpret, compute, mxu_reduce=None, vmem_mb=0):
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

    with _fm._mxu_scope(mxu_reduce):
        fused = pl.pallas_call(
            functools.partial(_vs_fwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, pdims[-1]), trow),
            out_shape=jax.ShapeDtypeStruct((T, pdims[-1]), jnp.float32),
            interpret=interpret,
            **_cp(interpret, vmem_mb=vmem_mb),
        )(xv, attn, *pe, *wsp, *bsp, *lns)
    return fused[:, :dims[-1]], (xv, attn, ws, bs, ln_in, ln_out)


def _vs_bwd(pe_desc, act, last_act, normalize, tile, interpret, compute,
            mxu_reduce, vmem_mb, res, dfused):
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
    with _fm._mxu_scope(mxu_reduce):
        outs = pl.pallas_call(
            functools.partial(_vs_bwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            **_cp(interpret, vmem_mb=vmem_mb),
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


# ------------------------------------------------------ rec-native stream ----
#
# v2 of the streamed kernels: instead of XLA-materialized feature tensors
# (xk/xv concats of [pos, proj, perp, extras] — each lane-padded to 128, so
# (K, T, 9) fp32 costs a full (K*T, 128) HBM round trip, and its gradient
# another), the kernels read the gathered POINT RECORDS directly (already
# materialized for the gather) plus the per-ray origin/direction, and compute
# the point-ray geometry (reference models/model.py:396-437) in-kernel on
# the VPU. The posenc selection matmul splits into three source matmuls
# (record / proj / perp); influence and alive ride the record's lanes 3/4.
# Backward hand-derives the geometry chain and streams d_rayo/d_rays into
# block-resident accumulators like d_qq; d_record carries the influence
# gradient in lane 3 and the (non-detached) position gradient from proj/perp
# in lanes 0:3 — the detached position FEATURE gradient (reference detaches
# positions in the key stream, models/model.py:403) is dropped by lane mask.

_REC_POS, _REC_INFLU, _REC_ALIVE, _REC_FEATS = 0, 3, 4, 5


@functools.lru_cache(maxsize=None)
def _rec_pe_plan(has_pos, Ls, embed_type, factor, mult, extra_dim, rec_pad):
    """Column plan for posenc over [pos?, proj, perp, extras] sources.

    Layout matches attention.py _encode: per-feature interleaved posenc
    (nn/posenc.py) then raw extras. Returns (d0, S_rec, S_proj, S_perp,
    rows) with every S sized (rec_pad, d0_pad)."""
    import numpy as np
    feats = (["pos"] if has_pos else []) + ["proj", "perp"]
    cols = []                       # (source, source_lane, scale, kind)
    for fi, src in enumerate(feats):
        for j in range(3):
            if embed_type == 1:
                cols.append((src, j, 0.0, 0))
            for i in range(Ls[fi]):
                s = (factor ** i) * mult
                cols.append((src, j, s, 1))
                cols.append((src, j, s, 2))
    for j in range(extra_dim):
        cols.append(("rec", _REC_FEATS + j, 0.0, 0))
    d0 = len(cols)
    d0p = _round_up(d0, _LANE)
    S = {"rec": np.zeros((rec_pad, d0p), np.float32),
         "proj": np.zeros((rec_pad, d0p), np.float32),
         "perp": np.zeros((rec_pad, d0p), np.float32)}
    rows = np.zeros((4, d0p), np.float32)
    for c, (src, j, s, kind) in enumerate(cols):
        S["rec" if src == "pos" else src][j, c] = 1.0
        rows[0, c] = s
        rows[1 + kind, c] = 1.0
    return d0, S["rec"], S["proj"], S["perp"], rows


def _mask3(x):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < 3, x, 0.0)


def _rec_lane(recb, lane_idx):
    """One record lane as a (rows, 1) column."""
    if _fm._MXU_REDUCE:
        w = recb.shape[1]
        li = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        e = (li == lane_idx).astype(jnp.float32)
        return jnp.dot(recb, e, preferred_element_type=jnp.float32)[:, :1]
    lane = jax.lax.broadcasted_iota(jnp.int32, recb.shape, 1)
    return jnp.sum(jnp.where(lane == lane_idx, recb, 0.0), axis=1,
                   keepdims=True)


def _geom_fwd(sel, rayo, rays, eps):
    """point_ray_geometry on (tile, rec_pad) fp32 arrays masked to lanes
    0:3 (papr.py _attend_kmaj / ops/geometry.py formulas)."""
    v = sel - rayo
    if _fm._MXU_REDUCE:
        t_al = _bsum(v * rays, 3)
        dd = _bsum(rays * rays, 3)
    else:
        t_al = jnp.sum(v * rays, axis=1, keepdims=True)
        dd = jnp.sum(rays * rays, axis=1, keepdims=True)
    c = t_al / (dd + eps)
    proj = rays * c
    perp = v - proj
    return proj, perp, (v, t_al, dd, c)

def _geom_bwd(dproj, dperp, rays, saved, eps):
    v, t_al, dd, c = saved
    dv = dperp
    dpe = dproj - dperp                      # proj's total cotangent
    if _fm._MXU_REDUCE:
        dc = _bsum(dpe * rays, 3)
    else:
        dc = jnp.sum(dpe * rays, axis=1, keepdims=True)
    drays = dpe * c
    dt = dc / (dd + eps)
    ddd = -dc * t_al / ((dd + eps) * (dd + eps))
    dv = dv + dt * rays
    drays = drays + dt * v + 2.0 * rays * ddd
    return dv, -dv, drays                    # d_sel, d_rayo, d_rays


def _softmax_s(ss, bkg):
    m = jnp.maximum(jnp.max(ss, axis=1, keepdims=True), bkg)
    e = jnp.exp(ss - m)
    eb = jnp.exp(bkg - m)
    z = jnp.sum(e, axis=1, keepdims=True) + eb
    return e / z, eb / z


def _rec_encode(recb, rayo, rays, Srec_ref, Sproj_ref, Sperp_ref,
                rows_ref, eps):
    """Geometry + split-source posenc -> (enc, pe_saved, geometry saved)."""
    sel = _mask3(recb)
    proj, perp, gsave = _geom_fwd(sel, rayo, rays, eps)
    # Selection matmuls ride the backend default (precision note in
    # fused_mlp._pe_stage: HIGHEST costs 17%/step for no hardware benefit).
    xg = (jnp.dot(recb, Srec_ref[:], preferred_element_type=jnp.float32)
          + jnp.dot(proj, Sproj_ref[:], preferred_element_type=jnp.float32)
          + jnp.dot(perp, Sperp_ref[:], preferred_element_type=jnp.float32))
    enc, pe_saved = _pe_freq(xg, rows_ref[:])
    return enc, pe_saved, gsave


def _rec_decode_bwd(g_enc, pe_saved, gsave, rays, Srec_ref, Sproj_ref,
                    Sperp_ref, eps, detach_pos):
    """d_enc -> (d_rec_from_features, d_rayo, d_rays)."""
    d_xg = _pe_freq_bwd(g_enc, pe_saved)
    dot_t = lambda a, s_ref: jax.lax.dot_general(
        a, s_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_rec_enc = dot_t(d_xg, Srec_ref)
    d_proj = dot_t(d_xg, Sproj_ref)
    d_perp = dot_t(d_xg, Sperp_ref)
    d_sel, d_rayo, d_rays = _geom_bwd(d_proj, d_perp, rays, gsave, eps)
    lane = jax.lax.broadcasted_iota(jnp.int32, d_rec_enc.shape, 1)
    if detach_pos:
        # Position FEATURE grads dropped (reference detach); extras kept.
        d_rec_enc = jnp.where(lane >= _REC_FEATS, d_rec_enc, 0.0)
    d_rec = d_rec_enc + jnp.where(lane < 3, d_sel, 0.0)
    return d_rec, d_rayo, d_rays


def _ksr_split(meta, refs, quant=False):
    """Parse a rec-walk kernel's refs per the _rec_param_specs layout:
    S(4), w(n), b(n), [inv(n), dq(n) when ``quant``], ln, rest. Returns
    (S, w, b, (inv, dq), ln, rest) — quant rows are empty tuples when off."""
    kcfg = meta[0]
    n, has_li, has_lo = kcfg[0], kcfg[10], kcfg[11]
    S_refs = refs[:4]
    i = 4
    w_refs = refs[i:i + n]
    b_refs = refs[i + n:i + 2 * n]
    i += 2 * n
    inv_refs = dq_refs = ()
    if quant:
        inv_refs, dq_refs = refs[i:i + n], refs[i + n:i + 2 * n]
        i += 2 * n
    nln = 2 * (has_li + has_lo)
    ln_refs = refs[i:i + nln]
    rest = refs[i + nln:]
    return S_refs, w_refs, b_refs, (inv_refs, dq_refs), ln_refs, rest


def _ksr_fwd_kernel(meta, rec_ref, rayo_ref, rays_ref, qq_ref, *refs):
    (kcfg, K, dm, score_act, bkg, cdt, tile, T, eps, quant) = meta
    ((Srec, Sproj, Sperp, rows_ref), w_refs, b_refs, (inv_refs, dq_refs),
     ln_refs, rest) = _ksr_split(meta, refs, quant)
    wk_ref, bk_ref, attn_ref, raw_ref, ss_ref = rest
    k = pl.program_id(1)

    recb = rec_ref[0].astype(jnp.float32)
    rayo = _mask3(rayo_ref[:].astype(jnp.float32))
    rays = _mask3(rays_ref[:].astype(jnp.float32))
    enc, _, _ = _rec_encode(recb, rayo, rays, Srec, Sproj, Sperp,
                            rows_ref, eps)
    if quant:
        y = walk_body_fwd_q(kcfg, enc, w_refs, inv_refs, dq_refs, b_refs,
                            ln_refs)
    else:
        y, _, _, _ = walk_body_fwd(kcfg, enc, w_refs, b_refs, ln_refs)
    kk = _linear(y.astype(cdt), wk_ref, bk_ref, cdt)
    qq = _zero_lanes(qq_ref[:], dm).astype(jnp.float32)
    col = _dot_col(qq, kk, dm) / math.sqrt(dm)

    influ = _rec_lane(recb, _REC_INFLU)
    alive = _rec_lane(recb, _REC_ALIVE) > 0.5
    s_col = jnp.where(alive, _score_act_fwd(col, score_act) * influ, NEG_BIG)

    raw = _col_update(jnp.where(k == 0, 0.0, raw_ref[:]), col, k)
    raw_ref[:] = raw
    ss = _col_update(jnp.where(k == 0, 0.0, ss_ref[:]), s_col, k)
    ss_ref[:] = ss

    @pl.when(k == K - 1)
    def _():
        attn_fg, attn_bkg = _softmax_s(ss, bkg)
        attn_ref[:] = jnp.concatenate([attn_fg, attn_bkg], axis=1).astype(
            attn_ref.dtype)


def _ksr_bwd_kernel(meta, rec_ref, rayo_ref, rays_ref, qq_ref, raw_ref,
                    ss_ref, dattn_ref, *refs):
    (kcfg, K, dm, score_act, bkg, cdt, tile, T, eps) = meta
    n = kcfg[0]
    ((Srec, Sproj, Sperp, rows_ref), w_refs, b_refs, _, ln_refs, rest) = \
        _ksr_split(meta, refs)
    wk_ref, bk_ref = rest[0], rest[1]
    (drec_ref, drayo_ref, drays_ref, dqq_ref, dwk_ref, dbk_ref) = rest[2:8]
    grads = rest[8:]
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

    # Softmax backward from the saved masked scores (alive == ss > NEG/2).
    ss = _zero_rows(ss_ref[:].astype(jnp.float32), tile, T)
    attn_fg, attn_bkg = _softmax_s(ss, bkg)
    dattn = _zero_rows(dattn_ref[:], tile, T).astype(jnp.float32)
    d_fg, d_bkg = dattn[:, :K], dattn[:, K:K + 1]
    inner = jnp.sum(attn_fg * d_fg, axis=1, keepdims=True) + attn_bkg * d_bkg
    ds = jnp.where(ss > 0.5 * NEG_BIG, attn_fg * (d_fg - inner), 0.0)

    recb = _zero_rows(rec_ref[0].astype(jnp.float32), tile, T)
    rayo = _mask3(_zero_rows(rayo_ref[:].astype(jnp.float32), tile, T))
    rays = _mask3(_zero_rows(rays_ref[:].astype(jnp.float32), tile, T))
    influ = _rec_lane(recb, _REC_INFLU)
    raw_col = _col_select(_zero_rows(raw_ref[:].astype(jnp.float32),
                                     tile, T), k)
    sact_col = _score_act_fwd(raw_col, score_act)
    ds_col = _col_select(ds, k)
    d_influ_col = ds_col * sact_col
    amask = _score_act_mask(sact_col, score_act)
    d_raw_col = (ds_col * influ * amask if amask is not None
                 else ds_col * influ) / math.sqrt(dm)

    # Recompute this slice's encode + walk; backprop the whole chain.
    enc, pe_saved, gsave = _rec_encode(recb, rayo, rays, Srec, Sproj,
                                       Sperp, rows_ref, eps)
    y, hs, li, lo = walk_body_fwd(kcfg, enc, w_refs, b_refs, ln_refs)
    y_c = y.astype(cdt)
    kk = _linear(y_c, wk_ref, bk_ref, cdt)
    qq = _zero_lanes(_zero_rows(qq_ref[:], tile, T), dm).astype(jnp.float32)

    contrib = d_raw_col * kk
    dqq_ref[:] = jnp.where(k == 0, contrib, dqq_ref[:] + contrib).astype(
        dqq_ref.dtype)

    dkk = d_raw_col * qq
    dkk_c = dkk.astype(cdt)
    accum(dwk_ref, jax.lax.dot_general(
        y_c, dkk_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    accum(dbk_ref, jnp.sum(dkk, axis=0, keepdims=True))
    g = jax.lax.dot_general(dkk_c, wk_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    def acc(kind, i, val):
        accum({"w": dw_refs, "b": db_refs, "ln": dln_refs}[kind][i], val)

    g = walk_body_bwd(kcfg, g, hs, li, lo, w_refs, acc)
    d_rec, d_rayo, d_rays = _rec_decode_bwd(g, pe_saved, gsave, rays, Srec,
                                            Sproj, Sperp, eps,
                                            detach_pos=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, d_rec.shape, 1)
    d_rec = d_rec + jnp.where(lane == _REC_INFLU, d_influ_col, 0.0)
    drec_ref[0] = d_rec.astype(drec_ref.dtype)
    drayo_ref[:] = jnp.where(k == 0, d_rayo, drayo_ref[:] + d_rayo).astype(
        drayo_ref.dtype)
    drays_ref[:] = jnp.where(k == 0, d_rays, drays_ref[:] + d_rays).astype(
        drays_ref.dtype)


def _rec_prep(rec, ws, bs, ln_in, ln_out, enc_desc, has_pos, act, last_act,
              tile, compute):
    K, T, rec_pad = rec.shape
    cdt = (jnp.dtype(compute) if compute
           else (jnp.bfloat16 if rec.dtype == jnp.bfloat16 else jnp.float32))
    Ls, embed_type, factor, mult, extra_dim = enc_desc
    d0, S_rec, S_proj, S_perp, rows = _rec_pe_plan(
        has_pos, tuple(int(l) for l in Ls), int(embed_type), float(factor),
        float(mult), int(extra_dim), rec_pad)
    dims = [d0] + [w.shape[1] for w in ws]
    pdims = [_round_up(d, _LANE) for d in dims]
    wsp = [_pad2(w.astype(cdt), pdims[i], pdims[i + 1])
           for i, w in enumerate(ws)]
    bsp = [_pad2(b.astype(jnp.float32)[None, :], 1, pdims[i + 1])
           for i, b in enumerate(bs)]
    lns = []
    for ln, dp in ((ln_in, pdims[0]), (ln_out, pdims[-1])):
        if ln is not None:
            a, b = ln
            lns += [_pad2(a.astype(jnp.float32)[None, :], 1, dp),
                    _pad2(b.astype(jnp.float32)[None, :], 1, dp)]
    kcfg = (len(ws), act, last_act, cdt, d0, d0, dims[-1], K * T, tile,
            False, ln_in is not None, ln_out is not None, 1e-6)
    S_mats = [jnp.asarray(S_rec), jnp.asarray(S_proj), jnp.asarray(S_perp),
              jnp.asarray(rows)]
    return cdt, dims, pdims, S_mats, wsp, bsp, lns, kcfg


def _rec_param_specs(n, pdims, S_mats, lns, const, quant=False):
    """Single source of truth for a rec-walk's parameter BlockSpec layout:
    S matrices, n weight mats, n bias rows, then — when ``quant`` — n
    inverse-activation-scale rows + n dequant rows (walk_body_fwd_q), then
    the LN tables. Call sites pass refs in exactly this order (e.g.
    attend_stream_eval's ``*S, *w, *b, *q, *lns``); keeping the quant rows
    here means a reorder cannot silently misalign specs against refs."""
    quant_specs = ([pl.BlockSpec((1, pdims[i]), const) for i in range(n)]
                   + [pl.BlockSpec((1, pdims[i + 1]), const)
                      for i in range(n)]) if quant else []
    return ([pl.BlockSpec(s.shape, const) for s in S_mats]
            + [pl.BlockSpec((pdims[i], pdims[i + 1]), const)
               for i in range(n)]
            + [pl.BlockSpec((1, pdims[i + 1]), const) for i in range(n)]
            + quant_specs
            + [pl.BlockSpec(l.shape, const) for l in lns])


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
                                    20, 21))
def key_stream_scores_rec(rec, rayo, rays, qq, ws, bs, ln_in, ln_out, wk, bk,
                          enc_desc=None, act="relu", last_act="none",
                          score_act="relu", bkg_score=5.0, eps=1e-6,
                          tile=256, interpret=False, compute=None,
                          mxu_reduce=None, vmem_mb=0, int8=False):
    """Rec-native streamed key attention: geometry + posenc + embedder +
    score + softmax from the raw gathered point records, one dispatch.

    Args:
      rec: (K, T, rec_pad) fp32 gathered point records
        ([xyz, influ, alive, pc_feats?, 0-pad], papr.py _point_record).
      rayo/rays: (T, 3) fp32 ray origins / NORMALIZED directions.
      qq: (T, d_model) fp32 projected query.
      enc_desc: (Ls, embed_type, pe_factor, pe_mult, extra_dim).
      int8: quantize the forward walk's dense stack to int8
        (tpu.int8_train; self-calibrating like attend_stream_eval). The
        BACKWARD is untouched — it recomputes the walk in the bf16/fp32
        compute dtype, a straight-through estimator around the quantized
        forward. Softmax backward stays exact: it consumes the saved
        (raw, ss) the int8 forward actually produced.
    Returns:
      attn (T, K+1) fp32 softmax weights, background token last.
    """
    out, _ = _ksr_fwd(rec, rayo, rays, qq, ws, bs, ln_in, ln_out, wk, bk,
                      enc_desc, act, last_act, score_act, bkg_score, eps,
                      tile, interpret, compute, mxu_reduce, vmem_mb, int8)
    return out


def _ksr_fwd(rec, rayo, rays, qq, ws, bs, ln_in, ln_out, wk, bk, enc_desc,
             act, last_act, score_act, bkg_score, eps, tile, interpret,
             compute, mxu_reduce=None, vmem_mb=0, int8=False):
    K, T, rec_pad = rec.shape
    # Forward holds no per-layer activations, so it runs at twice the
    # backward's ray tile — fewer grid steps amortize the per-step VPU
    # stages and DMA latency (measured win on v5e).
    tile = min(2 * tile, max(8, T))
    (cdt, dims, pdims, S_mats, wsp, bsp, lns, kcfg) = _rec_prep(
        rec, ws, bs, ln_in, ln_out, enc_desc, True, act, last_act, tile,
        compute)
    dm = wk.shape[0]
    dm_pad = _round_up(dm, _LANE)
    wkT = _pad2(wk.astype(cdt).T, pdims[-1], dm_pad)
    bk2 = _pad2(bk.astype(jnp.float32)[None, :], 1, dm_pad)
    meta = (kcfg, K, dm, score_act, float(bkg_score), cdt, tile, T,
            float(eps), bool(int8))
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    qrows = ()
    if int8:
        with _fm._mxu_scope(mxu_reduce):
            amax = _walk_amax(rec, rayo, rays, S_mats, kcfg, wsp, bsp,
                              lns, eps)
        wsp, inv, dq = _quantize_walk(ws, pdims, amax)
        qrows = tuple(inv) + tuple(dq)
    in_specs = ([pl.BlockSpec((1, tile, rec_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, dm_pad), trow)]
                + _rec_param_specs(len(ws), pdims, S_mats, lns, const,
                                   quant=bool(int8))
                + [pl.BlockSpec((pdims[-1], dm_pad), const),
                   pl.BlockSpec((1, dm_pad), const)])

    with _fm._mxu_scope(mxu_reduce):
        attn, raw, ss = pl.pallas_call(
            functools.partial(_ksr_fwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((tile, K + 1), trow),
                       pl.BlockSpec((tile, K), trow),
                       pl.BlockSpec((tile, K), trow)],
            out_shape=[jax.ShapeDtypeStruct((T, K + 1), jnp.float32),
                       jax.ShapeDtypeStruct((T, K), jnp.float32),
                       jax.ShapeDtypeStruct((T, K), jnp.float32)],
            interpret=interpret,
            **_cp(interpret, vmem_mb=vmem_mb),
        )(rec, rayo, rays, qq, *S_mats, *wsp, *bsp, *qrows, *lns, wkT, bk2)
    return attn, (rec, rayo, rays, qq, ws, bs, ln_in, ln_out, wk, bk, raw,
                  ss)


def _ksr_bwd(enc_desc, act, last_act, score_act, bkg_score, eps, tile,
             interpret, compute, mxu_reduce, vmem_mb, int8, res, dattn):
    # ``int8`` only shapes the forward; the backward recomputes the walk in
    # the full compute dtype (straight-through) and is identical either way.
    (rec, rayo, rays, qq, ws, bs, ln_in, ln_out, wk, bk, raw, ss) = res
    K, T, rec_pad = rec.shape
    n = len(ws)
    tile = min(tile, max(8, T))
    (cdt, dims, pdims, S_mats, wsp, bsp, lns, kcfg) = _rec_prep(
        rec, ws, bs, ln_in, ln_out, enc_desc, True, act, last_act, tile,
        compute)
    dm = wk.shape[0]
    dm_pad = _round_up(dm, _LANE)
    wkT = _pad2(wk.astype(cdt).T, pdims[-1], dm_pad)
    bk2 = _pad2(bk.astype(jnp.float32)[None, :], 1, dm_pad)
    meta = (kcfg, K, dm, score_act, float(bkg_score), cdt, tile, T,
            float(eps))
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    in_specs = ([pl.BlockSpec((1, tile, rec_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, dm_pad), trow),
                 pl.BlockSpec((tile, K), trow),       # raw
                 pl.BlockSpec((tile, K), trow),       # ss
                 pl.BlockSpec((tile, K + 1), trow)]   # dattn
                + _rec_param_specs(n, pdims, S_mats, lns, const)
                + [pl.BlockSpec((pdims[-1], dm_pad), const),
                   pl.BlockSpec((1, dm_pad), const)])

    out_specs = ([pl.BlockSpec((1, tile, rec_pad), lambda t, k: (k, t, 0)),
                  pl.BlockSpec((tile, rec_pad), trow),
                  pl.BlockSpec((tile, rec_pad), trow),
                  pl.BlockSpec((tile, dm_pad), trow),
                  pl.BlockSpec((pdims[-1], dm_pad), const),
                  pl.BlockSpec((1, dm_pad), const)]
                 + [pl.BlockSpec((pdims[i], pdims[i + 1]), const)
                    for i in range(n)]
                 + [pl.BlockSpec((1, pdims[i + 1]), const) for i in range(n)]
                 + [pl.BlockSpec(l.shape, const) for l in lns])
    out_shapes = ([jax.ShapeDtypeStruct((K, T, rec_pad), rec.dtype),
                   jax.ShapeDtypeStruct((T, rec_pad), jnp.float32),
                   jax.ShapeDtypeStruct((T, rec_pad), jnp.float32),
                   jax.ShapeDtypeStruct((T, dm_pad), jnp.float32),
                   jax.ShapeDtypeStruct((pdims[-1], dm_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, dm_pad), jnp.float32)]
                  + [jax.ShapeDtypeStruct((pdims[i], pdims[i + 1]),
                                          jnp.float32) for i in range(n)]
                  + [jax.ShapeDtypeStruct((1, pdims[i + 1]), jnp.float32)
                     for i in range(n)]
                  + [jax.ShapeDtypeStruct(l.shape, jnp.float32)
                     for l in lns])

    with _fm._mxu_scope(mxu_reduce):
        outs = pl.pallas_call(
            functools.partial(_ksr_bwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            **_cp(interpret, vmem_mb=vmem_mb),
        )(rec, rayo, rays, qq, raw, ss, dattn, *S_mats, *wsp, *bsp, *lns,
          wkT, bk2)

    drec = outs[0].astype(rec.dtype)
    drayo = outs[1][:, :3].astype(rayo.dtype)
    drays = outs[2][:, :3].astype(rays.dtype)
    dqq = outs[3][:, :dm].astype(qq.dtype)
    dwk = outs[4][:dims[-1], :dm].T.astype(wk.dtype)
    dbk = outs[5][0, :dm].astype(bk.dtype)
    dws = tuple(outs[6 + i][:dims[i], :dims[i + 1]].astype(ws[i].dtype)
                for i in range(n))
    dbs = tuple(outs[6 + n + i][0, :dims[i + 1]].astype(bs[i].dtype)
                for i in range(n))
    j = 6 + 2 * n
    dln_in = dln_out = None
    if ln_in is not None:
        dln_in = (outs[j][0, :dims[0]].astype(ln_in[0].dtype),
                  outs[j + 1][0, :dims[0]].astype(ln_in[1].dtype))
        j += 2
    if ln_out is not None:
        dln_out = (outs[j][0, :dims[-1]].astype(ln_out[0].dtype),
                   outs[j + 1][0, :dims[-1]].astype(ln_out[1].dtype))
    return (drec, drayo, drays, dqq, dws, dbs, dln_in, dln_out, dwk, dbk)


key_stream_scores_rec.defvjp(_ksr_fwd, _ksr_bwd)


# ------------------------------------------------- query-folded key stream ----
#
# Variant of the rec-native key kernel that also runs the QUERY chain
# (posenc + embedder + w_q projection of the raw ray direction) in-kernel:
# the k==0 step of each ray tile computes qq into a block-resident out
# buffer (which doubles as the backward residual), the last k step
# back-propagates the query walk from the VMEM-accumulated d_qq. Removes
# the separate query embedder dispatches and the eq/qq/d_qq HBM round
# trips entirely — with this, the only XLA ops between the record gather
# and the fused features are the two stream kernels.

def _q_prep(ws, bs, ln_in, ln_out, q_desc, act, last_act, cdt):
    Ls, embed_type, factor, mult = q_desc
    _, d0, S, rows = _posenc_plan((3,), tuple(int(l) for l in Ls),
                                  int(embed_type), float(factor),
                                  float(mult), 0)
    dims = [d0] + [w.shape[1] for w in ws]
    pdims = [_round_up(d, _LANE) for d in dims]
    wsp = [_pad2(w.astype(cdt), pdims[i], pdims[i + 1])
           for i, w in enumerate(ws)]
    bsp = [_pad2(b.astype(jnp.float32)[None, :], 1, pdims[i + 1])
           for i, b in enumerate(bs)]
    lns = []
    for ln, dp in ((ln_in, pdims[0]), (ln_out, pdims[-1])):
        if ln is not None:
            a, b = ln
            lns += [_pad2(a.astype(jnp.float32)[None, :], 1, dp),
                    _pad2(b.astype(jnp.float32)[None, :], 1, dp)]
    qcfg = (len(ws), act, last_act, cdt, d0, d0, dims[-1], 0, 0,
            False, ln_in is not None, ln_out is not None, 1e-6)
    return dims, pdims, [jnp.asarray(S), jnp.asarray(rows)], wsp, bsp, lns, \
        qcfg


def _ksrq_split(meta, refs):
    kcfg, qcfg = meta[0], meta[1]
    n, k_li, k_lo = kcfg[0], kcfg[10], kcfg[11]
    m, q_li, q_lo = qcfg[0], qcfg[10], qcfg[11]
    i = 0
    S_k = refs[i:i + 4]; i += 4
    kw = refs[i:i + n]; i += n
    kb = refs[i:i + n]; i += n
    nkl = 2 * (k_li + k_lo)
    kln = refs[i:i + nkl]; i += nkl
    wk_ref, bk_ref = refs[i], refs[i + 1]; i += 2
    S_q = refs[i:i + 2]; i += 2
    qw = refs[i:i + m]; i += m
    qb = refs[i:i + m]; i += m
    nql = 2 * (q_li + q_lo)
    qln = refs[i:i + nql]; i += nql
    wq_ref, bq_ref = refs[i], refs[i + 1]; i += 2
    return (S_k, kw, kb, kln, wk_ref, bk_ref, S_q, qw, qb, qln, wq_ref,
            bq_ref, refs[i:])


def _q_walk(qcfg, xq, Sq_refs, qw, qb, qln):
    """Query walk on a PRE-MASKED (tile, 128) fp32 tile. Masking happens at
    the caller's top level: pl.program_id (inside _zero_rows) cannot appear
    inside a pl.when callback under interpret mode."""
    xg = jnp.dot(xq, Sq_refs[0][:], preferred_element_type=jnp.float32)
    enc, pe_saved = _pe_freq(xg, Sq_refs[1][:])
    y, hs, li, lo = walk_body_fwd(qcfg, enc, qw, qb, qln)
    return y, hs, li, lo, pe_saved


def _ksrq_fwd_kernel(meta, rec_ref, rayo_ref, rays_ref, rayd_ref, *refs):
    (kcfg, qcfg, K, dm, score_act, bkg, cdt, tile, T, eps) = meta
    (Sk, kw, kb, kln, wk_ref, bk_ref, Sq, qw, qb, qln, wq_ref, bq_ref,
     rest) = _ksrq_split(meta, refs)
    (Srec, Sproj, Sperp, rows_ref) = Sk
    attn_ref, raw_ref, ss_ref, qq_ref = rest
    k = pl.program_id(1)

    xq = _mask3(rayd_ref[:].astype(jnp.float32))

    @pl.when(k == 0)
    def _():
        eq, _, _, _, _ = _q_walk(qcfg, xq, Sq, qw, qb, qln)
        qq_ref[:] = _linear(eq.astype(cdt), wq_ref, bq_ref, cdt).astype(
            qq_ref.dtype)

    recb = rec_ref[0].astype(jnp.float32)
    rayo = _mask3(rayo_ref[:].astype(jnp.float32))
    rays = _mask3(rays_ref[:].astype(jnp.float32))
    enc, _, _ = _rec_encode(recb, rayo, rays, Srec, Sproj, Sperp,
                            rows_ref, eps)
    y, _, _, _ = walk_body_fwd(kcfg, enc, kw, kb, kln)
    kk = _linear(y.astype(cdt), wk_ref, bk_ref, cdt)
    qq = _zero_lanes(qq_ref[:].astype(jnp.float32), dm)
    col = _dot_col(qq, kk, dm) / math.sqrt(dm)

    influ = _rec_lane(recb, _REC_INFLU)
    alive = _rec_lane(recb, _REC_ALIVE) > 0.5
    s_col = jnp.where(alive, _score_act_fwd(col, score_act) * influ, NEG_BIG)

    raw = _col_update(jnp.where(k == 0, 0.0, raw_ref[:]), col, k)
    raw_ref[:] = raw
    ss = _col_update(jnp.where(k == 0, 0.0, ss_ref[:]), s_col, k)
    ss_ref[:] = ss

    @pl.when(k == K - 1)
    def _():
        attn_fg, attn_bkg = _softmax_s(ss, bkg)
        attn_ref[:] = jnp.concatenate([attn_fg, attn_bkg], axis=1).astype(
            attn_ref.dtype)


def _ksrq_bwd_kernel(meta, rec_ref, rayo_ref, rays_ref, rayd_ref, qq_ref,
                     raw_ref, ss_ref, dattn_ref, *args):
    # MAINTENANCE: the key-side chain below mirrors _ksr_bwd_kernel — apply
    # masking/numerics fixes to BOTH kernels (tests use different shapes).
    # d_qq accumulates in a block-resident OUT buffer (dqq_scr below): a
    # VMEM scratch would be cheaper on paper, but interpret mode cannot
    # lower program_id with scratch_shapes present, and the (T, dm) HBM
    # write is noise.
    (kcfg, qcfg, K, dm, score_act, bkg, cdt, tile, T, eps) = meta
    n, m = kcfg[0], qcfg[0]
    (Sk, kw, kb, kln, wk_ref, bk_ref, Sq, qw, qb, qln, wq_ref, bq_ref,
     rest) = _ksrq_split(meta, args)
    (Srec, Sproj, Sperp, rows_ref) = Sk
    (drec_ref, drayo_ref, drays_ref, drayd_ref, dqq_scr, dwk_ref, dbk_ref,
     dwq_ref, dbq_ref) = rest[0:9]
    grads = rest[9:]
    dkw, dkb = grads[:n], grads[n:2 * n]
    nkl = 2 * (kcfg[10] + kcfg[11])
    dkln = grads[2 * n:2 * n + nkl]
    qgrads = grads[2 * n + nkl:]
    dqw, dqb = qgrads[:m], qgrads[m:2 * m]
    dqln = qgrads[2 * m:]
    k = pl.program_id(1)
    first = jnp.logical_and(pl.program_id(0) == 0, k == 0)
    first_q = jnp.logical_and(pl.program_id(0) == 0, k == K - 1)

    def mk_accum(cond):
        def accum(ref, val):
            @pl.when(cond)
            def _():
                ref[:] = val

            @pl.when(jnp.logical_not(cond))
            def _():
                ref[:] += val
        return accum

    accum = mk_accum(first)
    accum_q = mk_accum(first_q)

    ss = _zero_rows(ss_ref[:].astype(jnp.float32), tile, T)
    attn_fg, attn_bkg = _softmax_s(ss, bkg)
    dattn = _zero_rows(dattn_ref[:], tile, T).astype(jnp.float32)
    d_fg, d_bkg = dattn[:, :K], dattn[:, K:K + 1]
    inner = jnp.sum(attn_fg * d_fg, axis=1, keepdims=True) + attn_bkg * d_bkg
    ds = jnp.where(ss > 0.5 * NEG_BIG, attn_fg * (d_fg - inner), 0.0)

    recb = _zero_rows(rec_ref[0].astype(jnp.float32), tile, T)
    rayo = _mask3(_zero_rows(rayo_ref[:].astype(jnp.float32), tile, T))
    rays = _mask3(_zero_rows(rays_ref[:].astype(jnp.float32), tile, T))
    influ = _rec_lane(recb, _REC_INFLU)
    raw_col = _col_select(_zero_rows(raw_ref[:].astype(jnp.float32),
                                     tile, T), k)
    sact_col = _score_act_fwd(raw_col, score_act)
    ds_col = _col_select(ds, k)
    d_influ_col = ds_col * sact_col
    amask = _score_act_mask(sact_col, score_act)
    d_raw_col = (ds_col * influ * amask if amask is not None
                 else ds_col * influ) / math.sqrt(dm)

    enc, pe_saved, gsave = _rec_encode(recb, rayo, rays, Srec, Sproj,
                                       Sperp, rows_ref, eps)
    y, hs, li, lo = walk_body_fwd(kcfg, enc, kw, kb, kln)
    y_c = y.astype(cdt)
    kk = _linear(y_c, wk_ref, bk_ref, cdt)
    qq = _zero_lanes(_zero_rows(qq_ref[:], tile, T).astype(jnp.float32), dm)

    contrib = d_raw_col * kk
    dqq_scr[:] = jnp.where(k == 0, contrib, dqq_scr[:] + contrib)

    dkk = d_raw_col * qq
    dkk_c = dkk.astype(cdt)
    accum(dwk_ref, jax.lax.dot_general(
        y_c, dkk_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    accum(dbk_ref, jnp.sum(dkk, axis=0, keepdims=True))
    g = jax.lax.dot_general(dkk_c, wk_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    def acc_k(kind, i, val):
        accum({"w": dkw, "b": dkb, "ln": dkln}[kind][i], val)

    g = walk_body_bwd(kcfg, g, hs, li, lo, kw, acc_k)
    d_rec, d_rayo, d_rays = _rec_decode_bwd(g, pe_saved, gsave, rays, Srec,
                                            Sproj, Sperp, eps,
                                            detach_pos=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, d_rec.shape, 1)
    d_rec = d_rec + jnp.where(lane == _REC_INFLU, d_influ_col, 0.0)
    drec_ref[0] = d_rec.astype(drec_ref.dtype)
    drayo_ref[:] = jnp.where(k == 0, d_rayo, drayo_ref[:] + d_rayo).astype(
        drayo_ref.dtype)
    drays_ref[:] = jnp.where(k == 0, d_rays, drays_ref[:] + d_rays).astype(
        drays_ref.dtype)

    xq = _mask3(_zero_rows(rayd_ref[:].astype(jnp.float32), tile, T))

    @pl.when(k == K - 1)
    def _():
        # Query backward once per tile, from the VMEM-accumulated d_qq.
        eq, hs_q, li_q, lo_q, pe_q = _q_walk(qcfg, xq, Sq, qw, qb, qln)
        dqq = _zero_lanes(dqq_scr[:], dm)
        dqq_c = dqq.astype(cdt)
        accum_q(dwq_ref, jax.lax.dot_general(
            eq.astype(cdt), dqq_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        accum_q(dbq_ref, jnp.sum(dqq, axis=0, keepdims=True))
        g_q = jax.lax.dot_general(dqq_c, wq_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        def acc_q(kind, i, val):
            accum_q({"w": dqw, "b": dqb, "ln": dqln}[kind][i], val)

        g_q = walk_body_bwd(qcfg, g_q, hs_q, li_q, lo_q, qw, acc_q)
        d_xgq = _pe_freq_bwd(g_q, pe_q)
        drayd_ref[:] = jax.lax.dot_general(
            d_xgq, Sq[0][:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(drayd_ref.dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=tuple(range(16, 30)))
def key_stream_scores_recq(rec, rayo, rays, rayd, kws, kbs, kln_in, kln_out,
                           wk, bk, qws, qbs, qln_in, qln_out, wq, bq,
                           k_desc=None, q_desc=None, kact="relu",
                           klast="none", qact="relu", qlast="none",
                           score_act="relu", bkg_score=5.0, eps=1e-6,
                           tile=256, interpret=False, compute=None,
                           mxu_reduce=None, vmem_mb=0):
    """key_stream_scores_rec with the QUERY chain folded in.

    rayd: (T, 3) fp32 RAW (unnormalized) ray directions — the query
    feature (attention.py q_feats). q_desc: (q_L, embed_type, pe_factor,
    pe_mult). Returns attn (T, K+1) fp32.
    """
    out, _ = _ksrq_fwd(rec, rayo, rays, rayd, kws, kbs, kln_in, kln_out,
                       wk, bk, qws, qbs, qln_in, qln_out, wq, bq, k_desc,
                       q_desc, kact, klast, qact, qlast, score_act,
                       bkg_score, eps, tile, interpret, compute,
                       mxu_reduce, vmem_mb)
    return out


def _ksrq_layout(rec, kws, kbs, kln_in, kln_out, wk, bk, qws, qbs, qln_in,
                 qln_out, wq, bq, k_desc, q_desc, kact, klast, qact, qlast,
                 tile, compute):
    (cdt, kdims, kpdims, S_k, kwsp, kbsp, klns, kcfg) = _rec_prep(
        rec, kws, kbs, kln_in, kln_out, k_desc, True, kact, klast, tile,
        compute)
    (qdims, qpdims, S_q, qwsp, qbsp, qlns, qcfg) = _q_prep(
        qws, qbs, qln_in, qln_out, q_desc, qact, qlast, cdt)
    dm = wk.shape[0]
    dm_pad = _round_up(dm, _LANE)
    wkT = _pad2(wk.astype(cdt).T, kpdims[-1], dm_pad)
    bk2 = _pad2(bk.astype(jnp.float32)[None, :], 1, dm_pad)
    wqT = _pad2(wq.astype(cdt).T, qpdims[-1], dm_pad)
    bq2 = _pad2(bq.astype(jnp.float32)[None, :], 1, dm_pad)
    return (cdt, kdims, kpdims, S_k, kwsp, kbsp, klns, kcfg, qdims, qpdims,
            S_q, qwsp, qbsp, qlns, qcfg, dm, dm_pad, wkT, bk2, wqT, bq2)


def _ksrq_param_specs(n, kpdims, S_k, klns, m, qpdims, S_q, qlns, dm_pad,
                      const):
    return (_rec_param_specs(n, kpdims, S_k, klns, const)
            + [pl.BlockSpec((kpdims[-1], dm_pad), const),
               pl.BlockSpec((1, dm_pad), const)]
            + [pl.BlockSpec(s.shape, const) for s in S_q]
            + [pl.BlockSpec((qpdims[i], qpdims[i + 1]), const)
               for i in range(m)]
            + [pl.BlockSpec((1, qpdims[i + 1]), const) for i in range(m)]
            + [pl.BlockSpec(l.shape, const) for l in qlns]
            + [pl.BlockSpec((qpdims[-1], dm_pad), const),
               pl.BlockSpec((1, dm_pad), const)])


def _ksrq_fwd(rec, rayo, rays, rayd, kws, kbs, kln_in, kln_out, wk, bk,
              qws, qbs, qln_in, qln_out, wq, bq, k_desc, q_desc, kact,
              klast, qact, qlast, score_act, bkg_score, eps, tile,
              interpret, compute, mxu_reduce=None, vmem_mb=0):
    K, T, rec_pad = rec.shape
    tile = min(2 * tile, max(8, T))      # see _ksr_fwd
    (cdt, kdims, kpdims, S_k, kwsp, kbsp, klns, kcfg, qdims, qpdims, S_q,
     qwsp, qbsp, qlns, qcfg, dm, dm_pad, wkT, bk2, wqT,
     bq2) = _ksrq_layout(rec, kws, kbs, kln_in, kln_out, wk, bk, qws, qbs,
                         qln_in, qln_out, wq, bq, k_desc, q_desc, kact,
                         klast, qact, qlast, tile, compute)
    meta = (kcfg, qcfg, K, dm, score_act, float(bkg_score), cdt, tile, T,
            float(eps))
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    in_specs = ([pl.BlockSpec((1, tile, rec_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, _LANE), trow)]
                + _ksrq_param_specs(len(kws), kpdims, S_k, klns, len(qws),
                                    qpdims, S_q, qlns, dm_pad, const))

    with _fm._mxu_scope(mxu_reduce):
        attn, raw, ss, qq = pl.pallas_call(
            functools.partial(_ksrq_fwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((tile, K + 1), trow),
                       pl.BlockSpec((tile, K), trow),
                       pl.BlockSpec((tile, K), trow),
                       pl.BlockSpec((tile, dm_pad), trow)],
            out_shape=[jax.ShapeDtypeStruct((T, K + 1), jnp.float32),
                       jax.ShapeDtypeStruct((T, K), jnp.float32),
                       jax.ShapeDtypeStruct((T, K), jnp.float32),
                       jax.ShapeDtypeStruct((T, dm_pad), jnp.float32)],
            interpret=interpret,
            **_cp(interpret, vmem_mb=vmem_mb),
        )(rec, rayo, rays, rayd, *S_k, *kwsp, *kbsp, *klns, wkT, bk2,
          *S_q, *qwsp, *qbsp, *qlns, wqT, bq2)
    return attn, (rec, rayo, rays, rayd, kws, kbs, kln_in, kln_out, wk, bk,
                  qws, qbs, qln_in, qln_out, wq, bq, raw, ss, qq)


def _ksrq_bwd(k_desc, q_desc, kact, klast, qact, qlast, score_act,
              bkg_score, eps, tile, interpret, compute, mxu_reduce, vmem_mb,
              res, dattn):
    (rec, rayo, rays, rayd, kws, kbs, kln_in, kln_out, wk, bk, qws, qbs,
     qln_in, qln_out, wq, bq, raw, ss, qq) = res
    K, T, rec_pad = rec.shape
    n, m = len(kws), len(qws)
    # The folded backward carries the query walk's state (hs, weights,
    # grads, the qq residual) on top of the key walk's: 18.1 MB scoped VMEM
    # at ray tile 512 on the flagship shapes (measured: 16.48 MB at 448).
    # That blows Mosaic's default 16 MB scoped budget, so this call raises
    # vmem_limit_bytes to 20 MB instead of shrinking the tile (v5e has
    # 128 MB VMEM; round 2's tile-384 cap cost more than the folded query
    # chain saved).
    tile = min(tile, max(8, T))
    (cdt, kdims, kpdims, S_k, kwsp, kbsp, klns, kcfg, qdims, qpdims, S_q,
     qwsp, qbsp, qlns, qcfg, dm, dm_pad, wkT, bk2, wqT,
     bq2) = _ksrq_layout(rec, kws, kbs, kln_in, kln_out, wk, bk, qws, qbs,
                         qln_in, qln_out, wq, bq, k_desc, q_desc, kact,
                         klast, qact, qlast, tile, compute)
    meta = (kcfg, qcfg, K, dm, score_act, float(bkg_score), cdt, tile, T,
            float(eps))
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    in_specs = ([pl.BlockSpec((1, tile, rec_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, _LANE), trow),
                 pl.BlockSpec((tile, dm_pad), trow),   # qq residual
                 pl.BlockSpec((tile, K), trow),        # raw
                 pl.BlockSpec((tile, K), trow),        # ss
                 pl.BlockSpec((tile, K + 1), trow)]    # dattn
                + _ksrq_param_specs(n, kpdims, S_k, klns, m, qpdims, S_q,
                                    qlns, dm_pad, const))

    out_specs = ([pl.BlockSpec((1, tile, rec_pad), lambda t, k: (k, t, 0)),
                  pl.BlockSpec((tile, rec_pad), trow),
                  pl.BlockSpec((tile, rec_pad), trow),
                  pl.BlockSpec((tile, _LANE), trow),
                  pl.BlockSpec((tile, dm_pad), trow),    # d_qq accumulator
                  pl.BlockSpec((kpdims[-1], dm_pad), const),
                  pl.BlockSpec((1, dm_pad), const),
                  pl.BlockSpec((qpdims[-1], dm_pad), const),
                  pl.BlockSpec((1, dm_pad), const)]
                 + [pl.BlockSpec((kpdims[i], kpdims[i + 1]), const)
                    for i in range(n)]
                 + [pl.BlockSpec((1, kpdims[i + 1]), const)
                    for i in range(n)]
                 + [pl.BlockSpec(l.shape, const) for l in klns]
                 + [pl.BlockSpec((qpdims[i], qpdims[i + 1]), const)
                    for i in range(m)]
                 + [pl.BlockSpec((1, qpdims[i + 1]), const)
                    for i in range(m)]
                 + [pl.BlockSpec(l.shape, const) for l in qlns])
    out_shapes = ([jax.ShapeDtypeStruct((K, T, rec_pad), rec.dtype),
                   jax.ShapeDtypeStruct((T, rec_pad), jnp.float32),
                   jax.ShapeDtypeStruct((T, rec_pad), jnp.float32),
                   jax.ShapeDtypeStruct((T, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((T, dm_pad), jnp.float32),
                   jax.ShapeDtypeStruct((kpdims[-1], dm_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, dm_pad), jnp.float32),
                   jax.ShapeDtypeStruct((qpdims[-1], dm_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, dm_pad), jnp.float32)]
                  + [jax.ShapeDtypeStruct((kpdims[i], kpdims[i + 1]),
                                          jnp.float32) for i in range(n)]
                  + [jax.ShapeDtypeStruct((1, kpdims[i + 1]), jnp.float32)
                     for i in range(n)]
                  + [jax.ShapeDtypeStruct(l.shape, jnp.float32)
                     for l in klns]
                  + [jax.ShapeDtypeStruct((qpdims[i], qpdims[i + 1]),
                                          jnp.float32) for i in range(m)]
                  + [jax.ShapeDtypeStruct((1, qpdims[i + 1]), jnp.float32)
                     for i in range(m)]
                  + [jax.ShapeDtypeStruct(l.shape, jnp.float32)
                     for l in qlns])

    # Scoped-VMEM floor from the measured footprint (16.48 MB at ray tile
    # 448, 18.1 MB at 512 → ~5.2 MB constant + ~25.3 KB/ray-row), +15%
    # margin, never below the proven 20 MB at tile 512. Wider embedder
    # stacks or pc_feat dims grow the constant part — raise tpu.vmem_mb.
    floor = max(20, int((5.2 + 0.0254 * tile) * 1.15 + 1.0))
    if floor > 100:
        raise ValueError(
            f"query-fold backward at tile={tile} needs an estimated "
            f"{floor} MB scoped VMEM (> the 100 MB safety cap on v5e's "
            "128 MB); reduce tpu.fused_tile or disable tpu.query_fold.")
    with _fm._mxu_scope(mxu_reduce):
        outs = pl.pallas_call(
            functools.partial(_ksrq_bwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            **_cp(interpret, floor_mb=floor, vmem_mb=vmem_mb),
        )(rec, rayo, rays, rayd, qq, raw, ss, dattn, *S_k, *kwsp, *kbsp,
          *klns, wkT, bk2, *S_q, *qwsp, *qbsp, *qlns, wqT, bq2)

    drec = outs[0].astype(rec.dtype)
    drayo = outs[1][:, :3].astype(rayo.dtype)
    drays = outs[2][:, :3].astype(rays.dtype)
    drayd = outs[3][:, :3].astype(rayd.dtype)
    dwk = outs[5][:kdims[-1], :dm].T.astype(wk.dtype)
    dbk = outs[6][0, :dm].astype(bk.dtype)
    dwq = outs[7][:qdims[-1], :dm].T.astype(wq.dtype)
    dbq = outs[8][0, :dm].astype(bq.dtype)
    j = 9
    dkws = tuple(outs[j + i][:kdims[i], :kdims[i + 1]].astype(kws[i].dtype)
                 for i in range(n))
    dkbs = tuple(outs[j + n + i][0, :kdims[i + 1]].astype(kbs[i].dtype)
                 for i in range(n))
    j += 2 * n
    dkln_in = dkln_out = None
    if kln_in is not None:
        dkln_in = (outs[j][0, :kdims[0]].astype(kln_in[0].dtype),
                   outs[j + 1][0, :kdims[0]].astype(kln_in[1].dtype))
        j += 2
    if kln_out is not None:
        dkln_out = (outs[j][0, :kdims[-1]].astype(kln_out[0].dtype),
                    outs[j + 1][0, :kdims[-1]].astype(kln_out[1].dtype))
        j += 2
    dqws = tuple(outs[j + i][:qdims[i], :qdims[i + 1]].astype(qws[i].dtype)
                 for i in range(m))
    dqbs = tuple(outs[j + m + i][0, :qdims[i + 1]].astype(qbs[i].dtype)
                 for i in range(m))
    j += 2 * m
    dqln_in = dqln_out = None
    if qln_in is not None:
        dqln_in = (outs[j][0, :qdims[0]].astype(qln_in[0].dtype),
                   outs[j + 1][0, :qdims[0]].astype(qln_in[1].dtype))
        j += 2
    if qln_out is not None:
        dqln_out = (outs[j][0, :qdims[-1]].astype(qln_out[0].dtype),
                    outs[j + 1][0, :qdims[-1]].astype(qln_out[1].dtype))
    return (drec, drayo, drays, drayd, dkws, dkbs, dkln_in, dkln_out, dwk,
            dbk, dqws, dqbs, dqln_in, dqln_out, dwq, dbq)


key_stream_scores_recq.defvjp(_ksrq_fwd, _ksrq_bwd)


def _vsr_fwd_kernel(meta, rec_ref, rayo_ref, rays_ref, attn_ref, *refs):
    (vcfg, K, normalize, cdt, tile, T, eps, quant) = meta
    ((Srec, Sproj, Sperp, rows_ref), w_refs, b_refs, (inv_refs, dq_refs),
     ln_refs, rest) = _ksr_split(meta, refs, quant)
    fused_ref = rest[0]
    k = pl.program_id(1)

    recb = rec_ref[0].astype(jnp.float32)
    rayo = _mask3(rayo_ref[:].astype(jnp.float32))
    rays = _mask3(rays_ref[:].astype(jnp.float32))
    enc, _, _ = _rec_encode(recb, rayo, rays, Srec, Sproj, Sperp,
                            rows_ref, eps)
    if quant:
        y = walk_body_fwd_q(vcfg, enc, w_refs, inv_refs, dq_refs, b_refs,
                            ln_refs)
    else:
        y, _, _, _ = walk_body_fwd(vcfg, enc, w_refs, b_refs, ln_refs)
    yc = y.astype(cdt).astype(jnp.float32)

    attn = attn_ref[:].astype(jnp.float32)
    fg = attn[:, :K]
    w = _col_select(fg, k)
    if normalize:
        # All-dead rays (foreground mass exactly 0: every selected slot is
        # padding) divide by 1 instead of 0/0 — fused stays 0 there and
        # the composite is pure background (matches the unfused path).
        S = jnp.sum(fg, axis=1, keepdims=True)
        w = w / jnp.where(S > 0, S, 1.0)
    contrib = w * yc
    fused_ref[:] = jnp.where(k == 0, contrib,
                             fused_ref[:] + contrib).astype(fused_ref.dtype)


def _vsr_bwd_kernel(meta, rec_ref, rayo_ref, rays_ref, attn_ref, dfused_ref,
                    *refs):
    (vcfg, K, normalize, cdt, tile, T, eps) = meta
    n = vcfg[0]
    ((Srec, Sproj, Sperp, rows_ref), w_refs, b_refs, _, ln_refs, rest) = \
        _ksr_split(meta, refs)
    (drec_ref, drayo_ref, drays_ref, dattn_ref) = rest[0:4]
    grads = rest[4:]
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
    # Safe denominator: overhang rows AND genuinely all-dead rays have
    # foreground mass exactly 0 — divide by 1 there (w = 0, zero gradient
    # contribution) instead of 0/0 (matches the guarded unfused path).
    S = jnp.sum(fg, axis=1, keepdims=True)
    S = jnp.where(S > 0, S, 1.0)
    w = _col_select(fg, k)
    if normalize:
        w = w / S

    recb = _zero_rows(rec_ref[0].astype(jnp.float32), tile, T)
    rayo = _mask3(_zero_rows(rayo_ref[:].astype(jnp.float32), tile, T))
    rays = _mask3(_zero_rows(rays_ref[:].astype(jnp.float32), tile, T))
    enc, pe_saved, gsave = _rec_encode(recb, rayo, rays, Srec, Sproj,
                                       Sperp, rows_ref, eps)
    y, hs, li, lo = walk_body_fwd(vcfg, enc, w_refs, b_refs, ln_refs)
    yc = y.astype(cdt).astype(jnp.float32)

    dw_col = _dot_col(yc, dfused, vcfg[6])
    base = jnp.where(k == 0, 0.0, dattn_ref[:])
    datt = _col_update(base, dw_col, k)
    dattn_ref[:] = datt

    @pl.when(k == K - 1)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, datt.shape, 1)
        if normalize:
            fg_full = jnp.where(lane < K, attn, 0.0)
            inner = jnp.sum(datt * fg_full, axis=1, keepdims=True) / S
            dfg = jnp.where(lane < K, (datt - inner) / S, 0.0)
        else:
            dfg = datt
        dattn_ref[:] = dfg

    g = _zero_rows((w * dfused).astype(jnp.float32), tile, T)  # see above

    def acc(kind, i, val):
        accum({"w": dw_refs, "b": db_refs, "ln": dln_refs}[kind][i], val)

    g = walk_body_bwd(vcfg, g, hs, li, lo, w_refs, acc)
    d_rec, d_rayo, d_rays = _rec_decode_bwd(g, pe_saved, gsave, rays, Srec,
                                            Sproj, Sperp, eps,
                                            detach_pos=False)
    drec_ref[0] = d_rec.astype(drec_ref.dtype)
    drayo_ref[:] = jnp.where(k == 0, d_rayo, drayo_ref[:] + d_rayo).astype(
        drayo_ref.dtype)
    drays_ref[:] = jnp.where(k == 0, d_rays, drays_ref[:] + d_rays).astype(
        drays_ref.dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
                                    18))
def value_stream_fuse_rec(rec, rayo, rays, attn, ws, bs, ln_in, ln_out,
                          enc_desc=None, act="relu", last_act="none",
                          normalize=True, eps=1e-6, tile=256,
                          interpret=False, compute=None, mxu_reduce=None,
                          vmem_mb=0, int8=False):
    """Rec-native streamed value fuse: geometry + posenc + value embedder +
    renormalize/fuse from the raw gathered point records, one dispatch.

    Args as key_stream_scores_rec; attn is the (T, K+1) softmax output.
    ``int8``: quantized forward walk, full-precision backward (see
    key_stream_scores_rec — tpu.int8_train).
    Returns fused (T, d_out) fp32 features.
    """
    out, _ = _vsr_fwd(rec, rayo, rays, attn, ws, bs, ln_in, ln_out,
                      enc_desc, act, last_act, normalize, eps, tile,
                      interpret, compute, mxu_reduce, vmem_mb, int8)
    return out


def _vsr_fwd(rec, rayo, rays, attn, ws, bs, ln_in, ln_out, enc_desc, act,
             last_act, normalize, eps, tile, interpret, compute,
             mxu_reduce=None, vmem_mb=0, int8=False):
    K, T, rec_pad = rec.shape
    tile = min(2 * tile, max(8, T))      # see _ksr_fwd
    (cdt, dims, pdims, S_mats, wsp, bsp, lns, vcfg) = _rec_prep(
        rec, ws, bs, ln_in, ln_out, enc_desc, False, act, last_act, tile,
        compute)
    meta = (vcfg, K, bool(normalize), cdt, tile, T, float(eps), bool(int8))
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    qrows = ()
    if int8:
        with _fm._mxu_scope(mxu_reduce):
            amax = _walk_amax(rec, rayo, rays, S_mats, vcfg, wsp, bsp,
                              lns, eps)
        wsp, inv, dq = _quantize_walk(ws, pdims, amax)
        qrows = tuple(inv) + tuple(dq)
    in_specs = ([pl.BlockSpec((1, tile, rec_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, K + 1), trow)]
                + _rec_param_specs(len(ws), pdims, S_mats, lns, const,
                                   quant=bool(int8)))

    with _fm._mxu_scope(mxu_reduce):
        fused = pl.pallas_call(
            functools.partial(_vsr_fwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, pdims[-1]), trow),
            out_shape=jax.ShapeDtypeStruct((T, pdims[-1]), jnp.float32),
            interpret=interpret,
            **_cp(interpret, vmem_mb=vmem_mb),
        )(rec, rayo, rays, attn, *S_mats, *wsp, *bsp, *qrows, *lns)
    return fused[:, :dims[-1]], (rec, rayo, rays, attn, ws, bs, ln_in,
                                 ln_out)


def _vsr_bwd(enc_desc, act, last_act, normalize, eps, tile, interpret,
             compute, mxu_reduce, vmem_mb, int8, res, dfused):
    # int8 is forward-only (straight-through); backward is precision-full.
    rec, rayo, rays, attn, ws, bs, ln_in, ln_out = res
    K, T, rec_pad = rec.shape
    n = len(ws)
    tile = min(tile, max(8, T))
    (cdt, dims, pdims, S_mats, wsp, bsp, lns, vcfg) = _rec_prep(
        rec, ws, bs, ln_in, ln_out, enc_desc, False, act, last_act, tile,
        compute)
    meta = (vcfg, K, bool(normalize), cdt, tile, T, float(eps))
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    in_specs = ([pl.BlockSpec((1, tile, rec_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, K + 1), trow),
                 pl.BlockSpec((tile, pdims[-1]), trow)]
                + _rec_param_specs(n, pdims, S_mats, lns, const))

    out_specs = ([pl.BlockSpec((1, tile, rec_pad), lambda t, k: (k, t, 0)),
                  pl.BlockSpec((tile, rec_pad), trow),
                  pl.BlockSpec((tile, rec_pad), trow),
                  pl.BlockSpec((tile, K + 1), trow)]
                 + [pl.BlockSpec((pdims[i], pdims[i + 1]), const)
                    for i in range(n)]
                 + [pl.BlockSpec((1, pdims[i + 1]), const) for i in range(n)]
                 + [pl.BlockSpec(l.shape, const) for l in lns])
    out_shapes = ([jax.ShapeDtypeStruct((K, T, rec_pad), rec.dtype),
                   jax.ShapeDtypeStruct((T, rec_pad), jnp.float32),
                   jax.ShapeDtypeStruct((T, rec_pad), jnp.float32),
                   jax.ShapeDtypeStruct((T, K + 1), jnp.float32)]
                  + [jax.ShapeDtypeStruct((pdims[i], pdims[i + 1]),
                                          jnp.float32) for i in range(n)]
                  + [jax.ShapeDtypeStruct((1, pdims[i + 1]), jnp.float32)
                     for i in range(n)]
                  + [jax.ShapeDtypeStruct(l.shape, jnp.float32)
                     for l in lns])

    with _fm._mxu_scope(mxu_reduce):
        outs = pl.pallas_call(
            functools.partial(_vsr_bwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            **_cp(interpret, vmem_mb=vmem_mb),
        )(rec, rayo, rays, attn, dfused, *S_mats, *wsp, *bsp, *lns)

    drec = outs[0].astype(rec.dtype)
    drayo = outs[1][:, :3].astype(rayo.dtype)
    drays = outs[2][:, :3].astype(rays.dtype)
    dattn = outs[3].astype(attn.dtype)
    dws = tuple(outs[4 + i][:dims[i], :dims[i + 1]].astype(ws[i].dtype)
                for i in range(n))
    dbs = tuple(outs[4 + n + i][0, :dims[i + 1]].astype(bs[i].dtype)
                for i in range(n))
    j = 4 + 2 * n
    dln_in = dln_out = None
    if ln_in is not None:
        dln_in = (outs[j][0, :dims[0]].astype(ln_in[0].dtype),
                  outs[j + 1][0, :dims[0]].astype(ln_in[1].dtype))
        j += 2
    if ln_out is not None:
        dln_out = (outs[j][0, :dims[-1]].astype(ln_out[0].dtype),
                   outs[j + 1][0, :dims[-1]].astype(ln_out[1].dtype))
    return drec, drayo, drays, dattn, dws, dbs, dln_in, dln_out


value_stream_fuse_rec.defvjp(_vsr_fwd, _vsr_bwd)


# ------------------------------------------------- fused eval attention ----
#
# Forward-only (render/eval) fusion of the rec-native key AND value streams
# into ONE kernel: per (ray-tile, k) grid step the gathered record block is
# read once, the point-ray geometry computed once, and both embedder walks
# run back to back; the softmax-weighted feature fusion accumulates online
# (flash-attention style running max + rescale) so the value contribution
# composes in the same step its embedding exists in VMEM. vs the two-kernel
# eval path this removes: one full record DMA per (tile, k), one geometry +
# posenc-source stage, the (T, K+1) attention HBM round trip between the
# dispatches, and one kernel's grid/prologue overhead. No custom VJP — the
# reference's tiled eval (test.py:76-87) never differentiates; training
# keeps the two bwd-capable kernels.

def _ase_fwd_kernel(meta, rec_ref, rayo_ref, rays_ref, qq_ref, *refs):
    (kcfg, vcfg, K, dm, score_act, bkg, normalize, cdt, tile, T, eps,
     quant) = meta
    n, nv = kcfg[0], vcfg[0]
    # Per-walk ref layout: S(4), w(n), b(n), [inv(n), dq(n) when quant], ln.
    qn = 2 if quant else 0
    S_k = refs[:4]
    i = 4
    kw, kb = refs[i:i + n], refs[i + n:i + 2 * n]
    kinv = refs[i + 2 * n:i + 3 * n] if quant else ()
    kdq = refs[i + 3 * n:i + 4 * n] if quant else ()
    nkln = 2 * (kcfg[10] + kcfg[11])
    kln = refs[i + (2 + qn) * n:i + (2 + qn) * n + nkln]
    i += (2 + qn) * n + nkln
    wk_ref, bk_ref = refs[i], refs[i + 1]
    i += 2
    S_v = refs[i:i + 4]
    i += 4
    vw, vb = refs[i:i + nv], refs[i + nv:i + 2 * nv]
    vinv = refs[i + 2 * nv:i + 3 * nv] if quant else ()
    vdq = refs[i + 3 * nv:i + 4 * nv] if quant else ()
    nvln = 2 * (vcfg[10] + vcfg[11])
    vln = refs[i + (2 + qn) * nv:i + (2 + qn) * nv + nvln]
    i += (2 + qn) * nv + nvln
    fused_ref, attn_ref, ss_ref = refs[i], refs[i + 1], refs[i + 2]
    m_ref = refs[i + 3]                        # VMEM scratch: running max
    k = pl.program_id(1)

    recb = rec_ref[0].astype(jnp.float32)
    rayo = _mask3(rayo_ref[:].astype(jnp.float32))
    rays = _mask3(rays_ref[:].astype(jnp.float32))
    sel = _mask3(recb)
    proj, perp, _ = _geom_fwd(sel, rayo, rays, eps)   # shared geometry

    def encode(S):
        xg = (jnp.dot(recb, S[0][:], preferred_element_type=jnp.float32)
              + jnp.dot(proj, S[1][:], preferred_element_type=jnp.float32)
              + jnp.dot(perp, S[2][:], preferred_element_type=jnp.float32))
        return _pe_freq(xg, S[3][:])[0]

    # Key branch: embed -> score column (identical math to _ksr_fwd_kernel).
    if quant:
        y_k = walk_body_fwd_q(kcfg, encode(S_k), kw, kinv, kdq, kb, kln)
    else:
        y_k, _, _, _ = walk_body_fwd(kcfg, encode(S_k), kw, kb, kln)
    kk = _linear(y_k.astype(cdt), wk_ref, bk_ref, cdt)
    qq = _zero_lanes(qq_ref[:], dm).astype(jnp.float32)
    col = _dot_col(qq, kk, dm) / math.sqrt(dm)
    influ = _rec_lane(recb, _REC_INFLU)
    alive = _rec_lane(recb, _REC_ALIVE) > 0.5
    s_col = jnp.where(alive, _score_act_fwd(col, score_act) * influ, NEG_BIG)
    ss = _col_update(jnp.where(k == 0, 0.0, ss_ref[:]), s_col, k)
    ss_ref[:] = ss

    # Value branch (same record/geometry, value S matrices + stack).
    if quant:
        y_v = walk_body_fwd_q(vcfg, encode(S_v), vw, vinv, vdq, vb, vln)
    else:
        y_v, _, _, _ = walk_body_fwd(vcfg, encode(S_v), vw, vb, vln)
    yc = y_v.astype(cdt).astype(jnp.float32)

    # Online softmax-weighted accumulation. m starts at the (constant) bkg
    # score so all-dead rows keep exp(NEG_BIG - m) == 0 exactly; rescaling
    # by exp(m_old - m_new) makes the final accumulator equal
    # sum_k exp(s_k - m_final) * yc_k, the two-pass value.
    m_old = jnp.where(k == 0, jnp.float32(bkg), m_ref[:, :1])
    m_new = jnp.maximum(m_old, s_col)
    e = jnp.exp(s_col - m_new)
    acc = jnp.where(k == 0, e * yc,
                    fused_ref[:] * jnp.exp(m_old - m_new) + e * yc)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(k < K - 1)
    def _():
        fused_ref[:] = acc.astype(fused_ref.dtype)

    @pl.when(k == K - 1)
    def _():
        # m_new == max(max_k s_k, bkg): exact _softmax_s normalizer.
        efg = jnp.exp(ss - m_new)
        eb = jnp.exp(bkg - m_new)
        z = jnp.sum(efg, axis=1, keepdims=True)
        denom = z + eb
        attn_ref[:] = (jnp.concatenate([efg, eb], axis=1) / denom).astype(
            attn_ref.dtype)
        d = jnp.where(z > 0, z, 1.0) if normalize else denom
        fused_ref[:] = (acc / d).astype(fused_ref.dtype)


_INT8_CAL_ROWS = 1024      # calibration subsample row budget (across K)
# Headroom over the subsampled amax: rows outside the <=1024-row strided
# sample can exceed the measured amax (e.g. rare near-camera points) and
# would clip hard at +/-127; 10% headroom trades ~0.14 bit of resolution
# for bounded clipping on outliers up to 1.1x the sample max.
_INT8_CAL_HEADROOM = 1.1


def _walk_amax(rec, rayo, rays, S, cfg, wsp, bsp, lns, eps,
               rows=_INT8_CAL_ROWS):
    """Per-layer per-column activation amax of a walk, measured in plain
    JAX on an evenly-strided row subsample of the SAME inputs the kernel
    is about to run on (self-calibrating: no offline pass, no state).

    Runs encode + walk_body_fwd exactly as the kernel does (jnp arrays
    support the refs' ``[:]`` indexing) on ~``rows`` tokens — <1% of the
    tile's walk FLOPs — and amaxes each dense layer's input over the
    alive rows. Returns n arrays of shape (1, d_in_pad)."""
    K, T, rp = rec.shape
    Ts = max(1, min(T, rows // max(K, 1)))
    idx = jnp.arange(Ts) * max(1, T // Ts)
    recb = rec[:, idx].reshape(K * Ts, rp).astype(jnp.float32)
    # rayo/rays arrive (T, 3); the kernel reads them through an oversized
    # (tile, rec_pad) block (pad lanes are junk, masked by _mask3) — here
    # pad explicitly instead.
    ro = jnp.broadcast_to(
        _pad2(rayo[idx].astype(jnp.float32), Ts, rp)[None],
        (K, Ts, rp)).reshape(K * Ts, rp)
    rd = jnp.broadcast_to(
        _pad2(rays[idx].astype(jnp.float32), Ts, rp)[None],
        (K, Ts, rp)).reshape(K * Ts, rp)
    proj, perp, _ = _geom_fwd(_mask3(recb), _mask3(ro), _mask3(rd), eps)
    xg = (jnp.dot(recb, S[0], preferred_element_type=jnp.float32)
          + jnp.dot(proj, S[1], preferred_element_type=jnp.float32)
          + jnp.dot(perp, S[2], preferred_element_type=jnp.float32))
    enc, _ = _pe_freq(xg, S[3])
    alive = _rec_lane(recb, _REC_ALIVE) > 0.5
    _, hs, _, _ = walk_body_fwd(cfg, enc, wsp, bsp, lns)
    return [_INT8_CAL_HEADROOM
            * jnp.max(jnp.where(alive, jnp.abs(h.astype(jnp.float32)), 0.0),
                      axis=0, keepdims=True) for h in hs[:cfg[0]]]


def _quantize_walk(ws, pdims, amaxs):
    """Per-layer int8 weights for walk_body_fwd_q, from the ORIGINAL fp32
    weights (not the bf16-cast kernel copies — one rounding, not two).

    The per-column activation scale (amax/127) folds INTO the weight rows
    before per-output-channel weight quantization (smoothquant-style: free
    at runtime, and mixed-magnitude input columns — posenc self vs sin/cos
    lanes — each keep their own full int8 range). Returns (int8 padded
    weights, inverse-activation-scale rows (1, d_in_pad), dequant rows
    (1, d_out_pad))."""
    wq, inv, dq = [], [], []
    for i, w in enumerate(ws):
        wp = _pad2(w.astype(jnp.float32), pdims[i], pdims[i + 1])
        ax = amaxs[i]                                   # (1, d_in_pad)
        inv.append(jnp.where(ax > 0, 127.0 / jnp.where(ax > 0, ax, 1.0),
                             0.0))
        wf = wp * (ax / 127.0).T                        # fold act scale
        sw = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
        q = jnp.where(sw > 0, wf / jnp.where(sw > 0, sw, 1.0), 0.0)
        wq.append(jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8))
        dq.append(sw)
    return wq, inv, dq


def attend_stream_eval(rec, rayo, rays, qq, kws, kbs, kln_in, kln_out, wk,
                       bk, vws, vbs, vln_in, vln_out, k_desc=None,
                       v_desc=None, kact="relu", klast="none", vact="relu",
                       vlast="none", score_act="relu", bkg_score=5.0,
                       normalize=True, eps=1e-6, tile=256, interpret=False,
                       compute=None, mxu_reduce=None, vmem_mb=0,
                       int8=False, quant_params=None):
    """Fused rec-native eval attention: ONE dispatch from gathered records
    to (fused features, attention). Forward-only — raises under
    differentiation (training uses key_stream_scores_rec +
    value_stream_fuse_rec, which carry custom VJPs).

    Args as key_stream_scores_rec + the value stack/descriptor of
    value_stream_fuse_rec. Returns (fused (T, Cv) fp32, attn (T, K+1) fp32).

    ``int8=True`` (tpu.int8_eval) quantizes BOTH walks' dense stacks to
    int8 (walk_body_fwd_q): 2x the bf16 MXU rate on v5e for the render
    path's dominant stage. Self-calibrating per call from a row subsample
    (_walk_amax); everything outside the dense stacks (posenc, LN, score,
    softmax, fuse) stays fp32. Approximate by construction — quality
    measured in tests/test_int8_eval.py and docs/status_round4.md.
    """
    K, T, rec_pad = rec.shape
    tile = min(2 * tile, max(8, T))            # forward-only: see _ksr_fwd
    (cdt, kdims, kpdims, S_k, kwsp, kbsp, klns, kcfg) = _rec_prep(
        rec, kws, kbs, kln_in, kln_out, k_desc, True, kact, klast, tile,
        compute)
    (_, vdims, vpdims, S_v, vwsp, vbsp, vlns, vcfg) = _rec_prep(
        rec, vws, vbs, vln_in, vln_out, v_desc, False, vact, vlast, tile,
        compute)
    dm = wk.shape[0]
    dm_pad = _round_up(dm, _LANE)
    wkT = _pad2(wk.astype(cdt).T, kpdims[-1], dm_pad)
    bk2 = _pad2(bk.astype(jnp.float32)[None, :], 1, dm_pad)
    meta = (kcfg, vcfg, K, dm, score_act, float(bkg_score), bool(normalize),
            cdt, tile, T, float(eps), bool(int8))
    const = lambda t, k: (0, 0)
    trow = lambda t, k: (t, 0)
    kq = vq = ()
    if int8:
        if quant_params is not None:
            # Hoisted calibration (eval_quant_params): the caller measured
            # amax ONCE per frame instead of once per tile — the per-call
            # _walk_amax + requantize below is ~0.2% of the walk FLOPs but
            # runs as dozens of small unfused XLA ops per tile, which cost
            # more than the int8 MXU saving at render tile counts.
            (kwq, kinv, kdq), (vwq, vinv, vdq) = quant_params
        else:
            with _fm._mxu_scope(mxu_reduce):
                k_amax = _walk_amax(rec, rayo, rays, S_k, kcfg, kwsp, kbsp,
                                    klns, eps)
                v_amax = _walk_amax(rec, rayo, rays, S_v, vcfg, vwsp, vbsp,
                                    vlns, eps)
            kwq, kinv, kdq = _quantize_walk(kws, kpdims, k_amax)
            vwq, vinv, vdq = _quantize_walk(vws, vpdims, v_amax)
        kwsp, vwsp = kwq, vwq                  # int8 weights ride the
        kq = tuple(kinv) + tuple(kdq)          # same specs; scale rows
        vq = tuple(vinv) + tuple(vdq)          # append after the biases
    in_specs = ([pl.BlockSpec((1, tile, rec_pad), lambda t, k: (k, t, 0)),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, rec_pad), trow),
                 pl.BlockSpec((tile, dm_pad), trow)]
                + _rec_param_specs(len(kws), kpdims, S_k, (), const,
                                   quant=int8)
                + [pl.BlockSpec(l.shape, const) for l in klns]
                + [pl.BlockSpec((kpdims[-1], dm_pad), const),
                   pl.BlockSpec((1, dm_pad), const)]
                + _rec_param_specs(len(vws), vpdims, S_v, (), const,
                                   quant=int8)
                + [pl.BlockSpec(l.shape, const) for l in vlns])
    # Both walks resident per step: the measured key-fwd footprint alone is
    # ~11 MB at tile 1024 (22.6 at 2048); floor the combined kernel by tile
    # so the default 16 MB budget never faults it.
    floor = max(0, int((2.0 + 0.0146 * tile) * 1.3))
    with _fm._mxu_scope(mxu_reduce):
        fused, attn, _ = pl.pallas_call(
            functools.partial(_ase_fwd_kernel, meta),
            grid=(_round_up(T, tile) // tile, K),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((tile, vpdims[-1]), trow),
                       pl.BlockSpec((tile, K + 1), trow),
                       pl.BlockSpec((tile, K), trow)],
            out_shape=[jax.ShapeDtypeStruct((T, vpdims[-1]), jnp.float32),
                       jax.ShapeDtypeStruct((T, K + 1), jnp.float32),
                       jax.ShapeDtypeStruct((T, K), jnp.float32)],
            scratch_shapes=[_pltpu.VMEM((tile, _LANE), jnp.float32)],
            interpret=interpret,
            **_cp(interpret, floor_mb=floor, vmem_mb=vmem_mb),
        )(rec, rayo, rays, qq, *S_k, *kwsp, *kbsp, *kq, *klns, wkT, bk2,
          *S_v, *vwsp, *vbsp, *vq, *vlns)
    return fused[:, :vdims[-1]], attn
