"""Fused embedder Pallas kernel: [posenc] -> [LayerNorm] -> dense stack ->
[LayerNorm], with a custom VJP.

The k/q/v embedder stacks are the training step's hot spot (reference
models/attn.py:90-117 applied at models/attn.py:165-226): interleaved
positional encoding (models/utils.py:232-242) into 5-8 dense layers over
rays*k tokens, bracketed by LayerNorms. Executed op-by-op by XLA, every
stage round-trips its (T, 117..256) tensor through HBM and the step is
bandwidth-bound (~53 TFLOPS measured on v5e out of 197 peak); the
posenc/concat boundary alone costs ~12 ms/step in materialized features
and their gradients.

This kernel runs the WHOLE block per tile of tokens inside VMEM:

  * forward: one read of the RAW geometric features (9-ish dims), posenc
    expansion in VMEM (a 0/1 selection matmul on the MXU + masked sin/cos
    on the VPU), input LN, all dense layers back-to-back on the MXU (bf16
    in, fp32 accumulate), output LN, one write;
  * backward (custom VJP): flash-style recompute — re-runs the forward for
    the tile in VMEM, then walks the block in reverse producing d(raw)
    tiles and accumulating dW/db/dLN in fp32 VMEM accumulators across the
    (sequential) grid. No activation ever touches HBM, which also
    obsoletes jax.checkpoint for these stacks.

The LayerNorm matches nn/norm.py exactly (the reference's quirk: fp32
stats, UNBIASED std, ``std + eps`` denominator — models/attn.py:30-42); its
backward here is the hand-derived gradient of that formula. The posenc
layout matches nn/posenc.py (per-dim interleaved [x, sin, cos, ...]).

Supported blocks: plain dense chains (relu/none activations, bias, no
skip/half/residual/weight-norm). Exotic variants keep the unfused
reference path (papr_tpu/nn/mlp.py), which doubles as this kernel's parity
oracle (tests/test_fused_mlp.py).

Lane/row remainders (d % 128, T % tile) are handled by in-kernel masks, so
no host-side padding of the big tensors is needed (padding would burn the
HBM round-trips this kernel exists to remove). Parameters are small and
padded in the wrapper.
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128

# Lane reductions (sum over the minor dim) and their broadcasts are the VPU
# floor of the stream kernels: each (tile, 256) reduce+broadcast pair costs
# ~7 shuffle-add passes down plus ~7 back up, and the walk runs ~11 of them
# per (tile, k) slice while the MXU sits ~80% idle. _bsum moves them onto
# the MXU as a matmul against a masked-ones matrix, which also yields the
# broadcast for free (every output lane holds the sum). A/B-timed on v5e
# (2026-08-18, full train step with LPIPS, 2 runs each): ON 425-428k rays/s
# vs OFF 434-454k — the MXU matmuls LOSE ~3-6% (the masked-ones matmul
# serializes against the walk's real matmuls instead of overlapping them on
# the VPU), so the default stays OFF; the knob remains for other shapes.
_MXU_REDUCE = os.environ.get("PAPR_MXU_REDUCE", "0") == "1"


@contextlib.contextmanager
def _mxu_scope(flag):
    """Trace-scoped override of the MXU-reduce choice.

    The kernel bodies (and stream_attn's helpers) read ``_MXU_REDUCE`` while
    they are being traced; each fused entry point sets it for exactly the
    duration of its own trace from an explicit static ``mxu_reduce``
    argument, so two configs with different knobs coexist in one process
    (no create_model-time global mutation). ``None`` keeps the process
    default (env ``PAPR_MXU_REDUCE``)."""
    global _MXU_REDUCE
    if flag is None:
        yield
        return
    old = _MXU_REDUCE
    _MXU_REDUCE = bool(flag)
    try:
        yield
    finally:
        _MXU_REDUCE = old


def resolve_mxu_reduce(cfg):
    """``tpu.mxu_reduce`` -> True/False, or None for "env" (process
    default). Threaded by the model into every fused kernel call."""
    v = cfg.get_path("tpu.mxu_reduce", "env")
    return None if v == "env" else bool(v)


def _bsum(x, n_true, scale=1.0):
    """Masked row-sum broadcast to full width: out[:, j] = scale *
    sum(x[:, :n_true]) for every j. Rides the MXU (fp32, default
    precision — see the _pe_stage precision note). The mask is always
    0/1 so every call site with the same (w, n_true) shares one value
    (CSE across the walk); the scale is a single post-multiply pass."""
    w = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    m = jnp.where(lane < n_true, jnp.float32(1.0), jnp.float32(0.0))
    out = jnp.dot(x, m, preferred_element_type=jnp.float32)
    return out * scale if scale != 1.0 else out


def _round_up(n, m):
    return -(-n // m) * m


def _pad2(x, rows, cols):
    pr, pc = rows - x.shape[0], cols - x.shape[1]
    if pr or pc:
        x = jnp.pad(x, ((0, pr), (0, pc)))
    return x


def _act_fwd(h, kind):
    if kind == "relu":
        return jnp.maximum(h, 0.0)
    if kind == "none":
        return h
    raise NotImplementedError(kind)


def _act_mask(a, kind):
    """d act / d preact from the POST-activation value (fp32 compare:
    Mosaic on v5e rejects bf16 cmpf)."""
    if kind == "relu":
        return (a.astype(jnp.float32) > 0).astype(jnp.float32)
    if kind == "none":
        return None
    raise NotImplementedError(kind)


def _lane_mask(shape, n_true):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1) < n_true


def _zero_lanes(x, n_true):
    if n_true != x.shape[1]:
        return jnp.where(_lane_mask(x.shape, n_true), x, 0)
    return x


def _row_mask_fix(x, tile, T):
    """Zero rows past T (last grid tile overhang reads undefined memory)."""
    if T % tile == 0:
        return x
    row = pl.program_id(0) * tile + jax.lax.broadcasted_iota(
        jnp.int32, x.shape, 0)
    return jnp.where(row < T, x, 0)


# ------------------------------------------------------------- layernorm ----

def _ln_fwd(x, a, b, n_true, eps):
    """nn/norm.py formula on a (tile, dpad) fp32 block; stats over the first
    n_true lanes. Returns (y, d, r, h) for the backward.

    With _MXU_REDUCE the mean/variance reductions (and their broadcasts
    back to full width) ride the MXU via _bsum; ``r`` is then full-width
    (every lane equal) instead of (tile, 1) — downstream math is
    broadcast-compatible either way."""
    dpad = x.shape[1]
    if _MXU_REDUCE:
        mu = _bsum(x, n_true, 1.0 / n_true)     # pad lanes excluded by mask
        d = x - mu
        if n_true != dpad:
            d = jnp.where(_lane_mask(x.shape, n_true), d, 0.0)
        v = _bsum(d * d, n_true, 1.0 / max(n_true - 1, 1))
    else:
        if n_true != dpad:
            x = jnp.where(_lane_mask(x.shape, n_true), x, 0.0)
        mu = jnp.sum(x, axis=1, keepdims=True) / n_true
        d = x - mu
        if n_true != dpad:
            d = jnp.where(_lane_mask(x.shape, n_true), d, 0.0)
        v = jnp.sum(d * d, axis=1, keepdims=True) / max(n_true - 1, 1)
    s = jnp.sqrt(v)
    r = 1.0 / (s + eps)
    h = d * r
    return h * a + b, d, r, h


def _ln_bwd(g, d, r, h, a, n_true, eps):
    """Gradient of _ln_fwd wrt (x, a, b), given upstream g (zero on pad
    lanes/rows). Derivation: y = a*(x-mu)/(s+eps)+b, s = unbiased std."""
    da = jnp.sum(g * h, axis=0, keepdims=True)
    db = jnp.sum(g, axis=0, keepdims=True)
    gh = g * a
    if _MXU_REDUCE:
        c = _bsum(gh * d, n_true)
    else:
        c = jnp.sum(gh * d, axis=1, keepdims=True)
    s = 1.0 / r - eps                       # recover s from r
    denom = max(n_true - 1, 1) * jnp.maximum(s, 1e-30)
    w = jnp.where(s > 0, -c * r * r / denom, 0.0)
    dd = gh * r + w * d
    if _MXU_REDUCE:
        dx = dd - _bsum(dd, n_true, 1.0 / n_true)
    else:
        dx = dd - jnp.sum(dd, axis=1, keepdims=True) / n_true
    return dx, da, db


# ---------------------------------------------------------------- posenc ----

@functools.lru_cache(maxsize=None)
def _posenc_plan(dims, Ls, embed_type, factor, mult, extra_dim):
    """Column plan for in-kernel interleaved posenc (nn/posenc.py layout).

    Encoded column c comes from raw dim j(c): self columns pass through,
    sin/cos columns apply the per-column frequency. Expressed as a 0/1
    selection matrix S (raw -> encoded, an MXU matmul in-kernel) plus
    per-column frequency and kind-mask rows.
    """
    import numpy as np
    sel, freq, kinds = [], [], []   # raw index, scale, 0=self/1=sin/2=cos
    raw = 0
    for fi, d in enumerate(dims):
        for j in range(d):
            if embed_type == 1:
                sel.append(raw + j); freq.append(0.0); kinds.append(0)
            for i in range(Ls[fi]):
                s = (factor ** i) * mult
                sel.append(raw + j); freq.append(s); kinds.append(1)
                sel.append(raw + j); freq.append(s); kinds.append(2)
        raw += d
    for j in range(extra_dim):      # extras pass through un-encoded
        sel.append(raw + j); freq.append(0.0); kinds.append(0)
    raw += extra_dim

    d0 = len(sel)
    S = np.zeros((_round_up(raw, _LANE), _round_up(d0, _LANE)), np.float32)
    S[np.asarray(sel), np.arange(d0)] = 1.0
    rows = np.zeros((4, S.shape[1]), np.float32)
    rows[0, :d0] = freq
    k = np.asarray(kinds)
    rows[1, :d0] = (k == 0); rows[2, :d0] = (k == 1); rows[3, :d0] = (k == 2)
    return raw, d0, S, rows


def _pe_freq(xg, rows):
    """Frequency part of the posenc on gathered columns xg (tile, d0_pad)."""
    freq, m_self, m_sin, m_cos = (rows[0:1], rows[1:2], rows[2:3], rows[3:4])
    t = xg * freq
    sin_t, cos_t = jnp.sin(t), jnp.cos(t)
    enc = m_self * xg + m_sin * sin_t + m_cos * cos_t
    return enc, (freq, m_self, m_sin, m_cos, sin_t, cos_t)


def _pe_freq_bwd(g, pe_saved):
    freq, m_self, m_sin, m_cos, sin_t, cos_t = pe_saved
    return (m_self + (m_sin * cos_t - m_cos * sin_t) * freq) * g


def _pe_stage(xf, S, rows):
    """x_raw (tile, n_raw_pad) fp32 -> encoded (tile, d0_pad) fp32; also
    returns what the backward needs.

    PRECISION NOTE: the 0/1 selection matmuls deliberately ride the backend
    default. On real TPUs Mosaic's fp32 dot does NOT truncate the
    phase-sensitive posenc inputs (verified 2e-5 fused-vs-unfused on v5e
    hardware), and forcing Precision.HIGHEST costs ~11 ms/step (17%) on the
    flagship workload. Interpret mode (CPU tests) is exact fp32 under the
    pinned CPU backend; an ambient low-precision jax matmul config would
    make interpret-mode results diverge — pin the backend, not HIGHEST."""
    xg = jnp.dot(xf, S, preferred_element_type=jnp.float32)
    return _pe_freq(xg, rows)


def _pe_bwd(g, pe_saved, S):
    dxg = _pe_freq_bwd(g, pe_saved)
    return jax.lax.dot_general(dxg, S, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


# --------------------------------------------------------------- kernels ----

def walk_fwd(cfg, xf, pe_refs, w_refs, b_refs, ln_refs):
    """Embedder-block forward on an in-VMEM fp32 tile ``xf`` (rows,
    d_in_pad), already masked by the caller. Returns per-stage values needed
    by the backward. Shared with the streamed attention kernels
    (ops/stream_attn.py)."""
    pe = None
    if cfg[9]:  # has_pe
        xf, pe = _pe_stage(xf, pe_refs[0][:], pe_refs[1][:])
    y, hs, li, lo = walk_body_fwd(cfg, xf, w_refs, b_refs, ln_refs)
    return y, hs, pe, li, lo


def walk_body_fwd(cfg, xf, w_refs, b_refs, ln_refs):
    """[LN] -> dense stack -> [LN] on an ALREADY-ENCODED fp32 tile."""
    (n, act, last_act, cdt, d_raw, d_enc, d_out, T, tile, has_pe, has_li,
     has_lo, eps) = cfg
    li = lo = None
    if has_li:
        a_in, b_in = ln_refs[0][:], ln_refs[1][:]
        h0, d_i, r_i, h_i = _ln_fwd(xf, a_in, b_in, d_enc, eps)
        li = (d_i, r_i, h_i, a_in)
    else:
        h0 = xf
    hs = [h0.astype(cdt)]
    z = None
    for i in range(n):
        z = jnp.dot(hs[-1], w_refs[i][:], preferred_element_type=jnp.float32)
        z = z + b_refs[i][:]
        z = _act_fwd(z, last_act if i == n - 1 else act)
        hs.append(z.astype(cdt))
    if has_lo:
        k = 2 if has_li else 0
        a_out, b_out = ln_refs[k][:], ln_refs[k + 1][:]
        y, d_o, r_o, h_o = _ln_fwd(z, a_out, b_out, d_out, eps)
        lo = (d_o, r_o, h_o, a_out)
    else:
        y = z
    return y, hs, li, lo


def walk_body_fwd_q(cfg, xf, w_refs, inv_refs, dq_refs, b_refs, ln_refs):
    """Int8 variant of walk_body_fwd (forward-only, eval path).

    Each dense layer's input quantizes per COLUMN (the per-column
    activation scale is pre-folded into the int8 weights by the wrapper,
    so the kernel only multiplies by the inverse-scale row), the weights
    are int8 with per-output-channel dequant rows, and the matmul
    accumulates int32 on the MXU — 2x the bf16 MXU rate on v5e
    (tools/int8_walk_microbench.py: static-scale int8 1.3-1.6x over bf16
    at the walk's shapes; dynamic per-row quantization LOSES and is not
    offered). LNs, bias, activation stay fp32.
    """
    (n, act, last_act, cdt, d_raw, d_enc, d_out, T, tile, has_pe, has_li,
     has_lo, eps) = cfg
    if has_li:
        h, _, _, _ = _ln_fwd(xf, ln_refs[0][:], ln_refs[1][:], d_enc, eps)
    else:
        h = xf
    for i in range(n):
        q = jnp.clip(jnp.round(h * inv_refs[i][:]), -127.0, 127.0).astype(
            jnp.int8)
        z = jnp.dot(q, w_refs[i][:], preferred_element_type=jnp.int32)
        z = z.astype(jnp.float32) * dq_refs[i][:] + b_refs[i][:]
        h = _act_fwd(z, last_act if i == n - 1 else act)
    if has_lo:
        k = 2 if has_li else 0
        y, _, _, _ = _ln_fwd(h, ln_refs[k][:], ln_refs[k + 1][:], d_out, eps)
    else:
        y = h
    return y


def walk_bwd(cfg, g, hs, pe, li, lo, pe_refs, w_refs, accum):
    """Reverse walk matching walk_fwd: upstream g (rows, d_out_pad) fp32,
    zero on pad lanes/rows. ``accum(kind, i, val)`` accumulates parameter
    grads (kind in {'w','b','ln'}; for 'ln' i indexes the a/b refs in
    order). Returns d_x (rows, d_in_pad) fp32."""
    g = walk_body_bwd(cfg, g, hs, li, lo, w_refs, accum)
    if cfg[9]:  # has_pe
        g = _pe_bwd(g, pe, pe_refs[0][:])
    return g


def walk_body_bwd(cfg, g, hs, li, lo, w_refs, accum):
    """Reverse of walk_body_fwd; returns d_enc (rows, d_enc_pad) fp32."""
    (n, act, last_act, cdt, d_raw, d_enc, d_out, T, tile, has_pe, has_li,
     has_lo, eps) = cfg
    if has_lo:
        d_o, r_o, h_o, a_out = lo
        g, da_o, db_o = _ln_bwd(g, d_o, r_o, h_o, a_out, d_out, eps)
        k = 2 if has_li else 0
        accum("ln", k, da_o)
        accum("ln", k + 1, db_o)

    for i in reversed(range(n)):
        kind = last_act if i == n - 1 else act
        mask = _act_mask(hs[i + 1], kind)
        dz = g * mask if mask is not None else g
        dz_c = dz.astype(cdt)
        dw = jax.lax.dot_general(hs[i], dz_c, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        accum("w", i, dw)
        accum("b", i, jnp.sum(dz, axis=0, keepdims=True))
        g = jax.lax.dot_general(dz_c, w_refs[i][:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

    if has_li:
        d_i, r_i, h_i, a_in = li
        g, da_i, db_i = _ln_bwd(g, d_i, r_i, h_i, a_in, d_enc, eps)
        accum("ln", 0, da_i)
        accum("ln", 1, db_i)
    return g


def _recompute(cfg, x_ref, pe_refs, w_refs, b_refs, ln_refs):
    """Shared fwd walk; returns per-stage values needed by both passes."""
    (n, act, last_act, cdt, d_raw, d_enc, d_out, T, tile, has_pe, has_li,
     has_lo, eps) = cfg
    x = _row_mask_fix(_zero_lanes(x_ref[:], d_raw), tile, T)
    return walk_fwd(cfg, x.astype(jnp.float32), pe_refs, w_refs, b_refs,
                    ln_refs)


def _split_refs(cfg, refs):
    n, has_pe, has_li, has_lo = cfg[0], cfg[9], cfg[10], cfg[11]
    i = 0
    pe_refs = refs[:2] if has_pe else ()
    i = 2 if has_pe else 0
    w_refs = refs[i:i + n]
    b_refs = refs[i + n:i + 2 * n]
    ln_refs = refs[i + 2 * n:i + 2 * n + 2 * (has_li + has_lo)]
    rest = refs[i + 2 * n + 2 * (has_li + has_lo):]
    return pe_refs, w_refs, b_refs, ln_refs, rest


def _fwd_kernel(cfg, x_ref, *refs):
    pe_refs, w_refs, b_refs, ln_refs, rest = _split_refs(cfg, refs)
    y_ref = rest[0]
    y, _, _, _, _ = _recompute(cfg, x_ref, pe_refs, w_refs, b_refs, ln_refs)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(cfg, x_ref, dy_ref, *refs):
    (n, act, last_act, cdt, d_raw, d_enc, d_out, T, tile, has_pe, has_li,
     has_lo, eps) = cfg
    pe_refs, w_refs, b_refs, ln_refs, outs = _split_refs(cfg, refs)
    dx_ref = outs[0]
    dw_refs, db_refs = outs[1:1 + n], outs[1 + n:1 + 2 * n]
    dln_refs = outs[1 + 2 * n:]

    first = pl.program_id(0) == 0

    def accum(ref, val):
        @pl.when(first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] += val

    _, hs, pe, li, lo = _recompute(cfg, x_ref, pe_refs, w_refs, b_refs,
                                   ln_refs)

    g = _row_mask_fix(_zero_lanes(dy_ref[:], d_out), tile, T)
    g = g.astype(jnp.float32)

    def acc(kind, i, val):
        ref = {"w": dw_refs, "b": db_refs, "ln": dln_refs}[kind][i]
        accum(ref, val)

    g = walk_bwd(cfg, g, hs, pe, li, lo, pe_refs, w_refs, acc)
    dx_ref[:] = g.astype(dx_ref.dtype)


# -------------------------------------------------------------- dispatch ----

def _cdt(x):
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32


def _layout(x, ws, bs, ln_in, ln_out, pe_desc, cdt):
    """Pad the (small) parameters to lane multiples; big tensors untouched."""
    if pe_desc is not None:
        d_raw, d_enc, S, rows = _posenc_plan(*pe_desc)
        assert d_raw == x.shape[1], (d_raw, x.shape)
        pe = [jnp.asarray(S), jnp.asarray(rows)]
        d_in_pad = S.shape[0]
    else:
        d_raw = d_enc = x.shape[1]
        pe = []
        d_in_pad = _round_up(d_raw, _LANE)
    dims = [d_enc] + [w.shape[1] for w in ws]
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
    return d_raw, d_enc, d_in_pad, dims, pdims, pe, wsp, bsp, lns


def _make_specs(n, d_in_pad, pdims, tile, pe, ln_in, ln_out):
    const = lambda t: (0, 0)
    x_spec = pl.BlockSpec((tile, d_in_pad), lambda t: (t, 0))
    pe_specs = ([pl.BlockSpec(pe[0].shape, const),
                 pl.BlockSpec(pe[1].shape, const)] if pe else [])
    w_specs = [pl.BlockSpec((pdims[i], pdims[i + 1]), const) for i in range(n)]
    b_specs = [pl.BlockSpec((1, pdims[i + 1]), const) for i in range(n)]
    ln_specs = []
    if ln_in is not None:
        ln_specs += [pl.BlockSpec((1, pdims[0]), const)] * 2
    if ln_out is not None:
        ln_specs += [pl.BlockSpec((1, pdims[-1]), const)] * 2
    return x_spec, pe_specs, w_specs, b_specs, ln_specs


def _cfg_tuple(x, ws, ln_in, ln_out, act, last_act, tile, d_raw, d_enc,
               dims, pe_desc, cdt):
    return (len(ws), act, last_act, cdt, d_raw, d_enc, dims[-1],
            x.shape[0], tile, pe_desc is not None, ln_in is not None,
            ln_out is not None, 1e-6)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def fused_mlp(x, ws, bs, ln_in=None, ln_out=None, act="relu",
              last_act="none", interpret=False, tile=512, pe_desc=None,
              compute=None, mxu_reduce=None):
    """y = [posenc] [LN] MLP [LN] (x) with the whole block fused in VMEM.

    Args:
      x:  (T, d_raw) tokens (bf16 or fp32; sets the compute dtype).
      ws: tuple of (d_i, d_{i+1}) weights (input-major).
      bs: tuple of (d_{i+1},) biases.
      ln_in/ln_out: optional (a, b) LayerNorm params (nn/norm.py semantics).
      pe_desc: optional (dims, Ls, embed_type, factor, mult, extra_dim)
        static posenc descriptor; when set, x holds the RAW features and
        the encoding happens inside the kernel.
    Returns (T, d_out) in x.dtype.
    """
    y, _ = _fused_fwd(x, ws, bs, ln_in, ln_out, act, last_act, interpret,
                      tile, pe_desc, compute, mxu_reduce)
    return y


def _fused_fwd(x, ws, bs, ln_in, ln_out, act, last_act, interpret, tile,
               pe_desc, compute=None, mxu_reduce=None):
    with _mxu_scope(mxu_reduce):
        return _fused_fwd_inner(x, ws, bs, ln_in, ln_out, act, last_act,
                                interpret, tile, pe_desc, compute)


def _fused_fwd_inner(x, ws, bs, ln_in, ln_out, act, last_act, interpret,
                     tile, pe_desc, compute=None):
    n = len(ws)
    cdt = jnp.dtype(compute) if compute else _cdt(x)
    T = x.shape[0]
    (d_raw, d_enc, d_in_pad, dims, pdims, pe, wsp, bsp,
     lns) = _layout(x, ws, bs, ln_in, ln_out, pe_desc, cdt)
    cfg = _cfg_tuple(x, ws, ln_in, ln_out, act, last_act, tile, d_raw,
                     d_enc, dims, pe_desc, cdt)
    x_spec, pe_specs, w_specs, b_specs, ln_specs = _make_specs(
        n, d_in_pad, pdims, tile, pe, ln_in, ln_out)

    y = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(_round_up(T, tile) // tile,),
        in_specs=[x_spec] + pe_specs + w_specs + b_specs + ln_specs,
        out_specs=pl.BlockSpec((tile, pdims[-1]), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((T, pdims[-1]), cdt),
        interpret=interpret,
    )(x, *pe, *wsp, *bsp, *lns)
    return y[:, :dims[-1]], (x, ws, bs, ln_in, ln_out)


def _fused_bwd(act, last_act, interpret, tile, pe_desc, compute, mxu_reduce,
               res, dy):
    with _mxu_scope(mxu_reduce):
        return _fused_bwd_inner(act, last_act, interpret, tile, pe_desc,
                                compute, res, dy)


def _fused_bwd_inner(act, last_act, interpret, tile, pe_desc, compute, res,
                     dy):
    x, ws, bs, ln_in, ln_out = res
    n = len(ws)
    cdt = jnp.dtype(compute) if compute else _cdt(x)
    T = x.shape[0]
    (d_raw, d_enc, d_in_pad, dims, pdims, pe, wsp, bsp,
     lns) = _layout(x, ws, bs, ln_in, ln_out, pe_desc, cdt)
    cfg = _cfg_tuple(x, ws, ln_in, ln_out, act, last_act, tile, d_raw,
                     d_enc, dims, pe_desc, cdt)
    x_spec, pe_specs, w_specs, b_specs, ln_specs = _make_specs(
        n, d_in_pad, pdims, tile, pe, ln_in, ln_out)
    dy_spec = pl.BlockSpec((tile, pdims[-1]), lambda t: (t, 0))
    const = lambda t: (0, 0)

    out_specs = ([pl.BlockSpec((tile, d_in_pad), lambda t: (t, 0))]
                 + [pl.BlockSpec((pdims[i], pdims[i + 1]), const)
                    for i in range(n)]
                 + [pl.BlockSpec((1, pdims[i + 1]), const) for i in range(n)]
                 + list(ln_specs))
    out_shapes = ([jax.ShapeDtypeStruct((T, d_in_pad), x.dtype)]
                  + [jax.ShapeDtypeStruct((pdims[i], pdims[i + 1]),
                                          jnp.float32) for i in range(n)]
                  + [jax.ShapeDtypeStruct((1, pdims[i + 1]), jnp.float32)
                     for i in range(n)]
                  + [jax.ShapeDtypeStruct(l.shape, jnp.float32) for l in lns])

    # dy lanes beyond d_out (d_out % 128 != 0) overhang the block; the
    # kernel zero-masks them, so no host-side pad copy is needed.
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=(_round_up(T, tile) // tile,),
        in_specs=[x_spec, dy_spec] + pe_specs + w_specs + b_specs + ln_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, dy, *pe, *wsp, *bsp, *lns)

    dx = outs[0][:, :d_raw].astype(x.dtype)
    dws = tuple(outs[1 + i][:dims[i], :dims[i + 1]].astype(ws[i].dtype)
                for i in range(n))
    dbs = tuple(outs[1 + n + i][0, :dims[i + 1]].astype(bs[i].dtype)
                for i in range(n))
    k = 1 + 2 * n
    dln_in = dln_out = None
    if ln_in is not None:
        dln_in = (outs[k][0, :dims[0]].astype(ln_in[0].dtype),
                  outs[k + 1][0, :dims[0]].astype(ln_in[1].dtype))
        k += 2
    if ln_out is not None:
        dln_out = (outs[k][0, :dims[-1]].astype(ln_out[0].dtype),
                   outs[k + 1][0, :dims[-1]].astype(ln_out[1].dtype))
    return dx, dws, dbs, dln_in, dln_out


fused_mlp.defvjp(_fused_fwd, _fused_bwd)


# ----------------------------------------------------------- integration ----

def feedforward_fusible(ff_cfg) -> bool:
    """True when the config's FFN is a plain dense chain this kernel covers."""
    return (not tuple(ff_cfg.skip_layers)
            and not tuple(ff_cfg.half_layers)
            and not tuple(ff_cfg.get("residual_layers", []))
            and not ff_cfg.use_wn
            and not ff_cfg.residual_ff
            and float(ff_cfg.dropout_ff) == 0.0
            and not ff_cfg.ff_act_trainable
            and ff_cfg.ff_act in ("relu", "none")
            and ff_cfg.ff_last_act in ("relu", "none")
            and float(ff_cfg.ff_act_a) == 1.0
            and float(ff_cfg.ff_act_b) == 1.0)


def _ff_lns(params):
    if "innorm" in params:
        return ((params["innorm"]["a"], params["innorm"]["b"]),
                (params["outnorm"]["a"], params["outnorm"]["b"]))
    return None, None


def fused_feedforward_apply(params, x, ff_cfg, eps, policy,
                            interpret=False, tile=512, mxu_reduce=None):
    """Drop-in for feedforward_apply on fusible configs: the whole
    [LN] -> MLP -> [LN] block in one Pallas dispatch."""
    lead = x.shape[:-1]
    h = policy.cast(x).reshape(-1, x.shape[-1])
    ws = tuple(l["w"].T for l in params["mlp"]["layers"])
    bs = tuple(l["bias"] for l in params["mlp"]["layers"])
    ln_in, ln_out = _ff_lns(params)
    y = fused_mlp(h, ws, bs, ln_in, ln_out, ff_cfg.ff_act,
                  ff_cfg.ff_last_act, interpret, tile, None, None,
                  mxu_reduce)
    return y.reshape(*lead, y.shape[-1])


def fused_embedder_apply(params, raw_features, extras, Ls, embed_cfg, ff_cfg,
                         eps, policy, interpret=False, tile=512,
                         mxu_reduce=None):
    """The whole embedder — posenc + [LN] + MLP + [LN] — in one dispatch.

    raw_features: list of (..., d_i) UN-encoded geometric features
    (attention.py builds the same list for the unfused `_encode` path);
    extras: optional list of pass-through features appended after posenc.
    """
    dims = tuple(int(f.shape[-1]) for f in raw_features)
    extra_dim = int(sum(e.shape[-1] for e in extras)) if extras else 0
    pe_desc = (dims, tuple(int(l) for l in Ls), int(embed_cfg.embed_type),
               float(embed_cfg.pe_factor), float(embed_cfg.pe_mult_factor),
               extra_dim)
    parts = list(raw_features) + (list(extras) if extras else [])
    # raw features stay fp32 into the kernel: posenc at frequency 2^L is
    # phase-sensitive, so the sin/cos must see full-precision inputs (the
    # unfused path also encodes in fp32 and casts after, nn/posenc.py).
    x = jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=-1)
    lead = x.shape[:-1]
    h = x.reshape(-1, x.shape[-1])
    ws = tuple(l["w"].T for l in params["mlp"]["layers"])
    bs = tuple(l["bias"] for l in params["mlp"]["layers"])
    ln_in, ln_out = _ff_lns(params)
    y = fused_mlp(h, ws, bs, ln_in, ln_out, ff_cfg.ff_act,
                  ff_cfg.ff_last_act, interpret, tile, pe_desc,
                  jnp.dtype(policy.compute_dtype).name, mxu_reduce)
    return y.reshape(*lead, y.shape[-1])
