"""Proximity attention: geometric k/q/v embedders + score head.

Behavioral spec: reference models/attn.py. Each ray attends over its k
selected points; keys/values are positional-encoded point-ray geometry pushed
through deep FFN embedders, the query embeds the ray direction, and scores
are scaled-dot attention (single head) with a ReLU score activation.

TPU-first notes: tensors stay in ``(..., tokens, dim)`` layout (the reference
flattens (N,H,W) into a batch axis; here the batch axes stay leading and the
embedder matmuls batch over rays*points on the MXU). Embedder matmuls run in
the policy compute dtype (bf16 under ``use_amp``); the final score
dot-product and everything after it run in fp32 (torch fp16 autocast keeps
softmax in fp32; scores here are promoted one step earlier for stability —
divergence noted in docs/design.md).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..nn.activations import build_activation
from ..nn.mlp import F32, Policy, feedforward_apply, feedforward_init, linear_apply, linear_init
from ..nn.posenc import posenc

# Geometric feature dims per k/q/v type (reference: models/attn.py:9-23).
K_DIM_MAP = {1: [3, 3, 3]}
Q_DIM_MAP = {1: [3]}
V_DIM_MAP = {1: [3, 3]}


def _embed_in_dim(dims, Ls, embed_type: int, extra: int) -> int:
    if embed_type == 1:
        return sum(d + d * 2 * Ls[i] for i, d in enumerate(dims)) + extra
    if embed_type == 2:
        return sum(d * 2 * Ls[i] for i, d in enumerate(dims)) + extra
    raise ValueError(f"Unknown embedding type: {embed_type}")


def attention_init(key: jax.Array, attn_cfg, k_extra_dim: int = 0,
                   q_extra_dim: int = 0, v_extra_dim: int = 0,
                   eps: float = 1e-6) -> dict:
    e = attn_cfg.embed
    d_k = _embed_in_dim(K_DIM_MAP[attn_cfg.k_type], e.k_L, e.embed_type, k_extra_dim)
    d_q = _embed_in_dim(Q_DIM_MAP[attn_cfg.q_type], e.q_L, e.embed_type, q_extra_dim)
    d_v = _embed_in_dim(V_DIM_MAP[attn_cfg.v_type], e.v_L, e.embed_type, v_extra_dim)
    ks = jax.random.split(key, 5)
    return {
        "embed_k": feedforward_init(ks[0], d_k, e.key.d_ff_out, e.key, eps),
        "embed_q": feedforward_init(ks[1], d_q, e.query.d_ff_out, e.query, eps),
        "embed_v": feedforward_init(ks[2], d_v, e.value.d_ff_out, e.value, eps),
        # Score projections use xavier weights + default bias
        # (reference: models/attn.py:204-208).
        "w_k": linear_init(ks[3], e.key.d_ff_out, attn_cfg.d_model),
        "w_q": linear_init(ks[4], e.query.d_ff_out, attn_cfg.d_model),
    }


def _encode(features, Ls, embed_type: int, pe_factor: float, pe_mult: float,
            extras):
    parts = [posenc(f, Ls[i], pe_factor, without_self=(embed_type == 2),
                    mult_factor=pe_mult) for i, f in enumerate(features)]
    if extras:
        parts = parts + list(extras)
    return jnp.concatenate(parts, axis=-1)


def embed_kqv(params: dict, attn_cfg, k_features, q_features, v_features,
              k_extra=None, q_extra=None, v_extra=None, eps: float = 1e-6,
              policy: Policy = F32, remat: bool = False,
              dropout_rng: jax.Array | None = None, fused: bool = False,
              fused_interpret: bool = False, skip_k: bool = False,
              skip_v: bool = False, skip_q: bool = False, mxu_reduce=None):
    """Run the three geometric embedders -> (embed_k, embed_q, embed_v).

    Inputs are lists of geometric features shaped (..., K, d_i) (query:
    (..., 1, d_i)). ``dropout_rng`` enables embedder dropout (training only;
    rate = embed.*.dropout_ff, reference models/attn.py:108-117).
    ``skip_k``/``skip_v``/``skip_q`` return embed_k/embed_v/embed_q as None
    (the streamed attention kernels embed those slices themselves,
    ops/stream_attn.py; ``skip_q`` is the query-folded rec kernel).
    """
    e = attn_cfg.embed
    rngs = (jax.random.split(dropout_rng, 3) if dropout_rng is not None
            else (None, None, None))

    def run(ff_params, feats, Ls, extra, ff_cfg, rng):
        from ..ops.fused_mlp import feedforward_fusible, fused_embedder_apply
        if fused and rng is None and feedforward_fusible(ff_cfg):
            # Whole embedder — posenc + LN + dense stack + LN — in one
            # Pallas kernel (VMEM-resident activations, flash-style
            # recompute backward; remat is built in). ops/fused_mlp.py.
            return fused_embedder_apply(ff_params, feats, extra, Ls, e,
                                        ff_cfg, eps, policy,
                                        interpret=fused_interpret,
                                        mxu_reduce=mxu_reduce)
        x = _encode(feats, Ls, e.embed_type, e.pe_factor, e.pe_mult_factor,
                    extra)
        f = lambda p, t: feedforward_apply(p, t, ff_cfg, ff_cfg.d_ff_out, eps,
                                           policy, dropout_rng=rng,
                                           train=rng is not None)
        if remat:
            f = jax.checkpoint(f)
        return f(ff_params, policy.cast(x))

    k = (None if skip_k else
         run(params["embed_k"], k_features, e.k_L, k_extra, e.key, rngs[0]))
    q = (None if skip_q else
         run(params["embed_q"], q_features, e.q_L, q_extra, e.query, rngs[1]))
    v = (None if skip_v else
         run(params["embed_v"], v_features, e.v_L, v_extra, e.value, rngs[2]))
    return k, q, v


def attention_scores(qq: jnp.ndarray, kk: jnp.ndarray,
                     kernel_type: str = "scaled-dot") -> jnp.ndarray:
    """Score kernel menu (reference ``attention``, models/attn.py:45-88).

    ``qq``: query projection, (..., 1, d) (broadcastable against ``kk``);
    ``kk``: key projection, (..., K, d). Returns (..., K) fp32 scores.
    ``d_kq`` for the scaled variants is the projection width (the reference
    uses ``query.size(-1)``).

    The reference's ``AttentionLayer.forward`` hardcodes "scaled-dot"
    (models/attn.py:224) so the other ten kernels are unreachable from its
    configs; here the full menu is reachable via the (superset) config key
    ``models.attn.kernel_type``. Non-default kernels run the unfused XLA
    path (ops/fused_attn.py ``score_fusible``).
    """
    d = qq.shape[-1]
    neg = kernel_type.startswith("-")
    base = kernel_type[1:] if neg else kernel_type
    if base in ("scaled-dot", "dot"):
        s = jnp.sum(qq * kk, axis=-1)
        if base == "scaled-dot":
            s = s / math.sqrt(d)
    elif base == "l1-dist":
        s = jnp.sum(jnp.abs(qq - kk), axis=-1)
    elif base in ("l2-dist", "scaled-l2-dist"):
        s = jnp.sqrt(jnp.sum(jnp.square(qq - kk), axis=-1))
        if base == "scaled-l2-dist":
            s = s / math.sqrt(d)
    elif base == "cosine" and not neg:
        s = jnp.sum(qq * kk, axis=-1) / (
            jnp.linalg.norm(qq, axis=-1) * jnp.linalg.norm(kk, axis=-1))
    else:
        raise ValueError(f"Unknown kernel type: {kernel_type}")
    return -s if neg else s


def attention_apply(params: dict, attn_cfg, k_features, q_features,
                    v_features, k_extra=None, q_extra=None, v_extra=None,
                    eps: float = 1e-6, policy: Policy = F32,
                    remat: bool = False, dropout_rng: jax.Array | None = None,
                    fused: bool = False, fused_interpret: bool = False):
    """Compute (embed_k, embed_q, embed_v, scores).

    Returns scores (..., K) in fp32 after the score activation, and embedv
    (..., K, d_ff_out) for fusion.
    """
    k, q, v = embed_kqv(params, attn_cfg, k_features, q_features, v_features,
                        k_extra, q_extra, v_extra, eps, policy, remat,
                        dropout_rng, fused, fused_interpret)

    # Scores (reference: models/attn.py:212-226; scaled-dot by default),
    # single head, promoted to fp32 for the softmax that follows. Written as
    # an elementwise mul + reduce (not a batched matmul): the query has one
    # token, and M=1 batched matmuls waste 127/128 of the MXU.
    kk = linear_apply(params["w_k"], k, policy).astype(jnp.float32)
    qq = linear_apply(params["w_q"], q, policy).astype(jnp.float32)
    scores = attention_scores(qq, kk,
                              attn_cfg.get("kernel_type", "scaled-dot"))
    scores = build_activation(attn_cfg.score_act)(scores)
    return k, q, v, scores
