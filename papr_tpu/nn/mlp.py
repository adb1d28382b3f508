"""Generic MLP and FeedForward blocks (functional, pytree params).

Behavioral spec comes from the reference (models/mlp.py:12-59 ``MLP`` and
models/attn.py:90-117 ``FeedForward``), re-expressed as init/apply pairs over
plain dict pytrees so they jit/vmap/shard cleanly on TPU.

Supported layer machinery (all exercised by shipped configs or tests):
  * ``skip_layers``  — concat the block input before layer ``i``;
  * ``half_layers``  — layer ``i`` has halved output when ``i+1`` is listed
    and halved input when ``i`` is listed;
  * ``residual_layers``/``residual_dims`` — concat external tensors before a
    layer;
  * ``use_wn`` — torch-style weight normalization (w = g * v / ||v||_row).

Compute dtype: matmuls run in ``policy.compute_dtype`` (bf16 on TPU when
``use_amp``); parameters are stored fp32.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .activations import activation_param_init, apply_activation
from .init import linear_bias, xavier_uniform
from .norm import layernorm_apply, layernorm_init


@dataclass(frozen=True)
class Policy:
    """Mixed-precision policy (replaces torch.cuda.amp; bf16 needs no scaler)."""
    compute_dtype: jnp.dtype = jnp.float32

    def cast(self, x):
        return x.astype(self.compute_dtype)


F32 = Policy(jnp.float32)
BF16 = Policy(jnp.bfloat16)


def policy_from_config(cfg) -> Policy:
    """use_amp -> bf16 compute on TPU (reference fp16 AMP: models/model.py:24-26)."""
    if cfg.use_amp:
        name = cfg.get_path("tpu.compute_dtype", "bfloat16")
        return Policy(jnp.dtype(name))
    return F32


# ---------------------------------------------------------------- linear ----

def linear_init(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True,
                use_wn: bool = False, xavier: bool = True) -> dict:
    wkey, bkey = jax.random.split(key)
    if xavier:
        w = xavier_uniform(wkey, (out_dim, in_dim))
    else:
        # torch Linear default (kaiming uniform a=sqrt(5)) == U(+-1/sqrt(fan_in))*sqrt(3)*gain
        w = jax.random.uniform(
            wkey, (out_dim, in_dim), jnp.float32,
            -1.0, 1.0) * (1.0 / jnp.sqrt(in_dim))
    p: dict = {}
    if use_wn:
        # torch weight_norm(dim=0): g starts at the per-row norm of v. The
        # reference then xavier-inits BOTH v and g because its init loop hits
        # every param with ndim > 1 (models/mlp.py:43-45); g is (out, 1) there.
        # We replicate that quirk for faithful training dynamics.
        g = jnp.linalg.norm(w, axis=1, keepdims=True)
        p["v"] = w
        p["g"] = g
    else:
        p["w"] = w
    if bias:
        p["bias"] = linear_bias(bkey, in_dim, out_dim)
    return p


def linear_apply(params: dict, x: jnp.ndarray, policy: Policy = F32) -> jnp.ndarray:
    if "v" in params:
        v = params["v"]
        w = params["g"] * v / (jnp.linalg.norm(v, axis=1, keepdims=True))
    else:
        w = params["w"]
    # fp32 compute (parity mode) needs true fp32 matmuls; bf16 rides the
    # backend default (see papr_tpu/__init__ note).
    prec = (jax.lax.Precision.HIGHEST
            if policy.compute_dtype == jnp.float32 else None)
    y = jnp.dot(policy.cast(x), policy.cast(w).T, precision=prec)
    if "bias" in params:
        y = y + policy.cast(params["bias"])
    return y


# ------------------------------------------------------------------- MLP ----

def mlp_init(key: jax.Array, inp_dim: int, num_layers: int, num_channels: int,
             out_dim: int, use_wn: bool = False, skip_layers=(), bias: bool = True,
             half_layers=(), residual_layers=(), residual_dims=(),
             act_type: str = "leakyrelu", last_act_type: str = "none",
             act_a: float = 1.0, act_b: float = 1.0,
             act_trainable: bool = False) -> dict:
    """Build the layer list; dims follow models/mlp.py:23-33 exactly.

    Per-layer activation params (``ff_act_trainable`` / PReLU slopes) are
    stored under each layer's ``"act"`` key, one instance per layer like the
    reference (models/mlp.py:37-39 — hidden layers get ``act_type`` with
    ``num_channels=cur_out``, the last layer gets ``last_act_type``). The
    key is absent for stateless activations, so default configs keep their
    checkpoint layout.
    """
    assert len(residual_dims) == len(residual_layers)
    layers = []
    keys = jax.random.split(key, num_layers)
    for i in range(num_layers):
        cur_inp = inp_dim if i == 0 else num_channels
        cur_out = out_dim if i == num_layers - 1 else num_channels
        if (i + 1) in half_layers:
            cur_out = cur_out // 2
        if i in half_layers:
            cur_inp = cur_inp // 2
        if i in skip_layers:
            cur_inp += inp_dim
        if i in residual_layers:
            cur_inp += residual_dims[list(residual_layers).index(i)]
        layer = linear_init(keys[i], cur_inp, cur_out, bias=bias,
                            use_wn=use_wn)
        cur_act = last_act_type if i == num_layers - 1 else act_type
        ap = activation_param_init(cur_act, a=act_a, b=act_b,
                                   trainable=act_trainable,
                                   num_channels=cur_out)
        if ap:
            layer["act"] = ap
        layers.append(layer)
    return {"layers": layers}


def mlp_apply(params: dict, x: jnp.ndarray, act_type: str = "leakyrelu",
              last_act_type: str = "none", a: float = 1.0, b: float = 1.0,
              skip_layers=(), residual_layers=(), residuals=(),
              policy: Policy = F32) -> jnp.ndarray:
    inp = x
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        if i in skip_layers:
            x = jnp.concatenate([x, inp], axis=-1)
        if i in residual_layers:
            x = jnp.concatenate(
                [x, residuals[list(residual_layers).index(i)]], axis=-1)
        x = linear_apply(layer, x, policy)
        cur_act = last_act_type if i == n - 1 else act_type
        x = apply_activation(cur_act, x, layer.get("act"), a=a, b=b)
    return x


# ----------------------------------------------------------- FeedForward ----

def feedforward_init(key: jax.Array, d_input: int, d_output: int, ff_cfg,
                     eps: float = 1e-6) -> dict:
    """FFN used by the k/q/v embedders: [LayerNorm] -> MLP -> [LayerNorm].

    ``ff_cfg`` is a config node like ``models.attn.embed.key``.
    """
    p: dict = {
        "mlp": mlp_init(
            key, d_input, ff_cfg.n_ff_layer, ff_cfg.d_ff, d_output,
            use_wn=ff_cfg.use_wn, skip_layers=tuple(ff_cfg.skip_layers),
            half_layers=tuple(ff_cfg.half_layers),
            residual_layers=tuple(ff_cfg.get("residual_layers", [])),
            residual_dims=tuple(ff_cfg.get("residual_dims", [])),
            act_type=ff_cfg.ff_act, last_act_type=ff_cfg.ff_last_act,
            act_a=float(ff_cfg.ff_act_a), act_b=float(ff_cfg.ff_act_b),
            act_trainable=bool(ff_cfg.ff_act_trainable)),
    }
    if ff_cfg.norm == "layernorm":
        p["innorm"] = layernorm_init(d_input)
        p["outnorm"] = layernorm_init(d_output)
    elif ff_cfg.norm != "none":
        raise ValueError("Invalid attention norm type")
    return p


def feedforward_apply(params: dict, x: jnp.ndarray, ff_cfg, d_output: int,
                      eps: float = 1e-6, policy: Policy = F32,
                      dropout_rng: jax.Array | None = None,
                      train: bool = False) -> jnp.ndarray:
    """Reference: models/attn.py:113-117 (residual only when dims match)."""
    def norm(name, t):
        return layernorm_apply(params[name], t, eps) if name in params else t

    def body(t):
        t = mlp_apply(
            params["mlp"], t, act_type=ff_cfg.ff_act,
            last_act_type=ff_cfg.ff_last_act, a=ff_cfg.ff_act_a,
            b=ff_cfg.ff_act_b, skip_layers=tuple(ff_cfg.skip_layers),
            residual_layers=tuple(ff_cfg.get("residual_layers", [])),
            policy=policy)
        rate = float(ff_cfg.dropout_ff)
        if train and rate > 0.0 and dropout_rng is not None:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - rate, t.shape)
            t = jnp.where(keep, t / (1.0 - rate), 0).astype(t.dtype)
        return t

    if ff_cfg.residual_ff and x.shape[-1] == d_output:
        return norm("outnorm", x + body(norm("innorm", x)))
    return norm("outnorm", body(norm("innorm", x)))
