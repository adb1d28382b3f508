"""LayerNorm with the reference's exact (non-standard) formula.

Reference: models/attn.py:30-42 — normalizes by ``std + eps`` where ``std`` is
the torch-default *unbiased* standard deviation (ddof=1), not the usual
``sqrt(var + eps)`` with biased variance. Statistics are computed in float32
regardless of the compute dtype (torch autocast also runs LayerNorm in fp32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layernorm_init(features: int) -> dict:
    return {
        "a": jnp.ones((features,), jnp.float32),
        "b": jnp.zeros((features,), jnp.float32),
    }


def layernorm_apply(params: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    n = xf.shape[-1]
    var = jnp.sum((xf - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var)
    y = params["a"] * (xf - mean) / (std + eps) + params["b"]
    return y.astype(out_dtype)
