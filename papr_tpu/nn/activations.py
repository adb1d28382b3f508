"""Activation registry.

Functional counterparts of the reference's activation factory
(reference: models/utils.py:183-229). All activations used by the shipped
configs (relu, leakyrelu, none, relu+1) are stateless; the parametric family
(gaussian, quadratic, ...) takes its ``a``/``b`` constants at build time.

Divergence note: the reference can make ``a``/``b`` trainable
(``ff_act_trainable``) and PReLU has per-channel trainable slopes; no shipped
config enables either, so here they are fixed constants (asserted below).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_activation(act_type: str = "leakyrelu", neg_slope: float = 0.2,
                     a: float = 1.0, b: float = 1.0, trainable: bool = False):
    """Return a pure ``f(x) -> x`` for the named activation."""
    act_type = act_type.lower()
    if trainable:
        raise NotImplementedError(
            "trainable activation parameters are not supported on the TPU "
            "build (no shipped reference config uses ff_act_trainable)")

    if act_type == "none":
        return lambda x: x
    if act_type == "leakyrelu":
        return lambda x: jnp.where(x >= 0, x, neg_slope * x)
    if act_type == "prelu":
        # PReLU's torch default slope is 0.25 (fixed here; see module note).
        return lambda x: jnp.where(x >= 0, x, 0.25 * x)
    if act_type == "relu":
        return lambda x: jnp.maximum(x, 0)
    if act_type == "+1":
        return lambda x: x + 1
    if act_type == "relu+1":
        return lambda x: jnp.maximum(x, 0) + 1
    if act_type == "tanh":
        return jnp.tanh
    if act_type == "shifted_tanh":
        return lambda x: (jnp.tanh(x) + 1) / 2
    if act_type == "sigmoid":
        return jax.nn.sigmoid
    if act_type == "gelu":
        # exact erf form (torch nn.GELU default)
        return lambda x: jax.nn.gelu(x, approximate=False)
    if act_type == "gaussian":
        return lambda x: jnp.exp(-x ** 2 / (2 * a ** 2))
    if act_type == "quadratic":
        return lambda x: 1 / (1 + (a * x) ** 2)
    if act_type == "multi-quadratic":
        return lambda x: 1 / (1 + (a * x) ** 2) ** 0.5
    if act_type == "laplacian":
        return lambda x: jnp.exp(-jnp.abs(x) / a)
    if act_type == "super-gaussian":
        return lambda x: jnp.exp(-x ** 2 / (2 * a ** 2)) ** b
    if act_type == "expsin":
        return lambda x: jnp.exp(-jnp.sin(a * x))
    if act_type == "clamp":
        return lambda x: jnp.clip(x, 0.0, 1.0)
    if "sine" in act_type:
        return lambda x: jnp.sin(a * x)
    if "softplus" in act_type:
        # "softplus_a_b_c" -> a * softplus(b * x + c)
        c1, c2, c3 = [float(v) for v in act_type.split("_")[1:]]
        return lambda x: c1 * jax.nn.softplus(c2 * x + c3)
    raise NotImplementedError(f"activation [{act_type}] is not found")
