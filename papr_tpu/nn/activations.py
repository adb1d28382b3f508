"""Activation registry.

Functional counterparts of the reference's activation factory
(reference: models/utils.py:183-229). Stateless activations are plain
``f(x)`` closures from :func:`build_activation`. The parametric family
(gaussian, quadratic, multi-quadratic, laplacian, super-gaussian, expsin)
can carry trainable ``a``/``b`` parameters (reference ``ff_act_trainable``;
models/utils.py:363-416 stores them as shape-(1,) ``nn.Parameter``s, one
instance per MLP layer), and PReLU carries torch's always-trainable
per-channel slopes (init 0.25, reference models/utils.py:190).

Trainable variants live in the params pytree: :func:`activation_param_init`
returns the (possibly empty) per-instance param dict and
:func:`apply_activation` consumes it. The fused Pallas kernels bake
activations as compile-time constants, so configs with trainable activation
params run the unfused XLA path (ops/fused_mlp.py ``feedforward_fusible``
excludes them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Families whose ``a`` (and ``b`` for super-gaussian) become parameters
# under ff_act_trainable (reference models/utils.py:363-416).
_TRAINABLE_A = ("gaussian", "quadratic", "multi-quadratic", "laplacian",
                "expsin")


def activation_param_init(act_type: str, a: float = 1.0, b: float = 1.0,
                          trainable: bool = False,
                          num_channels: int | None = None) -> dict:
    """Per-instance trainable params for ``act_type`` (possibly empty).

    Mirrors the reference factory's parameter creation: the parametric
    family gets scalar shape-(1,) ``a``/``b`` when ``trainable``; PReLU
    gets per-channel slopes (torch ``nn.PReLU(num_channels)`` is always
    trainable regardless of the flag, models/utils.py:190).
    """
    act_type = act_type.lower()
    if act_type == "prelu":
        n = int(num_channels) if num_channels else 1
        return {"slope": jnp.full((n,), 0.25, jnp.float32)}
    if not trainable:
        return {}
    if act_type in _TRAINABLE_A:
        return {"a": jnp.full((1,), a, jnp.float32)}
    if act_type == "super-gaussian":
        return {"a": jnp.full((1,), a, jnp.float32),
                "b": jnp.full((1,), b, jnp.float32)}
    return {}


def apply_activation(act_type: str, x, params: dict | None = None,
                     neg_slope: float = 0.2, a=1.0, b=1.0):
    """Apply the named activation, drawing ``a``/``b``/PReLU slopes from
    ``params`` when present (else the build-time constants)."""
    act_type = act_type.lower()
    p = params or {}
    # Param arrays are stored fp32; cast to the input dtype so a bf16
    # compute chain stays bf16 (torch-autocast semantics). Python-float
    # constants are weakly typed and need no cast.
    cast = lambda v: v.astype(x.dtype) if hasattr(v, "astype") else v
    a = cast(p.get("a", a))
    b = cast(p.get("b", b))

    if act_type == "none":
        return x
    if act_type == "leakyrelu":
        return jnp.where(x >= 0, x, neg_slope * x)
    if act_type == "prelu":
        slope = cast(p.get("slope", 0.25))
        return jnp.where(x >= 0, x, slope * x)
    if act_type == "relu":
        return jnp.maximum(x, 0)
    if act_type == "+1":
        return x + 1
    if act_type == "relu+1":
        return jnp.maximum(x, 0) + 1
    if act_type == "tanh":
        return jnp.tanh(x)
    if act_type == "shifted_tanh":
        return (jnp.tanh(x) + 1) / 2
    if act_type == "sigmoid":
        return jax.nn.sigmoid(x)
    if act_type == "gelu":
        # exact erf form (torch nn.GELU default)
        return jax.nn.gelu(x, approximate=False)
    if act_type == "gaussian":
        return jnp.exp(-x ** 2 / (2 * a ** 2))
    if act_type == "quadratic":
        return 1 / (1 + (a * x) ** 2)
    if act_type == "multi-quadratic":
        return 1 / (1 + (a * x) ** 2) ** 0.5
    if act_type == "laplacian":
        return jnp.exp(-jnp.abs(x) / a)
    if act_type == "super-gaussian":
        return jnp.exp(-x ** 2 / (2 * a ** 2)) ** b
    if act_type == "expsin":
        return jnp.exp(-jnp.sin(a * x))
    if act_type == "clamp":
        return jnp.clip(x, 0.0, 1.0)
    if "sine" in act_type:
        return jnp.sin(a * x)
    if "softplus" in act_type:
        # "softplus_a_b_c" -> a * softplus(b * x + c)
        c1, c2, c3 = [float(v) for v in act_type.split("_")[1:]]
        return c1 * jax.nn.softplus(c2 * x + c3)
    raise NotImplementedError(f"activation [{act_type}] is not found")


def build_activation(act_type: str = "leakyrelu", neg_slope: float = 0.2,
                     a: float = 1.0, b: float = 1.0):
    """Return a pure ``f(x) -> x`` with build-time constants (the stateless
    path; trainable instances go through activation_param_init/
    apply_activation instead)."""
    return lambda x: apply_activation(act_type, x, None, neg_slope, a, b)
