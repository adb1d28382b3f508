"""Parameter initializers replicating torch's distributions.

The goal is distributional parity with the reference so training-from-scratch
dynamics match: xavier-uniform for weight matrices (reference:
models/mlp.py:43-45, models/attn.py:207-208) and torch's ``nn.Linear``
default uniform bias.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, shape: tuple[int, ...],
                   dtype=jnp.float32) -> jnp.ndarray:
    """torch.nn.init.xavier_uniform_ for a (out, in) weight matrix."""
    fan_out, fan_in = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_bias(key: jax.Array, fan_in: int, out_features: int,
                dtype=jnp.float32) -> jnp.ndarray:
    """torch.nn.Linear's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (out_features,), dtype, -bound, bound)


def kaiming_uniform_conv(key: jax.Array, shape: tuple[int, ...],
                         dtype=jnp.float32) -> jnp.ndarray:
    """torch.nn.Conv2d's default weight init (kaiming uniform, a=sqrt(5)).

    ``shape`` is HWIO (TPU-native conv layout). fan_in = H * W * I.
    """
    kh, kw, in_c, _ = shape
    fan_in = kh * kw * in_c
    gain = math.sqrt(2.0 / (1 + 5.0))  # leaky_relu gain with a=sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias(key: jax.Array, fan_in: int, out_c: int,
              dtype=jnp.float32) -> jnp.ndarray:
    """torch.nn.Conv2d's default bias init."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (out_c,), dtype, -bound, bound)
