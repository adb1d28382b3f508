"""Interleaved sinusoidal positional encoding.

Matches the reference layout (reference: models/utils.py:232-242): the
outputs are stacked on a new trailing axis and flattened so every input
dimension's ``[x, sin(f^0 x), cos(f^0 x), ..., sin(f^{L-1} x), cos(f^{L-1} x)]``
block stays contiguous — NOT the common NeRF frequency-major layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc(x: jnp.ndarray, L_embed: int, factor: float = 2.0,
           without_self: bool = False, mult_factor: float = 1.0) -> jnp.ndarray:
    """Encode ``x (..., D)`` to ``(..., D * (2L [+1]))`` interleaved per-dim."""
    parts = [] if without_self else [x]
    for i in range(L_embed):
        scaled = (factor ** i) * x * mult_factor
        parts.append(jnp.sin(scaled))
        parts.append(jnp.cos(scaled))
    stacked = jnp.stack(parts, axis=-1)  # (..., D, 2L[+1])
    return stacked.reshape(*x.shape[:-1], -1)
