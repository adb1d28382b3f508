"""Learning-rate schedules as pure functions of the global step.

Behavioral spec: reference models/utils.py:260-322 — a linear warmup
(start factor 1e-16) chained with one of {linear, cosine, cosine-hlfperiod,
exp, stop} decays via torch SequentialLR. Here each schedule is a pure
``f(step) -> lr`` so prune/grow optimizer rebuilds (which reset Adam moments)
never need scheduler "fast-forwarding" (reference models/model.py:175-179) —
the step is simply passed in.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_schedule(sched_cfg, max_steps: int, lr_factor: float = 1.0):
    """Returns f(step)->lr (jnp scalar). ``sched_cfg`` is e.g.
    ``training.lr.attn`` with fields type/base_lr/warmup/gamma."""
    base = float(sched_cfg.base_lr) * float(lr_factor)
    kind = sched_cfg.type
    warmup = int(sched_cfg.get("warmup", 0))
    if kind == "none":
        return lambda step: jnp.asarray(base, jnp.float32)

    start_factor = 1e-16 if warmup > 0 else 1.0

    def warmup_factor(t):
        if warmup <= 0:
            return jnp.asarray(1.0, jnp.float32)
        frac = jnp.minimum(t, warmup) / warmup
        return start_factor + (1.0 - start_factor) * frac

    if kind == "linear":
        T = max(max_steps - warmup, 1)
        decay = lambda u: 1.0 - jnp.minimum(u, T) / T
    elif kind == "cosine":
        T = max(max_steps - warmup, 1)
        decay = lambda u: (1.0 + jnp.cos(jnp.pi * u / T)) / 2.0
    elif kind == "cosine-hlfperiod":
        T = max(max_steps - warmup, 1) * 2
        decay = lambda u: (1.0 + jnp.cos(jnp.pi * u / T)) / 2.0
    elif kind == "exp":
        gamma = float(sched_cfg.gamma)
        decay = lambda u: gamma ** u
    elif kind == "stop":
        # StepLR(step_size=1, gamma=0): full lr for the first post-warmup
        # step, zero afterwards.
        decay = lambda u: jnp.where(u < 1, 1.0, 0.0)
    else:
        raise NotImplementedError(kind)

    def fn(step):
        t = jnp.asarray(step, jnp.float32)
        u = jnp.maximum(t - warmup, 0.0)
        factor = jnp.where(t < warmup, warmup_factor(t), decay(u))
        return jnp.asarray(base * factor, jnp.float32)

    return fn
