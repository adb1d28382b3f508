"""Per-group Adam with per-group schedules, as one jittable update.

Behavioral spec: reference models/model.py:117-192 — one torch Adam (+LR
scheduler) per parameter group. Semantics preserved:

  * groups: points / attn / points_influ_scores / pc_feats / mapping_mlp /
    renderer / bkg_feats (bkg only when learnable); ``fix_keys`` removes
    groups (reference models/model.py:169-173);
  * weight_decay is torch-Adam style L2 folded into the gradient;
  * a prune/grow event rebuilds the optimizer: all moments reset, bias
    correction restarts at t=1, while the schedule keeps following the
    global step (the reference fast-forwards rebuilt schedulers).

Implemented directly (not optax) because the bias-correction counter must be
resettable independently of the schedule step — torch restarts t at rebuild.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from .schedules import make_schedule

# param pytree top-level key -> (optimizer-group name, lr-config name).
# Group names match the reference's optimizer dict (so fix_keys work as-is).
GROUPS = {
    "points": ("points", "points"),
    "attn": ("attn", "attn"),
    "points_influ_scores": ("points_influ_scores", "points_influ_scores"),
    "pc_feats": ("pc_feats", "feats"),
    "mapping_mlp": ("mapping_mlp", "mapping_mlp"),
    "renderer": ("renderer", "generator"),
    "bkg_feats": ("bkg_feats", "bkg_feats"),
}

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


@dataclass(frozen=True)
class GroupSpec:
    name: str
    lr_fn: Callable
    weight_decay: float


def build_group_specs(cfg) -> dict[str, GroupSpec]:
    lr_opt = cfg.training.lr
    fixed = set(cfg.training.fix_keys)
    steps = int(cfg.training.steps)
    specs: dict[str, GroupSpec] = {}
    for top_key, (group, lr_name) in GROUPS.items():
        if group in fixed:
            continue
        if group == "bkg_feats" and not cfg.geoms.background.learnable:
            continue
        gcfg = lr_opt[lr_name]
        specs[top_key] = GroupSpec(
            name=group,
            lr_fn=make_schedule(gcfg, steps, lr_opt.lr_factor),
            weight_decay=float(gcfg.get("weight_decay", 0) or 0.0),
        )
    return specs


def init_opt_state(params: dict, specs: dict[str, GroupSpec]) -> dict:
    # One jitted program for the whole tree: eager zeros_like costs a
    # compile round-trip PER LEAF on remote-compile backends.
    def build(params):
        state = {}
        for key in params:
            if key not in specs:
                continue
            zeros = jax.tree.map(jnp.zeros_like, params[key])
            state[key] = {"m": zeros,
                          "v": jax.tree.map(jnp.zeros_like, params[key]),
                          "t": jnp.zeros((), jnp.int32)}
        return state
    return jax.jit(build)(params)


def apply_updates(params: dict, grads: dict, opt_state: dict,
                  specs: dict[str, GroupSpec], step) -> tuple[dict, dict]:
    """One Adam step per group; ``step`` is the global schedule step."""
    new_params = dict(params)
    new_state = dict(opt_state)
    for key, spec in specs.items():
        if key not in params:
            continue
        lr = spec.lr_fn(step)
        st = opt_state[key]
        t = st["t"] + 1
        tf = t.astype(jnp.float32)
        bc1 = 1.0 - ADAM_B1 ** tf
        bc2 = 1.0 - ADAM_B2 ** tf

        def upd(p, g, m, v):
            if spec.weight_decay:
                g = g + spec.weight_decay * p
            m = ADAM_B1 * m + (1 - ADAM_B1) * g
            v = ADAM_B2 * v + (1 - ADAM_B2) * (g * g)
            mhat = m / bc1
            vhat = v / bc2
            p = p - lr * mhat / (jnp.sqrt(vhat) + ADAM_EPS)
            return p, m, v

        flat_p, tree = jax.tree.flatten(params[key])
        flat_g = jax.tree.leaves(grads[key])
        flat_m = jax.tree.leaves(st["m"])
        flat_v = jax.tree.leaves(st["v"])
        out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
        new_params[key] = jax.tree.unflatten(tree, [o[0] for o in out])
        new_state[key] = {"m": jax.tree.unflatten(tree, [o[1] for o in out]),
                          "v": jax.tree.unflatten(tree, [o[2] for o in out]),
                          "t": t}
    return new_params, new_state


def current_lrs(specs: dict[str, GroupSpec], step: int) -> dict[str, float]:
    return {spec.name: float(spec.lr_fn(step)) for spec in specs.values()}
