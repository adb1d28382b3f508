#!/usr/bin/env python
"""Per-stage chained timing of the flagship train step on the live device.

Attributes the step time across: selection+attention forward (evaluate),
full forward+loss, full step without LPIPS, and the full reference-recipe
step (MSE + 1e-2*LPIPS). Uses the same marginal two-window protocol as
bench.py (readback-synced chains; the difference removes dispatch and
readback constants, which matter through the axon tunnel).

Run with no args; prints one JSON line with milliseconds per stage. Keep it
the ONLY process touching the TPU while it runs (a second axon client can
stall the tunnel — observed round 3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _chain(fn, n1=5, n2=15):
    """Marginal seconds-per-call over two chained windows."""
    out = fn(0)
    _sync(out)
    t0 = time.perf_counter()
    for i in range(n1):
        out = fn(10 + i)
    _sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n2):
        out = fn(30 + i)
    _sync(out)
    t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / (n2 - n1)


def _sync(out):
    import jax
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[0]))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from papr_tpu.model.papr import create_model, evaluate, forward
    from papr_tpu.nn.mlp import policy_from_config
    from papr_tpu.train.step import make_opt_state, make_train_step
    from bench import _bench_loss_fn

    patch, points, k = 160, 30000, 20
    cfg = _flagship_cfg(patch=patch, points=points, k=k)
    policy = policy_from_config(cfg)
    params, state = create_model(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    rayo = jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 3.0)
    rayd = rng.normal(size=(1, patch, patch, 3)).astype(np.float32)
    rayd = jnp.asarray(rayd / np.linalg.norm(rayd, axis=-1, keepdims=True))
    target = jnp.asarray(rng.random((1, patch, patch, 3)).astype(np.float32))
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[None])

    res = {}

    # 1. attention-stage forward only (selection + kqv embedders + attention
    #    + fuse; no UNet/composite/loss).
    @jax.jit
    def attn_fwd(step):
        fused, attn = evaluate(params, state, cfg, rayo, rayd, policy=policy)
        return fused.sum() + attn.sum() + step * 0.0

    res["attn_fwd_ms"] = _chain(attn_fwd) * 1e3

    # 2. full forward (attention + UNet + composite) + MSE loss, no grad.
    @jax.jit
    def full_fwd(step):
        out = forward(params, state, cfg, rayo, rayd, c2w, policy=policy)
        return jnp.mean((out - target) ** 2) + step * 0.0

    res["full_fwd_mse_ms"] = _chain(full_fwd) * 1e3

    # 3. attention-stage forward+backward (grad wrt params through evaluate).
    @jax.jit
    def attn_grad(step):
        def f(p):
            fused, attn = evaluate(p, state, cfg, rayo, rayd, policy=policy)
            return fused.sum() + attn.sum() + step * 0.0
        return jax.grad(f)(params)

    res["attn_fwd_bwd_ms"] = _chain(attn_grad) * 1e3

    # 4 + 5. full train step, without and with the LPIPS term.
    for tag, with_lpips in (("step_mse_ms", False), ("step_lpips_ms", True)):
        p2 = jax.tree.map(jnp.array, params)
        opt = make_opt_state(cfg, p2)
        ts, _ = make_train_step(cfg, loss_fn=_bench_loss_fn(cfg, with_lpips),
                                donate=True)
        holder = {"p": p2, "o": opt}

        def one(step):
            holder["p"], holder["o"], loss, _ = ts(
                holder["p"], holder["o"], state, rayo, rayd, target, c2w,
                step)
            return loss

        res[tag] = _chain(one) * 1e3

    res = {k2: round(v, 2) for k2, v in res.items()}
    res["derived_bwd_opt_ms"] = round(res["step_mse_ms"]
                                      - res["full_fwd_mse_ms"], 2)
    res["derived_lpips_term_ms"] = round(res["step_lpips_ms"]
                                         - res["step_mse_ms"], 2)
    res["derived_unet_fwd_ms"] = round(res["full_fwd_mse_ms"]
                                       - res["attn_fwd_ms"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
