#!/usr/bin/env python
"""Benchmark: training-step throughput on the flagship (chair-like) workload.

Measures the full jitted train step — top-k over the point cloud, k/q/v
embedders, attention, fusion, UNet, MSE loss, backward, per-group Adam — on
the reference's default workload shape (160x160 ray patch, 30k-point padded
cloud, k=20; configs/default.yml:22-28,9).

Prints ONE JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R}

vs_baseline normalizes against an estimated reference throughput of the
PyTorch implementation on A100 (~0.25 s/step at 160x160 -> ~102k rays/s; the
reference publishes no numbers, BASELINE.md). LPIPS is excluded from the
bench loss (pretrained VGG weights are not fetchable in this environment);
the LPIPS FLOPs are <2% of the step.
"""


# Platform override (the axon TPU plugin ignores JAX_PLATFORMS): set
# PAPR_PLATFORM=cpu to force CPU execution, e.g. for CI.
import os as _os
if _os.environ.get("PAPR_PLATFORM"):
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["PAPR_PLATFORM"])

import json
import time

import numpy as np

REFERENCE_RAYS_PER_SEC_A100_EST = 102_400.0


def bench_render():
    """Secondary metric (PAPR_BENCH=render): 800x800 render FPS."""
    import jax

    from __graft_entry__ import _flagship_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.ops.geometry import get_rays_np
    from papr_tpu.train.step import render_full_image

    cfg = _flagship_cfg(patch=160, points=30000, k=20)
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 0, 35.0]
    rayo, rayd = get_rays_np(800, 800, 700.0, 700.0, c2w[None])

    render_full_image(params, state, cfg, rayo, rayd, 100, 100)  # compile
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        out = render_full_image(params, state, cfg, rayo, rayd, 100, 100)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({"metric": "render_800x800_fps",
                      "value": round(1.0 / dt, 3), "unit": "frames/s",
                      "vs_baseline": round((1.0 / dt) / 0.25, 3)}))


def main():
    import jax

    from __graft_entry__ import _flagship_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import make_opt_state, make_train_step

    if _os.environ.get("PAPR_BENCH") == "render":
        return bench_render()

    small = bool(_os.environ.get("PAPR_BENCH_SMALL"))
    patch = 32 if small else 160
    cfg = _flagship_cfg(patch=patch, points=2048 if small else 30000,
                        k=8 if small else 20)

    params, state = create_model(cfg, jax.random.PRNGKey(0))
    opt_state = make_opt_state(cfg, params)
    train_step, _ = make_train_step(cfg, donate=True)

    rng = np.random.default_rng(0)
    rayo = jax.numpy.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 3.0)
    rayd = rng.normal(size=(1, patch, patch, 3)).astype(np.float32)
    rayd = jax.numpy.asarray(rayd / np.linalg.norm(rayd, axis=-1, keepdims=True))
    target = jax.numpy.asarray(rng.random((1, patch, patch, 3)).astype(np.float32))
    c2w = jax.numpy.asarray(np.eye(4, dtype=np.float32)[None])

    # Warmup / compile (hard sync: block_until_ready alone is unreliable
    # through the axon tunnel — force a host readback).
    for i in range(3):
        params, opt_state, loss, _ = train_step(
            params, opt_state, state, rayo, rayd, target, c2w, i)
    float(loss)

    # Marginal timing: two chained windows, one readback each, difference
    # removes dispatch/readback constants.
    def chain(n, base):
        nonlocal params, opt_state
        t0 = time.perf_counter()
        loss = None
        for i in range(n):
            params, opt_state, loss, _ = train_step(
                params, opt_state, state, rayo, rayd, target, c2w, base + i)
        float(loss)
        return time.perf_counter() - t0

    n1, n2 = (2, 6) if small else (5, 15)
    t1 = chain(n1, 10)
    t2 = chain(n2, 20)
    iters = n2 - n1
    dt = max(t2 - t1, 1e-6)

    rays_per_step = patch * patch
    rays_per_sec = rays_per_step * iters / dt
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_A100_EST, 3),
    }))


if __name__ == "__main__":
    main()
