#!/usr/bin/env python
"""Benchmark: training-step throughput on the flagship (chair-like) workload.

Measures the full jitted train step — top-k over the point cloud, k/q/v
embedders, attention, fusion, UNet, loss, backward, per-group Adam — on the
reference's default workload shape (160x160 ray patch, 30k-point padded
cloud, k=20; reference configs/default.yml:22-28,9).

The PRIMARY metric includes the LPIPS(VGG16) loss term like the reference
recipe (train.py:171, configs/default.yml:170-173: mse + 1e-2*lpips). When
pretrained weights are absent (no torchvision in this environment) the VGG
backbone runs with random weights — the compute path and FLOPs are identical,
so the timing is honest either way.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R, "train_rays_per_sec_no_lpips": N2,
   "render_800x800_fps": F}

vs_baseline divides by 102,400 rays/s — the estimated PyTorch reference on
A100 (160*160 rays / 0.25 s-per-step; derivation in BASELINE.md §Targets).
The reference publishes no numbers.

Each sub-metric runs in its own fresh process (PAPR_BENCH=train_lpips/train/
render): one config per process is the only reliable timing protocol through
the axon TPU tunnel, and it guarantees a single TPU client at a time.
"""


# Platform override (the axon TPU plugin ignores JAX_PLATFORMS): set
# PAPR_PLATFORM=cpu to force CPU execution, e.g. for CI.
import os as _os
if _os.environ.get("PAPR_PLATFORM"):
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["PAPR_PLATFORM"])

# Persistent compilation cache shared across the bench's child processes
# (and across bench invocations): repeat compiles of the same train/render
# programs become cache hits instead of multi-minute retraces. Harmless if
# the backend doesn't support it (JAX logs a warning and proceeds).
_CACHE_DIR = _os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))

import json
import subprocess
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC_A100_EST = 102_400.0  # 160*160 / 0.25s; BASELINE.md

_T0 = time.perf_counter()


def _stamp(msg: str):
    """Per-phase wall-clock stamps on stderr: a killed run still shows where
    the time went (VERDICT r4 weak #1 — BENCH_r04 died with no evidence)."""
    print(f"bench[{time.perf_counter() - _T0:8.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _bench_loss_fn(cfg, with_lpips: bool):
    """Reference loss recipe; random VGG weights if none are converted."""
    from papr_tpu.nn.mlp import policy_from_config
    from papr_tpu.train.losses import get_loss
    if not with_lpips:
        return None  # make_train_step builds mse-only from the cfg
    import jax
    from papr_tpu.model.lpips_jax import load_lpips_params, random_lpips_params
    try:
        lp = load_lpips_params()
        print("bench: lpips term with converted VGG weights", file=sys.stderr)
    except FileNotFoundError:
        lp = random_lpips_params(jax.random.PRNGKey(0))
        print("bench: lpips term with RANDOM VGG weights (identical FLOPs; "
              "no torchvision to convert the pretrained ones)", file=sys.stderr)
    from papr_tpu.config import Config
    losses = Config({"mse": 1.0, "lpips": 1e-2})
    return get_loss(losses, lpips_params=lp, policy=policy_from_config(cfg))


def bench_render(hw=None):
    """800x800 render FPS (NeRF-Synthetic eval resolution); ``hw`` overrides
    the frame shape (render_t2 mode: 640x1088, the factor-2 T&T eval shape
    of reference dataset/load_t2.py:29 + configs/t2)."""
    import jax

    from __graft_entry__ import _flagship_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.ops.geometry import get_rays_np
    from papr_tpu.train.step import render_full_image

    small = bool(_os.environ.get("PAPR_BENCH_SMALL"))
    side = 160 if small else 800
    if hw and small:
        hw = (hw[0] // 4, hw[1] // 4)   # keep the t2 aspect, CI-runnable
    H, W = hw if hw else (side, side)
    # PAPR_CULL_CAND_EVAL pins tpu.cull_candidates_eval for A/B runs (since
    # round 4 the cap genuinely narrows the cull kernel's extract loop);
    # PAPR_CULL_EARLY_EXIT=0 forces the full extract loop.
    extra = {}
    if _os.environ.get("PAPR_CULL_CAND_EVAL"):
        extra["cull_candidates_eval"] = int(_os.environ["PAPR_CULL_CAND_EVAL"])
    if _os.environ.get("PAPR_CULL_EARLY_EXIT"):
        extra["cull_early_exit"] = (
            _os.environ["PAPR_CULL_EARLY_EXIT"] != "0")
    # PAPR_INT8_EVAL=1 quantizes the eval walks to int8 (tpu.int8_eval)
    if _os.environ.get("PAPR_INT8_EVAL"):
        extra["int8_eval"] = _os.environ["PAPR_INT8_EVAL"] != "0"
    cfg = _flagship_cfg(patch=160, points=2048 if small else 30000,
                        k=8 if small else 20, tpu_extra=extra or None)
    params, state = create_model(cfg, jax.random.PRNGKey(0))

    def orbit(theta, radius=35.0):
        """Camera on a y-axis orbit looking inward — the serving loop's
        actual pose sequence. Rotating poses (a) exercise cull-candidate
        variance across frames and (b) defeat dispatch dedup on networked
        TPU runtimes (identical dispatches can be cached -> fake speeds)."""
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, 0, s, 0], [0, 1, 0, 0],
                        [-s, 0, c, 0], [0, 0, 0, 1]], np.float32)
        base = np.eye(4, dtype=np.float32)
        base[:3, 3] = [0, 0, radius]
        return rot @ base

    c2w = orbit(0.0)
    rayo, rayd = get_rays_np(H, W, 700.0 * max(H, W) / 800,
                             700.0 * max(H, W) / 800, c2w[None])

    # Frame delivery = c2w in, uint8 RGB out (render_frame: on-device ray
    # generation, one dispatch, quantized payload — the serving path).
    # HEADLINE = pipelined throughput (render_frames: fetch of frame i
    # overlaps device compute of frame i+1, the steady-state serving loop);
    # "serial_fps" is the unpipelined per-frame latency (like-for-like with
    # the round-2/3 headline methodology), and "fp32_fetch_fps" the
    # host-rays-in / fp32-frame-out render_full_image variant (round-1
    # methodology) so every older number stays comparable.
    from papr_tpu.train.step import render_frame, render_frames
    th = 160 if small else H
    tw = 160 if small else W
    focal = 700.0 * max(H, W) / 800

    def frame8(n):
        poses = [orbit(2 * np.pi * i / max(n, 1)) for i in range(n)]
        t0 = time.perf_counter()
        for p in poses:
            render_frame(params, state, cfg, p, focal, focal, H, W,
                         th, tw)
        return (time.perf_counter() - t0) / n

    def frame8_pipe(n):
        poses = [orbit(2 * np.pi * i / max(n, 1)) for i in range(n)]
        t0 = time.perf_counter()
        for _ in render_frames(params, state, cfg, poses, focal, focal,
                               H, W, th, tw):
            pass
        return (time.perf_counter() - t0) / n

    def frame32(n):
        t0 = time.perf_counter()
        for _ in range(n):
            render_full_image(params, state, cfg, rayo, rayd, th, tw,
                              rgb_only=True)
        return (time.perf_counter() - t0) / n

    def frame8_device(n):
        # Device-serial: dispatch every frame async, sync once at the end.
        # The frames execute back-to-back on the chip, so total/n is pure
        # device time — the tunnel's ~145 ms/frame dispatch+fetch floor
        # (measured with a trivial kernel, docs/status_round4.md) drops
        # out. On a locally-attached TPU host, serial ≈ device + ~2 ms.
        # The sync is a host READBACK of the last frame: block_until_ready
        # can return early through the axon tunnel (same caveat as the
        # train bench), and the device executes dispatches in order, so
        # the last frame landing on the host bounds all n.
        from papr_tpu.train.step import render_frame_async
        poses = [orbit(2 * np.pi * i / n + 0.05) for i in range(n)]
        t0 = time.perf_counter()
        outs = [render_frame_async(params, state, cfg, p, focal, focal,
                                   H, W, th, tw) for p in poses]
        np.asarray(outs[-1])
        return (time.perf_counter() - t0) / n

    # PAPR_RENDER_MODES limits which variants run (comma list of
    # serial,device,pipe,fp32) — A/B experiments only pay the compiles
    # they need; default runs everything.
    want = set((_os.environ.get("PAPR_RENDER_MODES") or
                "serial,device,pipe,fp32").split(","))
    out = {"metric": f"render_{H}x{W}_fps", "unit": "frames/s"}
    if want & {"serial", "pipe"}:
        frame8(1)                       # compile
    if "serial" in want:
        out["serial_fps"] = round(1.0 / frame8(3), 3)
        _stamp(f"render serial_fps {out['serial_fps']}")
    if "device" in want:
        if not (want & {"serial", "pipe"}):
            frame8_device(1)            # compile
        out["device_fps"] = round(1.0 / frame8_device(4), 3)
        _stamp(f"render device_fps {out['device_fps']}")
    if "pipe" in want:
        out["value"] = round(1.0 / frame8_pipe(4), 3)
        _stamp(f"render pipelined fps {out['value']}")
    if "fp32" in want:
        frame32(1)                      # compile fp32 variant
        out["fp32_fetch_fps"] = round(1.0 / frame32(3), 3)
        _stamp(f"render fp32_fetch_fps {out['fp32_fetch_fps']}")
    if "value" not in out:              # A/B runs: headline = device rate
        out["value"] = out.get("device_fps", out.get("serial_fps"))
    print(json.dumps(out))


def bench_train(with_lpips: bool):
    import jax

    from __graft_entry__ import _flagship_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import make_opt_state, make_train_step

    small = bool(_os.environ.get("PAPR_BENCH_SMALL"))
    patch = 32 if small else 160
    cfg = _flagship_cfg(patch=patch, points=2048 if small else 30000,
                        k=8 if small else 20)

    _stamp("imports + config done")
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    _stamp("create_model done")
    opt_state = make_opt_state(cfg, params)
    loss_fn = _bench_loss_fn(cfg, with_lpips)
    jax.block_until_ready(opt_state)
    _stamp("opt state + loss params done")
    train_step, _ = make_train_step(cfg, loss_fn=loss_fn, donate=True)

    rng = np.random.default_rng(0)
    rayo = jax.numpy.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 3.0)
    rayd = rng.normal(size=(1, patch, patch, 3)).astype(np.float32)
    rayd = jax.numpy.asarray(rayd / np.linalg.norm(rayd, axis=-1, keepdims=True))
    target = jax.numpy.asarray(rng.random((1, patch, patch, 3)).astype(np.float32))
    c2w = jax.numpy.asarray(np.eye(4, dtype=np.float32)[None])

    # Warmup / compile (hard sync: block_until_ready alone is unreliable
    # through the axon tunnel — force a host readback). Timed separately so
    # a compile-time regression is visible as such (BENCH_r04 postmortem).
    tc = time.perf_counter()
    params, opt_state, loss, _ = train_step(
        params, opt_state, state, rayo, rayd, target, c2w, 0)
    float(loss)
    _stamp(f"train_step first call (trace+compile+run): "
           f"{time.perf_counter() - tc:.1f}s")
    tc = time.perf_counter()
    for i in range(1, 3):
        params, opt_state, loss, _ = train_step(
            params, opt_state, state, rayo, rayd, target, c2w, i)
    float(loss)
    _stamp(f"train_step warm steps 2-3: {time.perf_counter() - tc:.2f}s")

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
    _stamp(f"steady-state windows: {t1:.2f}s/{n1} + {t2:.2f}s/{n2}")
    iters = n2 - n1
    dt = max(t2 - t1, 1e-6)

    rays_per_sec = patch * patch * iters / dt
    name = ("train_rays_per_sec_per_chip" if with_lpips
            else "train_rays_per_sec_no_lpips")
    print(json.dumps({"metric": name, "value": round(rays_per_sec, 1),
                      "unit": "rays/s"}))


# Total wall-clock budget for the orchestrated run. The driver kills the
# bench at an unknown horizon (BENCH_r04 died at rc=124 with nothing
# printed); staying inside ~20 min with modes skipped loudly beats a
# complete-but-dead run every time.
_BUDGET_S = float(_os.environ.get("PAPR_BENCH_BUDGET", "1200"))


def _budget_left():
    return _BUDGET_S - (time.perf_counter() - _T0)


def _run_mode(mode: str, timeout: float = 600):
    """One sub-metric in a fresh process (one config per process: required
    for trustworthy timing through the tunnel, and keeps a single TPU
    client alive at a time). Bounded by the remaining total budget; a
    timeout or failure returns None instead of raising."""
    timeout = min(timeout, _budget_left())
    if timeout < 30:
        _stamp(f"mode {mode} SKIPPED: {_budget_left():.0f}s of the "
               f"{_BUDGET_S:.0f}s budget left")
        return None
    _stamp(f"mode {mode} starting (timeout {timeout:.0f}s)")
    env = dict(_os.environ, PAPR_BENCH=mode, PAPR_BENCH_CHILD="1")
    try:
        r = subprocess.run([sys.executable, _os.path.abspath(__file__)],
                           capture_output=True, text=True, timeout=timeout,
                           cwd=_os.path.dirname(_os.path.abspath(__file__)),
                           env=env)
    except subprocess.TimeoutExpired as e:
        tail = (e.stderr or b"")
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        sys.stderr.write(tail[-2000:])
        _stamp(f"mode {mode} TIMED OUT after {timeout:.0f}s")
        return None
    sys.stderr.write(r.stderr[-2000:])
    _stamp(f"mode {mode} done rc={r.returncode}")
    if r.returncode != 0:
        print(f"bench: mode {mode} failed rc={r.returncode}", file=sys.stderr)
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    return None


def main():
    mode = _os.environ.get("PAPR_BENCH", "")
    if not mode and _os.environ.get("PAPR_BENCH_CHILD"):
        # Recursion guard: a child that lost its PAPR_BENCH env must never
        # re-orchestrate (that is a fork bomb).
        raise SystemExit("bench: child process without PAPR_BENCH")
    if mode == "render":
        return bench_render()
    if mode == "render_tuned":
        # Stacked speed levers (status_round5.md A/B): int8 eval walks +
        # candidate cap 512, device-rate only. Reported alongside the
        # sound defaults — the levers stay default-off because the cap is
        # a recall trade on unseen geometry and int8 an approximation
        # (tools/cap_quality_ab.py / tools/int8_quality_ab.py quantify
        # both per trained checkpoint).
        _os.environ.setdefault("PAPR_RENDER_MODES", "device")
        _os.environ["PAPR_INT8_EVAL"] = "1"
        _os.environ.setdefault("PAPR_CULL_CAND_EVAL", "512")
        return bench_render()
    if mode == "render_t2":
        # T&T eval shape (1280x2176 native at factor 2). Not part of the
        # orchestrated line — run explicitly: PAPR_BENCH=render_t2.
        return bench_render(hw=(640, 1088))
    if mode == "train":
        return bench_train(with_lpips=False)
    if mode == "train_lpips":
        return bench_train(with_lpips=True)

    # Orchestrate: each metric in its own process. The combined JSON line is
    # printed IMMEDIATELY once the primary metric lands, then reprinted
    # enriched after every optional mode — a driver kill at any later point
    # still leaves the last complete line on stdout (parsers take the last
    # JSON line).
    small = bool(_os.environ.get("PAPR_BENCH_SMALL"))
    _stamp(f"orchestrating; budget {_BUDGET_S:.0f}s; "
           f"compilation cache at {_CACHE_DIR}")
    # The axon backend's server-side compile of the train step is 30-600 s
    # (measured spread, docs/status_round5.md) and invisible to the client
    # until the first execution returns — give the primary the headroom.
    primary = _run_mode("train_lpips", timeout=900)
    if primary is None:
        raise SystemExit("bench: primary metric failed")
    out = {
        "metric": "train_rays_per_sec_per_chip",
        "value": primary["value"],
        "unit": "rays/s",
        "vs_baseline": round(primary["value"] / REFERENCE_RAYS_PER_SEC_A100_EST, 3),
    }
    print(json.dumps(out), flush=True)
    # Secondary metrics only on real runs: CPU-CI (PAPR_BENCH_SMALL) keeps to
    # the primary to stay inside the test budget (~2.5 min/mode on CPU).
    if not small:
        render = _run_mode("render")
        if render:
            out["render_800x800_fps"] = render["value"]
            if "serial_fps" in render:
                out["render_800x800_fps_serial"] = render["serial_fps"]
            if "device_fps" in render:
                out["render_800x800_fps_device"] = render["device_fps"]
            if "fp32_fetch_fps" in render:
                out["render_800x800_fps_fp32_fetch"] = render["fp32_fetch_fps"]
            print(json.dumps(out), flush=True)
        no_lpips = _run_mode("train")
        if no_lpips:
            out["train_rays_per_sec_no_lpips"] = no_lpips["value"]
            print(json.dumps(out), flush=True)
        tuned = _run_mode("render_tuned")
        if tuned:
            out["render_800x800_fps_device_tuned"] = tuned["value"]
            print(json.dumps(out), flush=True)
    _stamp("all modes done")


if __name__ == "__main__":
    main()
