#!/usr/bin/env python
"""Per-stage device timing of the 800x800 render frame (VERDICT r4 item 4).

Decomposes the frame into three nested device programs and differences
their chained (async-dispatch, last-readback-synced) per-frame times:

  selection            = T[tile-mapped cull/top-k only]
  walks + fuse + gather = T[attention pass (run_unet=False)] - selection
  UNet + epilogue       = T[full frame pipeline] - attention pass

All three run the REAL entry points (the selection stage replicates the
eval-path knob resolution of model/papr.py::_attend; the attention pass is
train/step.py::_full_render_fn(run_unet=False); the full frame is
render_frame_async) over the same rotating-orbit poses, so the split stays
honest under tpu.int8_eval / tpu.cull_candidates_eval stacking — the
round-5 A/B levers. Round 4's stage table (docs/status_round4.md) was
measured by ad-hoc stage stubbing; this tool makes the split reproducible.

Env knobs (same as bench.py render mode): PAPR_INT8_EVAL,
PAPR_CULL_CAND_EVAL, PAPR_CULL_EARLY_EXIT, PAPR_BENCH_SMALL.
Keep it the only TPU client while it runs. Prints one JSON line (ms).
"""

import json
import os
import sys
import time

# Platform override BEFORE jax import (the axon TPU plugin ignores
# JAX_PLATFORMS): PAPR_PLATFORM=cpu forces CPU, e.g. for CI smoke runs.
if os.environ.get("PAPR_PLATFORM"):
    import jax as _jax
    _jax.config.update("jax_platforms", os.environ["PAPR_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _orbit(theta, radius=35.0):
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, 0, s, 0], [0, 1, 0, 0],
                    [-s, 0, c, 0], [0, 0, 0, 1]], np.float32)
    base = np.eye(4, dtype=np.float32)
    base[:3, 3] = [0, 0, radius]
    return rot @ base


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.nn.mlp import policy_from_config
    from papr_tpu.ops.geometry import get_rays_np
    from papr_tpu.ops.tile_cull import select_topk_culled
    from papr_tpu.train.step import _full_render_fn, render_frame_async

    small = bool(os.environ.get("PAPR_BENCH_SMALL"))
    H = W = 64 if small else 800
    th = tw = 64 if small else 160
    extra = {}
    if os.environ.get("PAPR_CULL_CAND_EVAL"):
        extra["cull_candidates_eval"] = int(os.environ["PAPR_CULL_CAND_EVAL"])
    if os.environ.get("PAPR_CULL_EARLY_EXIT"):
        extra["cull_early_exit"] = os.environ["PAPR_CULL_EARLY_EXIT"] != "0"
    if os.environ.get("PAPR_INT8_EVAL"):
        extra["int8_eval"] = os.environ["PAPR_INT8_EVAL"] != "0"
    cfg = _flagship_cfg(patch=th, points=512 if small else 30000,
                        k=8 if small else 20, tpu_extra=extra or None)
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    policy = policy_from_config(cfg)
    focal = 700.0 * max(H, W) / 800

    # Pre-build device-resident ray tiles for 8 orbit poses (the sel/attn
    # stages take tiles; rotating poses defeat dispatch dedup).
    n_poses = 2 if small else 8
    poses = [_orbit(2 * np.pi * i / n_poses + 0.03) for i in range(n_poses)]
    tile_sets, ray_origins = [], []
    ty, tx = H // th, W // tw
    for p in poses:
        rayo, rayd = get_rays_np(H, W, focal, focal, p[None])
        tiles = rayd.reshape(1, ty, th, tx, tw, 3).transpose(0, 1, 3, 2, 4, 5)
        tile_sets.append(jax.device_put(jnp.asarray(tiles)))
        ray_origins.append(jax.device_put(jnp.asarray(rayo)))

    # --- selection-only program: eval-path knob resolution as in
    # model/papr.py::_attend (exact_select branch).
    meta_k = int(cfg.get_path("geoms.points.select_k", 20))
    eps = float(cfg.eps)
    M = int(cfg.get_path("tpu.cull_candidates", 2048))
    blk = int(cfg.get_path("tpu.cull_block", 16))
    pf = str(cfg.get_path("tpu.cull_prefilter_eval", "packsort"))
    eblk = int(cfg.get_path("tpu.cull_block_eval", 0)) or blk
    me = cfg.get_path("tpu.cull_candidates_eval", "auto")
    M = int(me) if me != "auto" else M * max((eblk * eblk) // (blk * blk), 1)
    rc = float(cfg.get_path("tpu.cull_recall", 0.99))
    ee = bool(cfg.get_path("tpu.cull_early_exit", True))
    interp = jax.default_backend() != "tpu"

    @jax.jit
    def sel_frame(params, state, rayo, tiles):
        flat = tiles.reshape(ty * tx, th, tw, 3)

        def one(rd):
            return select_topk_culled(params["points"], state["alive"],
                                      rayo[0], rd, meta_k, M=M, block=eblk,
                                      eps=eps, interpret=interp,
                                      prefilter=pf, recall_target=rc,
                                      early_exit=ee)
        return jax.lax.map(one, flat)

    # extras=False: skip the untiled selected-points output (an HBM write
    # the full-frame path doesn't have — it would skew the decomposition).
    attn_fn = _full_render_fn(cfg, policy, False, run_unet=False)

    def t_chain(dispatch, n1, n2):
        """Marginal per-call seconds: async-chain n calls, readback one
        element of the last output; difference of two windows removes the
        dispatch+fetch constant (bench.py frame8_device methodology)."""
        def window(n, base):
            t0 = time.perf_counter()
            out = None
            for i in range(n):
                out = dispatch((base + i) % n_poses)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.ravel()[0])
            return time.perf_counter() - t0
        window(1, 0)                       # compile
        t1 = window(n1, 1)
        t2 = window(n2, 3)
        return max(t2 - t1, 1e-9) / (n2 - n1)

    n1, n2 = (1, 3) if small else (2, 6)
    t_sel = t_chain(lambda i: sel_frame(params, state, ray_origins[i],
                                        tile_sets[i]), n1, n2)
    print(f"profile_render: selection {t_sel*1e3:.1f} ms", file=sys.stderr,
          flush=True)
    t_attn = t_chain(lambda i: attn_fn(params, state, ray_origins[i],
                                       tile_sets[i]), n1, n2)
    print(f"profile_render: attention pass {t_attn*1e3:.1f} ms",
          file=sys.stderr, flush=True)
    t_full = t_chain(lambda i: render_frame_async(
        params, state, cfg, poses[i], focal, focal, H, W, th, tw), n1, n2)
    print(f"profile_render: full frame {t_full*1e3:.1f} ms", file=sys.stderr,
          flush=True)

    out = {
        "metric": "render_stage_ms",
        "shape": f"{H}x{W}",
        "knobs": {"int8_eval": bool(extra.get("int8_eval")),
                  "cull_candidates_eval": extra.get("cull_candidates_eval",
                                                    "auto")},
        "selection_ms": round(t_sel * 1e3, 1),
        "walks_fuse_gather_ms": round((t_attn - t_sel) * 1e3, 1),
        "unet_epilogue_ms": round((t_full - t_attn) * 1e3, 1),
        "frame_ms": round(t_full * 1e3, 1),
        "device_fps": round(1.0 / t_full, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
