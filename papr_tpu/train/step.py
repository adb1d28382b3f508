"""Jitted training step and tiled full-image rendering.

TPU-native redesign of the reference hot loop (train.py:155-179):

  * ONE jitted, donated train step — forward, loss (MSE + LPIPS), backward,
    per-group Adam + schedules — instead of torch eager + GradScaler;
  * optional data/ray sharding over a device mesh: rays are sharded for the
    attention stage and gathered (XLA inserts the collective) before the UNet
    that needs the whole patch, mirroring the reference's tile-then-full-UNet
    dataflow (train.py:59-70);
  * full-image eval renders fixed-shape ray tiles (pad + crop) so every tile
    hits the same compiled executable (the reference's variable edge tiles
    would recompile, train.py:59-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model.papr import (evaluate, forward, model_meta,
                          render_foreground)
from ..nn.activations import build_activation
from ..nn.mlp import policy_from_config
from .losses import get_loss
from .optim import apply_updates, build_group_specs, init_opt_state


def make_train_step(cfg, loss_fn=None, sharding=None, donate: bool = True):
    """Build the jitted step: (params, opt_state, state, batch_arrays, step)
    -> (params, opt_state, loss, pred)."""
    policy = policy_from_config(cfg)
    specs = build_group_specs(cfg)
    last_act = build_activation(cfg.models.last_act)
    if loss_fn is None:
        loss_fn = get_loss(cfg.training.losses, policy=policy)
    # Loss weights (e.g. the 59 MB LPIPS VGG backbone) ride into the jit as a
    # RUNTIME pytree argument, not closure constants: XLA constant-folds
    # inlined weights through the conv tower, which pushed the remote TPU
    # compile of the LPIPS step to ~28 min (vs minutes as parameters).
    loss_rt = getattr(loss_fn, "params", None) or None
    if loss_rt is not None:
        if sharding is not None:       # replicate once over the mesh
            loss_rt = jax.device_put(loss_rt, sharding.replicated)
        else:
            loss_rt = jax.tree.map(jnp.asarray, loss_rt)
    # Embedder dropout (reference models/attn.py:108-117): active only when a
    # config asks for it; the per-step rng folds the global step into a
    # seed-derived key so resumed runs replay the same masks.
    e = cfg.models.attn.embed
    use_dropout = any(float(e[n].dropout_ff) > 0 for n in ("key", "query", "value"))
    base_key = jax.random.PRNGKey(int(cfg.seed)) if use_dropout else None

    def step_fn(params, opt_state, state, rayo, rayd, target, c2w, step,
                shading_code=None, loss_params=None):
        if sharding is not None:
            rayd = jax.lax.with_sharding_constraint(rayd, sharding.rays)
            target = jax.lax.with_sharding_constraint(target, sharding.rays)
        dropout_rng = (jax.random.fold_in(base_key, step)
                       if use_dropout else None)

        def compute_loss(p):
            out = forward(p, state, cfg, rayo, rayd, c2w,
                          shading_code=shading_code, policy=policy,
                          dropout_rng=dropout_rng,
                          mesh=sharding.mesh if sharding is not None else None)
            out = last_act(out)
            if sharding is not None:
                out = jax.lax.with_sharding_constraint(out, sharding.replicated)
            loss = loss_fn(out, target, loss_params)
            return loss, out

        (loss, pred), grads = jax.value_and_grad(compute_loss, has_aux=True)(params)
        params_new, opt_state_new = apply_updates(params, grads, opt_state,
                                                  specs, step)
        return params_new, opt_state_new, loss, pred

    donate_args = (0, 1) if donate else ()
    jitted = jax.jit(step_fn, donate_argnums=donate_args)
    if loss_rt is None:
        return jitted, specs

    def with_loss_params(params, opt_state, state, rayo, rayd, target, c2w,
                         step, shading_code=None):
        return jitted(params, opt_state, state, rayo, rayd, target, c2w,
                      step, shading_code, loss_rt)

    return with_loss_params, specs


def make_opt_state(cfg, params):
    return init_opt_state(params, build_group_specs(cfg))


# ---------------------------------------------------------------- rendering --

def _render_mesh(cfg):
    """The ('data', 'rays') mesh for SHARDED tile rendering, or None.

    When ``tpu.mesh`` names more than one device, full-image renders shard
    the flattened tile list over every mesh device (the reference's tiled
    eval, test.py:76-87, is embarrassingly parallel over tiles) and each
    device keeps the full Pallas fast path (``local=True``) instead of
    demoting to unfused XLA. ``tpu.force_local`` opts out (single-device
    serving on a multi-chip host)."""
    data = int(cfg.get_path("tpu.mesh.data", 1))
    rays = int(cfg.get_path("tpu.mesh.rays", 1))
    if data * rays <= 1 or bool(cfg.get_path("tpu.force_local", False)):
        return None
    if jax.device_count() < data * rays:
        return None
    from ..parallel.mesh import make_mesh
    return make_mesh(data, rays)


def _sharded_tile_attend(params, state, cfg, policy, rayo, flat, mesh,
                         quant_params=None):
    """Tile-sharded attention pass: flat (N, T, th, tw, 3) tiles spread over
    every mesh device; each device lax.maps its local tiles through
    ``evaluate`` with the Pallas kernels live. Returns (f, a, s) shaped like
    the single-device lax.map-over-tiles pass. ``quant_params`` (frame-level
    int8 calibration) is replicated to every device — identical quantization
    on every tile keeps mesh renders bit-equal to single-device ones."""
    from jax.sharding import PartitionSpec as P

    N, T, th, tw, _ = flat.shape
    D = mesh.size
    G = N * T
    Gp = -(-G // D) * D
    # Pad the global tile list to a device multiple by wrapping (padded
    # results are cropped; wrapped tiles are valid rays so no NaN hazard).
    gidx = jnp.arange(Gp) % G
    tiles_g = flat.reshape(G, th, tw, 3)[gidx]
    rayo_g = jnp.repeat(rayo, T, axis=0)[gidx]

    def local_fn(p, s, o_loc, t_loc, qp):
        def one_tile(args):
            o, rd = args
            fused, attn, sel = evaluate(p, s, cfg, o[None], rd[None],
                                        policy=policy, with_selected=True,
                                        local=True, quant_params=qp)
            return fused[0], attn[0], sel[0]

        return jax.lax.map(one_tile, (o_loc, t_loc))

    spec = P(("data", "rays"))
    f, a, s = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), spec, spec, P()),
        out_specs=(spec, spec, spec),
        check_vma=False)(params, state, rayo_g, tiles_g, quant_params)
    unpad = lambda x: x[:G].reshape(N, T, *x.shape[1:])
    return unpad(f), unpad(a), unpad(s)


def _full_render_fn(cfg, policy, extras: bool, run_unet: bool = True,
                    rgb8: bool = False, _cache={}):
    """One jitted dispatch for the COMPLETE full-image render: tiled
    attention pass (lax.map sequences tiles device-side, bounding memory like
    the reference's python tile loop, train.py:59-67), untiling, the
    full-image UNet, background compositing and last activation — nothing
    round-trips to the host in between. With ``extras`` the fused features /
    attention / selected points are also returned (exposure resampling,
    depth, featattn plots); plain renders return just foreground+rgb."""
    # The cfg object itself is kept in the cache value: a live reference
    # guarantees id(cfg) is never recycled for a different config, so a
    # long-lived process can't hit a stale jitted closure. The cache is a
    # bounded LRU — evicted entries drop their cfg pin, so many-config
    # processes (tests) don't accumulate closures forever.
    key = (id(cfg), extras, run_unet, rgb8)
    if key in _cache:
        _cache[key] = _cache.pop(key)               # refresh recency
    else:
        mesh = _render_mesh(cfg)

        @jax.jit
        def fn(params, state, rayo, rayd_tiles, gamma=None, beta=None):
            return _tiled_render_body(params, state, cfg, policy, rayo,
                                      rayd_tiles, gamma, beta, extras,
                                      run_unet, rgb8, mesh=mesh)

        _cache[key] = (cfg, fn)
        _evict_lru(_cache)
    return _cache[key][1]


_JIT_CACHE_CAP = 8


def _evict_lru(cache: dict, cap: int = _JIT_CACHE_CAP) -> None:
    while len(cache) > cap:
        cache.pop(next(iter(cache)))


def _tiled_render_body(params, state, cfg, policy, rayo, rayd_tiles,
                       gamma, beta, extras: bool, run_unet: bool, rgb8: bool,
                       mesh=None):
    """Tiled attention pass + full-image UNet + composite, all device-side
    (traced under the caller's jit). With a >1-device ``mesh`` the tile list
    is sharded over the mesh (``_sharded_tile_attend``) so every device runs
    the Pallas fast path; the UNet stage consumes the gathered feature map
    (XLA inserts the all-gather), mirroring the reference's tile-then-
    full-UNet split (train.py:59-70)."""
    meta = model_meta(cfg)
    N, ty, tx, th, tw, _ = rayd_tiles.shape
    flat = rayd_tiles.reshape(N, ty * tx, th, tw, 3)

    # tpu.int8_eval: calibrate + quantize the walks ONCE per frame instead
    # of inside every tile's trace (eval_quant_params — the per-tile
    # self-calibration cost ate most of the int8 win, status_round5.md).
    qp = None
    if (bool(cfg.get_path("tpu.int8_eval", False))
            and bool(cfg.get_path("tpu.eval_fused", True))):
        from ..model.papr import eval_quant_params
        all_rays = flat.reshape(-1, 3)
        stride = max(1, all_rays.shape[0] // 1024)
        qp = eval_quant_params(params, state, cfg, rayo[0],
                               all_rays[::stride], policy=policy)

    if mesh is not None and mesh.size > 1:
        f, a, s = _sharded_tile_attend(params, state, cfg, policy, rayo,
                                       flat, mesh, qp)
    else:
        def per_image(args):
            o, tiles = args

            def one_tile(rd):
                fused, attn, sel = evaluate(
                    params, state, cfg, o[None], rd[None],
                    policy=policy, with_selected=True, quant_params=qp)
                return fused[0], attn[0], sel[0]

            return jax.lax.map(one_tile, tiles)

        f, a, s = jax.lax.map(per_image, (rayo, flat))

    def untile(x):
        x = x.reshape(N, ty, tx, th, tw, *x.shape[4:])
        x = jnp.moveaxis(x, 2, 3)
        return x.reshape(N, ty * th, tx * tw, *x.shape[5:])

    fused = untile(f)          # (N, Hp, Wp, 1, C)
    attn = untile(a)           # (N, Hp, Wp, k+1, 1)
    if not run_unet:           # attention-only (cIMLE resampling)
        if not extras:         # skip the (N,Hp,Wp,K,3) selected-points
            return fused, attn  # untile+write (stage profiling)
        return fused, attn, untile(s)
    if meta.use_renderer:
        fg = render_foreground(params, cfg, fused[..., 0, :],
                               gamma, beta, policy)[..., None, :]
    else:
        fg = fused
    bkg_attn = attn[..., -1:, :]
    bkg = params["bkg_feats"][0]
    if cfg.models.normalize_topk_attn:
        rgb = fg * (1 - bkg_attn) + bkg * bkg_attn
    else:
        rgb = fg + bkg * bkg_attn
    rgb = build_activation(cfg.models.last_act)(rgb[..., 0, :])
    if rgb8:
        # Display/PNG payload: quantize on device so the host fetch
        # is 4x smaller (frame delivery, not a metrics path).
        rgb = jnp.round(jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    if extras:
        return rgb, fg[..., 0, :], bkg_attn[..., 0, :], fused, attn, untile(s)
    return rgb, fg[..., 0, :], bkg_attn[..., 0, :]


def _frame_fn(cfg, policy, H: int, W: int, tile_h: int, tile_w: int,
              _cache={}):
    """Fully-device frame pipeline: c2w + focal in (16 + 2 floats up the
    wire), uint8 RGB out. Ray generation (reference dataset/utils.py:81-96
    pixel-center convention), edge-padded tiling, attention, UNet, composite
    and quantization all run in ONE jit — nothing image-sized crosses
    host->device, which matters on networked TPU setups where the per-frame
    rayd upload would otherwise rival the device time."""
    key = (id(cfg), H, W, tile_h, tile_w)
    if key in _cache:
        _cache[key] = _cache.pop(key)               # refresh recency
        return _cache[key][1]
    ph = -(-H // tile_h) * tile_h - H
    pw = -(-W // tile_w) * tile_w - W
    Hp, Wp = H + ph, W + pw
    ty, tx = Hp // tile_h, Wp // tile_w
    mesh = _render_mesh(cfg)

    @jax.jit
    def fn(params, state, c2w, focal):
        from ..ops.geometry import get_rays_jnp
        rayo, rayd = get_rays_jnp(H, W, c2w, focal)         # (1,3),(H,W,3)
        rayd = jnp.pad(rayd, ((0, ph), (0, pw), (0, 0)), mode="edge")
        tiles = rayd.reshape(ty, tile_h, tx, tile_w, 3).transpose(
            0, 2, 1, 3, 4)[None]                            # (1,ty,tx,th,tw,3)
        rgb = _tiled_render_body(params, state, cfg, policy, rayo,
                                 tiles, None, None, False, True, True,
                                 mesh=mesh)[0]
        return rgb[0, :H, :W]

    _cache[key] = (cfg, fn)
    _evict_lru(_cache)
    return fn


def render_frame_async(params, state, cfg, c2w, focal_x: float,
                       focal_y: float, H: int, W: int, tile_h: int = 0,
                       tile_w: int = 0, policy=None):
    """Dispatch one frame and return the ON-DEVICE uint8 array without
    fetching it. jax's async dispatch returns immediately; a serving loop
    can therefore overlap the host fetch of frame i with the device compute
    of frame i+1 (double buffering) — on networked TPU setups the frame
    transfer is a visible slice of the serial per-frame latency, and this
    hides it entirely at steady state."""
    policy = policy or policy_from_config(cfg)
    fn = _frame_fn(cfg, policy, H, W, tile_h or H, tile_w or W)
    focal = np.asarray([focal_x, focal_y], np.float32)
    return fn(params, state, jnp.asarray(np.asarray(c2w).astype(np.float32)),
              jnp.asarray(focal))


def render_frame(params, state, cfg, c2w, focal_x: float, focal_y: float,
                 H: int, W: int, tile_h: int = 0, tile_w: int = 0,
                 policy=None) -> np.ndarray:
    """One-call frame delivery: (4,4) c2w -> uint8 (H, W, 3) RGB.

    The serving-path analogue of ``render_full_image`` (which keeps the
    host-ray interface for dataset-driven eval): rays are generated on
    device from the camera matrix, so the only per-frame upload is the
    camera pose."""
    return np.asarray(render_frame_async(params, state, cfg, c2w, focal_x,
                                         focal_y, H, W, tile_h, tile_w,
                                         policy))


def render_frames(params, state, cfg, c2ws, focal_x: float, focal_y: float,
                  H: int, W: int, tile_h: int = 0, tile_w: int = 0,
                  policy=None):
    """Pipelined multi-frame delivery: yields uint8 (H, W, 3) frames for a
    sequence of camera poses, overlapping each frame's host fetch with the
    next frame's device compute (queue depth 1). Steady-state throughput is
    max(device_time, fetch_time) per frame instead of their sum — the
    camera-path / video serving loop (reference test.py renders pose
    sequences the same way, frame by frame)."""
    pending = None
    for c2w in c2ws:
        fut = render_frame_async(params, state, cfg, c2w, focal_x, focal_y,
                                 H, W, tile_h, tile_w, policy)
        if pending is not None:
            yield np.asarray(pending)
        pending = fut
    if pending is not None:
        yield np.asarray(pending)


def render_full_image(params, state, cfg, rayo, rayd, tile_h: int,
                      tile_w: int, policy=None, with_depth: bool = False,
                      gamma=None, beta=None, with_extras: bool = None,
                      attention_only: bool = False, rgb_only: bool = False,
                      rgb_uint8: bool = False):
    """Tiled attention pass + one full-image UNet pass (reference
    train.py:29-87 / test.py:45-104). Returns dict of numpy arrays.

    By default only rgb/foreground/bkg_attn cross back to the host; pass
    ``with_depth``/``with_extras`` for fused features, attention and
    selected-point outputs (large transfers). ``rgb_uint8`` quantizes the
    frame to uint8 on device (the PNG/display payload — 4x smaller host
    fetch; metrics paths keep the fp32 frame)."""
    policy = policy or policy_from_config(cfg)
    N, H, W, _ = rayd.shape
    extras = bool(with_extras) or with_depth

    ph = -(-H // tile_h) * tile_h - H
    pw = -(-W // tile_w) * tile_w - W
    # Edge-replicate (NOT zero-pad): zero ray directions in the overhang
    # poison the cull kernel's cone bounds (normalize -> NaN, per-ray
    # scale 1/|d|^2 -> inf) for every VALID ray sharing a 16-pixel block
    # with a pad ray. Fires only when H/W is not a tile multiple (e.g. the
    # T&T 640x1088 eval shape with 100-px tiles); edge rays are unit-norm
    # and keep the block cones sane. The pad region is cropped either way.
    rayd_p = np.pad(np.asarray(rayd), ((0, 0), (0, ph), (0, pw), (0, 0)),
                    mode="edge")
    Hp, Wp = H + ph, W + pw
    ty, tx = Hp // tile_h, Wp // tile_w
    tiles = rayd_p.reshape(N, ty, tile_h, tx, tile_w, 3).transpose(
        0, 1, 3, 2, 4, 5)                       # (N, ty, tx, th, tw, 3)

    crop = lambda x: np.asarray(x)[:, :H, :W]
    if attention_only:
        fn = _full_render_fn(cfg, policy, True, run_unet=False)
        f, a, sel = fn(params, state, jnp.asarray(rayo), jnp.asarray(tiles))
        out = {"fused": crop(f), "attn": crop(a), "selected": crop(sel)}
        if with_depth:
            out["depth"] = attention_depth(np.asarray(rayo),
                                           out["selected"], out["attn"])
        return out
    fn = _full_render_fn(cfg, policy, extras, rgb8=rgb_uint8 and not extras)
    res = fn(params, state, jnp.asarray(rayo), jnp.asarray(tiles),
             gamma, beta)
    if rgb_only and not extras:
        # Frame delivery only: skip the foreground/bkg_attn host transfers
        # (test-time artifacts) — they dominate frame latency on networked
        # TPU setups (~2/3 of the fetched bytes).
        return {"rgb": crop(res[0])}
    out = {"rgb": crop(res[0]), "foreground": crop(res[1]),
           "bkg_attn": crop(res[2])}
    if extras:
        out["fused"] = crop(res[3])
        out["attn"] = crop(res[4])
        out["selected"] = crop(res[5])
    if with_depth:
        out["depth"] = attention_depth(np.asarray(rayo), out["selected"],
                                       out["attn"])
    return out


def attention_depth(rayo: np.ndarray, selected: np.ndarray,
                    attn: np.ndarray) -> np.ndarray:
    """Attention-weighted point-to-image-plane distance (train.py:110-116)."""
    od = -rayo.reshape(-1)[:3]
    D = np.sum(od * rayo.reshape(-1)[:3])
    dists = np.abs(np.sum(selected * od, -1) - D) / np.linalg.norm(od)
    n_bkg = attn.shape[-2] - dists.shape[-1]
    if n_bkg > 0:
        dists = np.concatenate(
            [dists, np.zeros(dists.shape[:-1] + (n_bkg,), np.float32)], -1)
    return np.sum(attn[..., 0] * dists, axis=-1)
