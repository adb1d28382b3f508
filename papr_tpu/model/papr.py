"""PAPR model: learned point cloud + proximity attention + UNet decode.

Behavioral spec: reference models/model.py (class ``PAPR``). This build is a
functional re-design for XLA:

  * all learnable state lives in a ``params`` pytree; static configuration
    (the YAML) is closed over at trace time;
  * the point cloud is padded to ``max_num_pts`` with an ``alive`` mask so
    prune/grow never changes array shapes (one compilation for the whole
    run; see docs/design.md). Dead points are excluded from top-k selection
    and their attention scores are masked;
  * top-k selection uses the matmul trick in ops/topk.py instead of the
    reference's (N, H, W, num_pts, 3) materialization;
  * mixed precision is bf16 (no loss scaler), fp32 for distances, scores,
    softmax, and LayerNorm statistics.

Pipeline per ray (reference models/model.py:494-560):
  top-k by point-to-ray distance -> geometric k/q/v -> posenc + FFN embedders
  -> scaled-dot scores -> * influence score -> softmax with background token
  -> renormalized foreground attention -> feature fusion -> UNet -> composite
  with background color.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.mlp import F32, Policy, mlp_init, mlp_apply
from ..nn.unet import small_unet_apply, small_unet_init
from ..ops.geometry import point_ray_geometry
from ..ops.topk import select_topk
from .attention import attention_init, embed_kqv

NEG_BIG = -1e30  # score for dead points: 0 softmax weight, finite gradients

_warned_multi: set = set()


def _warn_multi_device_fallback(what: str) -> None:
    """One-time warning when an explicit Pallas setting is demoted because the
    trace could be GSPMD-partitioned (ADVICE r2 #1). The kernels only run
    multi-device inside shard_map (train path with a mesh plan)."""
    if what not in _warned_multi:
        _warned_multi.add(what)
        import warnings
        warnings.warn(
            f"{what} requested but jax.device_count() > 1 and this trace is "
            "not inside the shard_map train path: the Pallas kernels have no "
            "GSPMD sharding rule, falling back to the unfused XLA path. "
            "Multi-device runs keep the kernels via tpu.mesh (shard_map).")


def _warn_qfold_ignored(why: str) -> None:
    """One-time warning when ``tpu.query_fold: true`` cannot take effect
    (the folded kernel exists only on the rec-native stream path)."""
    key = f"qfold:{why}"
    if key not in _warned_multi:
        _warned_multi.add(key)
        import warnings
        warnings.warn(
            f"tpu.query_fold: true ignored — {why}; the query chain runs "
            "unfolded. The folded kernel needs tpu.fused_attn: streamrec "
            "and no per-point query features (point_feats.use_inq).")


def _warn_int8_ignored(why: str, knob: str = "int8_eval") -> None:
    """One-time warning when a ``tpu.int8_*: true`` knob cannot take effect
    (int8 walks exist only in the rec-native streamed kernels)."""
    key = f"int8:{why}"
    if key not in _warned_multi:
        _warned_multi.add(key)
        import warnings
        warnings.warn(
            f"tpu.{knob}: true ignored — {why}; walks stay bf16/fp32. "
            "Int8 eval needs tpu.fused_attn: streamrec with "
            "tpu.eval_fused: true (the one-shot eval kernel) on an "
            "eval/render trace; int8 train needs the rec-native "
            "two-kernel path (streamrec, no query folding).")


# -------------------------------------------------------------- point init --

def sphere_points(center, num_pts: int, scale) -> np.ndarray:
    """Fibonacci sphere (reference: models/model.py:194-207)."""
    phi = math.pi * (3.0 - math.sqrt(5.0))
    i = np.arange(num_pts, dtype=np.float64)
    y = 1 - (i / max(num_pts - 1, 1)) * 2
    radius = np.sqrt(np.maximum(1 - y * y, 0))
    theta = phi * i
    pts = np.stack([np.cos(theta) * radius * scale[0] + center[0],
                    y * scale[1] + center[1],
                    np.sin(theta) * radius * scale[2] + center[2]], axis=-1)
    return pts.astype(np.float32)


def cube_points(rng: np.random.Generator, center, num_pts: int, scale) -> np.ndarray:
    """Regular grid + uniform remainder (reference: models/model.py:239-256)."""
    n_axis = int(num_pts ** (1.0 / 3.0))
    xs = np.linspace(-scale[0], scale[0], n_axis) + center[0]
    ys = np.linspace(-scale[1], scale[1], n_axis) + center[1]
    zs = np.linspace(-scale[2], scale[2], n_axis) + center[2]
    grid = np.array([[i, j, k] for i in xs for j in ys for k in zs])
    rest = num_pts - grid.shape[0]
    if rest > 0:
        rnd = np.stack([rng.uniform(-scale[a], scale[a], rest) + center[a]
                        for a in range(3)], axis=-1)
        grid = np.concatenate([grid, rnd], axis=0)
    return grid.astype(np.float32)


# ------------------------------------------------------------------ config --

@dataclass
class ModelMeta:
    """Static facts derived from the config (hashable trace constants)."""
    pad_num_pts: int
    select_k: int
    use_pc_feats: bool
    use_renderer: bool
    use_mapping_mlp: bool
    bkg_learnable: bool
    feat_dim: int


def model_meta(cfg) -> ModelMeta:
    pc = cfg.geoms.point_feats
    max_pts = int(cfg.max_num_pts)
    init_num = int(cfg.geoms.points.init_num)
    pad = max_pts if max_pts > 0 else init_num
    return ModelMeta(
        pad_num_pts=max(pad, init_num),
        select_k=int(cfg.geoms.points.select_k),
        use_pc_feats=bool(pc.use_ink or pc.use_inq or pc.use_inv),
        use_renderer=bool(cfg.models.use_renderer),
        use_mapping_mlp=bool(cfg.exposure_control.use),
        bkg_learnable=bool(cfg.geoms.background.learnable),
        feat_dim=int(cfg.models.attn.embed.value.d_ff_out),
    )


# -------------------------------------------------------------------- init --

def create_model(cfg, key: jax.Array, init_points: np.ndarray | None = None):
    """Build (params, state). ``state`` holds the non-trainable alive mask.

    Reference: models/model.py:18-115 (__init__). Points are padded to the
    static ``pad_num_pts``; slots beyond the live count are parked far away
    (1e8) and masked.
    """
    meta = model_meta(cfg)
    point_opt = cfg.geoms.points
    np_rng = np.random.default_rng(int(cfg.seed))

    if init_points is None and point_opt.load_path:
        init_points = load_point_cloud(point_opt.load_path, cfg.max_num_pts, np_rng)
    if init_points is None:
        center = [c * cfg.dataset.coord_scale for c in point_opt.init_center]
        scale = [s * cfg.dataset.coord_scale for s in point_opt.init_scale]
        if point_opt.init_type == "sphere":
            init_points = sphere_points(center, point_opt.init_num, scale)
        elif point_opt.init_type == "cube":
            init_points = cube_points(np_rng, center, point_opt.init_num, scale)
        else:
            raise NotImplementedError(
                f"Point init type [{point_opt.init_type}] is not found")

    n_live = init_points.shape[0]
    P = meta.pad_num_pts
    assert n_live <= P, (n_live, P)
    points = np.full((P, 3), 1e8, np.float32)
    points[:n_live] = init_points
    alive = np.zeros((P,), bool)
    alive[:n_live] = True

    def build(key, points):
        """Device-side param construction, traced as ONE program. Eager
        init (a jax.random call per tensor) costs a compile round-trip per
        op — ~0.4-1 s each on remote-compile backends, ~80 ops for the
        flagship model — so the whole build is jitted below."""
        keys = jax.random.split(key, 8)
        params: dict[str, Any] = {
            "points": points,
            # Explicit dtype: jnp.full from a Python float is weak-typed,
            # and a weak param leaf (plus the Adam moments zeros_like
            # inherits from it) strengthens over the first two steps,
            # forcing THREE compiles of the train step before the
            # signature stabilizes.
            "points_influ_scores": jnp.full(
                (P, 1), float(point_opt.influ_init_val), dtype=jnp.float32),
        }

        pc = cfg.geoms.point_feats
        extra = {"k": 0, "q": 0, "v": 0}
        if meta.use_pc_feats:
            params["pc_feats"] = jax.random.normal(keys[1], (P, int(pc.dim)))
            for name, flag in (("k", pc.use_ink), ("q", pc.use_inq),
                               ("v", pc.use_inv)):
                if flag:
                    extra[name] = int(pc.dim)

        params["attn"] = attention_init(
            keys[2], cfg.models.attn, k_extra_dim=extra["k"],
            q_extra_dim=extra["q"], v_extra_dim=extra["v"], eps=cfg.eps)

        if meta.use_renderer:
            gen = cfg.models.renderer.generator
            if gen.type == "small-unet":
                su = gen.small_unet
                params["renderer"] = small_unet_init(
                    keys[3], meta.feat_dim, 3, bilinear=su.bilinear,
                    single=su.single, render_scale=int(su.get("render_scale", 1)))
            elif gen.type == "mlp":
                m = gen.mlp
                params["renderer"] = mlp_init(
                    keys[3], meta.feat_dim, m.num_layers, m.num_channels, 3,
                    use_wn=m.use_wn, skip_layers=tuple(m.skip_layers),
                    bias=m.bias, half_layers=tuple(m.half_layers))
            else:
                raise NotImplementedError(f"generator type [{gen.type}]")
        else:
            assert meta.feat_dim == 3, \
                "Value embedding MLP should have output dim 3 if not using renderer"

        params["bkg_feats"] = jnp.asarray(
            np.asarray(cfg.geoms.background.init_color, np.float32)[None, :])

        if meta.use_mapping_mlp:
            ec = cfg.exposure_control
            params["mapping_mlp"] = mlp_init(
                keys[4], int(ec.shading_code_dim),
                int(ec.mapping_mlp.num_layers), int(ec.mapping_mlp.dim),
                int(ec.mapping_mlp.out_dim), use_wn=ec.mapping_mlp.use_wn)
        return params

    params = jax.jit(build)(key, jnp.asarray(points))
    state = {"alive": jnp.asarray(alive)}
    return params, state


def load_point_cloud(path: str, max_num_pts: int, rng: np.random.Generator) -> np.ndarray:
    """Load an initial cloud from .pth/.pt (via torch) or .npy/.npz.

    Reference: models/model.py:39-47 (shuffles then truncates to the cap).
    """
    if path.endswith((".pth", ".pt")):
        import torch
        pts = np.asarray(torch.load(path, map_location="cpu")).astype(np.float32)
    else:
        pts = np.load(path)
        if hasattr(pts, "files"):
            pts = pts[pts.files[0]]
        pts = np.asarray(pts, np.float32)
    rng.shuffle(pts)
    if max_num_pts > 0:
        pts = pts[:max_num_pts]
    return pts


# ----------------------------------------------------------------- forward --

def mapping_apply(params: dict, cfg, shading_code: jnp.ndarray,
                  policy: Policy = F32):
    """Shading code -> (gamma, beta) FiLM pair (reference: models/mlp.py:62-78
    and models/model.py:495-499)."""
    mm = cfg.exposure_control.mapping_mlp
    affine = mlp_apply(params["mapping_mlp"], shading_code.astype(jnp.float32),
                       act_type=mm.act, last_act_type=mm.last_act,
                       policy=policy)
    half = affine.shape[-1] // 2
    return affine[..., :half], affine[..., half:]


def _attend(params: dict, state: dict, cfg, rays_o, rays_d, policy: Policy,
            remat: bool = True, dropout_rng=None, local: bool = False,
            exact_select: bool = False, quant_params=None):
    """Shared body of forward/evaluate: selection + attention + fusion.

    rays_o (N, 3), rays_d (N, H, W, 3) -> fused (N,H,W,C) fp32,
    attn (N,H,W,K+1) fp32 (background token last), selected points
    (N,H,W,K,3), and the selection indices.

    ``local=True`` means this trace runs per-device inside a ``shard_map``
    (see ``_attend_spmd``): shapes are device-local and ``pallas_call`` is
    safe even though ``jax.device_count() > 1``. Without it, any trace that
    could be GSPMD-partitioned over several devices must avoid Pallas — the
    kernels have no GSPMD sharding rule.

    ``exact_select=True`` (eval/test renders) pins the cull candidate
    prefilter to the exact sort variant regardless of ``tpu.cull_prefilter``.
    """
    meta = model_meta(cfg)
    N, H, W, _ = rays_d.shape
    P = params["points"].shape[0]
    k = meta.select_k
    eps = float(cfg.eps)

    points = params["points"]
    alive = state["alive"]
    # Potentially GSPMD-partitioned trace: no pallas_call may be emitted.
    # tpu.force_local is the documented escape hatch ("this trace runs on one
    # device even though more are visible" — plain-jit callers, kernel parity
    # tests on the forced-8-device CPU host).
    local = local or bool(cfg.get_path("tpu.force_local", False))
    multi = jax.device_count() > 1 and not local

    if k >= P or k < 0:
        idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (N, H * W, P))
        k = P
    else:
        impl = cfg.get_path("tpu.topk_impl", "auto")
        if impl == "auto":
            # tile-culled pallas kernel on real TPUs; exact XLA elsewhere
            # (interpret-mode pallas on CPU is only for tests).
            cullable = (jax.default_backend() == "tpu"
                        and params["points"].shape[0] <= (1 << 15))
            if cullable and multi:
                # Silent demotion would hide a 2-3x selection slowdown on
                # multi-device hosts running plain-jit (render/eval) traces.
                _warn_multi_device_fallback(
                    "tpu.topk_impl=auto(cull) (set tpu.force_local: true "
                    "for single-device serving on a multi-chip host)")
            impl = "cull" if cullable and not multi else "xla"
        elif impl in ("cull", "pallas") and multi:
            _warn_multi_device_fallback(f"tpu.topk_impl={impl}")
            impl = "xla"
        interp = jax.default_backend() != "tpu"
        if impl == "cull":
            from ..ops.tile_cull import select_topk_culled
            M = int(cfg.get_path("tpu.cull_candidates", 2048))
            blk = int(cfg.get_path("tpu.cull_block", 16))
            pf = str(cfg.get_path("tpu.cull_prefilter", "approx"))
            rc = float(cfg.get_path("tpu.cull_recall", 0.99))
            if exact_select:
                # Eval/test renders never ride the approx_min_k recall stack
                # (VERDICT r2 weak #6): the default 'packsort' prefilter is a
                # full sort of the lower bounds packed into the SAME 17-bit
                # value / 15-bit index layout the stage-3 kernel uses, so its
                # only ranking difference vs 'sort' is on ties the kernel
                # itself cannot distinguish. One int32 sort beats lax.top_k's
                # (f32,s32) pair sort (30.7 vs 39.6 ms at 800x800 on v5e),
                # and both beat approx at render tile counts (~122 ms —
                # approx_min_k's aggregate reduction loses to one big sort at
                # T=2500 tiles). tpu.cull_prefilter_eval overrides ('sort'
                # restores the bit-exact prefilter). Blocks stay at the
                # training edge: 32-pixel blocks measured 13x slower per
                # element in the cull kernel (TR=1024 tiles starve the
                # min-extract loop), sinking any prefilter win.
                pf = str(cfg.get_path("tpu.cull_prefilter_eval", "packsort"))
                eblk = int(cfg.get_path("tpu.cull_block_eval", 0)) or blk
                me = cfg.get_path("tpu.cull_candidates_eval", "auto")
                M = int(me) if me != "auto" else \
                    M * max((eblk * eblk) // (blk * blk), 1)
                blk = eblk
            ee = bool(cfg.get_path("tpu.cull_early_exit", True))
            sel = lambda o, d: select_topk_culled(
                points, alive, o, d.reshape(H, W, 3), k, M=M, block=blk,
                eps=eps, interpret=interp, prefilter=pf, recall_target=rc,
                early_exit=ee)
        elif impl == "pallas":
            from ..ops.pallas_topk import pallas_select_topk
            sel = lambda o, d: pallas_select_topk(points, alive, o, d, k, eps,
                                                  interpret=interp)
        else:
            chunk = int(cfg.get_path("tpu.ray_chunk", 4096))
            sel = lambda o, d: select_topk(points, alive, o, d, k, eps,
                                           chunk=chunk, impl=impl)
        # Static unroll over the (small) image batch: vmap-of-chunked-top-k
        # lowers to a batched sort that is ~3.5x slower (measured on v5e).
        rds = rays_d.reshape(N, H * W, 3)
        idx = jnp.stack([sel(rays_o[i], rds[i]) for i in range(N)])
    idx = idx.reshape(N, H, W, k)

    # Fused attention gating (ops/fused_mlp.py embedders and/or the
    # ops/fused_attn.py score->softmax kernel). tpu.fused_attn:
    #   True/'auto-on-TPU' = both kernels; 'embed' = embedder kernels only;
    #   'score' = score kernel only; False = pure XLA (the parity oracle,
    #   tests/test_fused_attn.py). Any config the kernels don't cover
    #   (exotic embedder variants, custom score act, dropout, huge K)
    #   falls back to pure XLA.
    from ..ops.fused_attn import score_fusible
    from ..ops.fused_mlp import feedforward_fusible
    e = cfg.models.attn.embed
    fusible = (dropout_rng is None and k <= 64
               and not cfg.geoms.point_feats.use_inq
               and score_fusible(cfg.models.attn)
               and all(feedforward_fusible(c)
                       for c in (e.key, e.query, e.value)))
    fa = cfg.get_path("tpu.fused_attn", "auto")
    if fa == "auto":
        # Measured on v5e (160x160 patch, 30k pts, k=20, full train step,
        # fused_tile=512): rec-native stream 63.6 ms vs split kernels 81.1
        # vs unfused 83.4 — auto is 'streamrec' for real TPU runs. On a
        # multi-device mesh the kernels run per-device inside shard_map
        # (``local=True`` via ``_attend_spmd``); a potentially
        # GSPMD-partitioned trace keeps the unfused XLA path (no GSPMD
        # sharding rule for these pallas_calls).
        if fusible and jax.default_backend() == "tpu" and multi:
            _warn_multi_device_fallback(
                "tpu.fused_attn=auto(streamrec) (set tpu.force_local: true "
                "for single-device serving on a multi-chip host)")
        fa = ("streamrec" if (fusible and jax.default_backend() == "tpu"
                              and not multi) else False)
    elif multi and fa is not False:
        # Explicitly requested kernels under a potentially-partitioned trace:
        # fall back rather than trace pallas_call under GSPMD (ADVICE r2 #1).
        _warn_multi_device_fallback(f"tpu.fused_attn={fa}")
        fa = False
    use_stream = fusible and fa in ("stream", "streamrec")
    use_embed_kernel = fusible and fa in (True, "embed")
    use_score_kernel = fusible and fa in (True, "score")
    if use_stream or use_embed_kernel or use_score_kernel:
        return _attend_kmaj(params, cfg, meta, idx, rays_o, rays_d,
                            alive, eps, policy, remat, use_embed_kernel,
                            use_score_kernel, use_stream,
                            rec_native=(fa == "streamrec"),
                            eval_mode=exact_select,
                            quant_params=quant_params)

    # One wide gather instead of three narrow ones: TPU gathers of rows with
    # tiny trailing dims (3/1/64) hit a slow row-DMA path; a single gather of
    # a lane-aligned (P, 128*n) "point record" is bandwidth-optimal.
    pcf = cfg.geoms.point_feats
    pcf_dim = int(pcf.dim) if meta.use_pc_feats else 0
    record = _point_record(params, alive, meta, pcf)
    rec = record[idx]                                        # (N,H,W,K,128n)

    selected = rec[..., :3]                                  # (N,H,W,K,3)
    influ = rec[..., 3]                                      # (N,H,W,K)
    sel_alive = rec[..., 4] > 0.5                            # (N,H,W,K)
    proj, perp, _, _ = point_ray_geometry(
        selected, rays_o[:, None, None, :], rays_d, eps)

    # Geometric features (reference models/model.py:396-437): positions are
    # detached in the key stream; the query is the raw ray direction.
    k_feats = [jax.lax.stop_gradient(selected), proj, perp]
    q_feats = [rays_d[..., None, :]]
    v_feats = [proj, perp]
    k_extra = q_extra = v_extra = None
    if meta.use_pc_feats:
        gathered = rec[..., 5:5 + pcf_dim]
        if pcf.use_ink:
            k_extra = [gathered]
        if pcf.use_inq:
            q_extra = [gathered]
        if pcf.use_inv:
            v_extra = [gathered]

    attn_cfg = cfg.models.attn
    bkg_score = float(cfg.geoms.background.constant)

    ek, eq, ev = embed_kqv(
        params["attn"], attn_cfg, k_feats, q_feats, v_feats,
        k_extra, q_extra, v_extra, eps=eps, policy=policy,
        remat=remat, dropout_rng=dropout_rng, fused=False)

    # XLA score tail (reference models/attn.py:212-226 + model.py:524-534).
    from ..nn.activations import build_activation
    from ..nn.mlp import linear_apply
    from .attention import attention_scores
    kk = linear_apply(params["attn"]["w_k"], ek, policy).astype(jnp.float32)
    qq = linear_apply(params["attn"]["w_q"], eq, policy).astype(jnp.float32)
    scores = attention_scores(qq, kk,
                              attn_cfg.get("kernel_type", "scaled-dot"))
    scores = build_activation(attn_cfg.score_act)(scores)
    scores = scores * influ.astype(jnp.float32)
    scores = jnp.where(sel_alive, scores, NEG_BIG)
    fused_f, attn = _softmax_fuse(cfg, ev, scores, bkg_score)
    return fused_f, attn, selected, idx


def _attend_spmd(params: dict, state: dict, cfg, rays_o, rays_d,
                 policy: Policy, remat: bool, mesh):
    """``_attend`` per-device over the ('data', 'rays') mesh via shard_map.

    The per-ray pipeline (selection -> gather -> embed -> score -> fuse) is
    embarrassingly parallel over rays, so each device runs the full Pallas
    fast path on its local (N/data, H/rays, W) block — this is what keeps
    ``tpu.fused_attn`` kernels (and the cull top-k) live on a multi-chip
    mesh instead of demoting to unfused XLA (VERDICT r2 #1). Params and the
    alive mask ride in replicated; shard_map's transpose psums their
    cotangents over the mesh (the SPMD gradient reduction of SURVEY §2.9).
    The fused-feature output stays ray-sharded; XLA gathers it for the UNet
    stage, mirroring the reference's tile-then-full-UNet split
    (reference train.py:59-70).
    """
    from jax.sharding import PartitionSpec as P

    def local_fn(p, s, o, d):
        return _attend(p, s, cfg, o, d, policy, remat=remat,
                       dropout_rng=None, local=True)

    sharded = P("data", "rays")
    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P("data"), sharded),
        out_specs=(sharded, sharded, sharded, sharded),
        check_vma=False)(params, state, rays_o, rays_d)


def _point_record(params, alive, meta, pcf):
    """Lane-aligned per-point record [xyz, influ, alive, pc_feats?, pad]."""
    rec_parts = [params["points"], params["points_influ_scores"],
                 alive.astype(jnp.float32)[:, None]]
    if meta.use_pc_feats:
        rec_parts.append(params["pc_feats"])
    rec_width = 3 + 1 + 1 + (int(pcf.dim) if meta.use_pc_feats else 0)
    rec_pad = -(-rec_width // 128) * 128 - rec_width
    record = jnp.concatenate(rec_parts, axis=1)
    if rec_pad:
        record = jnp.pad(record, ((0, 0), (0, rec_pad)))
    # Barrier keeps the row gather full-width: without it XLA rewrites
    # gather(pad(concat)) as pad(gather(concat)), and the rematerializing
    # pad costs ~20 ms per 800x800 frame (it writes the whole (K, R, 128)
    # record tensor a second time). The barrier is AD-transparent.
    return jax.lax.optimization_barrier(record)


def _attend_kmaj(params: dict, cfg, meta, idx, rays_o, rays_d, alive,
                 eps: float, policy: Policy, remat: bool,
                 use_embed_kernel: bool, use_score_kernel: bool,
                 use_stream: bool = False, rec_native: bool = False,
                 eval_mode: bool = False, quant_params=None):
    """Fused attention path in K-MAJOR token order.

    All (tokens, dim) tensors on this path are plain 2D with token order
    (k, ray): the (K*T, D) embedder outputs view freely as (K, T, D) for the
    score kernel's leading-dim k slicing, so NO big-tensor layout copy or 5D
    intermediate exists between the gather and the fusion epilogue (measured
    ~0.9 ms per (T*K, 256) reshape/slice/pad copy on v5e — the reason the
    ray-major fused path lost to pure XLA).
    """
    from ..nn.activations import build_activation
    from ..nn.mlp import linear_apply
    from ..ops.fused_attn import fused_scores
    from ..ops.geometry import normalize_vector

    N, H, W, _ = rays_d.shape
    k = idx.shape[-1]
    T = N * H * W
    pcf = cfg.geoms.point_feats
    attn_cfg = cfg.models.attn
    e = attn_cfg.embed
    interp = jax.default_backend() != "tpu"
    bkg_score = float(cfg.geoms.background.constant)
    normalize = bool(cfg.models.normalize_topk_attn)
    # Per-config kernel knobs, threaded as static args (no process globals:
    # two configs with different knobs coexist in one process).
    from ..ops.fused_mlp import resolve_mxu_reduce
    mxu = resolve_mxu_reduce(cfg)
    vmem = int(cfg.get_path("tpu.vmem_mb", 0))

    # K-major gather: rec[k, t] is ray t's k-th selected point.
    record = _point_record(params, alive, meta, pcf)
    idx_km = idx.reshape(T, k).T                             # (K, T)
    rec = record[idx_km]                                     # (K, T, 128n)
    selected = rec[..., :3]                                  # (K, T, 3)
    influ = rec[..., 3].T                                    # (T, K) (small)
    sel_alive = rec[..., 4].T > 0.5                          # (T, K)

    # Per-token geometry (ops/geometry.py point_ray_geometry, k-major).
    rayd_flat = rays_d.reshape(T, 3)
    rayo_flat = jnp.broadcast_to(rays_o[:, None, :],
                                 (N, H * W, 3)).reshape(T, 3)
    rays = normalize_vector(rayd_flat, eps=eps)
    v = selected - rayo_flat
    t_along = jnp.sum(v * rays, axis=-1)
    dd = jnp.sum(rays * rays, axis=-1)
    proj = rays * (t_along / (dd + eps))[..., None]          # (K, T, 3)
    perp = v - proj

    flat = lambda x: x.reshape(k * T, x.shape[-1])
    k_feats = [flat(jax.lax.stop_gradient(selected)), flat(proj), flat(perp)]
    q_feats = [rayd_flat]
    v_feats = [flat(proj), flat(perp)]
    k_extra = q_extra = v_extra = None
    if meta.use_pc_feats:
        # use_inq configs are excluded by the gate in _attend (per-point
        # features into the per-ray query stream don't fit this layout).
        gathered = flat(rec[..., 5:5 + int(pcf.dim)])
        if pcf.use_ink:
            k_extra = [gathered]
        if pcf.use_inv:
            v_extra = [gathered]

    # tpu.query_fold: run the query chain (posenc -> query embedder -> w_q)
    # inside the rec-native key kernel instead of as separate XLA dispatches.
    # Measured SLOWER both ways on v5e: round 2 at the VMEM-forced bwd tile
    # of 384 (-0.4 ms), and round 3 at the FULL 512 tile with the scoped
    # budget raised to 20 MB (435.9k vs 446.6k rays/s, -2.4% — the larger
    # scoped footprint costs more pipelining than the saved query
    # dispatches buy). Stays opt-in; default off.
    want_qfold = bool(cfg.get_path("tpu.query_fold", False))
    qfold = rec_native and q_extra is None and want_qfold
    eval_one = False         # set on the stream path (attend_stream_eval)
    if want_qfold and not qfold:
        _warn_qfold_ignored(
            "rec-native streamrec preconditions do not hold "
            f"(rec_native={rec_native}, q_extra={'set' if q_extra is not None else 'None'})")
    ek, eq, ev = embed_kqv(
        params["attn"], attn_cfg, k_feats, q_feats, v_feats,
        k_extra, q_extra, v_extra, eps=eps, policy=policy,
        remat=remat and not (use_embed_kernel or use_stream),
        dropout_rng=None, fused=use_embed_kernel or use_stream,
        fused_interpret=interp, skip_k=use_stream, skip_v=use_stream,
        skip_q=qfold, mxu_reduce=mxu)
    ev3 = None if use_stream else ev.reshape(k, T, ev.shape[-1])

    if use_stream:
        # Streamed key-attention kernel (ops/stream_attn.py): the key
        # embedder walks + score projection + softmax run per (ray-tile, k)
        # slice with no HBM-materialized key embeddings; the query chain
        # (qq) composes via autodiff through the fused query embedder.
        # rec_native additionally moves the point-ray geometry and posenc
        # sources into the kernel, reading the gathered records directly.
        from ..ops.fused_mlp import _ff_lns
        from ..ops.stream_attn import (key_stream_scores,
                                       key_stream_scores_rec,
                                       key_stream_scores_recq,
                                       value_stream_fuse,
                                       value_stream_fuse_rec)
        k_extra_dim = int(pcf.dim) if k_extra is not None else 0
        kp = params["attn"]["embed_k"]
        kws = tuple(l["w"].T for l in kp["mlp"]["layers"])
        kbs = tuple(l["bias"] for l in kp["mlp"]["layers"])
        kln_in, kln_out = _ff_lns(kp)
        tile = int(cfg.get_path("tpu.fused_tile", 512))
        cdt_name = jnp.dtype(policy.compute_dtype).name
        qq = None if qfold else linear_apply(
            params["attn"]["w_q"], eq, policy).astype(jnp.float32)
        # Eval/render one-shot: key+value streams fused into ONE forward
        # kernel (attend_stream_eval — record read, geometry and grid
        # overhead once; online-softmax fusion). tpu.eval_fused: false
        # restores the two-kernel eval path.
        eval_one = (rec_native and eval_mode and not qfold
                    and bool(cfg.get_path("tpu.eval_fused", True)))
        # tpu.int8_eval: quantize the eval walks to int8 (2x MXU rate on
        # v5e; self-calibrating, forward-only). Lives in the one-shot
        # kernel only — training numerics are never touched.
        want_int8 = bool(cfg.get_path("tpu.int8_eval", False))
        if want_int8 and eval_mode and not eval_one:
            _warn_int8_ignored(
                f"the one-shot eval kernel is not active here "
                f"(rec_native={rec_native}, qfold={qfold}, "
                f"eval_fused={bool(cfg.get_path('tpu.eval_fused', True))})")
        # tpu.int8_train: quantize the TRAINING forward walks to int8 in
        # the two rec-native kernels; their backward recomputes in bf16
        # (straight-through). Default off — flip only with an A/B quality
        # check (tools/int8_train_ab.py, docs/status_round5.md).
        int8_train = (bool(cfg.get_path("tpu.int8_train", False))
                      and not eval_mode)
        if int8_train and (not rec_native or qfold):
            _warn_int8_ignored(
                f"the rec-native two-kernel path is not active here "
                f"(rec_native={rec_native}, qfold={qfold})",
                knob="int8_train")
            int8_train = False
        if eval_one:
            from ..ops.stream_attn import attend_stream_eval
            vp = params["attn"]["embed_v"]
            vws = tuple(l["w"].T for l in vp["mlp"]["layers"])
            vbs = tuple(l["bias"] for l in vp["mlp"]["layers"])
            vln_in, vln_out = _ff_lns(vp)
            v_extra_dim = int(pcf.dim) if v_extra is not None else 0
            fused_f, attn = attend_stream_eval(
                rec, rayo_flat, rays, qq, kws, kbs, kln_in, kln_out,
                params["attn"]["w_k"]["w"], params["attn"]["w_k"]["bias"],
                vws, vbs, vln_in, vln_out,
                (tuple(int(l) for l in e.k_L), int(e.embed_type),
                 float(e.pe_factor), float(e.pe_mult_factor), k_extra_dim),
                (tuple(int(l) for l in e.v_L), int(e.embed_type),
                 float(e.pe_factor), float(e.pe_mult_factor), v_extra_dim),
                e.key.ff_act, e.key.ff_last_act,
                e.value.ff_act, e.value.ff_last_act, attn_cfg.score_act,
                bkg_score, normalize, eps, tile, interp, cdt_name,
                mxu, vmem, int8=want_int8,
                quant_params=quant_params if want_int8 else None)
            # fused_f (T,C), attn (T,K+1)
        elif qfold:
            # Query-folded rec kernel: the query walk (posenc -> embedder
            # -> w_q) runs in-kernel; the k==0 grid step computes qq into a
            # block-resident buffer and the last k step back-propagates it.
            qp = params["attn"]["embed_q"]
            qws = tuple(l["w"].T for l in qp["mlp"]["layers"])
            qbs = tuple(l["bias"] for l in qp["mlp"]["layers"])
            qln_in, qln_out = _ff_lns(qp)
            attn = key_stream_scores_recq(
                rec, rayo_flat, rays, rayd_flat, kws, kbs, kln_in, kln_out,
                params["attn"]["w_k"]["w"], params["attn"]["w_k"]["bias"],
                qws, qbs, qln_in, qln_out,
                params["attn"]["w_q"]["w"], params["attn"]["w_q"]["bias"],
                (tuple(int(l) for l in e.k_L), int(e.embed_type),
                 float(e.pe_factor), float(e.pe_mult_factor), k_extra_dim),
                (tuple(int(l) for l in e.q_L), int(e.embed_type),
                 float(e.pe_factor), float(e.pe_mult_factor)),
                e.key.ff_act, e.key.ff_last_act,
                e.query.ff_act, e.query.ff_last_act, attn_cfg.score_act,
                bkg_score, eps, tile, interp, cdt_name,
                mxu, vmem)                                  # (T, K+1)
        elif rec_native:
            attn = key_stream_scores_rec(
                rec, rayo_flat, rays, qq, kws, kbs, kln_in, kln_out,
                params["attn"]["w_k"]["w"], params["attn"]["w_k"]["bias"],
                (tuple(int(l) for l in e.k_L), int(e.embed_type),
                 float(e.pe_factor), float(e.pe_mult_factor), k_extra_dim),
                e.key.ff_act, e.key.ff_last_act, attn_cfg.score_act,
                bkg_score, eps, tile, interp, cdt_name,
                mxu, vmem, int8_train)                      # (T, K+1)
        else:
            kx_parts = [jax.lax.stop_gradient(selected), proj, perp]
            if k_extra is not None:
                kx_parts.append(rec[..., 5:5 + int(pcf.dim)])
            xk = jnp.concatenate([p.astype(jnp.float32) for p in kx_parts],
                                 axis=-1)                   # (K, T, d_raw)
            pe_desc = ((3, 3, 3), tuple(int(l) for l in e.k_L),
                       int(e.embed_type), float(e.pe_factor),
                       float(e.pe_mult_factor), k_extra_dim)
            attn = key_stream_scores(
                xk, qq, kws, kbs, kln_in, kln_out,
                params["attn"]["w_k"]["w"], params["attn"]["w_k"]["bias"],
                influ.astype(jnp.float32), sel_alive.astype(jnp.float32),
                pe_desc, e.key.ff_act, e.key.ff_last_act,
                attn_cfg.score_act, bkg_score, tile, interp,
                cdt_name, mxu, vmem)                        # (T, K+1)
    elif use_score_kernel:
        attn = fused_scores(
            ek.reshape(k, T, ek.shape[-1]), eq,
            params["attn"]["w_k"]["w"], params["attn"]["w_k"]["bias"],
            params["attn"]["w_q"]["w"], params["attn"]["w_q"]["bias"],
            influ.astype(jnp.float32), sel_alive.astype(jnp.float32),
            score_act=attn_cfg.score_act, bkg_score=bkg_score,
            tile=int(cfg.get_path("tpu.fused_tile", 256)),
            interpret=interp,
            compute=jnp.dtype(policy.compute_dtype).name)           # (T, K+1)
    else:
        kk = linear_apply(params["attn"]["w_k"], ek, policy).astype(
            jnp.float32).reshape(k, T, -1)
        qq = linear_apply(params["attn"]["w_q"], eq, policy).astype(
            jnp.float32)
        raw = jnp.sum(qq[None] * kk, axis=-1) / math.sqrt(attn_cfg.d_model)
        scores = build_activation(attn_cfg.score_act)(raw).T     # (T, K)
        scores = scores * influ.astype(jnp.float32)
        scores = jnp.where(sel_alive, scores, NEG_BIG)
        allsc = jnp.concatenate(
            [scores, jnp.full((T, 1), bkg_score, jnp.float32)], axis=-1)
        attn = jax.nn.softmax(allsc, axis=-1)

    if use_stream and eval_one:
        pass                 # fused_f came out of attend_stream_eval above
    elif use_stream:
        # Value embedder + renormalize/fuse epilogue, streamed per k slice
        # (ops/stream_attn.py): value embeddings never materialize in HBM.
        v_extra_dim = int(pcf.dim) if v_extra is not None else 0
        vp = params["attn"]["embed_v"]
        vws = tuple(l["w"].T for l in vp["mlp"]["layers"])
        vbs = tuple(l["bias"] for l in vp["mlp"]["layers"])
        vln_in, vln_out = _ff_lns(vp)
        if rec_native:
            fused_f = value_stream_fuse_rec(
                rec, rayo_flat, rays, attn, vws, vbs, vln_in, vln_out,
                (tuple(int(l) for l in e.v_L), int(e.embed_type),
                 float(e.pe_factor), float(e.pe_mult_factor), v_extra_dim),
                e.value.ff_act, e.value.ff_last_act, normalize, eps, tile,
                interp, cdt_name, mxu, vmem, int8_train)    # (T, C)
        else:
            vx_parts = [proj, perp]
            if v_extra is not None:
                vx_parts.append(rec[..., 5:5 + int(pcf.dim)])
            xv = jnp.concatenate([p.astype(jnp.float32) for p in vx_parts],
                                 axis=-1)                   # (K, T, d_raw)
            pe_desc_v = ((3, 3), tuple(int(l) for l in e.v_L),
                         int(e.embed_type), float(e.pe_factor),
                         float(e.pe_mult_factor), v_extra_dim)
            fused_f = value_stream_fuse(
                xv, attn, vws, vbs, vln_in, vln_out, pe_desc_v,
                e.value.ff_act, e.value.ff_last_act, normalize, tile,
                interp, cdt_name, mxu, vmem)                # (T, C)
    else:
        # Renormalize + fuse epilogue (models/model.py:533-534). All-dead
        # rays (every selected slot padding, so the foreground mass is
        # EXACTLY 0 — possible only in this padded static-shape design,
        # never in the reference's dynamic shapes) renormalize against 1
        # instead of 0/0: fused becomes 0 and the composite is pure
        # background, which is the correct limit (bkg_attn == 1 there).
        topk_attn = attn[:, :-1]
        if normalize:
            den = jnp.sum(topk_attn, axis=-1, keepdims=True)
            topk_attn = topk_attn / jnp.where(den > 0, den, 1.0)
        fused_f = jnp.einsum("tk,ktc->tc", topk_attn,
                             ev3.astype(jnp.float32))

    fused_f = fused_f.reshape(N, H, W, -1)
    attn = attn.reshape(N, H, W, k + 1)
    selected_rm = jnp.moveaxis(selected, 0, 1).reshape(N, H, W, k, 3)
    return fused_f, attn, selected_rm, idx


def _softmax_fuse(cfg, embedv, scores, bkg_score: float):
    """Background-token softmax + foreground renormalization + fusion.

    Reference: models/model.py:526-534. Returns fused (..., C) fp32,
    attn (..., K+1) fp32.
    """
    bkg = jnp.full(scores.shape[:-1] + (1,), bkg_score, jnp.float32)
    all_scores = jnp.concatenate([scores, bkg], axis=-1)
    attn = jax.nn.softmax(all_scores, axis=-1)
    topk_attn = attn[..., :-1]
    if cfg.models.normalize_topk_attn:
        # Guarded against all-dead rays (foreground mass exactly 0): see
        # the stream epilogue note in _attend — fused 0 / pure-bkg
        # composite is the correct limit, NaN would poison the UNet.
        den = jnp.sum(topk_attn, axis=-1, keepdims=True)
        topk_attn = topk_attn / jnp.where(den > 0, den, 1.0)
    fused = jnp.sum(embedv.astype(jnp.float32) * topk_attn[..., None], axis=-2)
    return fused, attn


def render_foreground(params: dict, cfg, fused: jnp.ndarray, gamma=None,
                      beta=None, policy: Policy = F32) -> jnp.ndarray:
    """Decode fused features (N, H, W, C) to RGB with the generator head."""
    gen = cfg.models.renderer.generator
    if gen.type == "small-unet":
        su = gen.small_unet
        out = small_unet_apply(
            params["renderer"], fused, bilinear=su.bilinear, single=su.single,
            norm=su.norm, last_act=su.last_act,
            render_scale=int(su.get("render_scale", 1)),
            affine_layer=int(su.affine_layer), gamma=gamma, beta=beta,
            policy=policy)
    else:
        m = gen.mlp
        out = mlp_apply(params["renderer"], policy.cast(fused),
                        act_type=m.act_type, last_act_type=m.last_act_type,
                        a=m.act_a, b=m.act_b,
                        skip_layers=tuple(m.skip_layers), policy=policy)
    return out.astype(jnp.float32)


def forward(params: dict, state: dict, cfg, rays_o, rays_d, c2w=None,
            shading_code=None, policy: Policy = F32,
            dropout_rng=None, mesh=None) -> jnp.ndarray:
    """Full training forward -> RGB (N, H, W, 3) fp32.

    Reference: models/model.py:494-560. ``dropout_rng`` activates embedder
    dropout (training mode); eval paths leave it None. With a >1-device
    ``mesh`` the attention stage runs per-device via shard_map
    (``_attend_spmd``), keeping the Pallas fast path live; dropout configs
    stay on the (unfused) GSPMD path so 1-dev/N-dev masks agree.
    """
    meta = model_meta(cfg)
    gamma = beta = None
    if shading_code is not None and meta.use_mapping_mlp:
        gamma, beta = mapping_apply(params, cfg, shading_code, policy)

    remat = bool(cfg.get_path("tpu.remat_embed", True))
    if mesh is not None and mesh.size > 1 and dropout_rng is None:
        fused, attn, _, _ = _attend_spmd(params, state, cfg, rays_o, rays_d,
                                         policy, remat, mesh)
    else:
        fused, attn, _, _ = _attend(params, state, cfg, rays_o, rays_d,
                                    policy, remat=remat,
                                    dropout_rng=dropout_rng)
    bkg_attn = attn[..., -1:]                                # (N,H,W,1)

    if meta.use_renderer:
        foreground = render_foreground(params, cfg, fused, gamma, beta, policy)
    else:
        foreground = fused
    if cfg.models.normalize_topk_attn:
        rgb = foreground * (1 - bkg_attn) + params["bkg_feats"][0] * bkg_attn
    else:
        rgb = foreground + params["bkg_feats"][0] * bkg_attn
    return rgb


def evaluate(params: dict, state: dict, cfg, rays_o, rays_d, c2w=None,
             policy: Policy = F32, with_selected: bool = False,
             local: bool = False, quant_params=None):
    """Attention half only, for tiled full-image rendering.

    Reference: models/model.py:462-492 — returns fused features
    (N, H, W, 1, C) and attention (N, H, W, K+1, 1); the UNet runs once over
    the gathered full-resolution feature map (train.py:59-70).

    ``local=True`` marks a per-device trace inside a shard_map (the sharded
    tile render, train/step.py) where the Pallas kernels are safe despite
    ``jax.device_count() > 1``.

    ``quant_params``: precomputed int8 walk quantization from
    ``eval_quant_params`` (frame-level calibration for tiled renders —
    without it, tpu.int8_eval self-calibrates per call).
    """
    fused, attn, selected, _ = _attend(params, state, cfg, rays_o, rays_d,
                                       policy, remat=False,
                                       exact_select=True, local=local,
                                       quant_params=quant_params)
    out = (fused[..., None, :], attn[..., None])
    if with_selected:
        return out + (selected,)
    return out


def eval_quant_params(params, state, cfg, rays_o, rays_sample,
                      policy: Policy = F32):
    """Frame-level int8 calibration for tpu.int8_eval (tiled renders).

    attend_stream_eval's per-call self-calibration re-measures activation
    amax and requantizes the walk weights inside EVERY tile of a tiled
    render (lax.map body — XLA cannot hoist it because the gathered records
    differ per tile). The measured cost is ~50-70 ms per 800x800 frame in
    small unfused XLA ops, which ate most of the int8 MXU win
    (docs/status_round5.md A/B). This helper runs the same _walk_amax +
    _quantize_walk ONCE per frame on a strided subsample of the raw point
    records paired with a subsample of the frame's rays, and the result
    threads through evaluate(quant_params=...) into the kernel.

    Calibrating on raw (unselected) point records is conservative: selected
    points are the near-ray subset, so pairing random points with frame
    rays widens the geometry feature range (larger perp distances) and the
    measured amax upper-bounds the per-tile one — less clipping risk, at
    ~0.1 bit of resolution.

    rays_o: (3,) or (1, 3) camera origin; rays_sample: (S, 3) ray
    directions (need not be normalized). Returns
    ((kwq, kinv, kdq), (vwq, vinv, vdq)) for attend_stream_eval.
    """
    from ..ops.fused_mlp import _ff_lns, resolve_mxu_reduce
    from ..ops.geometry import normalize_vector
    from ..ops.stream_attn import _quantize_walk, _rec_prep, _walk_amax

    meta = model_meta(cfg)
    pcf = cfg.geoms.point_feats
    attn_cfg = cfg.models.attn
    e = attn_cfg.embed
    eps = float(cfg.eps)
    record = _point_record(params, state["alive"], meta, pcf)   # (P, rp)
    P, rp = record.shape
    rays_sample = jnp.asarray(rays_sample).reshape(-1, 3)
    S = int(min(1024, P, rays_sample.shape[0]))
    rec_cal = record[(jnp.arange(S) * max(1, P // S))][None]    # (1, S, rp)
    rays = normalize_vector(
        rays_sample[(jnp.arange(S) * max(1, rays_sample.shape[0] // S))],
        eps=eps)
    rayo = jnp.broadcast_to(jnp.asarray(rays_o).reshape(1, 3), (S, 3))

    cdt_name = jnp.dtype(policy.compute_dtype).name
    tile = int(cfg.get_path("tpu.fused_tile", 512))
    mxu = resolve_mxu_reduce(cfg)
    k_extra_dim = int(pcf.dim) if (meta.use_pc_feats and pcf.use_ink) else 0
    v_extra_dim = int(pcf.dim) if (meta.use_pc_feats and pcf.use_inv) else 0
    k_desc = (tuple(int(l) for l in e.k_L), int(e.embed_type),
              float(e.pe_factor), float(e.pe_mult_factor), k_extra_dim)
    v_desc = (tuple(int(l) for l in e.v_L), int(e.embed_type),
              float(e.pe_factor), float(e.pe_mult_factor), v_extra_dim)

    from ..ops.fused_mlp import _mxu_scope
    out = []
    for name, desc, has_pos, ec in (("embed_k", k_desc, True, e.key),
                                    ("embed_v", v_desc, False, e.value)):
        p = params["attn"][name]
        ws = tuple(l["w"].T for l in p["mlp"]["layers"])
        bs = tuple(l["bias"] for l in p["mlp"]["layers"])
        ln_in, ln_out = _ff_lns(p)
        (_, _, pdims, S_mats, wsp, bsp, lns, wcfg) = _rec_prep(
            rec_cal, ws, bs, ln_in, ln_out, desc, has_pos, ec.ff_act,
            ec.ff_last_act, tile, cdt_name)
        with _mxu_scope(mxu):
            amax = _walk_amax(rec_cal, rayo, rays, S_mats, wcfg, wsp, bsp,
                              lns, eps)
        out.append(_quantize_walk(ws, pdims, amax))
    return tuple(out)


def composite_background(cfg, params, foreground, bkg_attn):
    """Shared eval-time compositing (reference train.py:74-82)."""
    if cfg.models.normalize_topk_attn:
        return foreground * (1 - bkg_attn) + params["bkg_feats"][0] * bkg_attn
    return foreground + params["bkg_feats"][0] * bkg_attn
