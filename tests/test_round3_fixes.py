"""Round-3 guards: eval-time exact selection, multi-device Pallas gating."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papr_tpu.config import load_config
from papr_tpu.model.papr import _attend, create_model
from papr_tpu.nn.mlp import policy_from_config
from papr_tpu.ops.geometry import get_rays_np
from papr_tpu.ops.tile_cull import select_topk_culled


def _wide_fov_scene(P=3000, H=32, W=32, seed=0):
    """Wide-FOV stress scene: large cone half-angles make the LB bounds loose,
    the regime where the approx prefilter's 96.8% worst case lives."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(P, 3)).astype(np.float32) * 0.8
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 0, 1.2]
    rayo, rayd = get_rays_np(H, W, 10.0, 10.0, c2w[None])  # ~116 deg fov
    return pts, rayo[0], rayd[0]


def _cfg(pf="approx", recall=0.99):
    return load_config(overrides={
        "use_amp": False, "max_num_pts": 3000,
        "geoms": {"points": {"select_k": 8, "init_num": 3000}},
        "models": {"attn": {"d_model": 16, "embed": {
            "k_L": [2, 2, 2], "q_L": [2], "v_L": [2, 2],
            "key": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
            "query": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
            "value": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2}}}},
        "tpu": {"topk_impl": "cull", "cull_candidates": 256,
                "cull_prefilter": pf, "cull_recall": recall},
    })


def test_eval_selection_is_exact_under_approx_prefilter():
    """exact_select=True (the evaluate() path) must pin the sort prefilter:
    selection on the wide-FOV stress scene is identical to prefilter='sort'
    even when the train config runs cull_prefilter=approx (VERDICT r2 #9)."""
    cfg = _cfg(pf="approx", recall=0.95)
    policy = policy_from_config(cfg)
    pts, rayo, rayd = _wide_fov_scene()
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    params = dict(params, points=jnp.asarray(pts))

    # local=True: single-device semantics (the multi-device demotion gate is
    # exercised separately in test_explicit_kernels_demoted_outside_shard_map)
    _, _, _, idx_eval = _attend(params, state, cfg, rayo[None], rayd[None],
                                policy, remat=False, exact_select=True,
                                local=True)
    # eval keeps the training block (cull_block_eval defaults to 0 = same);
    # the pinned property is that the prefilter is the exact sort even
    # though the train config says approx.
    want = np.asarray(select_topk_culled(
        jnp.asarray(pts), state["alive"], jnp.asarray(rayo),
        jnp.asarray(rayd), 8, M=256, block=16, eps=float(cfg.eps),
        interpret=True, prefilter="sort"))
    got = np.asarray(idx_eval).reshape(-1, 8)
    # selection is a set per ray (reference topk uses sorted=False)
    np.testing.assert_array_equal(np.sort(got, axis=-1),
                                  np.sort(want, axis=-1))


def test_cull_recall_knob_reaches_kernel():
    """tpu.cull_recall is plumbed: at a GENEROUS candidate cap (M covers the
    whole cloud, so the cap itself is lossless and the prefilter is the only
    approximation) approx_min_k at high recall matches the exact sort.
    Pre-round-4 this test used M=256, which the cull kernel silently padded
    back to a 2048-wide candidate set; once the cap was honored
    (docs/status_round4.md cull-cap fix) the M truncation dominated the
    comparison, which is the cap's documented behavior, not the knob's."""
    pts, rayo, rayd = _wide_fov_scene()
    alive = jnp.ones(pts.shape[0], bool)
    M = pts.shape[0]  # lossless cap: isolates the prefilter approximation
    a = np.asarray(select_topk_culled(
        jnp.asarray(pts), alive, jnp.asarray(rayo), jnp.asarray(rayd), 8,
        M=M, block=16, interpret=True, prefilter="approx",
        recall_target=0.99))
    b = np.asarray(select_topk_culled(
        jnp.asarray(pts), alive, jnp.asarray(rayo), jnp.asarray(rayd), 8,
        M=M, block=16, interpret=True, prefilter="sort"))
    assert a.shape == b.shape
    overlap = np.mean([len(set(a[i]) & set(b[i])) / 8
                       for i in range(a.shape[0])])
    assert overlap > 0.9, overlap
    # and the knob itself is live: recall_target must reach the
    # approx_min_k primitive. The output-based check used before round 5
    # was a tautology (ADVICE r4), and on CPU approx_min_k is exact for
    # any recall, so outputs genuinely cannot distinguish 0.5 from 0.99 —
    # assert the plumbing structurally via the jaxpr's primitive params.
    def jaxpr_for(recall):
        # M=256 < P: a real cap, so the approx prefilter actually engages
        # (at M=P the lossless-cap fast path skips approx_min_k entirely).
        return str(jax.make_jaxpr(
            lambda p, al, ro, rd: select_topk_culled(
                p, al, ro, rd, 8, M=256, block=16, interpret=True,
                prefilter="approx", recall_target=recall))(
            jnp.asarray(pts), alive, jnp.asarray(rayo), jnp.asarray(rayd)))

    assert "recall_target=0.5" in jaxpr_for(0.5)
    assert "recall_target=0.99" in jaxpr_for(0.99)


def test_render_frame_matches_host_ray_render():
    """render_frame (device-side ray generation from c2w) must reproduce
    render_full_image over host-generated rays exactly (same pixel-center
    convention, same tiling, uint8 output)."""
    from papr_tpu.train.step import render_frame, render_full_image

    cfg = load_config(overrides={
        "use_amp": False, "max_num_pts": 300,
        "geoms": {"points": {"select_k": 4, "init_num": 300}},
        "models": {"attn": {"d_model": 16, "embed": {
            "k_L": [2, 2, 2], "q_L": [2], "v_L": [2, 2],
            "key": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
            "query": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
            "value": {"d_ff": 16, "d_ff_out": 32, "n_ff_layer": 2}}}},
        "tpu": {"ray_chunk": 512},
    })
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.3, -0.2, 2.5]
    H = W = 24
    fx = fy = 30.0
    rayo, rayd = get_rays_np(H, W, fx, fy, c2w[None])

    want = render_full_image(params, state, cfg, rayo, rayd, 16, 16,
                             rgb_only=True, rgb_uint8=True)["rgb"][0]
    got = render_frame(params, state, cfg, c2w, fx, fy, H, W, 16, 16)
    assert got.dtype == np.uint8 and got.shape == (H, W, 3)
    # identical tiling/convention: allow 1-count quantization wobble
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1

    # Non-square frame with different fx/fy and edge padding on both axes —
    # the T&T aspect regime (640x1088 at factor 2) in miniature.
    H2, W2 = 20, 36
    fx2, fy2 = 28.0, 41.0
    rayo2, rayd2 = get_rays_np(H2, W2, fx2, fy2, c2w[None])
    want2 = render_full_image(params, state, cfg, rayo2, rayd2, 16, 16,
                              rgb_only=True, rgb_uint8=True)["rgb"][0]
    got2 = render_frame(params, state, cfg, c2w, fx2, fy2, H2, W2, 16, 16)
    assert got2.shape == (H2, W2, 3)
    assert np.max(np.abs(got2.astype(int) - want2.astype(int))) <= 1

    # Pipelined multi-frame delivery (render_frames, fetch/compute overlap)
    # is the SAME compiled frame function — bit-identical frames, in order.
    from papr_tpu.train.step import render_frames
    c2w_b = c2w.copy()
    c2w_b[:3, 3] = [-0.1, 0.4, 2.8]
    frames = list(render_frames(params, state, cfg, [c2w, c2w_b, c2w],
                                fx, fy, H, W, 16, 16))
    assert len(frames) == 3
    np.testing.assert_array_equal(frames[0], got)
    np.testing.assert_array_equal(frames[2], got)
    want_b = render_frame(params, state, cfg, c2w_b, fx, fy, H, W, 16, 16)
    np.testing.assert_array_equal(frames[1], want_b)


def test_build_loss_lpips_random_fallback():
    """With lpips weight > 0 and no converted VGG asset, build_loss keeps the
    term alive with deterministic random weights (the reference recipe always
    trains with LPIPS; VERDICT r2 #3). Reproducible: two builds agree."""
    from papr_tpu.train.loop import build_loss

    cfg = load_config(overrides={
        "training": {"losses": {"mse": 1.0, "lpips": 0.01, "lpips_alex": 0.0}},
    })
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    t = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    mse = float(jnp.mean((p - t) ** 2))
    l1 = float(build_loss(cfg)(p, t))
    l2 = float(build_loss(cfg)(p, t))
    assert l1 == l2, "random-weight fallback must be deterministic"
    assert abs(l1 - mse) > 1e-7, "lpips term inactive"

    cfg_drop = load_config(overrides={
        "training": {"losses": {"mse": 1.0, "lpips": 0.01,
                                "lpips_alex": 0.0}},
        "tpu": {"lpips_fallback": "drop"},
    })
    assert float(build_loss(cfg_drop)(p, t)) == pytest.approx(mse, rel=1e-6)


def test_explicit_kernels_demoted_outside_shard_map():
    """device_count > 1 + explicit fused_attn/cull outside shard_map must
    fall back to unfused XLA with a warning, not trace pallas_call under
    GSPMD (ADVICE r2 #1)."""
    if jax.device_count() < 2:
        pytest.skip("needs multi-device host")
    import papr_tpu.model.papr as papr_mod
    cfg = _cfg()
    policy = policy_from_config(cfg)
    pts, rayo, rayd = _wide_fov_scene(P=300, H=16, W=16)
    cfg2 = load_config(overrides={
        "use_amp": False, "max_num_pts": 300,
        "geoms": {"points": {"select_k": 4, "init_num": 300}},
        "models": {"attn": {"d_model": 16, "embed": {
            "k_L": [2, 2, 2], "q_L": [2], "v_L": [2, 2],
            "key": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
            "query": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
            "value": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2}}}},
        "tpu": {"topk_impl": "cull", "fused_attn": "streamrec"},
    })
    params, state = create_model(cfg2, jax.random.PRNGKey(0))
    papr_mod._warned_multi.clear()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _attend(params, state, cfg2, rayo[None], rayd[None], policy,
                remat=False)  # local=False: potentially GSPMD
    msgs = [str(w.message) for w in rec]
    assert any("tpu.topk_impl=cull" in m for m in msgs), msgs
    assert any("tpu.fused_attn=streamrec" in m for m in msgs), msgs


def test_mxu_reduce_matches_vpu_reduce(monkeypatch):
    """fused_mlp._bsum (MXU lane-reduce) must equal the masked VPU sum, and
    _ln_fwd/_ln_bwd must be numerically identical under either reduction
    path (PAPR_MXU_REDUCE toggles a module global read at trace time)."""
    import numpy as np
    import jax.numpy as jnp
    import papr_tpu.ops.fused_mlp as fm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32))
    for n_true in (3, 117, 256):
        ref = np.sum(np.asarray(x)[:, :n_true], axis=1, keepdims=True)
        got = np.asarray(fm._bsum(x, n_true, 0.5))
        assert got.shape == (64, 256)
        np.testing.assert_allclose(got[:, :1], 0.5 * ref, rtol=5e-5,
                                   atol=5e-5)
        # every lane equal (broadcast for free)
        assert np.allclose(got, got[:, :1])

    a = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32))
    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(fm, "_MXU_REDUCE", flag)
        y, d, r, h = fm._ln_fwd(x, a, b, 117, 1e-5)
        g_m = jnp.where(fm._lane_mask(g.shape, 117), g, 0.0)
        dx, da, db = fm._ln_bwd(g_m, d, r, h, a, 117, 1e-5)
        outs[flag] = [np.asarray(t) for t in (y, dx, da, db)]
    for u, v in zip(outs[False], outs[True]):
        np.testing.assert_allclose(u, v, rtol=5e-5, atol=5e-5)


def test_mxu_reduce_reaches_stream_attn_helpers(monkeypatch):
    """stream_attn reads fused_mlp._MXU_REDUCE at call time (not a copied
    import-time value), and its MXU variants (_dot_col, _rec_lane,
    _geom_fwd/_geom_bwd) match the VPU forms."""
    import numpy as np
    import jax.numpy as jnp
    import papr_tpu.ops.fused_mlp as fm
    import papr_tpu.ops.stream_attn as sa

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((32, 256)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((32, 256)).astype(np.float32))
    rec = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    lane3 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) < 3
    sel = jnp.where(lane3, x, 0.0)
    rayo = jnp.where(lane3, y[:1], 0.0)
    rays = jnp.where(lane3, y, 0.0)
    g1 = jnp.where(lane3, jnp.asarray(
        rng.standard_normal(x.shape).astype(np.float32)), 0.0)
    g2 = jnp.where(lane3, jnp.asarray(
        rng.standard_normal(x.shape).astype(np.float32)), 0.0)

    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(fm, "_MXU_REDUCE", flag)
        dot = sa._dot_col(sel, rays, 3, 0.25)
        rl = sa._rec_lane(rec, 5)
        proj, perp, saved = sa._geom_fwd(sel, rayo, rays, 1e-6)
        bwd = sa._geom_bwd(g1, g2, rays, saved, 1e-6)
        outs[flag] = [np.asarray(t) for t in
                      (dot, rl, proj, perp) + tuple(jnp.atleast_2d(b)
                                                    for b in bwd)]
    assert len(outs[False]) == len(outs[True])
    for u, v in zip(outs[False], outs[True]):
        np.testing.assert_allclose(u, v, rtol=5e-5, atol=5e-5)


def test_get_rays_jnp_matches_host_convention():
    """The device-side serving-path ray generator equals get_rays_np at
    fineness=1 (one source of truth for the camera convention)."""
    import numpy as np
    import jax.numpy as jnp
    from papr_tpu.ops.geometry import get_rays_jnp, get_rays_np

    rng = np.random.default_rng(0)
    # a valid c2w: random rotation (QR) + translation
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = q.astype(np.float32)
    c2w[:3, 3] = rng.standard_normal(3).astype(np.float32)
    H, W, fx, fy = 12, 20, 31.7, 29.3

    ro_np, rd_np = get_rays_np(H, W, fx, fy, c2w[None])
    ro_j, rd_j = get_rays_jnp(H, W, jnp.asarray(c2w),
                              jnp.asarray([fx, fy], jnp.float32))
    np.testing.assert_allclose(np.asarray(ro_j).reshape(3), ro_np[0].reshape(3),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd_j), rd_np[0], rtol=1e-5,
                               atol=1e-5)


def test_mxu_reduce_per_config_coexistence(monkeypatch):
    """tpu.mxu_reduce is threaded per-call as a static kernel arg (VERDICT
    r3 #8: no create_model-time global mutation): resolve_mxu_reduce maps
    the config, traces with opposite flags coexist in one process (their
    jaxprs differ — the MXU path reduces via dot_general — while outputs
    agree), and the module default is restored after each trace."""
    import numpy as np
    import jax.numpy as jnp
    import papr_tpu.ops.fused_mlp as fm
    from papr_tpu.config import load_config
    from papr_tpu.ops.fused_mlp import fused_mlp, resolve_mxu_reduce

    mk = lambda **tpu: load_config(overrides={"tpu": tpu} if tpu else {})
    assert resolve_mxu_reduce(mk(mxu_reduce=True)) is True
    assert resolve_mxu_reduce(mk(mxu_reduce=False)) is False
    assert resolve_mxu_reduce(mk()) is None         # "env" -> process default

    monkeypatch.setattr(fm, "_MXU_REDUCE", False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    ws = (jnp.asarray(rng.standard_normal((48, 32)).astype(np.float32)),)
    bs = (jnp.zeros((32,), jnp.float32),)
    ln = (jnp.ones((48,), jnp.float32), jnp.zeros((48,), jnp.float32))

    call = lambda flag: fused_mlp(x, ws, bs, ln, None, "relu", "none", True,
                                  512, None, None, flag)
    jaxprs, outs = {}, {}
    for flag in (False, True):
        jaxprs[flag] = str(jax.make_jaxpr(lambda: call(flag))())
        outs[flag] = np.asarray(call(flag))
        assert fm._MXU_REDUCE is False     # scope restored after each trace
    np.testing.assert_allclose(outs[True], outs[False], rtol=5e-5, atol=5e-5)
    # the MXU-reduce trace runs extra dot_generals for the LN reductions
    assert (jaxprs[True].count("dot_general")
            > jaxprs[False].count("dot_general"))


def test_vmem_budget_threading_and_validation():
    """tpu.vmem_mb reaches _cp as a static arg; budgets past the 100 MB
    safety cap raise instead of crashing the worker at runtime (ADVICE r3)."""
    import pytest
    from papr_tpu.ops.stream_attn import _cp, _validate_mb

    assert _cp(True, 0, 64) == {}                    # interpret: no annotation
    assert _cp(False, 0, 0) == {} or "compiler_params" in _cp(False, 0, 0)
    got = _cp(False, 0, 37)
    assert got["compiler_params"].vmem_limit_bytes == 37 << 20
    assert _cp(False, 20, 8)["compiler_params"].vmem_limit_bytes == 20 << 20
    with pytest.raises(ValueError, match="outside"):
        _validate_mb(101, "tpu.vmem_mb")
    with pytest.raises(ValueError, match="outside"):
        _cp(False, 0, 128)


def _tiny_cfg(fa=None, topk="cull", P=64, k=4):
    over = {
        "use_amp": False, "max_num_pts": P,
        "geoms": {"points": {"select_k": k, "init_num": P},
                  "background": {"constant": 3.0}},
        "models": {"attn": {"d_model": 16, "embed": {
            "k_L": [2, 2, 2], "q_L": [2], "v_L": [2, 2],
            "key": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
            "query": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
            "value": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2}}}},
        "tpu": {"topk_impl": topk, "cull_candidates": 64},
    }
    if fa is not None:
        over["tpu"]["fused_attn"] = fa
    return load_config(overrides=over)


@pytest.mark.parametrize("fa", [None, "streamrec"])
def test_all_dead_rays_render_finite_pure_background(fa):
    """Rays whose every selected slot is dead (foreground softmax mass
    EXACTLY 0 — possible only in the padded static-shape design, never in
    the reference's dynamic shapes) must render the pure background color
    with finite gradients, not 0/0 = NaN through the renormalization
    (regression: t2-shaped eval produced NaN for 13,760 border pixels).
    Covers the unfused epilogue and the value-stream kernel (interpret)."""
    cfg = _tiny_cfg(fa=fa)
    policy = policy_from_config(cfg)
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    state = dict(state, alive=jnp.zeros_like(state["alive"]))
    rng = np.random.default_rng(0)
    rayo = jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 3.0)
    rayd = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)
    rayd = jnp.asarray(rayd)

    def loss(p):
        fused, attn, _, _ = _attend(p, state, cfg, rayo, rayd, policy,
                                    remat=False, local=True)
        return jnp.sum(fused ** 2) + jnp.sum(attn ** 2), (fused, attn)

    (l, (fused, attn)), grads = jax.value_and_grad(loss, has_aux=True)(params)
    fused, attn = np.asarray(fused), np.asarray(attn)
    assert np.isfinite(float(l))
    assert np.isfinite(fused).all(), "NaN leaked through the renorm guard"
    np.testing.assert_allclose(fused, 0.0, atol=1e-7)
    # all foreground mass on the background token: pure-bkg composite
    np.testing.assert_allclose(attn[..., -1], 1.0, atol=1e-6)
    flat, _ = jax.tree_util.tree_flatten(grads)
    for g in flat:
        assert np.isfinite(np.asarray(g)).all(), "NaN gradient"


def test_render_full_image_edge_pads_nontile_shapes():
    """render_full_image must edge-replicate (not zero-pad) the overhang
    when H/W is not a tile multiple: zero ray directions poison the cull
    kernel's per-block cone bounds for VALID rays sharing a 16-pixel block
    with the pad (regression: t2 640x1088 eval with 100-px tiles selected
    all-dead slots for the bottom 8 rows / right 8 cols -> NaN)."""
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import render_full_image

    cfg = _tiny_cfg(topk="cull", P=64, k=4)
    policy = policy_from_config(cfg)
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    H, W = 24, 40
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 0, 2.5]
    rayo, rayd = get_rays_np(H, W, 30.0, 30.0, c2w[None])

    # tile 16 -> pads 24x40 to 32x48 (overhang blocks mix valid+pad rays);
    # tile (24, 40) -> single exact tile, the oracle.
    out_pad = render_full_image(params, state, cfg, rayo, rayd, 16, 16,
                                policy=policy, with_extras=True)
    out_exact = render_full_image(params, state, cfg, rayo, rayd, H, W,
                                  policy=policy, with_extras=True)
    assert np.isfinite(out_pad["rgb"]).all()
    fg = np.asarray(out_pad["attn"])[0, ..., 0][..., :-1].sum(-1)
    assert (fg > 0).all(), "edge rays lost all alive selections"
    # Different tilings give different cull-block cones -> near-tie
    # selection differences; only gross corruption is a regression here.
    np.testing.assert_allclose(out_pad["rgb"], out_exact["rgb"], atol=0.05)


def test_render_fn_cache_bounded():
    """The full-render jit cache is a bounded LRU: old cfg pins drop out
    (VERDICT r3 weak: id(cfg)-keyed caches pinned cfgs forever)."""
    from papr_tpu.train.step import _JIT_CACHE_CAP, _full_render_fn

    cache = {}
    cfgs = [load_config(overrides={"max_num_pts": 16 + i}) for i in range(12)]
    fns = []
    for cfg in cfgs:
        fns.append(_full_render_fn(cfg, policy_from_config(cfg), False,
                                   _cache=cache))
    assert len(cache) == _JIT_CACHE_CAP
    # most-recent entries survive; a hit refreshes recency and returns the
    # SAME jitted fn
    assert _full_render_fn(cfgs[-1], policy_from_config(cfgs[-1]), False,
                           _cache=cache) is fns[-1]
    assert (id(cfgs[-1]), False, True, False) in cache
    assert (id(cfgs[0]), False, True, False) not in cache
