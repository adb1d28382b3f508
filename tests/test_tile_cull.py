"""Tile cone-culling selection vs the exact implementation, on realistic
camera rays (coherence is the point)."""

import jax.numpy as jnp
import numpy as np

from papr_tpu.ops.geometry import get_rays_np
from papr_tpu.ops.tile_cull import select_topk_culled, tile_rays, untile_indices
from papr_tpu.ops.topk import select_topk


def _camera_scene(P=3000, H=32, W=32, seed=0, dead=None):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(P, 3)).astype(np.float32) * 0.5
    alive = np.ones(P, bool)
    if dead:
        alive[dead[0]:dead[1]] = False
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0, 0, 2.5]
    rayo, rayd = get_rays_np(H, W, 40.0, 40.0, c2w[None])
    return pts, alive, rayo[0], rayd[0]


def test_tile_untile_roundtrip():
    rng = np.random.default_rng(1)
    rays = rng.normal(size=(20, 24, 3)).astype(np.float32)
    tiles, meta = tile_rays(jnp.asarray(rays), block=16)
    # identity payload: encode flat ray id, tile it, untile it
    ids = np.arange(20 * 24).reshape(20, 24, 1).astype(np.int32)
    t, meta2 = tile_rays(jnp.asarray(ids.astype(np.float32)).repeat(3, -1), 16)
    back = untile_indices(t[..., :1].astype(np.int32), meta2)
    np.testing.assert_array_equal(np.asarray(back)[:, 0],
                                  np.arange(20 * 24))


def test_culled_matches_exact_selection():
    pts, alive, rayo, rayd = _camera_scene(dead=(100, 200))
    k = 8
    got = np.asarray(select_topk_culled(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
        jnp.asarray(rayd), k, M=1024, block=16, interpret=True))
    want = np.asarray(select_topk(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
        jnp.asarray(rayd).reshape(-1, 3), k, chunk=512))
    assert got.shape == want.shape
    assert not np.isin(got, np.arange(100, 200)).any()
    overlap = np.mean([len(set(got[i]) & set(want[i])) / k
                       for i in range(got.shape[0])])
    assert overlap > 0.99, overlap


def test_culled_nonaligned_image():
    # M=1024 (not 512): since round 4 the candidate cap is HONORED below
    # the old 2048 chunk floor, and 512 of 2048 points is too tight a cap
    # for this scene's cone spread (the pre-round-4 code silently ran all
    # 2048 candidates regardless of M, see _chunk_for).
    pts, alive, rayo, rayd = _camera_scene(P=2048, H=23, W=37, seed=2)
    k = 6
    got = np.asarray(select_topk_culled(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
        jnp.asarray(rayd), k, M=1024, block=16, interpret=True))
    assert got.shape == (23 * 37, k)
    want = np.asarray(select_topk(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
        jnp.asarray(rayd).reshape(-1, 3), k, chunk=256))
    overlap = np.mean([len(set(got[i]) & set(want[i])) / k
                       for i in range(got.shape[0])])
    assert overlap > 0.98, overlap


def test_model_forward_consistent_across_impls():
    """forward() with impl=cull vs impl=xla agree at the RGB level."""
    import jax
    from papr_tpu.config import load_config
    from papr_tpu.model.papr import create_model, forward

    def cfg_with(impl):
        return load_config(overrides={
            "use_amp": False, "max_num_pts": 512,
            "dataset": {"coord_scale": 1.0},
            "geoms": {"points": {"select_k": 6, "init_num": 500},
                      "point_feats": {"dim": 8}},
            "models": {"attn": {"d_model": 16, "embed": {
                "k_L": [2, 2, 2], "q_L": [2], "v_L": [2, 2],
                "key": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
                "query": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
                "value": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2}}}},
            "tpu": {"topk_impl": impl, "ray_chunk": 512,
                    "cull_candidates": 256, "cull_block": 16,
                    "force_local": True},
        })

    params, state = create_model(cfg_with("xla"), jax.random.PRNGKey(0))
    pts, alive, rayo, rayd = _camera_scene(P=500, H=16, W=16, seed=3)
    params = dict(params)
    params["points"] = jnp.asarray(np.pad(pts, ((0, 12), (0, 0))))
    state = dict(state)
    state["alive"] = jnp.asarray(np.pad(alive, (0, 12)))

    outs = {}
    for impl in ("xla", "cull"):
        outs[impl] = np.asarray(forward(params, state, cfg_with(impl),
                                        rayo[None], rayd[None]))
    # small pixel-level differences allowed where near-tie selections differ
    close = np.isclose(outs["xla"], outs["cull"], rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.995, close.mean()


def test_culled_packsort_prefilter_matches_sort_selection():
    """tpu.cull_prefilter_eval=packsort (the eval default): the packed
    single-array sort selects the same winners as the exact pair sort —
    differences are confined to pack-quantization ties the stage-3 kernel
    cannot distinguish either way."""
    pts, alive, rayo, rayd = _camera_scene(dead=(100, 200))
    k = 8
    args = (jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
            jnp.asarray(rayd), k)
    kw = dict(M=1024, block=16, interpret=True)
    got = np.asarray(select_topk_culled(*args, prefilter="packsort", **kw))
    want = np.asarray(select_topk_culled(*args, prefilter="sort", **kw))
    assert not np.isin(got, np.arange(100, 200)).any()
    overlap = np.mean([len(set(got[i]) & set(want[i])) / k
                       for i in range(got.shape[0])])
    assert overlap > 0.999, overlap


def test_culled_approx_prefilter_matches_exact_selection():
    """tpu.cull_prefilter=approx: aggregate-reduction candidate prefilter
    keeps selection identity (winners have the smallest lower bounds)."""
    pts, alive, rayo, rayd = _camera_scene(dead=(100, 200))
    k = 8
    got = np.asarray(select_topk_culled(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
        jnp.asarray(rayd), k, M=1024, block=16, interpret=True,
        prefilter="approx"))
    want = np.asarray(select_topk(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
        jnp.asarray(rayd).reshape(-1, 3), k, chunk=512))
    assert not np.isin(got, np.arange(100, 200)).any()
    overlap = np.mean([len(set(got[i]) & set(want[i])) / k
                       for i in range(got.shape[0])])
    assert overlap > 0.99, overlap


def test_cull_chunk_narrows_with_candidate_cap():
    """Round-4 regression: M below the VMEM-tuned 2048 must narrow the
    extract loop (the old floor padded M=1024 back up to a 2048-wide loop,
    silently running an uncapped selection and eating the entire speedup;
    docs/status_round4.md A/B table)."""
    from papr_tpu.ops.tile_cull import _chunk_for
    assert _chunk_for(256, 1024) == 1024     # cap narrows the chunk
    assert _chunk_for(256, 512) == 512
    assert _chunk_for(256, 100) == 512       # lane-alignment floor
    assert _chunk_for(256, 4096) == 2048     # VMEM cap still binds
    assert _chunk_for(1024, 4096) == 512     # big eval tiles keep 2 MB scratch
    assert _chunk_for(256, 1500) == 1536     # 512-aligned round-up


def test_cull_candidate_cap_is_honored():
    """A tight M must actually change the selection (pre-round-4 any
    M < 2048 silently ran take=2048 candidates, so the cap was a no-op)."""
    pts, alive, rayo, rayd = _camera_scene(P=2048, H=23, W=37, seed=2)
    k = 6
    kw = dict(block=16, interpret=True)
    tight = np.asarray(select_topk_culled(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
        jnp.asarray(rayd), k, M=512, **kw))
    full = np.asarray(select_topk_culled(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
        jnp.asarray(rayd), k, M=2048, **kw))
    want = np.asarray(select_topk(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
        jnp.asarray(rayd).reshape(-1, 3), k, chunk=256))

    def overlap(a):
        return np.mean([len(set(a[i]) & set(want[i])) / k
                        for i in range(a.shape[0])])

    ov_tight, ov_full = overlap(tight), overlap(full)
    # The uncapped run is exact-ish; the capped one must differ (cap applied)
    # yet stay a sound lower-bound truncation (winners it keeps are real).
    assert ov_full > 0.999, ov_full
    assert ov_tight < ov_full, (ov_tight, ov_full)
    assert ov_tight > 0.75, ov_tight   # 0.817 measured: truncation, not junk


def test_cull_early_exit_is_exact():
    """The sorted-prefilter early exit must be output-IDENTICAL to the full
    loop (it only skips chunks whose lower bounds prove they cannot alter
    the result; the round-4 LB^2 fix is covered by the squared-distance
    comparison these scenes exercise)."""
    for P, H, W, k, M, pf in [(3000, 32, 32, 8, 2048, "sort"),
                              (3000, 32, 32, 8, 2048, "packsort"),
                              (3000, 32, 32, 8, 4096, "sort"),
                              (600, 16, 16, 8, 2048, "sort")]:
        pts, alive, rayo, rayd = _camera_scene(P=P, H=H, W=W, dead=(50, 150))
        args = (jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(rayo),
                jnp.asarray(rayd), k)
        a = np.asarray(select_topk_culled(
            *args, M=M, block=16, interpret=True, prefilter=pf,
            early_exit=True))
        b = np.asarray(select_topk_culled(
            *args, M=M, block=16, interpret=True, prefilter=pf,
            early_exit=False))
        np.testing.assert_array_equal(a, b, err_msg=f"{P},{k},{M},{pf}")
