"""tpu.int8_eval: int8-quantized eval walks in the one-shot eval kernel.

The render path's device floor is the two embedder walks (~249 of 444
ms/frame, docs/status_round4.md); v5e's MXU runs int8 at 2x the bf16 rate
(tools/int8_walk_microbench.py: static-scale int8 1.3-1.6x at the walk's
shapes). tpu.int8_eval quantizes BOTH walks' dense stacks inside
attend_stream_eval (ops/stream_attn.py walk_body_fwd_q): per-column
activation scales self-calibrated per call (_walk_amax), folded into
per-output-channel int8 weights (_quantize_walk). Forward/eval only —
training numerics never touch it.

These tests pin (a) op-level closeness to the fp kernel, (b) the model
surface (evaluate) staying close and finite, (c) the warn-and-ignore path
when the one-shot kernel is not active, and (d) the quantizer's
reconstruction bound.
"""

import sys
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, ".")


def _toy_attend_args(seed=0, K=4, T=64, dm=8, width=32, n_layers=3):
    rng = np.random.default_rng(seed)
    rp = 128
    rec = np.zeros((K, T, rp), np.float32)
    rec[..., :3] = rng.normal(size=(K, T, 3))
    rec[..., 3] = rng.uniform(0.5, 2.0, size=(K, T))      # influence
    rec[..., 4] = 1.0                                     # alive
    rayo = rng.normal(size=(T, 3)).astype(np.float32)
    rays = rng.normal(size=(T, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    qq = rng.normal(size=(T, dm)).astype(np.float32)

    def stack(d_in):
        ws, bs, d = [], [], d_in
        for _ in range(n_layers):
            w = rng.normal(size=(d, width)).astype(np.float32)
            ws.append(jnp.asarray(w / np.sqrt(d)))
            bs.append(jnp.asarray(
                rng.normal(size=(width,)).astype(np.float32) * 0.1))
            d = width
        return ws, bs

    k_desc = ((2, 2, 2), 1, 2.0, 1.0, 0)
    v_desc = ((2, 2), 1, 2.0, 1.0, 0)
    d0k = 3 * 3 * (1 + 2 * 2)
    d0v = 2 * 3 * (1 + 2 * 2)
    kws, kbs = stack(d0k)
    vws, vbs = stack(d0v)
    wk = jnp.asarray(rng.normal(size=(dm, width)).astype(np.float32) * 0.2)
    bk = jnp.zeros((dm,), jnp.float32)
    args = (jnp.asarray(rec), jnp.asarray(rayo), jnp.asarray(rays),
            jnp.asarray(qq), kws, kbs, None, None, wk, bk, vws, vbs,
            None, None)
    return args, dict(k_desc=k_desc, v_desc=v_desc, tile=32, interpret=True)


def test_int8_attend_close_to_fp_kernel():
    """Op level: the int8 kernel tracks the fp one-shot kernel on random
    (untrained — worst-case dynamic range) weights within int8 error."""
    from papr_tpu.ops.stream_attn import attend_stream_eval

    args, kw = _toy_attend_args()
    fused_fp, attn_fp = attend_stream_eval(*args, **kw)
    fused_q, attn_q = attend_stream_eval(*args, int8=True, **kw)
    assert np.all(np.isfinite(np.asarray(fused_q)))
    scale = float(np.abs(np.asarray(fused_fp)).max())
    assert float(np.abs(np.asarray(fused_fp - fused_q)).max()) < 0.05 * scale
    # attention rows stay valid distributions and close
    a_q = np.asarray(attn_q)
    np.testing.assert_allclose(a_q.sum(axis=-1), 1.0, atol=1e-5)
    assert float(np.abs(np.asarray(attn_fp) - a_q).max()) < 0.02


def test_int8_eval_model_surface():
    """Model level: evaluate() with tpu.int8_eval stays close to the fp
    render on the real surface (both kernels live, odd shape overhang)."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model, evaluate

    kern = {"fused_attn": "streamrec", "eval_fused": True}
    cfg_fp = tiny_cfg(tpu=dict(kern))
    cfg_q = tiny_cfg(tpu={**kern, "int8_eval": True})
    params, state = create_model(cfg_fp, jax.random.PRNGKey(0))
    rayo, rayd, _ = _rays(H=9, W=11)
    fp = evaluate(params, state, cfg_fp, rayo, rayd)
    q = evaluate(params, state, cfg_q, rayo, rayd)
    for a, b, name in zip(fp, q, ("fused", "attn")):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), name
        tol = 0.05 * (np.abs(a).max() + 1e-9)
        assert np.abs(a - b).max() < tol, name


def test_int8_train_step_untouched():
    """tpu.int8_eval NEVER quantizes training: the train step on an
    int8_eval config is bit-identical to the plain streamrec config."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import make_opt_state, make_train_step

    rayo, rayd, c2w = _rays(H=8, W=8)
    target = np.random.default_rng(0).random((1, 8, 8, 3), np.float32)
    losses = {}
    for name, tpu in (("fp", {"fused_attn": "streamrec"}),
                      ("q", {"fused_attn": "streamrec", "int8_eval": True})):
        cfg = tiny_cfg(tpu=tpu)
        params, state = create_model(cfg, jax.random.PRNGKey(0))
        opt = make_opt_state(cfg, params)
        step_fn, _ = make_train_step(cfg, donate=False)
        _, _, loss, _ = step_fn(params, opt, state, rayo, rayd, target,
                                c2w, 0)
        losses[name] = float(loss)
    assert losses["q"] == losses["fp"]


def test_int8_ignored_warns_when_one_shot_kernel_inactive():
    """tpu.int8_eval with tpu.eval_fused false: warn once, render equals
    the fp two-kernel path exactly (the flag must not silently change
    which kernels run)."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model, evaluate

    cfg_fp = tiny_cfg(tpu={"fused_attn": "streamrec", "eval_fused": False})
    cfg_q = tiny_cfg(tpu={"fused_attn": "streamrec", "eval_fused": False,
                          "int8_eval": True})
    params, state = create_model(cfg_fp, jax.random.PRNGKey(0))
    rayo, rayd, _ = _rays(H=8, W=8)
    fp = evaluate(params, state, cfg_fp, rayo, rayd)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        q = evaluate(params, state, cfg_q, rayo, rayd)
    assert any("int8_eval" in str(w.message) for w in rec)
    for a, b in zip(fp, q):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantize_walk_reconstruction():
    """_quantize_walk: dequantized weights reconstruct the folded fp
    weights to within one int8 step per factor, and zero-amax (dead)
    input columns contribute exactly zero."""
    from papr_tpu.ops.stream_attn import _quantize_walk

    rng = np.random.default_rng(1)
    d_in, d_out = 128, 128
    w = jnp.asarray(rng.normal(size=(d_in, d_out)).astype(np.float32))
    amax = rng.uniform(0.1, 8.0, size=(1, d_in)).astype(np.float32)
    amax[0, 5] = 0.0                         # a dead input column
    wq, inv, dq = _quantize_walk([w], [d_in, d_out], [jnp.asarray(amax)])
    # emulate the kernel on x = amax (the extreme representable input)
    x = jnp.asarray(amax)
    q = jnp.clip(jnp.round(x * inv[0]), -127, 127).astype(jnp.int8)
    z = jnp.dot(q.astype(jnp.int32), wq[0].astype(jnp.int32))
    z = z.astype(jnp.float32) * dq[0]
    z_ref = jnp.dot(jnp.asarray(amax).at[0, 5].set(0.0), w)
    err = float(np.abs(np.asarray(z - z_ref)).max())
    # two rounding stages (weights + activations): bound by the dequant
    # scale times the summed per-element half-steps
    bound = float((np.abs(np.asarray(amax)).sum() / 127.0
                   * np.abs(np.asarray(w)).max())
                  + np.asarray(dq[0]).max() * d_in)
    assert err < bound
    # dead column: inverse scale is 0 so any input there quantizes to 0
    assert float(np.asarray(inv[0])[0, 5]) == 0.0


def test_int8_frame_level_calibration_close_to_fp():
    """Tiled renders hoist the int8 calibration to once per frame
    (eval_quant_params): the full-image int8 render must stay close to the
    fp render — frame-level amax is a conservative superset of the
    per-tile one, so closeness bounds both the quantization and the
    calibration-transfer error."""
    from test_round2_fixes import tiny_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import render_full_image

    kern = {"fused_attn": "streamrec", "eval_fused": True}
    cfg_fp = tiny_cfg(tpu=dict(kern))
    cfg_q = tiny_cfg(tpu={**kern, "int8_eval": True})
    params, state = create_model(cfg_fp, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    rayo = rng.normal(size=(1, 3)).astype(np.float32) * 3.0
    rayd = rng.normal(size=(1, 20, 24, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)
    fp = render_full_image(params, state, cfg_fp, rayo, rayd, 10, 12)
    q = render_full_image(params, state, cfg_q, rayo, rayd, 10, 12)
    for k in ("rgb", "bkg_attn"):
        a, b = np.asarray(fp[k]), np.asarray(q[k])
        assert np.all(np.isfinite(b)), k
        tol = 0.06 * (np.abs(a).max() + 1e-9)
        assert np.abs(a - b).max() < tol, (k, np.abs(a - b).max(), tol)


def test_int8_mesh_render_matches_local_int8():
    """tpu.int8_eval on a sharded (2, 4) mesh render: every device runs the
    int8 one-shot kernel on its tiles with per-tile self-calibration —
    identical to the single-device int8 render (same per-tile trace, so
    the same calibration subsample and quantization on both paths)."""
    from papr_tpu.config import load_config
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import render_full_image

    overrides = {
        "use_amp": False, "max_num_pts": 256,
        "geoms": {"points": {"init_num": 200, "select_k": 8}},
    }
    kern = {"fused_attn": "streamrec", "topk_impl": "cull",
            "int8_eval": True}
    cfg_local = load_config(overrides={**overrides,
                                       "tpu": {**kern, "force_local": True}})
    cfg_mesh = load_config(overrides={
        **overrides, "tpu": {**kern, "mesh": {"data": 2, "rays": 4}}})

    params, state = create_model(cfg_local, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    rayo = rng.normal(size=(1, 3)).astype(np.float32) * 3.0
    rayd = rng.normal(size=(1, 19, 22, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out_l = render_full_image(params, state, cfg_local, rayo, rayd,
                                  8, 10)
        out_m = render_full_image(params, state, cfg_mesh, rayo, rayd,
                                  8, 10)
    for k in ("rgb", "bkg_attn"):
        np.testing.assert_allclose(out_m[k], out_l[k], atol=1e-5,
                                   err_msg=k)
