"""tpu.int8_train: int8-quantized TRAINING forward walks in the rec-native
streamed kernels (key_stream_scores_rec / value_stream_fuse_rec).

The rec kernels' backward never stores walk activations — it recomputes the
walk from the inputs in the compute dtype (_ksr_bwd_kernel/_vsr_bwd_kernel).
int8_train exploits exactly that structure: the FORWARD walk runs int8
(walk_body_fwd_q, the same self-calibrating quantization as tpu.int8_eval)
while the backward recompute stays bf16/fp32 — a straight-through estimator.
The softmax backward remains exact because it consumes the (raw, ss)
residuals the int8 forward actually wrote.

Tests pin: (a) op-level forward closeness + both kernels' grads flowing and
tracking the fp grads, (b) the train-step surface (loss close, params move),
(c) eval/render traces ignoring the flag entirely, and (d) the
warn-and-ignore path when the rec-native two-kernel path is not active.
"""

import sys
import warnings

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from test_int8_eval import _toy_attend_args


def test_int8_key_stream_forward_and_grads():
    """key_stream_scores_rec(int8=True): forward tracks fp within int8
    error; gradients exist, are finite, and track the fp-path gradients
    (the backward is the SAME bf16 recompute either way — only the softmax
    residuals differ by the forward's quantization error)."""
    from papr_tpu.ops.stream_attn import key_stream_scores_rec

    (rec, rayo, rays, qq, kws, kbs, _, _, wk, bk, *_), kw = _toy_attend_args()
    kws, kbs = tuple(kws), tuple(kbs)
    k_desc, tile = kw["k_desc"], kw["tile"]

    def run(int8):
        def f(rec, qq, ws, wk):
            attn = key_stream_scores_rec(
                rec, rayo, rays, qq, ws, kbs, None, None, wk, bk,
                k_desc, "relu", "none", "relu", 5.0, 1e-6, tile,
                True, None, None, 0, int8)
            return jnp.sum(attn[:, :-1] ** 2), attn
        (loss, attn), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2, 3), has_aux=True)(rec, qq, kws, wk)
        return loss, attn, grads

    loss_fp, attn_fp, g_fp = run(False)
    loss_q, attn_q, g_q = run(True)
    assert np.all(np.isfinite(np.asarray(attn_q)))
    assert float(np.abs(np.asarray(attn_fp - attn_q)).max()) < 0.02
    for a, b in zip(jax.tree.leaves(g_fp), jax.tree.leaves(g_q)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() < 0.1 * scale


def test_int8_value_stream_forward_and_grads():
    """value_stream_fuse_rec(int8=True): same contract on the value side."""
    from papr_tpu.ops.stream_attn import value_stream_fuse_rec

    (rec, rayo, rays, _, _, _, _, _, _, _, vws, vbs, _, _), kw = \
        _toy_attend_args()
    vws, vbs = tuple(vws), tuple(vbs)
    v_desc, tile = kw["v_desc"], kw["tile"]
    K, T, _ = rec.shape
    rng = np.random.default_rng(7)
    attn = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(T, K + 1)).astype(np.float32)), axis=-1)

    def run(int8):
        def f(rec, attn, ws):
            fused = value_stream_fuse_rec(
                rec, rayo, rays, attn, ws, vbs, None, None, v_desc,
                "relu", "none", True, 1e-6, tile, True, None, None, 0,
                int8)
            return jnp.sum(fused ** 2), fused
        (loss, fused), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2), has_aux=True)(rec, attn, vws)
        return fused, grads

    fused_fp, g_fp = run(False)
    fused_q, g_q = run(True)
    assert np.all(np.isfinite(np.asarray(fused_q)))
    scale = float(np.abs(np.asarray(fused_fp)).max())
    assert float(np.abs(np.asarray(fused_fp - fused_q)).max()) < 0.05 * scale
    for a, b in zip(jax.tree.leaves(g_fp), jax.tree.leaves(g_q)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        s = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() < 0.1 * s


def test_int8_train_step_surface():
    """Train-step level: tpu.int8_train runs end to end, the loss tracks
    the fp step, and parameters actually move (grads flow through both
    quantized kernels)."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import make_opt_state, make_train_step

    rayo, rayd, c2w = _rays(H=8, W=8)
    target = np.random.default_rng(0).random((1, 8, 8, 3), np.float32)
    out = {}
    for name, tpu in (("fp", {"fused_attn": "streamrec"}),
                      ("q", {"fused_attn": "streamrec", "int8_train": True})):
        cfg = tiny_cfg(tpu=tpu)
        params, state = create_model(cfg, jax.random.PRNGKey(0))
        p0 = jax.tree.map(np.asarray, params)
        opt = make_opt_state(cfg, params)
        step_fn, _ = make_train_step(cfg, donate=False)
        params, _, loss, _ = step_fn(params, opt, state, rayo, rayd,
                                     target, c2w, 0)
        out[name] = (float(loss), p0, jax.tree.map(np.asarray, params))
    loss_fp, _, _ = out["fp"]
    loss_q, p0, p1 = out["q"]
    assert np.isfinite(loss_q)
    assert abs(loss_q - loss_fp) < 0.05 * abs(loss_fp) + 1e-3
    moved = any(np.abs(a - b).max() > 0
                for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)))
    assert moved


def test_int8_train_leaves_eval_untouched():
    """tpu.int8_train must never change an eval/render trace: evaluate()
    under the flag is bit-identical to the plain config (int8 eval has its
    own knob)."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model, evaluate

    kern = {"fused_attn": "streamrec"}
    cfg_fp = tiny_cfg(tpu=dict(kern))
    cfg_q = tiny_cfg(tpu={**kern, "int8_train": True})
    params, state = create_model(cfg_fp, jax.random.PRNGKey(0))
    rayo, rayd, _ = _rays(H=9, W=11)
    fp = evaluate(params, state, cfg_fp, rayo, rayd)
    q = evaluate(params, state, cfg_q, rayo, rayd)
    for a, b in zip(fp, q):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_train_ignored_warns_on_qfold():
    """int8_train + query folding: warn once, fall back to the fp folded
    kernel (the flag must not silently change which kernels run)."""
    from test_round2_fixes import _rays, tiny_cfg
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import make_opt_state, make_train_step

    rayo, rayd, c2w = _rays(H=8, W=8)
    target = np.random.default_rng(0).random((1, 8, 8, 3), np.float32)
    losses = {}
    for name, tpu in (
            ("fp", {"fused_attn": "streamrec", "query_fold": True}),
            ("q", {"fused_attn": "streamrec", "query_fold": True,
                   "int8_train": True})):
        cfg = tiny_cfg(tpu=tpu)
        params, state = create_model(cfg, jax.random.PRNGKey(0))
        opt = make_opt_state(cfg, params)
        step_fn, _ = make_train_step(cfg, donate=False)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            _, _, loss, _ = step_fn(params, opt, state, rayo, rayd,
                                    target, c2w, 0)
        losses[name] = float(loss)
        if name == "q":
            assert any("int8_train" in str(w.message) for w in rec)
    assert losses["q"] == losses["fp"]
