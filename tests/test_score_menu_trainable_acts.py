"""Score-kernel menu + trainable activation params vs the reference oracle.

Covers the two remaining reference API surfaces VERDICT r2 listed as
documented divergences:
  * the 11-entry attention score menu (reference models/attn.py:45-88 —
    reachable here via ``models.attn.kernel_type``);
  * ``ff_act_trainable`` activation parameters (reference
    models/utils.py:183-229, 363-416) including PReLU's always-trainable
    per-channel slopes.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _reference import REFERENCE_PATH, import_reference_models

requires_reference = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PATH), reason="reference not available")

KERNELS = ["scaled-dot", "-scaled-dot", "dot", "-dot", "l1-dist", "-l1-dist",
           "l2-dist", "-l2-dist", "scaled-l2-dist", "-scaled-l2-dist",
           "cosine"]


@requires_reference
@pytest.mark.parametrize("kernel", KERNELS)
def test_attention_scores_match_reference(kernel):
    import torch
    import_reference_models()
    from models.attn import attention as ref_attention

    from papr_tpu.model.attention import attention_scores

    rng = np.random.default_rng(hash(kernel) % 2**31)
    q = rng.standard_normal((2, 1, 32)).astype(np.float32)
    k = rng.standard_normal((2, 7, 32)).astype(np.float32)

    # matmul kernels give (2, 1, 7); dist kernels (2, 1, 7) via the
    # unsqueeze-broadcast — both flatten to (2, 7).
    ref = np.asarray(
        ref_attention(torch.from_numpy(q), torch.from_numpy(k), kernel)
    ).reshape(2, 7)

    got = np.asarray(attention_scores(jnp.asarray(q), jnp.asarray(k), kernel))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_unknown_kernel_raises():
    from papr_tpu.model.attention import attention_scores
    with pytest.raises(ValueError):
        attention_scores(jnp.ones((1, 1, 4)), jnp.ones((1, 3, 4)), "-cosine")
    with pytest.raises(ValueError):
        attention_scores(jnp.ones((1, 1, 4)), jnp.ones((1, 3, 4)), "rbf")


def test_kernel_type_gates_fused_and_changes_scores():
    from papr_tpu.config import load_config
    from papr_tpu.ops.fused_attn import score_fusible

    cfg = load_config(overrides={"models": {"attn": {"kernel_type": "cosine"}}})
    assert not score_fusible(cfg.models.attn)
    cfg2 = load_config()
    assert score_fusible(cfg2.models.attn)


def test_model_forward_with_cosine_kernel():
    """Full model forward runs under a non-default kernel and differs from
    scaled-dot (same weights)."""
    from papr_tpu.config import load_config
    from papr_tpu.model.papr import create_model, forward

    def run(kernel):
        cfg = load_config(overrides={
            "max_num_pts": 32,
            # influ_init_val defaults to 0.0 which zeroes every score
            # pre-softmax; a nonzero init lets the kernel choice show.
            "geoms": {"points": {"init_num": 32, "select_k": 4,
                                 "influ_init_val": 1.0}},
            "models": {"attn": {"kernel_type": kernel}},
            "tpu": {"ray_chunk": 64, "fused_attn": False},
        })
        params, state = create_model(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        rayo = jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 3)
        rayd = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        rayd = jnp.asarray(rayd / np.linalg.norm(rayd, axis=-1, keepdims=True))
        c2w = jnp.asarray(np.eye(4, dtype=np.float32)[None])
        out = forward(params, state, cfg, rayo, rayd, c2w)
        rgb = out[0] if isinstance(out, tuple) else out
        return np.asarray(rgb)

    a = run("scaled-dot")
    b = run("cosine")
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    assert not np.allclose(a, b)


# ---------------------------------------------------------------------------
# Trainable activation params
# ---------------------------------------------------------------------------

@requires_reference
@pytest.mark.parametrize("act,params_keys", [
    ("gaussian", ("a",)),
    ("quadratic", ("a",)),
    ("multi-quadratic", ("a",)),
    ("laplacian", ("a",)),
    ("super-gaussian", ("a", "b")),
    ("expsin", ("a",)),
])
def test_trainable_activation_matches_reference(act, params_keys):
    import torch
    import_reference_models()
    from models.utils import activation_func

    from papr_tpu.nn.activations import activation_param_init, apply_activation

    a0, b0 = 1.3, 0.7
    p = activation_param_init(act, a=a0, b=b0, trainable=True)
    assert set(p.keys()) == set(params_keys)
    assert all(p[k].shape == (1,) for k in params_keys)

    x = np.linspace(-3, 3, 41).astype(np.float32)
    ref_layer = activation_func(act, a=a0, b=b0, trainable=True)
    ref = ref_layer(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(apply_activation(act, jnp.asarray(x), p))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    # gradient flows into the activation params
    g = jax.grad(lambda pp: jnp.sum(apply_activation(act, jnp.asarray(x), pp)))(p)
    assert any(float(jnp.abs(g[k]).sum()) > 0 for k in params_keys)


@requires_reference
def test_prelu_per_channel_matches_torch():
    import torch
    from papr_tpu.nn.activations import activation_param_init, apply_activation

    p = activation_param_init("prelu", num_channels=8)
    assert p["slope"].shape == (8,)
    x = np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32)
    ref = torch.nn.PReLU(8)(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(apply_activation("prelu", jnp.asarray(x), p))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_ff_act_trainable_trains_end_to_end():
    """ff_act_trainable: true creates act params in the embedders, the fused
    path demotes, and one train step updates the activation params."""
    from papr_tpu.config import load_config
    from papr_tpu.model.papr import create_model
    from papr_tpu.ops.fused_mlp import feedforward_fusible
    from papr_tpu.train.step import make_opt_state, make_train_step

    emb = {"ff_act": "gaussian", "ff_act_a": 1.0, "ff_act_trainable": True}
    cfg = load_config(overrides={
        "max_num_pts": 32,
        # nonzero influence init so gradients reach the key embedder
        # (scores are multiplied by influ before the softmax).
        "geoms": {"points": {"init_num": 32, "select_k": 4,
                             "influ_init_val": 1.0}},
        "models": {"attn": {"embed": {"key": emb, "value": dict(emb)}}},
        "dataset": {"batch_size": 1, "patches": {"height": 8, "width": 8}},
        "training": {"losses": {"mse": 1.0, "lpips": 0.0, "lpips_alex": 0.0}},
        "tpu": {"ray_chunk": 64},
    })
    assert not feedforward_fusible(cfg.models.attn.embed.key)

    params, state = create_model(cfg, jax.random.PRNGKey(0))
    layers = params["attn"]["embed_k"]["mlp"]["layers"]
    acts = [l["act"] for l in layers if "act" in l]
    # every hidden layer has its own (1,) "a" (reference models/mlp.py:37;
    # ff_last_act stays default "none" -> no param on the last layer)
    assert len(acts) == len(layers) - 1
    before = np.asarray(jnp.concatenate([a["a"] for a in acts]))
    assert np.allclose(before, 1.0)

    opt_state = make_opt_state(cfg, params)
    step, _ = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    rayo = jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32) * 3)
    rayd = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    rayd = jnp.asarray(rayd / np.linalg.norm(rayd, axis=-1, keepdims=True))
    tgt = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    c2w = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    # global step past the attn group's 10k warmup so its lr is nonzero
    params2, _, loss, _ = step(params, opt_state, state, rayo, rayd, tgt,
                               c2w, 20000)
    assert np.isfinite(float(loss))
    layers2 = params2["attn"]["embed_k"]["mlp"]["layers"]
    after = np.asarray(jnp.concatenate(
        [l["act"]["a"] for l in layers2 if "act" in l]))
    assert not np.allclose(after, before), "act params did not update"
