"""End-to-end numerical parity against the reference implementation.

Builds a small model with our init, exports the weights into the reference
PAPR (torch, CPU, no AMP), runs both forward passes on identical rays, and
compares RGB. This is the round-trip gate for the whole pipeline: top-k
selection, geometry features, posenc, embedders, attention, influence
scores, background softmax, fusion, UNet, and compositing.
"""

import os

import jax
import numpy as np
import pytest
import torch

from papr_tpu.config import load_config
from papr_tpu.model.papr import create_model, evaluate, forward
from papr_tpu.model.torch_convert import from_torch_state_dict, to_torch_state_dict

from _reference import REFERENCE_PATH, import_reference_models

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PATH), reason="reference not available")


def tiny_cfg(**over):
    overrides = {
        "use_amp": False,
        "max_num_pts": 64,
        "dataset": {"coord_scale": 1.0},
        "geoms": {
            "points": {"select_k": 4, "init_num": 50, "init_type": "cube"},
            "point_feats": {"dim": 8},
        },
        "models": {
            "attn": {
                "d_model": 32,
                "embed": {
                    "k_L": [2, 2, 2], "q_L": [2], "v_L": [2, 2],
                    "key": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
                    "query": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
                    "value": {"d_ff": 16, "d_ff_out": 8, "n_ff_layer": 3},
                },
            },
        },
    }
    from papr_tpu.config import merge_config
    merge_config(overrides, over)
    return load_config(overrides=overrides)


def build_pair(cfg, seed=0):
    """Our model + reference model loaded with identical weights."""
    params, state = create_model(cfg, jax.random.PRNGKey(seed))
    sd = to_torch_state_dict(params, state, cfg)

    import_reference_models()
    from models.model import PAPR
    ref = PAPR(cfg, device="cpu")
    ref.load_my_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()})
    ref.eval()
    return params, state, ref


def make_rays(cfg, H=12, W=12, seed=3):
    rng = np.random.default_rng(seed)
    rayo = rng.normal(size=(1, 3)).astype(np.float32) * 2.5
    rayd = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)
    c2w = np.eye(4, dtype=np.float32)[None]
    return rayo, rayd, c2w


def test_forward_matches_reference():
    cfg = tiny_cfg()
    params, state, ref = build_pair(cfg)
    rayo, rayd, c2w = make_rays(cfg)

    ours = np.asarray(forward(params, state, cfg,
                              rayo, rayd, c2w))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(rayo), torch.from_numpy(rayd),
                     torch.from_numpy(c2w), step=-1).numpy()
    assert ours.shape == theirs.shape == (1, 12, 12, 3)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


def test_evaluate_matches_reference():
    cfg = tiny_cfg()
    params, state, ref = build_pair(cfg, seed=1)
    rayo, rayd, c2w = make_rays(cfg, seed=4)

    fused, attn = evaluate(params, state, cfg, rayo, rayd, c2w)
    with torch.no_grad():
        ref_fused, ref_attn = ref.evaluate(
            torch.from_numpy(rayo), torch.from_numpy(rayd),
            torch.from_numpy(c2w), step=-1)
    np.testing.assert_allclose(np.asarray(attn), ref_attn.numpy(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused), ref_fused.numpy(),
                               rtol=1e-3, atol=2e-4)


def test_forward_matches_reference_no_renderer():
    # NB: keep pc_feats enabled — the reference's load_my_state_dict requires
    # the key unconditionally (models/model.py:640).
    cfg = tiny_cfg(**{
        "models": {"use_renderer": False,
                   "attn": {"embed": {"value": {"d_ff_out": 3}}}},
    })
    params, state, ref = build_pair(cfg, seed=2)
    rayo, rayd, c2w = make_rays(cfg, seed=5)
    ours = np.asarray(forward(params, state, cfg, rayo, rayd, c2w))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(rayo), torch.from_numpy(rayd),
                     torch.from_numpy(c2w), step=-1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


def test_torch_roundtrip_identity():
    """Export -> import reproduces the same pytree (incl. padding/mask)."""
    cfg = tiny_cfg()
    params, state = create_model(cfg, jax.random.PRNGKey(7))
    sd = to_torch_state_dict(params, state, cfg)
    params2, state2 = create_model(cfg, jax.random.PRNGKey(8))
    params2, state2, _ = from_torch_state_dict(params2, state2, cfg, sd)
    assert np.array_equal(np.asarray(state["alive"]), np.asarray(state2["alive"]))
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(params2)}
    n_alive = int(np.asarray(state["alive"]).sum())
    for k, v in flat1:
        key = jax.tree_util.keystr(k)
        got = np.asarray(flat2[key])
        want = np.asarray(v)
        if key.startswith(("['points'", "['pc_feats'")):
            got, want = got[:n_alive], want[:n_alive]
        np.testing.assert_allclose(got, want, atol=1e-7, err_msg=key)


def test_forward_matches_reference_batched():
    """N=2 image batch with distinct cameras (reference batches over
    img_idx, train.py:155-166)."""
    cfg = tiny_cfg()
    params, state, ref = build_pair(cfg, seed=3)
    rng = np.random.default_rng(9)
    rayo = rng.normal(size=(2, 3)).astype(np.float32) * 2.5
    rayd = rng.normal(size=(2, 6, 6, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)
    c2w = np.stack([np.eye(4, dtype=np.float32)] * 2)

    ours = np.asarray(forward(params, state, cfg, rayo, rayd, c2w))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(rayo), torch.from_numpy(rayd),
                     torch.from_numpy(c2w), step=-1).numpy()
    assert ours.shape == theirs.shape == (2, 6, 6, 3)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


def test_export_torch_loads_into_reference_exactly(tmp_path):
    """export_torch writes a model.pth whose key set equals the reference's
    state_dict exactly, and the reference loads it without fallback."""
    from papr_tpu.train.checkpoint import export_torch

    cfg = tiny_cfg()
    params, state = create_model(cfg, jax.random.PRNGKey(11))
    path = str(tmp_path / "model.pth")
    export_torch(path, params, state, cfg, step=123)

    import_reference_models()
    from models.model import PAPR
    ref = PAPR(cfg, device="cpu")

    obj = torch.load(path, weights_only=False)
    assert list(obj.keys()) == ["123"]
    sd = obj["123"]
    ref_keys = set(ref.state_dict().keys())
    ours = set(sd.keys())
    assert ours == ref_keys, (sorted(ours - ref_keys),
                              sorted(ref_keys - ours))
    ref.load_my_state_dict(sd)
    for name, p in ref.state_dict().items():
        np.testing.assert_allclose(p.numpy(), sd[name].numpy(), atol=1e-7,
                                   err_msg=name)
