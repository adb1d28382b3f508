"""Data-layer parity (ray generation vs the reference) and exposure-control
(mapping MLP + FiLM) parity."""

import os
import sys

import jax
import numpy as np
import pytest
import torch

from papr_tpu.config import load_config
from papr_tpu.model.papr import create_model, forward, mapping_apply
from papr_tpu.model.torch_convert import to_torch_state_dict
from papr_tpu.ops.geometry import get_rays_np

from _reference import REFERENCE_PATH, import_reference_models

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PATH), reason="reference not available")


def test_get_rays_matches_reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from dataset.utils import get_rays as ref_get_rays

    rng = np.random.default_rng(0)
    H, W, fx, fy = 24, 32, 40.0, 38.0
    c2w = np.stack([np.eye(4, dtype=np.float32) for _ in range(3)])
    c2w[:, :3, 3] = rng.normal(size=(3, 3)).astype(np.float32)
    # random rotations via QR
    for i in range(3):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        c2w[i, :3, :3] = q.astype(np.float32)

    ro, rd = get_rays_np(H, W, fx, fy, c2w)
    tro, trd = ref_get_rays(H, W, fx, fy, torch.from_numpy(c2w))
    np.testing.assert_allclose(ro, tro.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rd, trd.numpy(), rtol=1e-4, atol=1e-5)


def _exposure_cfg():
    overrides = {
        "use_amp": False,
        "max_num_pts": 48,
        "dataset": {"coord_scale": 1.0},
        "geoms": {"points": {"select_k": 4, "init_num": 40},
                  "point_feats": {"dim": 8}},
        "exposure_control": {
            "use": True, "shading_code_dim": 16,
            "mapping_mlp": {"num_layers": 2, "dim": 32, "out_dim": 64},
        },
        "models": {
            "attn": {"d_model": 32, "embed": {
                "k_L": [2, 2, 2], "q_L": [2], "v_L": [2, 2],
                "key": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
                "query": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
                "value": {"d_ff": 16, "d_ff_out": 32, "n_ff_layer": 2}}},
            "renderer": {"generator": {"small_unet": {"affine_layer": 0}}},
        },
    }
    return load_config(overrides=overrides)


def test_exposure_film_forward_matches_reference():
    cfg = _exposure_cfg()
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    sd = to_torch_state_dict(params, state, cfg)

    import_reference_models()
    from models.model import PAPR
    ref = PAPR(cfg, device="cpu")
    ref.load_my_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()})
    ref.eval()

    rng = np.random.default_rng(5)
    rayo = rng.normal(size=(1, 3)).astype(np.float32) * 2.5
    rayd = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)
    c2w = np.eye(4, dtype=np.float32)[None]
    code = rng.normal(size=(16,)).astype(np.float32)

    ours = np.asarray(forward(params, state, cfg, rayo, rayd, c2w,
                              shading_code=code))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(rayo), torch.from_numpy(rayd),
                     torch.from_numpy(c2w), step=-1,
                     shading_code=torch.from_numpy(code)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


def test_mapping_mlp_matches_reference():
    cfg = _exposure_cfg()
    params, state = create_model(cfg, jax.random.PRNGKey(1))
    sd = to_torch_state_dict(params, state, cfg)

    import_reference_models()
    from models.mlp import get_mapping_mlp
    mm = get_mapping_mlp(cfg.exposure_control, use_amp=False)
    own = mm.state_dict()
    for k in own:
        own[k].copy_(torch.from_numpy(np.ascontiguousarray(
            sd[f"mapping_mlp.{k}"])))

    code = np.random.default_rng(2).normal(size=(16,)).astype(np.float32)
    gamma, beta = mapping_apply(params, cfg, np.asarray(code))
    with torch.no_grad():
        affine = mm(torch.from_numpy(code)).numpy()
    np.testing.assert_allclose(np.asarray(gamma), affine[:32], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(beta), affine[32:], rtol=1e-4,
                               atol=1e-5)


def test_composite_background_rules():
    from papr_tpu.dataset.loaders import composite_background
    rgba = np.zeros((1, 4, 4, 4), np.float32)
    rgba[..., :3] = 0.5
    rgba[..., 3] = 0.0
    out = composite_background(rgba, white_bg=True)
    np.testing.assert_allclose(out, 1.0)  # transparent -> white
    rgb_white = np.ones((1, 4, 4, 3), np.float32)
    out2 = composite_background(rgb_white.copy(), white_bg=False)
    np.testing.assert_allclose(out2, 0.0)  # white pixels zeroed on black bg


def test_patch_extraction_shapes_and_bounds():
    from papr_tpu.config import Config
    from papr_tpu.dataset.dataset import extract_patches
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 20, 24, 3)).astype(np.float32)
    rayo = rng.random((2, 3)).astype(np.float32)
    rayd = rng.random((2, 20, 24, 3)).astype(np.float32)
    args = Config({"patches": {"height": 8, "width": 8, "max_patches": 3}})
    ip, rp, op, n = extract_patches(imgs, rayo, rayd, args, rng)
    assert ip.shape == (2, 3, 8, 8, 3) and rp.shape == (2, 3, 8, 8, 3)
    assert n == 3
    np.testing.assert_allclose(op[1, 0], rayo[1])
