"""Training-dynamics parity: several optimization steps on identical batches
must track the reference (same weights, same Adam semantics, constant LRs).
Validates the full backward pass through attention/UNet/top-k gathers and the
per-group optimizer."""

import os

import jax
import numpy as np
import pytest
import torch

from papr_tpu.config import load_config
from papr_tpu.model.torch_convert import to_torch_state_dict
from papr_tpu.model.papr import create_model
from papr_tpu.train.step import make_opt_state, make_train_step

from _reference import REFERENCE_PATH, import_reference_models

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PATH), reason="reference not available")


def test_five_training_steps_track_reference():
    cfg = load_config(overrides={
        "use_amp": False,
        "max_num_pts": 40,
        "dataset": {"coord_scale": 1.0},
        "geoms": {"points": {"select_k": 4, "init_num": 40},
                  "point_feats": {"dim": 8}},
        "models": {"attn": {"d_model": 16, "embed": {
            "k_L": [2, 2, 2], "q_L": [2], "v_L": [2, 2],
            "key": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
            "query": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2},
            "value": {"d_ff": 16, "d_ff_out": 16, "n_ff_layer": 2}}}},
        # constant LRs (type none) so the stubbed reference schedulers match
        "training": {
            "losses": {"mse": 1.0, "lpips": 0.0, "lpips_alex": 0.0},
            "lr": {g: {"type": "none"} for g in
                   ("attn", "points", "points_influ_scores", "feats",
                    "generator", "bkg_feats", "mapping_mlp")},
        },
        "tpu": {"remat_embed": False, "ray_chunk": 512},
    })

    params, state = create_model(cfg, jax.random.PRNGKey(0))
    sd = to_torch_state_dict(params, state, cfg)

    import_reference_models()
    from models.model import PAPR
    ref = PAPR(cfg, device="cpu")
    ref.load_my_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()})
    ref.init_optimizers(0)  # rebuild optimizers for the reloaded Parameters
    ref.train()

    rng = np.random.default_rng(0)
    rayo = rng.normal(size=(1, 3)).astype(np.float32) * 2.5
    rayd = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)
    tgt = rng.random((1, 8, 8, 3)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)[None]

    train_step, _ = make_train_step(cfg, donate=False)
    opt_state = make_opt_state(cfg, params)

    our_losses = []
    for step in range(5):
        params, opt_state, loss, _ = train_step(
            params, opt_state, state, rayo, rayd, tgt, c2w, step)
        our_losses.append(float(loss))

    ref_losses = []
    t_rayo, t_rayd = torch.from_numpy(rayo), torch.from_numpy(rayd)
    t_tgt, t_c2w = torch.from_numpy(tgt), torch.from_numpy(c2w)
    for step in range(5):
        ref.clear_grad()
        out = ref(t_rayo, t_rayd, t_c2w, step=-1)
        loss = torch.mean((out - t_tgt) ** 2)
        loss.backward()
        for opt in ref.optimizers.values():
            if opt is not None:
                opt.step()
        ref_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=1e-5)
    # parameters drifted together, not just losses
    sd_after = to_torch_state_dict(params, state, cfg)
    ref_after = ref.state_dict()
    for key in ("points", "proximity_attn.attention_layer.w_k.weight",
                "renderer.outc.conv.weight", "points_influ_scores"):
        np.testing.assert_allclose(
            sd_after[key], ref_after[key].detach().numpy(),
            rtol=5e-3, atol=2e-4, err_msg=key)
