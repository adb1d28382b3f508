"""Reference parity for the non-default renderer variants: bilinear
upsampling, render_scale=2, double-conv blocks, instance norm, and the MLP
generator."""

import os

import jax
import numpy as np
import pytest
import torch

from papr_tpu.nn.mlp import F32
from papr_tpu.nn.unet import small_unet_apply, small_unet_init

from _reference import REFERENCE_PATH, import_reference_models

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PATH), reason="reference not available")


def _export_unet(params, norm="none"):
    """Flatten our UNet params into the reference SmallUNet state_dict."""
    from papr_tpu.model.torch_convert import _conv_entries, _convT_entries
    out = {}
    c2i = 2 if norm == "none" else 3
    _conv_entries("inc.double_conv.0", params["inc"]["c1"], out)
    for name in ("down1", "down2"):
        _conv_entries(f"{name}.maxpool_conv.1.double_conv.0",
                      params[name]["c1"], out)
        if "c2" in params[name]:
            _conv_entries(f"{name}.maxpool_conv.1.double_conv.{c2i}",
                          params[name]["c2"], out)
    for name in ("up1", "up2"):
        if "up" in params[name]:
            _convT_entries(f"{name}.up", params[name]["up"], out)
        _conv_entries(f"{name}.conv.double_conv.0",
                      params[name]["conv"]["c1"], out)
        if "c2" in params[name]["conv"]:
            _conv_entries(f"{name}.conv.double_conv.{c2i}",
                          params[name]["conv"]["c2"], out)
    if "up3" in params:
        if "up" in params["up3"]:
            _convT_entries("up3.up", params["up3"]["up"], out)
        _conv_entries("up3.conv.double_conv.0", params["up3"]["conv"]["c1"], out)
        _conv_entries(f"up3.conv.double_conv.{c2i}", params["up3"]["conv"]["c2"], out)
    _conv_entries("outc.conv", params["outc"], out)
    return out


@pytest.mark.parametrize("bilinear,single,render_scale,norm", [
    (False, True, 1, "none"),     # shipped default
    (False, False, 1, "none"),    # double-conv blocks
    (False, True, 2, "none"),     # 2x render scale
    (False, True, 1, "instance"), # instance norm
])
def test_small_unet_variants_match_reference(bilinear, single, render_scale,
                                             norm):
    import_reference_models()
    from models.unet import SmallUNet

    params = small_unet_init(jax.random.PRNGKey(0), 8, 3, bilinear=bilinear,
                             single=single, render_scale=render_scale)
    ref = SmallUNet(8, 3, bilinear=bilinear, single=single, norm=norm,
                    render_scale=render_scale, use_amp=False)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in _export_unet(params, norm).items()}
    missing, unexpected = ref.load_state_dict(sd, strict=True)
    assert not missing and not unexpected
    ref.eval()

    x = np.random.default_rng(0).normal(size=(1, 16, 16, 8)).astype(np.float32)
    ours = np.asarray(small_unet_apply(
        params, x, bilinear=bilinear, single=single, norm=norm,
        render_scale=render_scale, policy=F32))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    want = want.transpose(0, 2, 3, 1)
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-4)


def test_bilinear_variant_broken_in_reference_too():
    """The reference's bilinear Up concatenates 768 channels into a conv
    built for 512 (models/unet.py:104-140) — dead code in every shipped
    config; both implementations fail on it the same way."""
    import_reference_models()
    from models.unet import SmallUNet
    ref = SmallUNet(8, 3, bilinear=True, single=True, use_amp=False)
    with pytest.raises(RuntimeError):
        ref(torch.zeros(1, 8, 16, 16))
    params = small_unet_init(jax.random.PRNGKey(0), 8, 3, bilinear=True)
    x = np.zeros((1, 16, 16, 8), np.float32)
    with pytest.raises(Exception):
        small_unet_apply(params, x, bilinear=True)


def test_mlp_generator_matches_reference():
    import_reference_models()
    from models.renderer import MLPGenerator
    from papr_tpu.nn.mlp import mlp_apply, mlp_init

    params = mlp_init(jax.random.PRNGKey(1), 8, 3, 32, 3)
    ref = MLPGenerator(inp_dim=8, num_layers=3, num_channels=32, out_dim=3,
                       act_type="leakyrelu", last_act_type="none", use_wn=False)
    sd = ref.state_dict()
    for i in range(3):
        sd[f"mlp.model.{1 + 2 * i}.weight"].copy_(
            torch.from_numpy(np.asarray(params["layers"][i]["w"])))
        sd[f"mlp.model.{1 + 2 * i}.bias"].copy_(
            torch.from_numpy(np.asarray(params["layers"][i]["bias"])))

    x = np.random.default_rng(2).normal(size=(1, 6, 6, 8)).astype(np.float32)
    ours = np.asarray(mlp_apply(params, x, act_type="leakyrelu"))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, want.transpose(0, 2, 3, 1), rtol=1e-4,
                               atol=1e-5)
