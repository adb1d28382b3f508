"""Bidirectional converter: our params pytree <-> reference torch state_dict.

Two jobs:
  1. import pretrained reference checkpoints (``model.pth`` /
     ``model_<step>.pth``, reference models/model.py:562-641) into the padded
     TPU pytree;
  2. export our params so the reference implementation can be used as a
     numerics oracle in tests.

Key layout (reference module names):
  points, points_influ_scores, pc_feats, bkg_feats
  proximity_attn.embed.embed_{k,q,v}.{innorm,outnorm}.{a_2,b_2}
  proximity_attn.embed.embed_{k,q,v}.mlp.model.<1+2i>.{weight,bias}
  proximity_attn.attention_layer.w_{k,q}.{weight,bias}
  renderer.inc.double_conv.0.*, renderer.down{1,2}.maxpool_conv.1.double_conv.*,
  renderer.up{1,2}.up.*, renderer.up{1,2}.conv.double_conv.*, renderer.outc.conv.*
  mapping_mlp.model.model.<1+2i>.{weight,bias}

Tensor layout transforms: Linear (out,in) both sides; Conv2d torch OIHW <->
ours HWIO; ConvTranspose2d torch (in,out,kh,kw) <-> ours (kh,kw,in,out).
"""

from __future__ import annotations

import numpy as np

from .papr import model_meta


def _np(x):
    return np.asarray(x)


def _mlp_entries(prefix: str, mlp_params: dict, out: dict):
    for i, layer in enumerate(mlp_params["layers"]):
        base = f"{prefix}.model.{1 + 2 * i}"
        if "v" in layer:
            out[f"{base}.weight_v"] = _np(layer["v"])
            out[f"{base}.weight_g"] = _np(layer["g"])
        else:
            out[f"{base}.weight"] = _np(layer["w"])
        if "bias" in layer:
            out[f"{base}.bias"] = _np(layer["bias"])


def _ff_entries(prefix: str, ff_params: dict, out: dict):
    if "innorm" in ff_params:
        out[f"{prefix}.innorm.a_2"] = _np(ff_params["innorm"]["a"])
        out[f"{prefix}.innorm.b_2"] = _np(ff_params["innorm"]["b"])
        out[f"{prefix}.outnorm.a_2"] = _np(ff_params["outnorm"]["a"])
        out[f"{prefix}.outnorm.b_2"] = _np(ff_params["outnorm"]["b"])
    _mlp_entries(f"{prefix}.mlp", ff_params["mlp"], out)


def _conv_entries(prefix: str, conv_params: dict, out: dict):
    out[f"{prefix}.weight"] = _np(conv_params["w"]).transpose(3, 2, 0, 1)
    out[f"{prefix}.bias"] = _np(conv_params["b"])


def _convT_entries(prefix: str, conv_params: dict, out: dict):
    out[f"{prefix}.weight"] = _np(conv_params["w"]).transpose(2, 3, 0, 1)
    out[f"{prefix}.bias"] = _np(conv_params["b"])


def to_torch_state_dict(params: dict, state: dict, cfg) -> dict:
    """Export live (unpadded) arrays under the reference's key names."""
    meta = model_meta(cfg)
    alive = _np(state["alive"]).astype(bool)
    out: dict = {
        # select_k is a registered buffer in the reference (models/model.py:34)
        "select_k": np.asarray(int(cfg.geoms.points.select_k), np.int32),
        "points": _np(params["points"])[alive],
        "points_influ_scores": _np(params["points_influ_scores"])[alive],
        "bkg_feats": _np(params["bkg_feats"]),
    }
    if meta.use_pc_feats:
        out["pc_feats"] = _np(params["pc_feats"])[alive]

    attn = params["attn"]
    for name in ("k", "q", "v"):
        _ff_entries(f"proximity_attn.embed.embed_{name}", attn[f"embed_{name}"], out)
    for name in ("k", "q"):
        out[f"proximity_attn.attention_layer.w_{name}.weight"] = _np(attn[f"w_{name}"]["w"])
        out[f"proximity_attn.attention_layer.w_{name}.bias"] = _np(attn[f"w_{name}"]["bias"])

    if meta.use_renderer and cfg.models.renderer.generator.type == "small-unet":
        r = params["renderer"]
        # DoubleConv's second conv sits at Sequential index 2 with norm='none'
        # and 3 with instance/batch norm (reference models/unet.py:42-79).
        c2i = 2 if cfg.models.renderer.generator.small_unet.norm == "none" else 3
        _conv_entries("renderer.inc.double_conv.0", r["inc"]["c1"], out)
        for name in ("down1", "down2"):
            blk = r[name]
            _conv_entries(f"renderer.{name}.maxpool_conv.1.double_conv.0", blk["c1"], out)
            if "c2" in blk:
                _conv_entries(f"renderer.{name}.maxpool_conv.1.double_conv.{c2i}", blk["c2"], out)
        for name in ("up1", "up2"):
            blk = r[name]
            if "up" in blk:
                _convT_entries(f"renderer.{name}.up", blk["up"], out)
            _conv_entries(f"renderer.{name}.conv.double_conv.0", blk["conv"]["c1"], out)
            if "c2" in blk["conv"]:
                _conv_entries(f"renderer.{name}.conv.double_conv.{c2i}", blk["conv"]["c2"], out)
        if "up3" in r:
            if "up" in r["up3"]:
                _convT_entries("renderer.up3.up", r["up3"]["up"], out)
            _conv_entries("renderer.up3.conv.double_conv.0", r["up3"]["conv"]["c1"], out)
            _conv_entries(f"renderer.up3.conv.double_conv.{c2i}", r["up3"]["conv"]["c2"], out)
        _conv_entries("renderer.outc.conv", r["outc"], out)
    elif meta.use_renderer:
        _mlp_entries("renderer.mlp", params["renderer"], out)

    if meta.use_mapping_mlp and "mapping_mlp" in params:
        _mlp_entries("mapping_mlp.model", params["mapping_mlp"], out)
    return out


# ------------------------------------------------------------------ import --

def _set_linear(layer: dict, sd: dict, base: str):
    import jax.numpy as jnp
    if (f"{base}.weight" not in sd and f"{base}.weight_v" not in sd):
        return  # excluded or absent: keep the fresh init
    if f"{base}.weight_v" in sd:
        layer["v"] = jnp.asarray(_np(sd[f"{base}.weight_v"]))
        layer["g"] = jnp.asarray(_np(sd[f"{base}.weight_g"]))
    else:
        layer["w"] = jnp.asarray(_np(sd[f"{base}.weight"]))
    if f"{base}.bias" in sd:
        layer["bias"] = jnp.asarray(_np(sd[f"{base}.bias"]))


def _set_mlp(mlp_params: dict, sd: dict, prefix: str):
    for i, layer in enumerate(mlp_params["layers"]):
        _set_linear(layer, sd, f"{prefix}.model.{1 + 2 * i}")


def _set_ff(ff_params: dict, sd: dict, prefix: str):
    import jax.numpy as jnp
    if "innorm" in ff_params and f"{prefix}.innorm.a_2" in sd:
        ff_params["innorm"]["a"] = jnp.asarray(_np(sd[f"{prefix}.innorm.a_2"]))
        ff_params["innorm"]["b"] = jnp.asarray(_np(sd[f"{prefix}.innorm.b_2"]))
        ff_params["outnorm"]["a"] = jnp.asarray(_np(sd[f"{prefix}.outnorm.a_2"]))
        ff_params["outnorm"]["b"] = jnp.asarray(_np(sd[f"{prefix}.outnorm.b_2"]))
    _set_mlp(ff_params["mlp"], sd, f"{prefix}.mlp")


def _set_conv(conv_params: dict, sd: dict, prefix: str, transpose: bool = False):
    import jax.numpy as jnp
    if f"{prefix}.weight" not in sd:
        return  # excluded or absent: keep the fresh init
    w = _np(sd[f"{prefix}.weight"])
    if transpose:  # ConvTranspose2d (in,out,kh,kw) -> (kh,kw,in,out)
        conv_params["w"] = jnp.asarray(w.transpose(2, 3, 0, 1))
    else:          # Conv2d OIHW -> HWIO
        conv_params["w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    conv_params["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))


def from_torch_state_dict(params: dict, state: dict, cfg, sd: dict,
                          exclude_keys=()):
    """Load a reference state_dict (numpy-valued) into a fresh pytree.

    Shape-polymorphic arrays (points / scores / pc_feats; reference
    models/model.py:617-641) are padded to the static size and the alive mask
    is rebuilt from the loaded live count. ``exclude_keys`` substrings skip
    matching entries (reference load_my_state_dict / training.exclude_keys).
    Returns (params, state, extras).
    """
    import jax.numpy as jnp

    meta = model_meta(cfg)
    exclude_keys = tuple(exclude_keys) or tuple(
        cfg.get_path("training.exclude_keys", []) or [])
    sd = {k: _np(v) for k, v in sd.items()
          if not any(e in k for e in exclude_keys)}
    P = meta.pad_num_pts
    if "points" not in sd:
        raise KeyError("state_dict has no 'points' (did exclude_keys drop it?)")
    n_live = sd["points"].shape[0]
    assert n_live <= P, (n_live, P)

    def pad(arr, fill=0.0):
        out = np.full((P,) + arr.shape[1:], fill, np.float32)
        out[:n_live] = arr
        return jnp.asarray(out)

    params = dict(params)
    params["points"] = pad(sd["points"], 1e8)
    params["points_influ_scores"] = pad(sd["points_influ_scores"])
    if meta.use_pc_feats and "pc_feats" in sd:
        params["pc_feats"] = pad(sd["pc_feats"])
    if "bkg_feats" in sd:
        params["bkg_feats"] = jnp.asarray(sd["bkg_feats"])

    attn = params["attn"]
    for name in ("k", "q", "v"):
        _set_ff(attn[f"embed_{name}"], sd, f"proximity_attn.embed.embed_{name}")
    for name in ("k", "q"):
        _set_linear(attn[f"w_{name}"], sd, f"proximity_attn.attention_layer.w_{name}")

    if meta.use_renderer and cfg.models.renderer.generator.type == "small-unet":
        r = params["renderer"]
        c2i = 2 if cfg.models.renderer.generator.small_unet.norm == "none" else 3
        _set_conv(r["inc"]["c1"], sd, "renderer.inc.double_conv.0")
        for name in ("down1", "down2"):
            _set_conv(r[name]["c1"], sd, f"renderer.{name}.maxpool_conv.1.double_conv.0")
            if "c2" in r[name]:
                _set_conv(r[name]["c2"], sd, f"renderer.{name}.maxpool_conv.1.double_conv.{c2i}")
        for name in ("up1", "up2"):
            if "up" in r[name]:
                _set_conv(r[name]["up"], sd, f"renderer.{name}.up", transpose=True)
            _set_conv(r[name]["conv"]["c1"], sd, f"renderer.{name}.conv.double_conv.0")
            if "c2" in r[name]["conv"]:
                _set_conv(r[name]["conv"]["c2"], sd, f"renderer.{name}.conv.double_conv.{c2i}")
        if "up3" in r:
            if "up" in r["up3"]:
                _set_conv(r["up3"]["up"], sd, "renderer.up3.up", transpose=True)
            _set_conv(r["up3"]["conv"]["c1"], sd, "renderer.up3.conv.double_conv.0")
            _set_conv(r["up3"]["conv"]["c2"], sd, f"renderer.up3.conv.double_conv.{c2i}")
        _set_conv(r["outc"], sd, "renderer.outc.conv")
    elif meta.use_renderer:
        _set_mlp(params["renderer"], sd, "renderer.mlp")

    if meta.use_mapping_mlp and "mapping_mlp" in params:
        _set_mlp(params["mapping_mlp"], sd, "mapping_mlp.model")

    alive = np.zeros((P,), bool)
    alive[:n_live] = True
    state = dict(state)
    state["alive"] = jnp.asarray(alive)
    extras = {}
    for key in ("train_shading_codes", "eval_shading_codes"):
        if key in sd:
            extras[key] = jnp.asarray(sd[key])
    return params, state, extras


def load_torch_checkpoint(path: str):
    """Read a reference model.pth ({step: state_dict}) or raw state_dict."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and all(isinstance(k, str) and k.isdigit() for k in obj):
        step, sd = next(iter(obj.items()))
        return int(step), {k: v.numpy() if hasattr(v, "numpy") else v
                           for k, v in sd.items()}
    return 0, {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}
