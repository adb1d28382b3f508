"""LPIPS perceptual loss with a VGG16 backbone, in JAX (NHWC).

Behavioral spec: reference models/lpips.py (``LPNet``): inputs are NHWC RGB
in [0,1], mapped to [-1,1], normalized by the LPIPS shift/scale constants,
pushed through the five VGG16 relu slices (relu1_2, relu2_2, relu3_3,
relu4_3, relu5_3), channel-unit-normalized, squared-differenced, weighted by
the learned lin heads, spatially averaged and summed.

Weights: torchvision's IMAGENET1K_V1 VGG16 features + the repo's vgg.pth lin
heads, converted once by tools/convert_vgg.py into a single .npz (HWIO conv
kernels). Looked up from $PAPR_LPIPS_WEIGHTS or papr_tpu/assets/lpips_vgg.npz.

The LEARNED LIN HEADS ship pre-converted (assets/lpips_lin.npz — the
reference distributes them as its 6.7 KB vgg.pth; reference
models/lpips.py:95-101); only the torchvision backbone needs the one-time
conversion. When the backbone is absent, the random fallback still uses the
real lin heads so the per-slice channel weighting matches the reference.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature-extractor conv plan: (out_channels, pool_before)
VGG16_CONVS = [
    (64, False), (64, False),          # relu1_2 after idx 1
    (128, True), (128, False),         # relu2_2 after idx 3
    (256, True), (256, False), (256, False),   # relu3_3 after idx 6
    (512, True), (512, False), (512, False),   # relu4_3 after idx 9
    (512, True), (512, False), (512, False),   # relu5_3 after idx 12
]
SLICE_ENDS = (1, 3, 6, 9, 12)  # conv indices ending each LPIPS slice

SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "lpips_vgg.npz")
DEFAULT_LIN_WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "lpips_lin.npz")


def load_lin_params(path: str | None = None) -> list | None:
    """The 5 learned lin-head weight vectors (converted reference vgg.pth),
    or None when the asset is missing."""
    path = path or DEFAULT_LIN_WEIGHTS
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        return [jnp.asarray(data[f"lin{i}.w"]) for i in range(5)]


def load_lpips_params(path: str | None = None) -> dict:
    path = path or os.environ.get("PAPR_LPIPS_WEIGHTS", DEFAULT_WEIGHTS)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS VGG weights not found at {path}. Convert them once with "
            "tools/convert_vgg.py (needs torchvision) or set "
            "PAPR_LPIPS_WEIGHTS. Training can proceed without the lpips term "
            "(set training.losses.lpips: 0).")
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    convs = [{"w": jnp.asarray(flat[f"conv{i}.w"]),
              "b": jnp.asarray(flat[f"conv{i}.b"])}
             for i in range(len(VGG16_CONVS))]
    lins = [jnp.asarray(flat[f"lin{i}.w"]) for i in range(5)]
    return {"convs": convs, "lins": lins}


def random_lpips_params(key: jax.Array, use_real_lins: bool = False) -> dict:
    """Random-backbone instance (tests / no-torchvision fallback).

    The conv backbone is random but the 5 lin heads come from the shipped
    converted asset when available (``use_real_lins``), so the channel
    weighting of each slice matches the reference's learned calibration.

    Built as ONE jitted program: eager per-tensor jax.random calls cost a
    compile round-trip each on remote-compile backends (~30 ops here)."""
    def build(key):
        convs = []
        in_c = 3
        for i, (out_c, _) in enumerate(VGG16_CONVS):
            k1, k2, key = jax.random.split(key, 3)
            convs.append({
                "w": jax.random.normal(k1, (3, 3, in_c, out_c)) * 0.05,
                "b": jax.random.normal(k2, (out_c,)) * 0.05,
            })
            in_c = out_c
        lins = []
        if not use_real_lins:
            slice_cs = (64, 128, 256, 512, 512)
            for i, c in enumerate(slice_cs):
                key, k = jax.random.split(key)
                lins.append(jax.random.uniform(k, (c,)))
        return convs, lins

    convs, lins = jax.jit(build)(key)
    if use_real_lins:
        lins = load_lin_params()
        if lins is None:
            # Explicitly requested calibration must not silently degrade.
            raise FileNotFoundError(
                f"real lin heads requested but {DEFAULT_LIN_WEIGHTS} is "
                "missing; restore the shipped asset or use "
                "tpu.lpips_fallback: random.")
    return {"convs": convs, "lins": lins}


def _vgg_slices(params: dict, x: jnp.ndarray, compute_dtype=None):
    """x: (N, H, W, 3) already scaled; returns the 5 relu feature maps."""
    outs = []
    h = x if compute_dtype is None else x.astype(compute_dtype)
    for i, (out_c, pool_before) in enumerate(VGG16_CONVS):
        if pool_before:
            n, hh, ww, c = h.shape
            h = h[:, :hh - hh % 2, :ww - ww % 2]
            h = h.reshape(n, hh // 2, 2, ww // 2, 2, c).max(axis=(2, 4))
        w = params["convs"][i]["w"]
        b = params["convs"][i]["b"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=(jax.lax.Precision.HIGHEST if compute_dtype is None
                       else None))
        h = jnp.maximum(h + b, 0)
        if i in SLICE_ENDS:
            outs.append(h)
    return outs


def lpips_apply(params: dict, pred: jnp.ndarray, target: jnp.ndarray,
                policy=None) -> jnp.ndarray:
    """pred/target: (N, H, W, 3) in [0, 1]. Returns scalar fp32."""
    compute_dtype = policy.compute_dtype if policy is not None else None

    def prep(img):
        img = 2.0 * img - 1.0
        return (img - SHIFT) / SCALE

    f0 = _vgg_slices(params, prep(pred), compute_dtype)
    f1 = _vgg_slices(params, prep(target), compute_dtype)
    total = jnp.zeros((), jnp.float32)
    for k in range(5):
        a = _unit_normalize(f0[k].astype(jnp.float32))
        b = _unit_normalize(f1[k].astype(jnp.float32))
        diff = (a - b) ** 2
        w = params["lins"][k].reshape(1, 1, 1, -1).astype(jnp.float32)
        val = jnp.sum(w * diff, axis=-1, keepdims=True)   # 1x1 lin head
        total = total + jnp.mean(jnp.mean(val, axis=(1, 2)))
    return total


def _unit_normalize(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Reference models/lpips.py:64-67 (norm inside sqrt AND denominator)."""
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True) + eps)
    return feat / (norm + eps)


# ---------------------------------------------------------- LPIPS-AlexNet --

DEFAULT_ALEX_WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "lpips_alex.npz")


def load_lpips_alex_params(path: str | None = None) -> dict:
    """AlexNet LPIPS weights (tools/convert_alexnet.py); metric-only
    (reference test.py:188 uses the pip lpips package)."""
    path = path or os.environ.get("PAPR_LPIPS_ALEX_WEIGHTS",
                                  DEFAULT_ALEX_WEIGHTS)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS AlexNet weights not found at {path}; convert once with "
            "tools/convert_alexnet.py.")
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    convs = [{"w": jnp.asarray(flat[f"conv{i}.w"]),
              "b": jnp.asarray(flat[f"conv{i}.b"]),
              "stride": tuple(int(s) for s in flat[f"conv{i}.stride"]),
              "padding": tuple(int(p) for p in flat[f"conv{i}.padding"])}
             for i in range(5)]
    lins = [jnp.asarray(flat[f"lin{i}.w"]) for i in range(5)]
    return {"convs": convs, "lins": lins}


def _maxpool3s2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def lpips_alex_apply(params: dict, pred: jnp.ndarray,
                     target: jnp.ndarray) -> jnp.ndarray:
    """Metric-only LPIPS with the AlexNet backbone (forward pass only)."""

    def prep(img):
        img = 2.0 * img - 1.0
        return ((img - SHIFT) / SCALE).astype(jnp.float32)

    def slices(x):
        outs = []
        h = x
        for i, conv in enumerate(params["convs"]):
            if i in (1, 2):          # MaxPool before conv1 and conv2
                h = _maxpool3s2(h)
            ph, pw = conv["padding"]
            h = jax.lax.conv_general_dilated(
                h, conv["w"], conv["stride"], [(ph, ph), (pw, pw)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST)
            h = jnp.maximum(h + conv["b"], 0)
            outs.append(h)
        return outs

    f0, f1 = slices(prep(pred)), slices(prep(target))
    total = jnp.zeros((), jnp.float32)
    for k in range(5):
        a, b = _unit_normalize(f0[k]), _unit_normalize(f1[k])
        diff = (a - b) ** 2
        w = params["lins"][k].reshape(1, 1, 1, -1)
        total = total + jnp.mean(jnp.mean(
            jnp.sum(w * diff, axis=-1, keepdims=True), axis=(1, 2)))
    return total
