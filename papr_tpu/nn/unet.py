"""SmallUNet rendering head, NHWC (TPU-native) layout.

Behavioral spec: reference models/unet.py (SNP-credited SmallUNet). Channel
plan 128-256-512-256-128 with SingleConv blocks (conv3x3 + ReLU), maxpool
downsampling, ConvTranspose(k=2,s=2) upsampling with skip concatenation, and
six optional FiLM (gamma/beta) modulation sites for exposure control
(models/unet.py:208-247). Convs run in the policy compute dtype (bf16 under
use_amp), parameters are fp32.

Layout notes (TPU-first design, not a torch translation):
  * activations are NHWC and kernels HWIO — XLA:TPU's preferred conv layout;
  * ConvTranspose k=2/s=2 has non-overlapping taps, so it is implemented as a
    single matmul + pixel interleave (MXU-friendly, avoids the gradient-of-
    strided-conv path);
  * max-pool is a reduce_window.

Norm variants: 'none' (all shipped configs), 'instance'
(InstanceNorm2d, affine=False), and 'batch' (batch statistics only — torch's
running-stats inference mode is intentionally not replicated; no shipped
config uses batchnorm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .activations import build_activation
from .init import conv_bias, kaiming_uniform_conv
from .mlp import F32, Policy


# ------------------------------------------------------------- primitives --

def conv_init(key: jax.Array, in_c: int, out_c: int, k: int) -> dict:
    wkey, bkey = jax.random.split(key)
    w = kaiming_uniform_conv(wkey, (k, k, in_c, out_c))
    b = conv_bias(bkey, k * k * in_c, out_c)
    return {"w": w, "b": b}


def _prec(policy: Policy):
    return (jax.lax.Precision.HIGHEST
            if policy.compute_dtype == jnp.float32 else None)


def conv_apply(p: dict, x: jnp.ndarray, policy: Policy = F32,
               padding: str = "SAME") -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        policy.cast(x), policy.cast(p["w"]), window_strides=(1, 1),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_prec(policy))
    return y + policy.cast(p["b"])


def convT2x2_init(key: jax.Array, in_c: int, out_c: int) -> dict:
    # torch ConvTranspose2d default init uses fan_in = out_c * k * k (dim 1 of
    # its (in, out, kh, kw) weight) for both the weight and bias bounds.
    import math
    wkey, bkey = jax.random.split(key)
    fan_in = 4 * out_c
    gain = math.sqrt(2.0 / 6.0)
    bound = gain * math.sqrt(3.0 / fan_in)
    w = jax.random.uniform(wkey, (2, 2, in_c, out_c), jnp.float32, -bound, bound)
    b = conv_bias(bkey, fan_in, out_c)
    return {"w": w, "b": b}


def convT2x2_apply(p: dict, x: jnp.ndarray, policy: Policy = F32) -> jnp.ndarray:
    """ConvTranspose2d(k=2, s=2): out[2i+di, 2j+dj] = x[i,j] @ W[di,dj].

    Non-overlapping taps make this a plain matmul followed by a 2x2 pixel
    interleave — exactly torch's result, but expressed MXU-first.
    """
    n, h, w, cin = x.shape
    # (N,H,W,Cin) x (2,2,Cin,Cout) -> (N,H,W,2,2,Cout), then interleave pixels.
    y = jnp.einsum("nhwc,xyco->nhwxyo", policy.cast(x), policy.cast(p["w"]),
                   precision=_prec(policy))
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, -1)
    return y + policy.cast(p["b"])


def maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool as a reshape-max (cleanly differentiable, and
    torch MaxPool2d's floor behavior on odd sizes via truncation)."""
    n, h, w, c = x.shape
    x = x[:, :h - h % 2, :w - w % 2]
    return x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def upsample_bilinear_align_corners(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """torch nn.Upsample(mode='bilinear', align_corners=True)."""
    n, h, w, c = x.shape
    oh, ow = h * scale, w * scale

    def grid(out_len, in_len):
        if out_len == 1 or in_len == 1:
            return jnp.zeros((out_len,), jnp.float32)
        return jnp.arange(out_len, dtype=jnp.float32) * (in_len - 1) / (out_len - 1)

    ys, xs = grid(oh, h), grid(ow, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1, x1 = jnp.minimum(y0 + 1, h - 1), jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None].astype(x.dtype)
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None].astype(x.dtype)
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _norm_apply(kind: str, x: jnp.ndarray) -> jnp.ndarray:
    if kind == "none":
        return x
    xf = x.astype(jnp.float32)
    if kind == "instance":  # per-sample, per-channel over H,W; affine=False
        mean = xf.mean(axis=(1, 2), keepdims=True)
        var = xf.var(axis=(1, 2), keepdims=True)
    elif kind == "batch":  # batch statistics (see module docstring)
        mean = xf.mean(axis=(0, 1, 2), keepdims=True)
        var = xf.var(axis=(0, 1, 2), keepdims=True)
    else:
        raise NotImplementedError(kind)
    return ((xf - mean) / jnp.sqrt(var + 1e-5)).astype(x.dtype)


# ------------------------------------------------------------ conv blocks --

def single_conv_init(key, in_c, out_c, mid_c=None):
    mid_c = mid_c or out_c
    return {"c1": conv_init(key, in_c, mid_c, 3)}


def single_conv_apply(p, x, norm, policy):
    return jnp.maximum(_norm_apply(norm, conv_apply(p["c1"], x, policy)), 0)


def double_conv_init(key, in_c, out_c, mid_c=None):
    mid_c = mid_c or out_c
    k1, k2 = jax.random.split(key)
    return {"c1": conv_init(k1, in_c, mid_c, 3), "c2": conv_init(k2, mid_c, out_c, 3)}


def double_conv_apply(p, x, norm, policy):
    x = jnp.maximum(_norm_apply(norm, conv_apply(p["c1"], x, policy)), 0)
    return jnp.maximum(_norm_apply(norm, conv_apply(p["c2"], x, policy)), 0)


def _block_init(key, in_c, out_c, single, mid_c=None):
    return (single_conv_init(key, in_c, out_c, mid_c) if single
            else double_conv_init(key, in_c, out_c, mid_c))


def _block_apply(p, x, single, norm, policy):
    return (single_conv_apply(p, x, norm, policy) if single
            else double_conv_apply(p, x, norm, policy))


def _pad_to_match(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """F.pad NHWC equivalent of models/unet.py:131-135 (centre padding)."""
    dy = x2.shape[1] - x1.shape[1]
    dx = x2.shape[2] - x1.shape[2]
    return jnp.pad(x1, ((0, 0), (dy // 2, dy - dy // 2),
                        (dx // 2, dx - dx // 2), (0, 0)))


# --------------------------------------------------------------- SmallUNet --

def small_unet_init(key: jax.Array, n_channels: int, n_classes: int,
                    bilinear: bool = False, single: bool = True,
                    render_scale: int = 1) -> dict:
    assert render_scale in (1, 2)
    ks = jax.random.split(key, 8)
    p = {
        "inc": single_conv_init(ks[0], n_channels, 128),
        "down1": _block_init(ks[1], 128, 256, single),
        "down2": _block_init(ks[2], 256, 512, single),
    }
    if bilinear:
        # Quirk preserved: SingleConv(in, out, mid=in//2) outputs mid channels
        # (reference models/unet.py:11-39 ignores out when mid is given).
        p["up1"] = {"conv": _block_init(ks[3], 512, 256, single, mid_c=256)}
        p["up2"] = {"conv": _block_init(ks[4], 256, 128, single, mid_c=128)}
    else:
        p["up1"] = {"up": convT2x2_init(ks[3], 512, 256),
                    "conv": _block_init(jax.random.fold_in(ks[3], 1), 512, 256, single)}
        p["up2"] = {"up": convT2x2_init(ks[4], 256, 128),
                    "conv": _block_init(jax.random.fold_in(ks[4], 1), 256, 128, single)}
    if render_scale == 2:
        if bilinear:
            p["up3"] = {"conv": double_conv_init(ks[5], 128, 128, mid_c=64)}
        else:
            p["up3"] = {"up": convT2x2_init(ks[5], 128, 128),
                        "conv": double_conv_init(jax.random.fold_in(ks[5], 1), 128, 128)}
    p["outc"] = conv_init(ks[6], 128, n_classes, 1)
    return p


def _film(x: jnp.ndarray, gamma, beta) -> jnp.ndarray:
    c = x.shape[-1]
    return x * gamma.reshape(1, 1, 1, c).astype(x.dtype) + \
        beta.reshape(1, 1, 1, c).astype(x.dtype)


def small_unet_apply(params: dict, x: jnp.ndarray, *, bilinear: bool = False,
                     single: bool = True, norm: str = "none",
                     last_act: str = "none", render_scale: int = 1,
                     affine_layer: int = -1, gamma=None, beta=None,
                     policy: Policy = F32) -> jnp.ndarray:
    """x: (N, H, W, C_feat) fused features -> (N, H, W, n_classes)."""
    if affine_layer >= 0:
        assert gamma is not None and beta is not None

    def maybe_film(t, site):
        return _film(t, gamma, beta) if affine_layer == site else t

    def up_block(p, x1, x2):
        if bilinear:
            x1 = upsample_bilinear_align_corners(x1)
        else:
            x1 = convT2x2_apply(p["up"], x1, policy)
        x1 = _pad_to_match(x1, x2)
        return _block_apply(p["conv"], jnp.concatenate([x2, x1], axis=-1),
                            single, norm, policy)

    x = maybe_film(policy.cast(x), 0)
    x1 = maybe_film(single_conv_apply(params["inc"], x, norm, policy), 1)
    x2 = maybe_film(_block_apply(params["down1"], maxpool2(x1), single, norm, policy), 2)
    x3 = maybe_film(_block_apply(params["down2"], maxpool2(x2), single, norm, policy), 3)
    y = maybe_film(up_block(params["up1"], x3, x2), 4)
    y = maybe_film(up_block(params["up2"], y, x1), 5)
    if render_scale == 2:
        if bilinear:
            y = upsample_bilinear_align_corners(y)
        else:
            y = convT2x2_apply(params["up3"]["up"], y, policy)
        y = double_conv_apply(params["up3"]["conv"], y, norm, policy)
    logits = conv_apply(params["outc"], y, policy)
    return build_activation(last_act)(logits)
