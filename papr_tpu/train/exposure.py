"""cIMLE exposure-control machinery: shading-code store + resampling.

Behavioral spec: reference exposure_control_finetune.py:184-218 and
utils.py:406-495 (``resample_shading_codes``): each training image owns a
latent shading code; periodically, candidate codes are scored by re-decoding
the image's (fixed) fused feature map through mapping-MLP-FiLM + UNet and the
best (by PSNR or loss) replaces the stored code.

TPU-native notes: the fused feature map is rendered once (tiled), then all
``num_samples`` candidate decodes run as ONE vmapped, jitted batch — the
reference loops candidates serially on the GPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model.papr import composite_background, mapping_apply, render_foreground
from ..nn.activations import build_activation
from ..nn.mlp import policy_from_config
from .losses import psnr
from .step import render_full_image


def init_shading_codes(rng: np.random.Generator, n_images: int, cfg) -> np.ndarray:
    ec = cfg.exposure_control
    return (rng.standard_normal((n_images, int(ec.shading_code_dim)))
            .astype(np.float32) * float(ec.shading_code_scale))


def _candidate_scores_fn(cfg, loss_fn=None):
    """Score all candidate codes in one jitted vmapped batch.

    select_by 'psnr' ranks by MSE (identical ordering); 'loss' ranks by the
    full training loss (MSE + LPIPS when available) like the reference's
    loss branch (utils.py:479-481).
    """
    policy = policy_from_config(cfg)
    last_act = build_activation(cfg.models.last_act)
    by_loss = cfg.exposure_control.shading_code_resample_select_by == "loss"
    if by_loss and loss_fn is None:
        from .loop import build_loss
        loss_fn = build_loss(cfg)
    # LPIPS backbone weights ride as a runtime jit arg — closure capture
    # would inline them as HLO constants (the ~28-minute remote-compile
    # problem; see losses.py get_loss docstring).
    loss_params = getattr(loss_fn, "params", {}) if by_loss else {}

    @jax.jit
    def score_codes_impl(params, fused, bkg_attn, img, codes, lp):
        def decode(code):
            gamma, beta = mapping_apply(params, cfg, code, policy)
            fg = render_foreground(params, cfg, fused, gamma, beta, policy)
            rgb = composite_background(cfg, params, fg[..., None, :],
                                       bkg_attn)[..., 0, :]
            rgb = last_act(rgb)
            if by_loss:
                # 3-arg only when there are runtime weights; custom 2-arg
                # loss fns (tests, user callables) keep working.
                return loss_fn(rgb, img, lp) if lp else loss_fn(rgb, img)
            return jnp.mean((rgb - img) ** 2)

        return jax.vmap(decode)(codes)

    def score_codes(params, fused, bkg_attn, img, codes):
        return score_codes_impl(params, fused, bkg_attn, img, codes,
                                loss_params)

    return score_codes


def resample_shading_codes(shading_codes: np.ndarray, cfg, params, state,
                           dataset, img_id: int, step: int,
                           rng: np.random.Generator, score_fn=None,
                           full_img: bool = False) -> None:
    """Best-of-N resample for one image's code (in-place, like the reference)."""
    ec = cfg.exposure_control
    if full_img:
        img, rayd, rayo = dataset.get_full_img(img_id)
    else:
        _, _, img, rayd, rayo = dataset[img_id]
        img, rayd, rayo = img[None], rayd[None], rayo[None]

    candidates = (rng.standard_normal(
        (int(ec.shading_code_num_samples), int(ec.shading_code_dim)))
        .astype(np.float32) * float(ec.shading_code_scale))

    out = render_full_image(params, state, cfg, rayo, rayd,
                            int(cfg.eval.max_height), int(cfg.eval.max_width),
                            attention_only=True)
    fused = jnp.asarray(out["fused"][..., 0, :])
    bkg_attn = jnp.asarray(out["attn"][..., -1:, :])

    score_fn = score_fn or _candidate_scores_fn(cfg)
    mses = np.asarray(score_fn(params, fused, bkg_attn, jnp.asarray(img),
                               jnp.asarray(candidates)))
    best = int(np.argmin(mses))
    shading_codes[img_id] = candidates[best]
