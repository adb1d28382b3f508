#!/usr/bin/env python
"""Evaluation CLI: renders the test split tile-by-tile and reports
PSNR / SSIM / LPIPS per frame and averaged; writes predrgb / depth / fgrgb /
bkgmask PNGs and optional videos. Supports the three exposure-control modes
(--exp [--random | --intrp]).

Interface-compatible with the reference test.py (flags, config files, output
layout under <save_dir>/<index>/test). LPIPS metrics require converted VGG
weights (tools/convert_vgg.py); without them the columns report nan.
"""


# Platform override (the axon TPU plugin ignores JAX_PLATFORMS): set
# PAPR_PLATFORM=cpu to force CPU execution, e.g. for CI.
import os as _os
if _os.environ.get("PAPR_PLATFORM"):
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["PAPR_PLATFORM"])

import argparse
import os
import shutil
import sys

import numpy as np

from papr_tpu.config import Config, load_config, make_test_config
from papr_tpu.utils.logging import Logger, setup_seed


def parse_args():
    p = argparse.ArgumentParser(description="PAPR-TPU test")
    p.add_argument("--opt", type=str, default="", help="Option file path")
    p.add_argument("--resume", type=int, default=250000, help="Resume step")
    p.add_argument("--exp", action="store_true",
                   help="[Exposure control] test with exposure control")
    p.add_argument("--intrp", action="store_true",
                   help="[Exposure control] latent interpolation")
    p.add_argument("--random", action="store_true",
                   help="[Exposure control] random codes")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--view", type=int, default=0,
                   help="[Exposure control] test frame index")
    p.add_argument("--scale", type=float, default=1.0,
                   help="[Exposure control] shading code scale")
    p.add_argument("--num_samples", type=int, default=20)
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, default=1)
    p.add_argument("--num_intrp", type=int, default=10)
    # Parsed-and-ignored, exactly like the reference (its test.py:34 defines
    # --resample but nothing reads it) — kept for strict CLI flag parity.
    p.add_argument("--resample", action="store_true",
                   help="[Exposure control] accepted for reference-CLI "
                        "parity; unused (unused in the reference too)")
    return p.parse_args()


def make_lpips_metrics():
    """LPIPS metric fns (vgg via our jax module; alex unavailable -> nan)."""
    import jax
    try:
        from papr_tpu.model.lpips_jax import load_lpips_params, lpips_apply
        lp = load_lpips_params()
        vgg_fn = jax.jit(lambda a, b: lpips_apply(lp, a, b))
        vgg = lambda p, t: float(vgg_fn(p, t))
    except FileNotFoundError as e:
        print(f"WARNING: {e}\nWARNING: LPIPS-VGG metric will be nan.")
        vgg = lambda p, t: float("nan")
    try:
        from papr_tpu.model.lpips_jax import (load_lpips_alex_params,
                                              lpips_alex_apply)
        la = load_lpips_alex_params()
        alex_fn = jax.jit(lambda a, b: lpips_alex_apply(la, a, b))
        alex = lambda p, t: float(alex_fn(p, t))
    except FileNotFoundError as e:
        print(f"WARNING: {e}\nWARNING: LPIPS-alex metric will be nan.")
        alex = lambda p, t: float("nan")
    return alex, vgg


def run_test(cli, cfg, save_name, mode, resume_step):
    import jax
    from papr_tpu.dataset import get_dataset, get_loader
    from papr_tpu.model.papr import create_model, mapping_apply
    from papr_tpu.train.checkpoint import import_torch, load_checkpoint, restore_into
    from papr_tpu.train.loop import build_loss
    from papr_tpu.train.step import render_full_image
    from papr_tpu.utils.metrics import psnr_np, ssim_np
    from papr_tpu.utils import plots
    import imageio

    params, state = create_model(cfg, jax.random.PRNGKey(int(cfg.seed)))
    extras = {}
    load_path = cfg.test.load_path or os.path.join(cfg.save_dir, cfg.index)
    if not os.path.isabs(load_path) and not os.path.exists(load_path):
        alt = os.path.join(cfg.save_dir, load_path)
        load_path = alt if os.path.exists(alt) else load_path
    if load_path.endswith(".npz") or os.path.exists(
            os.path.join(load_path, "checkpoint.npz")):
        # Honor --resume <step> like the reference's model_<step>.pth
        # (reference test.py:320): prefer the checkpoint_<step>.npz snapshot
        # when it exists, else fall back to the latest checkpoint.npz.
        if not load_path.endswith(".npz"):
            snap = os.path.join(load_path, f"checkpoint_{resume_step}.npz")
            if os.path.exists(snap):
                load_path = snap
        resume_step, tree = load_checkpoint(load_path)
        params = restore_into(params, tree["params"])
        state = restore_into(state, tree["state"])
        extras = tree.get("extras", {})
    else:
        resume_step, params, state, extras = import_torch(
            load_path, params, state, cfg)
    print(f"!!!!! Loaded model from {load_path} at step {resume_step}")

    dataset = get_dataset(cfg.dataset, mode=mode, seed=int(cfg.seed))
    loader = get_loader(dataset, cfg.dataset, mode="test")
    loss_fn = build_loss(cfg)
    lpips_alex, lpips_vgg = make_lpips_metrics()

    shading_codes = None
    if cli.exp:
        key = "train_shading_codes" if mode == "train" else "eval_shading_codes"
        shading_codes = extras.get(key)
        if shading_codes is not None:
            print(f"Using {key}: {np.asarray(shading_codes).shape}")

    stats = {"loss": [], "psnr": [], "ssim": [], "lpips_alex": [], "lpips_vgg": []}
    frames = {}
    rng = np.random.default_rng(cli.seed)

    def one_frame(frame, i, batch, code=None, suffix=""):
        gamma = beta = None
        code_mean = 0.0
        if code is not None:
            import jax.numpy as jnp
            code = jnp.asarray(np.asarray(code).reshape(-1))
            code_mean = float(np.asarray(code).mean())
            gamma, beta = mapping_apply(params, cfg, code)
        out = render_full_image(params, state, cfg, batch.rayo, batch.rayd,
                                int(cfg.test.max_height), int(cfg.test.max_width),
                                with_depth=True, gamma=gamma, beta=beta)
        rgb = np.clip(out["rgb"], 0, 1)
        img = batch.image
        import jax.numpy as jnp
        stats["loss"].append(float(loss_fn(jnp.asarray(rgb), jnp.asarray(img))))
        stats["psnr"].append(psnr_np(rgb, img))
        stats["ssim"].append(ssim_np(rgb[0], img[0]))
        stats["lpips_alex"].append(lpips_alex(rgb, img))
        stats["lpips_vgg"].append(lpips_vgg(rgb, img))
        print(f"Test frame: {frame}, code mean: {code_mean}, "
              f"test_loss: {stats['loss'][-1]:.4f}, test_psnr: {stats['psnr'][-1]:.4f}, "
              f"test_ssim: {stats['ssim'][-1]:.4f}, "
              f"test_lpips_alex: {stats['lpips_alex'][-1]:.4f}, "
              f"test_lpips_vgg: {stats['lpips_vgg'][-1]:.4f}")

        if cfg.test.save_fig:
            dir_name = "images"
            if code is not None:
                dir_name = (f"exposure_control_{suffix}_scale{cli.scale}"
                            if suffix in ("intrp", "random")
                            else f"exposure_control_{suffix}")
            log_dir = os.path.join(cfg.save_dir, cfg.index, "test", dir_name)
            os.makedirs(log_dir, exist_ok=True)
            tag = (f"test-{frame:04d}-{i:02d}-codeMean{code_mean:.4f}"
                   f"-PSNR{stats['psnr'][-1]:.3f}-SSIM{stats['ssim'][-1]:.4f}"
                   f"-LPIPSA{stats['lpips_alex'][-1]:.4f}"
                   f"-LPIPSV{stats['lpips_vgg'][-1]:.4f}")
            depth = out["depth"][0] / cfg.dataset.coord_scale * (65536 / 10)
            imageio.imwrite(os.path.join(log_dir, f"{tag}-predrgb.png"),
                            (rgb[0] * 255).astype(np.uint8))
            imageio.imwrite(os.path.join(log_dir, f"{tag}-depth.png"),
                            depth.astype(np.uint16))
            imageio.imwrite(os.path.join(log_dir, f"{tag}-fgrgb.png"),
                            (np.clip(out["foreground"][0], 0, 1) * 255).astype(np.uint8))
            bkg_mask = (np.asarray(params["bkg_feats"])[0] * out["bkg_attn"][0])
            imageio.imwrite(os.path.join(log_dir, f"{tag}-bkgmask.png"),
                            (np.clip(bkg_mask, 0, 1) * 255).astype(np.uint8))

        if cfg.test.save_video and cfg.test.plots.pcrgb:
            alive = np.asarray(state["alive"])
            pts = np.asarray(params["points"])[alive]
            influ = np.asarray(params["points_influ_scores"])[alive, 0]
            scale_mult = 1.5 if "Barn" in cfg.dataset.path else (
                0.5 if "Family" in cfg.dataset.path else 1.0)
            azims = np.linspace(180, -180, max(len(loader), 1))
            panel = plots.test_pcrgb_plot(
                frame, -frame * (360.0 / max(len(loader), 1)), azims[frame],
                stats["psnr"][-1], pts, rgb[0], img[0], out["depth"][0],
                cfg.dataset.coord_scale * scale_mult, influ)
            frames.setdefault("pcrgb", []).append(np.asarray(panel.convert("RGB")))

        if cfg.test.save_video and cfg.test.plots.get("featattn", False):
            alive = np.asarray(state["alive"])
            pts = np.asarray(params["points"])[alive]
            influ = np.asarray(params["points_influ_scores"])[alive, 0]
            panel = plots.test_featmap_attn_plot(
                frame, -frame, pts, rgb[0], img[0],
                cfg.dataset.coord_scale, out["fused"][0, ..., 0, :],
                out["attn"][0, ..., 0], influ)
            frames.setdefault("featattn", []).append(np.asarray(panel.convert("RGB")))

    if cli.exp:
        dim = int(cfg.exposure_control.shading_code_dim)
        if cli.random:
            for frame, batch in enumerate(loader):
                if frame != cli.view:
                    continue
                for i in range(cli.num_samples):
                    code = rng.standard_normal(dim).astype(np.float32) * cli.scale
                    one_frame(frame, i, batch, code, "random")
        elif cli.intrp:
            ids = [cli.start_index, cli.end_index]
            latents = []
            for i in range(cli.num_samples):
                code = rng.standard_normal(dim).astype(np.float32) * cli.scale
                if i in ids:
                    latents.append(code)
            for frame, batch in enumerate(loader):
                if frame != cli.view:
                    continue
                for j in range(cli.num_intrp):
                    code = latents[0] + (latents[1] - latents[0]) * (j + 1) / cli.num_intrp
                    one_frame(frame, j, batch, code, "intrp")
        else:
            code = rng.standard_normal(dim).astype(np.float32) * cli.scale
            for frame, batch in enumerate(loader):
                one_frame(frame, 0, batch, code, "test")
    else:
        for frame, batch in enumerate(loader):
            one_frame(frame, 0, batch)

    means = {k: float(np.mean(v)) if v else float("nan") for k, v in stats.items()}
    if frames:
        log_dir = os.path.join(cfg.save_dir, cfg.index, "test", "videos")
        os.makedirs(log_dir, exist_ok=True)
        for key, val in frames.items():
            name = (f"{cfg.index}-PSNR{means['psnr']:.3f}-SSIM{means['ssim']:.4f}"
                    f"-LPIPSA{means['lpips_alex']:.4f}-LPIPSV{means['lpips_vgg']:.4f}"
                    f"-{key}-{save_name}-step{resume_step}.mp4")[-255:]
            from papr_tpu.utils.video import write_video
            out = write_video(os.path.join(log_dir, name), val, fps=30)
            print("video:", out)

    print(f"Avg test loss: {means['loss']:.4f}, test PSNR: {means['psnr']:.4f}, "
          f"test SSIM: {means['ssim']:.4f}, test LPIPS Alex: "
          f"{means['lpips_alex']:.4f}, test LPIPS VGG: {means['lpips_vgg']:.4f}")
    return means


def main():
    cli = parse_args()
    if cli.intrp or cli.random:
        assert cli.exp, "--intrp/--random require --exp"
    assert not (cli.intrp and cli.random), \
        "Cannot do interpolation and random exposure at the same time."

    base_cfg = load_config(cli.opt)
    log_dir = os.path.join(base_cfg.save_dir, base_cfg.index)
    os.makedirs(log_dir, exist_ok=True)
    sys.stdout = Logger(os.path.join(log_dir, "test.log"), sys.stdout)
    sys.stderr = Logger(os.path.join(log_dir, "test_error.log"), sys.stderr)
    if cli.opt:
        shutil.copyfile(cli.opt, os.path.join(log_dir, os.path.basename(cli.opt)))
    setup_seed(base_cfg.seed)

    for entry in base_cfg.test.datasets:
        entry = Config(entry)
        cfg = make_test_config(base_cfg, entry)
        if cli.exp:
            assert cfg.models.use_renderer, \
                "Only renderer-based models support exposure control"
        run_test(cli, cfg, entry.name, entry.mode, cli.resume)


if __name__ == "__main__":
    main()
