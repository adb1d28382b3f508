#!/usr/bin/env python
"""cIMLE exposure-control finetuning CLI.

Interface-compatible with the reference exposure_control_finetune.py:
  python exposure_control_finetune.py --opt configs/t2/Caterpillar_exposure_control.yml

Finetunes a pretrained model with per-image latent shading codes -> mapping
MLP -> FiLM modulation of the UNet, resampling each image's code by best-of-N
search every ``shading_code_resample_iter`` steps (reference :184-218).
"""


# Platform override (the axon TPU plugin ignores JAX_PLATFORMS): set
# PAPR_PLATFORM=cpu to force CPU execution, e.g. for CI.
import os as _os
if _os.environ.get("PAPR_PLATFORM"):
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["PAPR_PLATFORM"])

import argparse
import copy
import os
import shutil
import sys
import time

import numpy as np

from papr_tpu.config import Config, load_config, make_eval_config
from papr_tpu.utils.logging import Logger, setup_seed, snapshot_code


def parse_args():
    p = argparse.ArgumentParser(description="PAPR-TPU exposure finetune")
    p.add_argument("--opt", type=str, default="", help="Option file path")
    p.add_argument("--resume", type=int, default=0, help="Resume training")
    return p.parse_args()


def main():
    cli = parse_args()
    cfg = load_config(cli.opt)
    assert cfg.exposure_control.use, \
        "set exposure_control.use: true for this stage"
    eval_cfg = make_eval_config(cfg)
    # The "sample" dataset: same scenes at resample-sized patches
    # (reference :312-349 builds a third config with patch size
    # shading_code_resample_size).
    sample_dict = copy.deepcopy(dict(cfg))
    size = int(cfg.exposure_control.shading_code_resample_size)
    sample_dict["dataset"] = dict(sample_dict["dataset"])
    sample_dict["dataset"]["patches"] = dict(sample_dict["dataset"]["patches"])
    sample_dict["dataset"]["patches"]["height"] = size
    sample_dict["dataset"]["patches"]["width"] = size
    sample_cfg = Config(sample_dict)

    log_dir = os.path.join(cfg.save_dir, cfg.index)
    os.makedirs(log_dir, exist_ok=True)
    sys.stdout = Logger(os.path.join(log_dir, "train.log"), sys.stdout)
    sys.stderr = Logger(os.path.join(log_dir, "train_error.log"), sys.stderr)
    shutil.copyfile(__file__, os.path.join(log_dir, os.path.basename(__file__)))
    if cli.opt:
        shutil.copyfile(cli.opt, os.path.join(log_dir, os.path.basename(cli.opt)))
    snapshot_code(".", os.path.join(log_dir, "code.zip"))
    setup_seed(cfg.seed)

    run(cfg, eval_cfg, sample_cfg, cli.resume)


def run(cfg, eval_cfg, sample_cfg, resume):
    import jax

    from papr_tpu.dataset import get_dataset, get_loader
    from papr_tpu.dataset.dataset import device_prefetch
    from papr_tpu.model.papr import create_model
    from papr_tpu.nn.activations import build_activation
    from papr_tpu.train.checkpoint import (import_torch, load_checkpoint,
                                           load_histories, restore_into,
                                           save_checkpoint)
    from papr_tpu.train.exposure import (_candidate_scores_fn,
                                         init_shading_codes,
                                         resample_shading_codes)
    from papr_tpu.train.loop import build_loss, eval_step
    from papr_tpu.train.optim import build_group_specs, current_lrs, init_opt_state
    from papr_tpu.train.step import make_train_step

    log_dir = os.path.join(cfg.save_dir, cfg.index)
    dataset = get_dataset(cfg.dataset, mode="train", seed=int(cfg.seed))
    sample_dataset = get_dataset(sample_cfg.dataset, mode="train", seed=int(cfg.seed))
    eval_dataset = get_dataset(eval_cfg.dataset, mode="test")
    trainloader = get_loader(dataset, cfg.dataset, mode="train")

    params, state = create_model(cfg, jax.random.PRNGKey(int(cfg.seed)))
    specs = build_group_specs(cfg)
    opt_state = init_opt_state(params, specs)
    histories = {"steps": [], "train_losses": [], "eval_losses": [],
                 "eval_psnrs": [], "pt_lrs": [], "attn_lrs": []}
    np_rng = np.random.default_rng(int(cfg.seed) + 2)

    start_step = 0
    codes = None
    if resume > 0 and os.path.exists(os.path.join(log_dir, "checkpoint.npz")):
        start_step, tree = load_checkpoint(log_dir)
        params = restore_into(params, tree["params"])
        opt_state = restore_into(opt_state, tree["opt_state"])
        state = restore_into(state, tree["state"])
        codes = {k: np.asarray(v) for k, v in tree.get("extras", {}).items()}
        histories.update(load_histories(log_dir))
        print(f"!!!!! Resume from step {start_step}")
    elif cfg.load_path:
        load_path = cfg.load_path
        if not os.path.isabs(load_path) and not os.path.exists(load_path):
            load_path = os.path.join(cfg.save_dir, load_path)
        if load_path.endswith(".npz") or os.path.exists(
                os.path.join(load_path, "checkpoint.npz")):
            s, tree = load_checkpoint(load_path)
            # Only params/state come from the pretrained run; the mapping MLP
            # is fresh, so restore leaf-wise where shapes match.
            from papr_tpu.train.checkpoint import _flatten
            import jax.numpy as jnp
            flat_t = _flatten(params)
            flat_l = _flatten(tree["params"])
            for k in flat_t:
                if k in flat_l and flat_t[k].shape == flat_l[k].shape:
                    flat_t[k] = flat_l[k]
            from papr_tpu.train.checkpoint import _unflatten
            params = jax.tree.map(jnp.asarray, _unflatten(flat_t))
            state = restore_into(state, tree["state"])
        else:
            s, params, state, _ = import_torch(load_path, params, state, cfg)
        print(f"!!!!! Loaded pretrained model from {cfg.load_path} (step {s})")

    if codes is None:
        codes = {
            "train_shading_codes": init_shading_codes(np_rng, len(dataset), cfg),
            "eval_shading_codes": init_shading_codes(np_rng, len(eval_dataset), cfg),
        }
    print("!!!!! train_shading_codes:", codes["train_shading_codes"].shape)

    loss_fn = build_loss(cfg)
    train_step, _ = make_train_step(cfg, loss_fn=loss_fn)
    last_act = build_activation(cfg.models.last_act)
    # select_by 'loss' must rank candidates by the full training loss
    # (reference utils.py:479-481), not silently fall back to MSE.
    score_fn = _candidate_scores_fn(cfg, loss_fn=loss_fn)

    tr = cfg.training
    ec = cfg.exposure_control
    step, eval_cnt, avg_loss = start_step, max(start_step, 1), 0.0
    start_time = time.time()
    print("Start step:", start_step, "Total steps:", tr.steps)
    while step < tr.steps:
        for batch in device_prefetch(trainloader):
            if step % int(ec.shading_code_resample_iter) == 0:
                print("Resampling shading codes")
                for img_idx in range(len(sample_dataset)):
                    resample_shading_codes(
                        codes["train_shading_codes"], cfg, params, state,
                        sample_dataset, img_idx, step, np_rng, score_fn)
                print("Resampled", len(sample_dataset), "codes")

            code = codes["train_shading_codes"][int(batch.img_idx[0])]
            params, opt_state, loss, pred = train_step(
                params, opt_state, state, batch.rayo, batch.rayd, batch.image,
                batch.c2w, step, shading_code=code)
            avg_loss = avg_loss + loss   # device-side (see train/loop.py)
            step += 1
            eval_cnt += 1

            if step % 200 == 0:
                dt = time.time() - start_time
                lrs = current_lrs(specs, step)
                print(f"Train step: {step} loss: {float(loss):.6f} "
                      f"mapping_lr: {lrs.get('mapping_mlp', 0):.3e} time: {dt:.2f}s")
                start_time = time.time()

            if (step % cfg.eval.step == 0) or (step % 500 == 0 and step < 10000):
                lrs = current_lrs(specs, step)
                histories["train_losses"].append(float(avg_loss) / eval_cnt)
                histories["pt_lrs"].append(lrs.get("points", 0.0))
                histories["attn_lrs"].append(lrs.get("attn", 0.0))
                histories["steps"].append(step)
                pred_np = np.asarray(last_act(pred))
                eval_code = codes["eval_shading_codes"][int(cfg.eval.img_idx)]
                eval_step(step, params, state, cfg, dataset, eval_dataset,
                          batch, loss_fn, pred_np, histories, log_dir,
                          eval_shading_code=eval_code)
                save_checkpoint(log_dir, step, params, opt_state, state,
                                extras=codes, histories=histories,
                                keep_snapshot=(step % 50000 == 0))
                avg_loss, eval_cnt = 0.0, 0

            if step >= tr.steps:
                break

    save_checkpoint(log_dir, step, params, opt_state, state, extras=codes,
                    histories=histories)
    print("Training finished!")


if __name__ == "__main__":
    main()
