"""A/B the eval candidate cap (tpu.cull_candidates_eval) on a trained run.

Renders the first two test views of a finished experiment at the default
cap (auto=2048) and at 1024/512, reporting PSNR vs ground truth and the
max abs frame difference vs the default. Used for the round-4 measurement
in docs/status_round4.md (quality_r4: bit-identical at every cap, +8.1%
device FPS at 512 — see the dated A/B table).

Usage: python tools/cap_quality_ab.py [config_yml] [experiment_dir]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from papr_tpu.config import load_config
from papr_tpu.dataset import get_dataset, get_loader
from papr_tpu.train.checkpoint import load_checkpoint
from papr_tpu.train.step import render_full_image
from papr_tpu.utils.metrics import psnr_np


def main(cfg_path="configs/quality_r4.yml", exp_dir="experiments/quality_r4"):
    def cfg_with(cap):
        over = {"tpu": {"cull_candidates_eval": cap}} if cap else {}
        return load_config(cfg_path, overrides=over)

    cfg0 = cfg_with(None)
    step, tree = load_checkpoint(exp_dir)
    params, state = tree["params"], tree["state"]
    print("checkpoint step", step)
    ds = get_dataset(cfg0.dataset, mode="test", seed=int(cfg0.seed))
    loader = get_loader(ds, cfg0.dataset, mode="test")
    batches = []
    for i, b in enumerate(loader):
        batches.append(b)
        if i >= 1:
            break

    frames = {}
    for cap in (None, 1024, 512):
        cfg = cfg_with(cap)
        outs = [np.asarray(render_full_image(params, state, cfg, b.rayo,
                                             b.rayd, 100, 100,
                                             rgb_only=True)["rgb"])
                for b in batches]
        frames[cap] = outs
        ps = [float(psnr_np(np.clip(outs[i][0], 0, 1),
                            np.asarray(batches[i].image[0])))
              for i in range(len(batches))]
        print("cap", cap, "psnr", [round(p, 4) for p in ps])
    for cap in (1024, 512):
        d = [float(np.abs(frames[cap][i].astype(np.float64) -
                          frames[None][i].astype(np.float64)).max())
             for i in range(len(batches))]
        print("cap", cap, "max |diff| vs default:", d)


if __name__ == "__main__":
    main(*sys.argv[1:])
