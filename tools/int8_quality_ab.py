"""A/B tpu.int8_eval (int8-quantized eval walks) on a trained run.

Renders the first test views of a finished experiment with the fp one-shot
eval kernel and with tpu.int8_eval: true, reporting PSNR vs ground truth
for both, plus PSNR of the int8 frame against the fp frame (the direct
quantization cost). The measured numbers live in docs/status_round4.md.

Usage: python tools/int8_quality_ab.py [config_yml] [experiment_dir] [n_views]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from papr_tpu.config import Config, load_config, make_test_config
from papr_tpu.dataset import get_dataset, get_loader
from papr_tpu.train.checkpoint import load_checkpoint
from papr_tpu.train.step import render_full_image
from papr_tpu.utils.metrics import psnr_np


def main(cfg_path="configs/quality_r4.yml", exp_dir="experiments/quality_r4",
         n_views="2"):
    n_views = int(n_views)

    def cfg_with(int8):
        return load_config(cfg_path, overrides={"tpu": {"int8_eval": int8}})

    cfg0 = cfg_with(False)
    step, tree = load_checkpoint(exp_dir)
    params, state = tree["params"], tree["state"]
    print("checkpoint step", step)
    # Full-frame test views via test.py's exact dataset construction
    # (make_test_config; see the note in tools/cap_quality_ab.py).
    entry = Config(cfg0.test.datasets[0])
    dcfg = make_test_config(cfg0, entry).dataset
    ds = get_dataset(dcfg, mode="test", seed=int(cfg0.seed))
    loader = get_loader(ds, dcfg, mode="test")
    batches = []
    for i, b in enumerate(loader):
        batches.append(b)
        if i >= n_views - 1:
            break

    frames = {}
    for int8 in (False, True):
        cfg = cfg_with(int8)
        th = int(cfg.get_path("test.max_height", 100))
        tw = int(cfg.get_path("test.max_width", 100))
        outs = [np.asarray(render_full_image(params, state, cfg, b.rayo,
                                             b.rayd, th, tw,
                                             rgb_only=True)["rgb"])
                for b in batches]
        frames[int8] = outs
        ps = [float(psnr_np(np.clip(outs[i][0], 0, 1),
                            np.asarray(batches[i].image[0])))
              for i in range(len(batches))]
        print("int8" if int8 else "fp  ", "psnr vs GT",
              [round(p, 4) for p in ps])
    agree = [float(psnr_np(np.clip(frames[True][i][0], 0, 1),
                           np.clip(frames[False][i][0], 0, 1)))
             for i in range(len(batches))]
    print("int8-vs-fp frame PSNR:", [round(p, 2) for p in agree])


if __name__ == "__main__":
    main(*sys.argv[1:])
