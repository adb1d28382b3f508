"""A/B the eval candidate cap (tpu.cull_candidates_eval) on trained runs.

For each (config, experiment) pair, renders ``--views`` test views at the
default cap (auto=2048) and at 1024/512, reporting per-view PSNR vs ground
truth and the max abs frame difference vs the default cap. Round 4 measured
2 views of one scene; round 5 extends to >=8 views across every committed
checkpoint (VERDICT r4 item 8) so the README's "real speed dial" claim has
per-(M, scene) evidence (docs/status_round5.md).

Usage:
  python tools/cap_quality_ab.py [--views 8] [cfg:expdir [cfg:expdir ...]]
Defaults to the round-5 quality runs if no pairs are given.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from papr_tpu.config import Config, load_config, make_test_config
from papr_tpu.dataset import get_dataset, get_loader
from papr_tpu.train.checkpoint import load_checkpoint
from papr_tpu.train.step import render_full_image
from papr_tpu.utils.metrics import psnr_np

DEFAULT_PAIRS = [
    # experiments/ is recycled between rounds; default to checkpoints that
    # exist in a round-5 session (each experiment dir saves its config).
    "experiments/int8ab_bf16/int8ab_bf16.yml:experiments/int8ab_bf16",
    "configs/quality_r5_t2.yml:experiments/quality_r5_t2",
    "configs/quality_r5_250k.yml:experiments/quality_r5_250k",
]


def run_pair(cfg_path, exp_dir, views, caps=(None, 1024, 512)):
    def cfg_with(cap):
        over = {"tpu": {"cull_candidates_eval": cap}} if cap else {}
        return load_config(cfg_path, overrides=over)

    cfg0 = cfg_with(None)
    step, tree = load_checkpoint(exp_dir)
    params, state = tree["params"], tree["state"]
    print(f"== {exp_dir} (checkpoint step {step})")
    # Build the dataset exactly as test.py does (make_test_config over the
    # first test.datasets entry): the merged entry carries the default
    # testset's extract_patch: false, so views are FULL frames. Passing the
    # raw train cfg.dataset here instead yields 180x180 random test-view
    # patches (its extract_patch: true survives) — a weaker, patch-scoped
    # measurement (this bit the first round-5 cap table; status_round5.md).
    entry = Config(cfg0.test.datasets[0])
    dcfg = make_test_config(cfg0, entry).dataset
    ds = get_dataset(dcfg, mode="test", seed=int(cfg0.seed))
    loader = get_loader(ds, dcfg, mode="test")
    batches = []
    for i, b in enumerate(loader):
        batches.append(b)
        if i >= views - 1:
            break
    th = int(cfg0.get_path("test.max_height", 100))
    tw = int(cfg0.get_path("test.max_width", 100))

    frames = {}
    for cap in caps:
        cfg = cfg_with(cap)
        outs = [np.asarray(render_full_image(params, state, cfg, b.rayo,
                                             b.rayd, th, tw,
                                             rgb_only=True)["rgb"])
                for b in batches]
        frames[cap] = outs
        ps = [float(psnr_np(np.clip(outs[i][0], 0, 1),
                            np.asarray(batches[i].image[0])))
              for i in range(len(batches))]
        print(f"cap {cap}: psnr per view {[round(p, 4) for p in ps]} "
              f"mean {np.mean(ps):.4f}")
    for cap in caps[1:]:
        d = [float(np.abs(frames[cap][i].astype(np.float64) -
                          frames[caps[0]][i].astype(np.float64)).max())
             for i in range(len(batches))]
        print(f"cap {cap}: max |diff| vs default per view: {d} "
              f"(max {max(d):.3e})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("pairs", nargs="*", default=DEFAULT_PAIRS)
    args = ap.parse_args()
    for pair in args.pairs:
        cfg_path, exp_dir = pair.split(":")
        try:
            run_pair(cfg_path, exp_dir, args.views)
        except FileNotFoundError as e:
            print(f"== {exp_dir}: SKIPPED ({e})")


if __name__ == "__main__":
    main()
