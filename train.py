#!/usr/bin/env python
"""Training CLI: python train.py --opt configs/nerfsyn/chair.yml [--resume 1]

Interface-compatible with the reference train.py (same flags, config files,
and output layout under <save_dir>/<index>).
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

from papr_tpu.config import load_config, make_eval_config
from papr_tpu.train.loop import train_and_eval
from papr_tpu.utils.logging import Logger, setup_seed, snapshot_code


def parse_args():
    parser = argparse.ArgumentParser(description="PAPR-TPU")
    parser.add_argument("--opt", type=str, default="", help="Option file path")
    parser.add_argument("--resume", type=int, default=0, help="Resume training")
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = load_config(args.opt)
    eval_cfg = make_eval_config(cfg)

    log_dir = os.path.join(cfg.save_dir, cfg.index)
    os.makedirs(log_dir, exist_ok=True)
    sys.stdout = Logger(os.path.join(log_dir, "train.log"), sys.stdout)
    sys.stderr = Logger(os.path.join(log_dir, "train_error.log"), sys.stderr)

    shutil.copyfile(__file__, os.path.join(log_dir, os.path.basename(__file__)))
    if args.opt:
        shutil.copyfile(args.opt, os.path.join(log_dir, os.path.basename(args.opt)))
    snapshot_code(".", os.path.join(log_dir, "code.zip"))

    setup_seed(cfg.seed)
    train_and_eval(cfg, eval_cfg, resume=args.resume)


if __name__ == "__main__":
    main()
