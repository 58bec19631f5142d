#!/usr/bin/env python
"""Train a detector from a config file.

CLI twin of the reference `code/tools/train.py`:
  python tools/train.py configs/lsnet/lsnet_bbox_r50_fpn_1x_coco.py \
      --work-dir work/lsnet_r50 [--resume-from ckpt] [--options k=v ...]
"""

import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_options(pairs):
    out = {}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        try:
            out[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            out[key] = val
    return out


def main():
    parser = argparse.ArgumentParser(description="Train a detector")
    parser.add_argument("config")
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--resume-from", default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--max-iters-per-epoch", type=int, default=None)
    parser.add_argument("--total-epochs", type=int, default=None)
    parser.add_argument("--options", nargs="+",
                        help="override config: key.subkey=value")
    args = parser.parse_args()

    from lsnet_tpu.parallel.mesh import initialize_distributed
    from lsnet_tpu.train.loop import train_detector
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_dict(parse_options(args.options))
    if args.seed is not None:
        cfg.seed = args.seed
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])

    initialize_distributed()
    train_detector(cfg, work_dir, resume_from=args.resume_from,
                   total_epochs=args.total_epochs,
                   max_iters_per_epoch=args.max_iters_per_epoch,
                   eval_interval=cfg.get("evaluation", {}).get("interval", 1))


if __name__ == "__main__":
    main()
