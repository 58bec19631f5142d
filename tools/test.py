#!/usr/bin/env python
"""Evaluate a trained detector on the test/val split.

CLI twin of the reference `code/tools/test.py`:
  python tools/test.py CONFIG CHECKPOINT [--eval bbox|segm|keypoints]
      [--max-images N] [--out results.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Test a detector")
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("--eval", nargs="+", default=None)
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from lsnet_tpu.models import build_detector
    from lsnet_tpu.train.checkpoint import (init_variables_shell,
                                            restore_eval_state)
    from lsnet_tpu.train.loop import evaluate_detector
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    canvas = tuple(cfg.get("canvas_shape", (800, 1344)))
    model, _ = build_detector(cfg.model.to_dict())
    state = restore_eval_state(args.checkpoint,
                               init_variables_shell(model, canvas))

    metrics = evaluate_detector(cfg, model, state, canvas,
                                max_images=args.max_images)
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
