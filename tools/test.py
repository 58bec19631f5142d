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

    import jax
    import jax.numpy as jnp

    from lsnet_tpu.models import build_detector
    from lsnet_tpu.train.checkpoint import restore_checkpoint
    from lsnet_tpu.train.loop import evaluate_detector
    from lsnet_tpu.train.optim import build_optimizer
    from lsnet_tpu.train.step import create_train_state
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    canvas = tuple(cfg.get("canvas_shape", (800, 1344)))
    model, _ = build_detector(cfg.model.to_dict())
    dummy = jnp.zeros((1, *canvas, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy)
    tx, _ = build_optimizer(0.01, 1000, [8, 11])
    state = create_train_state(variables, tx)
    state = restore_checkpoint(args.checkpoint, state)

    metrics = evaluate_detector(cfg, model, state, canvas,
                                max_images=args.max_images)
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
