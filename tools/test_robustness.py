#!/usr/bin/env python
"""Corruption-robustness benchmark: evaluate across corruptions x severities.

CLI twin of the reference `code/tools/test_robustness.py:1-458`: for every
requested corruption and severity, re-run the val evaluation with the
corruption applied right after image load (the reference injects a
`Corrupt` step at pipeline position 1), and aggregate
``{corruption: {severity: {task: metrics}}}`` into one json consumed by
`tools/robustness_eval.py` (P / mPC / rPC).

Severity 0 is the clean pass — evaluated once and stored under every
corruption (the reference stores it per corruption and reads P from the
first; duplicating keeps the json self-describing).

The corruption backend is the in-tree numpy suite
(`lsnet_tpu/data/corruptions.py`) — the external ``imagecorruptions``
package is absent in this image; 14/19 corruptions are available
(see that module's docstring for the exact subset and why).

Usage:
  python tools/test_robustness.py CONFIG CHECKPOINT [--out robust.json]
      [--corruptions benchmark|noise|blur|weather|digital|holdout|all|NAME..]
      [--severities 0 1 2 3 4 5] [--max-images N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pick_corruptions(spec):
    from lsnet_tpu.data.corruptions import BENCHMARK, CORRUPTIONS, HOLDOUT
    groups = {
        "benchmark": BENCHMARK,
        "holdout": HOLDOUT,
        "all": sorted(CORRUPTIONS),
        "noise": ["gaussian_noise", "shot_noise", "impulse_noise"],
        "blur": ["defocus_blur", "motion_blur", "zoom_blur"],
        "weather": ["fog", "brightness"],
        "digital": ["contrast", "pixelate", "jpeg_compression"],
    }
    if len(spec) == 1 and spec[0] in groups:
        return groups[spec[0]]
    for name in spec:
        if name not in CORRUPTIONS:
            raise SystemExit(f"unknown corruption {name!r}; available: "
                             f"{sorted(CORRUPTIONS)} or groups "
                             f"{sorted(groups)}")
    return list(spec)


def main():
    ap = argparse.ArgumentParser(description="Robustness benchmark")
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--out", default="robustness_results.json")
    ap.add_argument("--corruptions", nargs="+", default=["benchmark"])
    ap.add_argument("--severities", type=int, nargs="+",
                    default=[0, 1, 2, 3, 4, 5])
    ap.add_argument("--max-images", type=int, default=None)
    args = ap.parse_args()

    from lsnet_tpu.models import build_detector
    from lsnet_tpu.train.checkpoint import (init_variables_shell,
                                            restore_eval_state)
    from lsnet_tpu.train.loop import evaluate_detector
    from lsnet_tpu.utils.config import Config

    corruptions = pick_corruptions(args.corruptions)
    cfg = Config.fromfile(args.config)
    canvas = tuple(cfg.get("canvas_shape", (800, 1344)))
    model, _ = build_detector(cfg.model.to_dict())
    state = restore_eval_state(args.checkpoint,
                               init_variables_shell(model, canvas))

    def run(corruption):
        if corruption is not None:
            cfg.data.val["corruption"] = list(corruption)
        else:
            cfg.data.val.pop("corruption", None)
        return evaluate_detector(cfg, model, state, canvas,
                                 max_images=args.max_images)

    results = {c: {} for c in corruptions}
    clean = None
    for corruption in corruptions:
        for severity in args.severities:
            if severity == 0:
                if clean is None:
                    print("[robustness] clean pass", flush=True)
                    clean = run(None)
                results[corruption][severity] = clean
                continue
            print(f"[robustness] {corruption} severity {severity}",
                  flush=True)
            results[corruption][severity] = run((corruption, severity))
        with open(args.out, "w") as f:    # checkpoint progress per corruption
            json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
