#!/usr/bin/env python
"""Offline LSVR annotation generator (reference `code/tools/gen_coco_lsvr.py`):
adds `extreme_points` (4 extreme pts + bbox center, 10 floats) to every
annotation of a COCO instances json.

NOTE: the framework computes extreme points on the fly from segmentation
polygons (lsnet_tpu.data.lsvr), so this tool is OPTIONAL — it exists for
drop-in parity with reference workflows that expect instances_lsvr_*.json.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lsnet_tpu.data.lsvr import extreme_points_with_center  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ann_file")
    parser.add_argument("out_file")
    args = parser.parse_args()
    with open(args.ann_file) as f:
        data = json.load(f)
    n = 0
    for ann in data["annotations"]:
        x, y, w, h = ann["bbox"]
        bbox = np.array([x, y, x + w, y + h])
        seg = ann.get("segmentation")
        if isinstance(seg, list) and seg:
            pts = np.concatenate([np.asarray(s).reshape(-1, 2) for s in seg])
        else:  # RLE / missing: fall back to the bbox rectangle
            pts = np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]])
        ann["extreme_points"] = [float(v) for v in
                                 extreme_points_with_center(pts, bbox)]
        n += 1
    with open(args.out_file, "w") as f:
        json.dump(data, f)
    print(f"wrote {args.out_file} ({n} annotations)")


if __name__ == "__main__":
    main()
