#!/usr/bin/env python
"""Visualize the training pipeline's output samples (GT overlays).

CLI twin of the reference `code/tools/browse_dataset.py:1-68`: iterate the
dataset exactly as training sees it (resize / augment / flip), draw the GT
annotations for the task (boxes + extreme points / contour polygons /
keypoint skeletons) and save PNGs to ``--output-dir``. There is no display
in this environment, so saving is the default (the reference's
``--not-show`` path).

Usage:
  python tools/browse_dataset.py CONFIG --output-dir work/browse
      [--number 20] [--val] [--seed 0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMG_STD = np.array([58.395, 57.12, 57.375], np.float32)


def denormalize(img: np.ndarray) -> np.ndarray:
    return np.clip(img * IMG_STD + IMG_MEAN, 0, 255).astype(np.uint8)


def draw_sample(sample, out_file):
    from lsnet_tpu.utils.visualize import (imshow_extremes, imshow_polygons,
                                           imshow_pose)

    img = denormalize(np.asarray(sample["image"], np.float32))
    bboxes = sample.get("gt_bboxes", np.zeros((0, 4), np.float32))
    labels = sample.get("gt_labels", np.zeros((0,), np.int32))
    if "gt_extremes" in sample:
        # extreme_points layout: 4 points + center (10 floats); the drawer
        # takes the 4 extreme points
        ext = np.asarray(sample["gt_extremes"])[:, :8]
        return imshow_extremes(img, bboxes, ext, labels, out_file=out_file)
    if "gt_polygons" in sample:
        return imshow_polygons(img, bboxes, np.asarray(sample["gt_polygons"]),
                               labels, out_file=out_file)
    if "gt_keypoints_vs" in sample:
        kps = np.asarray(sample["gt_keypoints_vs"]).reshape(
            len(bboxes), -1, 3)[..., :2].reshape(len(bboxes), -1)
        return imshow_pose(img, bboxes, kps, out_file=out_file)
    # plain boxes fallback
    return imshow_extremes(img, bboxes, np.zeros((len(bboxes), 8)),
                           labels, out_file=out_file)


def main():
    ap = argparse.ArgumentParser(description="Browse the dataset pipeline")
    ap.add_argument("config")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--number", type=int, default=20)
    ap.add_argument("--val", action="store_true",
                    help="browse the val split (test-mode pipeline)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from lsnet_tpu.data.coco import CocoDataset, DatasetConfig
    from lsnet_tpu.train.loop import (_head_cfg, _head_num_vectors)
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    head = _head_cfg(cfg)
    task = {"bbox": "bbox", "segm": "segm", "pose_bbox": "pose",
            "pose_kbox": "pose"}[head.get("task", "bbox")]
    split = cfg.data.val if args.val else cfg.data.train
    ds = CocoDataset(DatasetConfig(
        ann_file=split.ann_file, img_prefix=split.img_prefix, task=task,
        num_vectors=_head_num_vectors(cfg, head), filter_empty=not args.val,
        img_scale=tuple(split.get("img_scale", (1333, 800))),
        flip_ratio=float(split.get("flip_ratio", 0.5)),
        augmentations=tuple(split.get("augmentations", ()))),
        test_mode=args.val)

    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    n = min(args.number, len(ds)) if args.number > 0 else len(ds)
    for i in range(n):
        sample = ds.get_sample(i, None if args.val else rng)
        out = os.path.join(args.output_dir,
                           f"{i:04d}_img{sample['img_id']}.png")
        draw_sample(sample, out)
        print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
