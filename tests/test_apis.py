"""High-level API tests: init_detector / inference_detector / aug_test
wiring on a tiny model (reference `tests/test_async.py` / inference
coverage analogue)."""

import numpy as np
import jax
import jax.numpy as jnp

from lsnet_tpu.apis import (DetectorBundle, aug_test, aug_test_simple,
                            inference_detector, init_detector, show_result)
from lsnet_tpu.utils.config import Config

IMG = 64


def tiny_cfg():
    return Config(dict(
        model=dict(
            type="LSDetector",
            backbone=dict(type="ResNet", depth=18, num_stages=4,
                          out_indices=(0, 1, 2, 3)),
            neck=dict(type="FPN", out_channels=32, start_level=1,
                      add_extra_convs="on_input", num_outs=5,
                      norm_cfg=dict(type="GN", num_groups=8)),
            bbox_head=dict(type="LSHead", task="bbox", num_vectors=4,
                           num_classes=3, in_channels=32, feat_channels=32,
                           point_feat_channels=32, stacked_convs=1,
                           norm_cfg=dict(type="GN", num_groups=8),
                           conv_module_type="norm")),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(type="nms", iou_thr=0.6), max_per_img=10),
        data=dict(test=dict(img_scale=(IMG, IMG))),
        canvas_shape=(IMG, IMG),
    ))


def test_inference_and_show(tmp_path):
    bundle = init_detector(tiny_cfg(), canvas=(IMG, IMG))
    img = (np.random.RandomState(0).rand(48, 56, 3) * 255).astype(np.uint8)
    result = inference_detector(bundle, img)
    for k in ("bboxes", "scores", "labels", "landmarks"):
        assert k in result
    out = show_result(img, result, task="bbox",
                      out_file=str(tmp_path / "vis.png"))
    assert out.shape == img.shape
    assert (tmp_path / "vis.png").exists()


def test_aug_test_paths():
    bundle = init_detector(tiny_cfg(), canvas=(IMG, IMG))
    img = (np.random.RandomState(1).rand(48, 56, 3) * 255).astype(np.uint8)
    voted = aug_test(bundle, img, scales=[(IMG, IMG)], flip=True)
    assert "bboxes" in voted and voted["bboxes"].shape[1] == 4
    simple = aug_test_simple(bundle, img, scales=[(IMG, IMG)], flip=True)
    assert "bboxes" in simple
