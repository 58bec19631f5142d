"""Decode path tests: a synthetic 'perfect prediction' placed in the head
output layout must decode to the planted box after NMS (mirrors the role of
the reference `_get_bboxes_single` + `multiclass_nms_lsvr`)."""

import numpy as np
import jax
import jax.numpy as jnp

from lsnet_tpu.core import points as P
from lsnet_tpu.core.decode import Detections, TestConfig, lsnet_decode

IMG = (64, 64)
STRIDES = (8, 16, 32, 64, 128)


def plant_box(cls_maps, lm_maps, box, label, score_logit, lvl=0):
    """Plant a detection at the grid point nearest the box center."""
    x1, y1, x2, y2 = box
    s = STRIDES[lvl]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    gx, gy = int(round(cx / s)), int(round(cy / s))
    px, py = gx * s, gy * s
    cls_maps[lvl][0, gy, gx, label] = score_logit
    # landmark layout per point: [y-, y+, x-, x+]; order t,l,b,r,c
    pts = [((x1 + x2) / 2, y1), (x1, (y1 + y2) / 2),
           ((x1 + x2) / 2, y2), (x2, (y1 + y2) / 2), (cx, cy)]
    vec = []
    for (ptx, pty) in pts:
        oy = (pty - py) / s
        ox = (ptx - px) / s
        vec += [max(-oy, 0), max(oy, 0), max(-ox, 0), max(ox, 0)]
    lm_maps[lvl][0, gy, gx, :] = np.array(vec, np.float32)


def test_decode_recovers_planted_box():
    cfg = TestConfig(image_shape=IMG, num_classes=4, task="bbox",
                     point_strides=STRIDES, nms_pre=100, score_thr=0.3,
                     max_per_img=10)
    shapes = P.level_shapes(IMG, STRIDES)
    cls_maps = [np.full((1, h, w, 4), -10.0, np.float32) for h, w in shapes]
    lm_maps = [np.full((1, h, w, 20), 0.05, np.float32) for h, w in shapes]
    box = (16.0, 24.0, 40.0, 48.0)
    plant_box(cls_maps, lm_maps, box, label=2, score_logit=4.0)

    outs = {"cls": [jnp.array(m) for m in cls_maps],
            "bbox_refine": [jnp.array(m) for m in lm_maps]}
    det = lsnet_decode(outs,
                       jnp.array([[64, 64]], jnp.int32),
                       jnp.array([[1, 1, 1, 1]], jnp.float32), cfg)
    valid = np.asarray(det.valid[0])
    assert valid.sum() >= 1
    top = np.argmax(np.asarray(det.scores[0]))
    np.testing.assert_allclose(np.asarray(det.bboxes[0, top]), box, atol=0.5)
    assert int(det.labels[0, top]) == 2
    assert float(det.scores[0, top]) > 0.9
    # extremes packed [xt,y1, x1,yl, xb,y2, x2,yr]
    lm = np.asarray(det.landmarks[0, top])
    np.testing.assert_allclose(lm[0], (box[0] + box[2]) / 2, atol=0.5)
    np.testing.assert_allclose(lm[3], (box[1] + box[3]) / 2, atol=0.5)


def test_decode_score_threshold_filters():
    cfg = TestConfig(image_shape=IMG, num_classes=4, task="bbox",
                     point_strides=STRIDES, nms_pre=100, score_thr=0.3,
                     max_per_img=10)
    shapes = P.level_shapes(IMG, STRIDES)
    outs = {"cls": [jnp.full((1, h, w, 4), -10.0) for h, w in shapes],
            "bbox_refine": [jnp.full((1, h, w, 20), 0.05)
                            for h, w in shapes]}
    det = lsnet_decode(outs, jnp.array([[64, 64]], jnp.int32),
                       jnp.array([[1, 1, 1, 1]], jnp.float32), cfg)
    assert int(np.asarray(det.valid).sum()) == 0


def test_decode_rescale():
    cfg = TestConfig(image_shape=IMG, num_classes=4, task="bbox",
                     point_strides=STRIDES, nms_pre=100, score_thr=0.3,
                     max_per_img=10)
    shapes = P.level_shapes(IMG, STRIDES)
    cls_maps = [np.full((1, h, w, 4), -10.0, np.float32) for h, w in shapes]
    lm_maps = [np.full((1, h, w, 20), 0.05, np.float32) for h, w in shapes]
    box = (16.0, 24.0, 40.0, 48.0)
    plant_box(cls_maps, lm_maps, box, label=1, score_logit=4.0)
    outs = {"cls": [jnp.array(m) for m in cls_maps],
            "bbox_refine": [jnp.array(m) for m in lm_maps]}
    det = lsnet_decode(outs, jnp.array([[64, 64]], jnp.int32),
                       jnp.array([[2, 2, 2, 2]], jnp.float32), cfg,
                       rescale=True)
    top = np.argmax(np.asarray(det.scores[0]))
    np.testing.assert_allclose(np.asarray(det.bboxes[0, top]),
                               np.asarray(box) / 2, atol=0.5)
