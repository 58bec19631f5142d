"""LSCPVHead forward / loss / decode tests (reference has none — modeled on
the head-unit test pattern of `code/tests/test_heads.py`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lsnet_tpu.core import points as P
from lsnet_tpu.core.cpv import (CPVLossConfig, TestConfig, gaussian_radius,
                                hm_targets_single, lscpv_decode, lscpv_loss,
                                make_sem_targets, smooth_l1)
from lsnet_tpu.core.loss import LossConfig
from lsnet_tpu.models import build_detector

IMG = (64, 64)
STRIDES = (8, 16, 32, 64, 128)


def tiny_cpv_model():
    return build_detector(dict(
        type="LSCPVDetector",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=-1),
        neck=dict(type="FPN", out_channels=32, start_level=1,
                  add_extra_convs="on_input", num_outs=5,
                  norm_cfg=dict(type="GN", num_groups=8)),
        bbox_head=dict(type="LSCPVHead", num_classes=4, in_channels=32,
                       feat_channels=32, point_feat_channels=32,
                       stacked_convs=1, shared_stacked_convs=1,
                       corner_dim=16, num_points=9,
                       norm_cfg=dict(type="GN", num_groups=8),
                       conv_module_type="norm"),
    ))


@pytest.mark.slow
def test_cpv_forward_shapes():
    model, _ = tiny_cpv_model()
    x = jnp.zeros((1, *IMG, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    shapes = P.level_shapes(IMG, STRIDES)
    assert len(outs["cls"]) == 5
    for lvl, (h, w) in enumerate(shapes):
        assert outs["cls"][lvl].shape == (1, h, w, 4)
        assert outs["bbox_init"][lvl].shape == (1, h, w, 20)
        assert outs["bbox_refine"][lvl].shape == (1, h, w, 20)
        assert outs["hem_score"][lvl].shape == (1, h, w, 2)
        assert outs["hem_offset"][lvl].shape == (1, h, w, 4)
        assert outs["sem_score"][lvl].shape == (1, h, w, 4)


def test_hm_targets():
    img = (128, 128)
    points = P.multi_level_points(img, STRIDES)
    nlp = P.num_level_points(img, STRIDES)
    valid = jnp.ones((points.shape[0],), bool)
    # large box: gaussian radius ( ~0.08 * size ) exceeds the stride-8
    # neighbour distance, so adjacent grid points get a bump
    gt = jnp.array([[8.0, 16.0, 124.0, 124.0], [0, 0, 0, 0]])
    gv = jnp.array([True, False])
    t = hm_targets_single(points, valid, nlp, gt, gv)
    # the closest point at level 0 to TL corner (8,16) is exactly (8,16)
    hm0 = np.asarray(t.hm_tl[:nlp[0]]).reshape(16, 16)
    assert hm0[2, 1] == 1.0
    off = np.asarray(t.offset_tl[:nlp[0]]).reshape(16, 16, 2)
    np.testing.assert_allclose(off[2, 1], [0, 0], atol=1e-6)
    # gaussian neighbourhood positive but < 1
    assert 0 < hm0[2, 2] < 1
    assert int(t.num_pos_tl) >= 1
    # invalid gt contributes nothing
    assert float(t.hm_br[0]) <= 1.0


def test_gaussian_radius_positive():
    r = gaussian_radius(jnp.array([32.0]), jnp.array([32.0]), 0.7)
    assert float(r[0]) > 0


def test_smooth_l1():
    np.testing.assert_allclose(
        float(smooth_l1(jnp.array(0.0), jnp.array(0.0))), 0.0)
    big = float(smooth_l1(jnp.array(2.0), jnp.array(0.0), beta=1 / 9))
    assert np.isclose(big, 2.0 - 0.5 / 9)


def test_sem_targets():
    boxes = jnp.array([[[0, 0, 32, 32], [8, 8, 16, 16.]]])
    labels = jnp.array([[1, 2]])
    valid = jnp.array([[True, True]])
    sem, wts = make_sem_targets(boxes, labels, valid, IMG, 4)
    assert sem.shape == (1, 8, 8, 4)
    # smaller box painted last wins its own weight cell
    assert float(sem[0, 1, 1, 2]) == 1.0
    assert float(sem[0, 0, 0, 1]) == 1.0
    assert float(wts[0, 1, 1, 2]) > float(wts[0, 0, 0, 1])


@pytest.mark.slow
def test_cpv_loss_and_decode():
    model, _ = tiny_cpv_model()
    B = 2
    x = jnp.zeros((B, *IMG, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    batch = {
        "pad_shape": jnp.array([[64, 64]] * B, jnp.int32),
        "gt_bboxes": jnp.array([[[8, 8, 40, 40], [20, 10, 60, 50]]] * B,
                               jnp.float32),
        "gt_labels": jnp.array([[1, 2]] * B, jnp.int32),
        "gt_valid": jnp.array([[True, True]] * B),
    }
    ccfg = CPVLossConfig(base=LossConfig(image_shape=IMG, num_classes=4,
                                         task="bbox"))
    total, losses = lscpv_loss(outs, batch, ccfg)
    expected = {"loss_cls", "loss_bbox_init", "loss_bbox_refine",
                "loss_heatmap", "loss_offset", "loss_sem"}
    assert set(losses) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    tcfg = TestConfig(image_shape=IMG, num_classes=4, task="bbox",
                      nms_pre=100, score_thr=0.05, max_per_img=10)
    det = lscpv_decode(outs, jnp.array([[64, 64]] * B, jnp.int32),
                       jnp.ones((B, 4), jnp.float32), tcfg)
    assert det.bboxes.shape == (B, 10, 4)
    assert np.all(np.isfinite(np.asarray(det.bboxes)))


@pytest.mark.slow
def test_cpv_decode_carries_landmarks():
    """CPV results must carry the decoded extreme-point vectors (VERDICT r1:
    `cpv.py:388` packed zeros; the reference LSCPV get_bboxes returns
    extremes through results, `lscpvnet_head.py:1012-1092`)."""
    model, _ = tiny_cpv_model()
    B = 1
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, *IMG, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x)
    outs = model.apply(variables, x)
    tcfg = TestConfig(image_shape=IMG, num_classes=4, task="bbox",
                      nms_pre=100, score_thr=0.0, max_per_img=10)
    det = lscpv_decode(outs, jnp.array([[64, 64]] * B, jnp.int32),
                       jnp.ones((B, 4), jnp.float32), tcfg)
    lm = np.asarray(det.landmarks)
    valid = np.asarray(det.valid)
    assert lm.shape == (B, 10, 8)
    assert valid.any()
    # at least one valid detection has a non-zero landmark vector
    assert np.abs(lm[valid]).sum() > 0
    # landmarks live inside the image frame
    assert (lm[valid] >= 0).all() and (lm[valid] <= 64).all()
