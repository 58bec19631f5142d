"""Round-4 zoo stragglers: PISA-SSD, GA-RPN, Double-Head R-CNN and
Dynamic R-CNN (VERDICT r3 "what's missing" #3) — forward contracts, loss
finiteness/grads, decode validity, schedule behavior, config builds."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

IMG = (64, 64)
CFG_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def _batch(B=2, M=4, empty=False):
    gt = np.zeros((B, M, 4), np.float32)
    valid = np.zeros((B, M), bool)
    labels = np.zeros((B, M), np.int32)
    if not empty:
        gt[:, 0] = [8, 8, 40, 40]
        gt[:, 1] = [20, 10, 60, 50]
        valid[:, :2] = True
        labels[:, 0] = 1
        labels[:, 1] = 2
    return {"gt_bboxes": jnp.asarray(gt), "gt_valid": jnp.asarray(valid),
            "gt_labels": jnp.asarray(labels),
            "img_shape": jnp.asarray([[64, 64]] * B, jnp.int32),
            "pad_shape": jnp.asarray([[64, 64]] * B, jnp.int32)}


# ------------------------------------------------------------- PISA SSD ---

def _ssd_feats(B=2):
    rng = np.random.RandomState(0)
    chans = (512, 1024, 512, 256, 256, 256)
    out = []
    for s, c in zip((8, 16, 32, 64, 100, 300), chans):
        h, w = -(-IMG[0] // s), -(-IMG[1] // s)
        out.append(jnp.asarray(rng.randn(B, h, w, c).astype(np.float32)))
    return out


@pytest.mark.parametrize("empty", [False, True])
def test_pisa_ssd_loss_and_grads(empty):
    from lsnet_tpu.core.dense_loss import DenseLossConfig, pisa_ssd_loss
    from lsnet_tpu.models.heads.dense import SSDHead

    head = SSDHead(num_classes=4)
    feats = _ssd_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch(empty=empty)
    cfg = DenseLossConfig(image_shape=IMG, num_classes=4, head="pisa_ssd",
                          strides=(8, 16, 32, 64, 100, 300))

    def lf(p):
        outs = head.apply({"params": p}, feats)
        return pisa_ssd_loss(outs, batch, cfg)

    (total, losses), grads = jax.value_and_grad(
        lambda p: lf(p), has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    assert "loss_carl" in losses
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm))
    if empty:
        assert float(losses["loss_carl"]) == 0.0


def test_pisa_ssd_matches_ssd_on_negatives_only():
    """With zero GT, ISR/CARL are inert: cls loss equals plain SSD's."""
    from lsnet_tpu.core.dense_loss import (DenseLossConfig, pisa_ssd_loss,
                                           ssd_loss)
    from lsnet_tpu.models.heads.dense import SSDHead
    head = SSDHead(num_classes=4)
    feats = _ssd_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    batch = _batch(empty=True)
    cfg_p = DenseLossConfig(image_shape=IMG, num_classes=4, head="pisa_ssd",
                            strides=(8, 16, 32, 64, 100, 300))
    cfg_s = DenseLossConfig(image_shape=IMG, num_classes=4, head="ssd",
                            strides=(8, 16, 32, 64, 100, 300))
    _, lp = pisa_ssd_loss(outs, batch, cfg_p)
    _, ls = ssd_loss(outs, batch, cfg_s)
    np.testing.assert_allclose(float(lp["loss_cls"]),
                               float(ls["loss_cls"]), rtol=1e-5)


# -------------------------------------------------------------- GA-RPN ---

def _fpn_feats(B=2, C=256, strides=(8, 16, 32, 64, 128)):
    rng = np.random.RandomState(1)
    return [jnp.asarray(rng.randn(B, -(-IMG[0] // s), -(-IMG[1] // s), C)
                        .astype(np.float32)) for s in strides]


def test_ga_rpn_forward_and_loss():
    from lsnet_tpu.core.dense_loss import DenseLossConfig, ga_rpn_loss
    from lsnet_tpu.models.heads.dense import GARPNHead

    head = GARPNHead()
    feats = _fpn_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    for key, ch in (("cls", 1), ("reg", 4), ("loc", 1), ("shape", 2)):
        assert len(outs[key]) == 5
        assert outs[key][0].shape[-1] == ch
    batch = _batch()
    cfg = DenseLossConfig(image_shape=IMG, num_classes=1, head="ga_rpn")

    def lf(p):
        outs = head.apply({"params": p}, feats)
        return ga_rpn_loss(outs, batch, cfg)

    (total, losses), grads = jax.value_and_grad(
        lambda p: lf(p), has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    for k in ("loss_anchor_loc", "loss_anchor_shape", "loss_rpn_cls",
              "loss_rpn_bbox"):
        assert np.isfinite(float(losses[k])), k
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm))


def test_ga_rpn_decode():
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.dense_decode import dense_decode
    from lsnet_tpu.core.dense_loss import DenseLossConfig
    from lsnet_tpu.models.heads.dense import GARPNHead

    head = GARPNHead()
    feats = _fpn_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    lcfg = DenseLossConfig(image_shape=IMG, num_classes=1, head="ga_rpn")
    tcfg = TestConfig(image_shape=IMG, num_classes=1, task="bbox",
                      num_vectors=4, nms_pre=200, score_thr=0.0,
                      nms_iou=0.7, max_per_img=50)
    dets = dense_decode(outs, jnp.asarray([[64, 64]] * 2, jnp.int32),
                        jnp.ones((2, 4), jnp.float32), tcfg, lcfg)
    assert dets.bboxes.shape == (2, 50, 4)
    v = np.asarray(dets.valid)
    b = np.asarray(dets.bboxes)
    assert np.all(b[v][:, 2] >= b[v][:, 0])


# ------------------------------------------------- Double-Head R-CNN -----

def test_double_head_builds_and_runs():
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.utils.config import Config
    cfg = Config.fromfile(os.path.join(
        CFG_ROOT, "double_heads", "dh_faster_rcnn_r50_fpn_1x_coco.py"))
    model, _ = build_detector(cfg.model.to_dict())
    assert type(model).__name__ == "DoubleHeadRCNNDetector"
    assert model.reg_roi_scale_factor == 1.3
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rois = jnp.asarray([[0.0, 4, 4, 40, 40], [0.0, 8, 8, 24, 24]])
    variables = model.init(jax.random.PRNGKey(0), images, rois)
    outs = model.apply(variables, images, rois)
    cls, reg = outs["roi"]
    assert cls.shape == (2, 81)
    assert reg.shape == (2, 4 * 80)


def test_double_head_loss_runs():
    from lsnet_tpu.core.two_stage import TwoStageConfig, two_stage_loss
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.utils.config import Config
    cfg = Config.fromfile(os.path.join(
        CFG_ROOT, "double_heads", "dh_faster_rcnn_r50_fpn_1x_coco.py"))
    md = cfg.model.to_dict()
    md["roi_head"]["bbox_head"]["num_classes"] = 4
    md["backbone"]["depth"] = 18
    model, _ = build_detector(md)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images)
    tscfg = TwoStageConfig(image_shape=IMG, num_classes=4,
                           proposal_count=32, rcnn_num_samples=16)
    batch = _batch(B=1)
    batch["image"] = images
    total, losses = two_stage_loss(model, variables, batch, tscfg)
    assert np.isfinite(float(total))


# --------------------------------------------------- Dynamic R-CNN ------

def test_dynamic_rcnn_loss_and_stats():
    from lsnet_tpu.core.two_stage import TwoStageConfig, dynamic_rcnn_loss
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.utils.config import Config
    cfg = Config.fromfile(os.path.join(
        CFG_ROOT, "dynamic_rcnn", "dynamic_rcnn_r50_fpn_1x.py"))
    md = cfg.model.to_dict()
    md["roi_head"]["bbox_head"]["num_classes"] = 4
    md["backbone"]["depth"] = 18
    model, _ = build_detector(md)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images)
    tscfg = TwoStageConfig(image_shape=IMG, num_classes=4,
                           proposal_count=32, rcnn_num_samples=16)
    batch = _batch(B=1)
    batch["image"] = images
    total, losses = dynamic_rcnn_loss(model, variables, batch, tscfg,
                                      jnp.float32(0.4), jnp.float32(1.0),
                                      iou_topk=8, beta_topk=4)
    assert np.isfinite(float(total))
    assert 0.0 <= float(losses["stat_iou"]) <= 1.0
    assert float(losses["stat_beta"]) >= 0.0


def test_dynamic_schedule_updates():
    from lsnet_tpu.core.two_stage import DynamicRCNNSchedule
    s = DynamicRCNNSchedule(initial_iou=0.4, initial_beta=1.0,
                            update_iter_interval=4)
    for _ in range(3):
        iou, beta = s.update(0.6, 0.05)
        assert iou == 0.4 and beta == 1.0      # not yet at interval
    iou, beta = s.update(0.6, 0.05)
    assert iou == pytest.approx(0.6)           # mean(history) > initial
    assert beta == pytest.approx(0.05)         # median(history) < initial
    # histories reset; low IoU keeps the floor at initial
    for _ in range(4):
        iou, beta = s.update(0.1, np.inf)
    assert iou == 0.4
    assert beta == pytest.approx(0.05)         # no finite betas -> keep


def test_straggler_configs_build():
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.utils.config import Config
    for rel in ("pisa/pisa_ssd300_coco.py",
                "guided_anchoring/ga_rpn_r50_fpn_1x_coco.py",
                "double_heads/dh_faster_rcnn_r50_fpn_1x_coco.py",
                "dynamic_rcnn/dynamic_rcnn_r50_fpn_1x.py"):
        cfg = Config.fromfile(os.path.join(CFG_ROOT, rel))
        model, _ = build_detector(cfg.model.to_dict())
        assert model is not None, rel
