"""Two-stage (Faster R-CNN) family tests: RPN proposals, RoI sampling,
losses, decode, end-to-end gradient (reference two_stage.py +
standard_roi_head.py flow)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

IMG = (64, 64)
STRIDES = (4, 8, 16, 32, 64)


def _model():
    from lsnet_tpu.models import build_detector
    cfg = dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), base_channels=16),
        neck=dict(type="FPN", out_channels=32, start_level=0, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      anchor_generator=dict(scales=[8],
                                            ratios=[0.5, 1.0, 2.0])),
        roi_head=dict(bbox_head=dict(num_classes=4, fc_out_channels=64)))
    return build_detector(cfg)


def _cfg():
    from lsnet_tpu.core.two_stage import TwoStageConfig
    return TwoStageConfig(image_shape=IMG, num_classes=4,
                          nms_pre=200, proposal_count=32,
                          rcnn_num_samples=16, rpn_num_samples=32)


def _batch(B=2):
    rng = np.random.RandomState(0)
    gt = np.zeros((B, 4, 4), np.float32)
    valid = np.zeros((B, 4), bool)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [20, 10, 60, 50]
    valid[:, :2] = True
    labels = np.zeros((B, 4), np.int32)
    labels[:, 0] = 1
    labels[:, 1] = 2
    return {"image": jnp.asarray(rng.rand(B, *IMG, 3).astype(np.float32)),
            "gt_bboxes": jnp.asarray(gt), "gt_valid": jnp.asarray(valid),
            "gt_labels": jnp.asarray(labels),
            "img_shape": jnp.asarray([[64, 64]] * B, jnp.int32)}


@pytest.fixture(scope="module")
def built():
    model, _ = _model()
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    return model, variables, batch


def test_rpn_proposals_and_sampling(built):
    from lsnet_tpu.core.two_stage import rpn_proposals, sample_rois

    model, variables, batch = built
    feats = model.apply(variables, batch["image"], method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    assert rpn_outs["rpn_cls"][0].shape == (2, 16, 16, 3)
    props, pvalid = rpn_proposals(rpn_outs, batch["img_shape"], _cfg())
    assert props.shape == (2, 32, 4)
    p = np.asarray(props)[np.asarray(pvalid)]
    assert (p[:, 2] >= p[:, 0]).all() and (p[:, 3] >= p[:, 1]).all()
    assert (p >= 0).all() and (p <= 64).all()

    rois, labels, deltas, pos, valid = sample_rois(
        props, pvalid, batch["gt_bboxes"], batch["gt_valid"],
        batch["gt_labels"], _cfg())
    assert rois.shape == (2, 16, 4)
    # GT boxes injected as proposals guarantee positives with correct labels
    pos_np = np.asarray(pos)
    assert pos_np.any()
    lab = np.asarray(labels)
    assert set(lab[pos_np]) <= {1, 2}
    assert (lab[~pos_np] == 4).all()          # background = num_classes
    assert np.isfinite(np.asarray(deltas)).all()


@pytest.mark.slow
def test_two_stage_loss_and_grad(built):
    from lsnet_tpu.core.two_stage import two_stage_loss

    model, variables, batch = built
    total, losses = two_stage_loss(model, variables, batch, _cfg())
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls",
                           "loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_cls"]) > 0

    @jax.jit
    def loss_fn(params):
        t, _ = two_stage_loss(model, {"params": params,
                                      "batch_stats": variables.get(
                                          "batch_stats", {})}, batch, _cfg())
        return t

    g = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    # both stages receive gradient
    assert float(jnp.linalg.norm(
        g["rpn_head"]["rpn_conv"]["kernel"])) > 0
    assert float(jnp.linalg.norm(
        g["bbox_head"]["shared_fc0"]["kernel"])) > 0


@pytest.mark.slow
def test_two_stage_decode(built):
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.two_stage import two_stage_decode

    model, variables, batch = built
    tcfg = TestConfig(image_shape=IMG, num_classes=4, nms_pre=100,
                      score_thr=0.0, nms_iou=0.5, max_per_img=10)
    det = two_stage_decode(model, variables, batch["image"],
                           batch["img_shape"],
                           jnp.ones((2, 4), jnp.float32), _cfg(), tcfg)
    assert det.bboxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(det.bboxes)).all()
    assert np.asarray(det.valid).any()


def test_multilevel_roi_align_level_routing():
    from lsnet_tpu.models.heads.two_stage import multilevel_roi_align

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, 64 // s, 64 // s, 8).astype(np.float32))
             for s in (4, 8, 16, 32)]
    # small roi -> level 0; huge roi -> clamped to last level
    rois = jnp.asarray(np.array([[0, 4, 4, 20, 20],
                                 [0, 0, 0, 3000, 3000]], np.float32))
    out = multilevel_roi_align(feats, rois, (4, 8, 16, 32), out_size=(7, 7))
    assert out.shape == (2, 7, 7, 8)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).sum() > 0


@pytest.mark.slow
def test_faster_rcnn_config_train_and_infer(tmp_path):
    """Faster R-CNN through the real surfaces: config build, train_detector
    (2 iters), inference_detector."""
    import json
    import os

    from test_e2e_train import make_synthetic_coco

    from lsnet_tpu.apis import inference_detector, init_detector
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.train.loop import train_detector
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile("configs/faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py")
    model, _ = build_detector(cfg.model.to_dict())
    assert model is not None

    ann_file, img_dir = make_synthetic_coco(str(tmp_path), n_images=8)
    tiny = Config(dict(
        model=dict(
            type="FasterRCNN",
            backbone=dict(type="ResNet", depth=18, num_stages=4,
                          out_indices=(0, 1, 2, 3), base_channels=16),
            neck=dict(type="FPN", out_channels=32, start_level=0,
                      num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                          anchor_generator=dict(scales=[8],
                                                ratios=[0.5, 1.0, 2.0])),
            roi_head=dict(bbox_head=dict(num_classes=1,
                                         fc_out_channels=64))),
        train_cfg=dict(
            rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3),
                     sampler=dict(num=64)),
            rpn_proposal=dict(nms_pre=200, max_per_img=32),
            rcnn=dict(assigner=dict(pos_iou_thr=0.5),
                      sampler=dict(num=16, pos_fraction=0.25))),
        test_cfg=dict(rcnn=dict(score_thr=0.0,
                                nms=dict(type="nms", iou_thr=0.5),
                                max_per_img=10)),
        data=dict(samples_per_gpu=1,
                  train=dict(ann_file=ann_file, img_prefix=img_dir,
                             img_scale=(64, 64)),
                  val=dict(ann_file=ann_file, img_prefix=img_dir,
                           img_scale=(64, 64)),
                  test=dict(img_scale=(64, 64))),
        optimizer=dict(lr=0.01),
        lr_config=dict(step=[100]),
        canvas_shape=(64, 64),
        max_instances=8,
        log_interval=1,
        total_epochs=1,
        evaluation=dict(interval=100),
    ))
    out = train_detector(tiny, str(tmp_path / "work"), total_epochs=1,
                         max_iters_per_epoch=2, eval_interval=10 ** 9)
    assert int(out["state"].step) >= 1
    log = [json.loads(l) for f in os.listdir(tmp_path / "work")
           if f.endswith(".log.json")
           for l in open(tmp_path / "work" / f)]
    train_recs = [r for r in log if r.get("mode") == "train"]
    assert train_recs and all(
        np.isfinite(r["loss"]) for r in train_recs)
    assert "loss_rpn_cls" in train_recs[0]

    bundle = init_detector(tiny, canvas=(64, 64))
    img = (np.random.RandomState(0).rand(48, 56, 3) * 255).astype(np.uint8)
    res = inference_detector(bundle, img)
    assert res["bboxes"].shape[1] == 4


def test_polygon_rasterizer_matches_numpy_oracle():
    """On-device even-odd rasterizer vs a numpy point-in-polygon oracle."""
    from matplotlib.path import Path as MplPath  # type: ignore
    pytest.importorskip("matplotlib")
    from lsnet_tpu.core.two_stage import rasterize_polygon_in_roi

    rng = np.random.RandomState(0)
    ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    rad = rng.rand(12) * 10 + 6
    poly = np.stack([20 + rad * np.cos(ang), 24 + rad * np.sin(ang)],
                    1).astype(np.float32)
    roi = np.array([4, 6, 38, 42], np.float32)
    out = 28
    got = np.asarray(rasterize_polygon_in_roi(
        jnp.asarray(poly.reshape(1, -1)), jnp.asarray(roi[None]), out))[0]
    fr = (np.arange(out) + 0.5) / out
    gx = roi[0] + fr * (roi[2] - roi[0])
    gy = roi[1] + fr * (roi[3] - roi[1])
    gxx, gyy = np.meshgrid(gx, gy)
    want = MplPath(poly).contains_points(
        np.stack([gxx.ravel(), gyy.ravel()], 1)).reshape(out, out)
    agree = (got.astype(bool) == want).mean()
    assert agree > 0.98, agree      # boundary pixels may differ


@pytest.mark.slow
def test_mask_rcnn_loss_and_forward():
    from lsnet_tpu.core.two_stage import mask_rcnn_loss
    from lsnet_tpu.models import build_detector

    cfg_d = dict(
        type="MaskRCNN",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), base_channels=16),
        neck=dict(type="FPN", out_channels=32, start_level=0, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      anchor_generator=dict(scales=[8],
                                            ratios=[0.5, 1.0, 2.0])),
        roi_head=dict(bbox_head=dict(num_classes=4, fc_out_channels=64),
                      mask_head=dict(conv_out_channels=32, num_convs=2)))
    model, _ = build_detector(cfg_d)
    batch = _batch()
    # square polygons matching the gt boxes
    polys = np.zeros((2, 4, 8), np.float32)
    for b in range(2):
        for m, bb in enumerate(np.asarray(batch["gt_bboxes"][b])):
            x1, y1, x2, y2 = bb
            polys[b, m] = [x1, y1, x2, y1, x2, y2, x1, y2]
    batch = dict(batch, gt_polygons=jnp.asarray(polys))
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    assert "mask_head" in variables["params"]
    total, losses = mask_rcnn_loss(model, variables, batch, _cfg())
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_mask"]) > 0


def test_mask_rcnn_config_builds():
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile("configs/mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py")
    model, _ = build_detector(cfg.model.to_dict())
    assert model.mask_head is not None


@pytest.mark.slow
def test_mask_rcnn_decode_and_paste():
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.two_stage import mask_rcnn_decode
    from lsnet_tpu.evalkit.evaluator import paste_mask
    from lsnet_tpu.models import build_detector

    cfg_d = dict(
        type="MaskRCNN",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), base_channels=16),
        neck=dict(type="FPN", out_channels=32, start_level=0, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      anchor_generator=dict(scales=[8],
                                            ratios=[0.5, 1.0, 2.0])),
        roi_head=dict(bbox_head=dict(num_classes=4, fc_out_channels=64),
                      mask_head=dict(conv_out_channels=32, num_convs=2)))
    model, _ = build_detector(cfg_d)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    tcfg = TestConfig(image_shape=IMG, num_classes=4, nms_pre=100,
                      score_thr=0.0, nms_iou=0.5, max_per_img=5)
    det, masks = mask_rcnn_decode(model, variables, batch["image"],
                                  batch["img_shape"],
                                  jnp.ones((2, 4), jnp.float32), _cfg(),
                                  tcfg)
    assert masks.shape == (2, 5, 28, 28)
    m = np.asarray(masks)
    assert ((m >= 0) & (m <= 1)).all()

    # paste: an all-ones crop fills exactly the (rounded) box
    full = paste_mask(np.ones((28, 28), np.float32),
                      np.array([10.0, 12.0, 30.0, 40.0]), (64, 64))
    assert full.dtype == np.uint8
    assert full[13:39, 11:29].all()
    assert full[:12].sum() == 0


@pytest.mark.slow
def test_cascade_rcnn_loss_and_decode():
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.two_stage import (cascade_rcnn_decode,
                                          cascade_rcnn_loss)
    from lsnet_tpu.models import build_detector

    cfg_d = dict(
        type="CascadeRCNN",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), base_channels=16),
        neck=dict(type="FPN", out_channels=32, start_level=0, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      anchor_generator=dict(scales=[8],
                                            ratios=[0.5, 1.0, 2.0])),
        roi_head=dict(bbox_head=dict(num_classes=4, fc_out_channels=64)))
    model, _ = build_detector(cfg_d)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    # three separate stage heads exist
    assert {"bbox_head", "bbox_head2", "bbox_head3"} <= \
        set(variables["params"].keys())
    total, losses = cascade_rcnn_loss(model, variables, batch, _cfg())
    assert {"s0.loss_cls", "s1.loss_cls", "s2.loss_cls"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    g = jax.grad(lambda p: cascade_rcnn_loss(
        model, {"params": p,
                "batch_stats": variables.get("batch_stats", {})},
        batch, _cfg())[0])(variables["params"])
    for h in ("bbox_head", "bbox_head2", "bbox_head3"):
        assert float(jnp.linalg.norm(
            g[h]["shared_fc0"]["kernel"])) > 0, h

    tcfg = TestConfig(image_shape=IMG, num_classes=4, nms_pre=100,
                      score_thr=0.0, nms_iou=0.5, max_per_img=10)
    det = cascade_rcnn_decode(model, variables, batch["image"],
                              batch["img_shape"],
                              jnp.ones((2, 4), jnp.float32), _cfg(), tcfg)
    assert det.bboxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(det.bboxes)).all()
    assert np.asarray(det.valid).any()


def test_fast_rcnn_decode():
    """Fast R-CNN: external proposals -> RoI head -> detections."""
    import jax
    import jax.numpy as jnp

    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.two_stage import TwoStageConfig, fast_rcnn_decode
    from lsnet_tpu.models import build_detector

    model, _ = build_detector(dict(
        type="FastRCNN",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=-1),
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        roi_head=dict(bbox_head=dict(num_classes=4,
                                     fc_out_channels=64))))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    props = jnp.asarray([[[4, 4, 30, 30], [10, 10, 50, 50],
                          [0, 0, 20, 60], [5, 20, 60, 40]]], jnp.float32)
    pvalid = jnp.ones((1, 4), bool)
    cfg = TwoStageConfig(image_shape=(64, 64), num_classes=4)
    tcfg = TestConfig(image_shape=(64, 64), num_classes=4, task="bbox",
                      num_vectors=4, nms_pre=16, score_thr=0.0,
                      nms_iou=0.5, max_per_img=8)
    det = fast_rcnn_decode(model, variables, img, props, pvalid,
                           jnp.asarray([[64, 64]], jnp.int32),
                           jnp.ones((1, 4), jnp.float32), cfg, tcfg)
    assert det.bboxes.shape == (1, 8, 4)
    assert np.isfinite(np.asarray(det.scores)).all()


def test_mask_scoring_rcnn():
    """MS R-CNN: maskiou branch trains and rescoring decode runs."""
    import jax
    import jax.numpy as jnp

    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.two_stage import (TwoStageConfig,
                                          mask_scoring_rcnn_decode,
                                          mask_scoring_rcnn_loss)
    from lsnet_tpu.models import build_detector

    model, _ = build_detector(dict(
        type="MaskScoringRCNN",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=-1),
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        roi_head=dict(bbox_head=dict(num_classes=4, fc_out_channels=64),
                      mask_head=dict(conv_out_channels=32, num_convs=1))))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    cfg = TwoStageConfig(image_shape=(64, 64), num_classes=4,
                         nms_pre=64, proposal_count=32, rcnn_num_samples=16)
    poly = np.array([8, 8, 40, 8, 40, 40, 8, 40] * 9, np.float32)[:72]
    batch = {
        "image": img,
        "img_shape": jnp.asarray([[64, 64]], jnp.int32),
        "gt_bboxes": jnp.asarray([[[8, 8, 40, 40], [0, 0, 0, 0]]],
                                 jnp.float32),
        "gt_labels": jnp.asarray([[1, 0]], jnp.int32),
        "gt_valid": jnp.asarray([[True, False]]),
        "gt_polygons": jnp.asarray(np.stack([poly, poly])[None]),
    }
    total, losses = mask_scoring_rcnn_loss(model, variables, batch, cfg)
    assert np.isfinite(float(total))
    assert "loss_mask_iou" in losses
    tcfg = TestConfig(image_shape=(64, 64), num_classes=4, task="bbox",
                      num_vectors=4, nms_pre=64, score_thr=0.0,
                      nms_iou=0.5, max_per_img=8)
    det, masks = mask_scoring_rcnn_decode(
        model, variables, img, jnp.asarray([[64, 64]], jnp.int32),
        jnp.ones((1, 4), jnp.float32), cfg, tcfg)
    assert masks.shape[:2] == (1, 8)
    assert np.isfinite(np.asarray(det.scores)).all()


def test_grid_rcnn():
    """Grid R-CNN: grid heatmap loss trains and grid decode runs."""
    import jax
    import jax.numpy as jnp

    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.two_stage import (TwoStageConfig, grid_rcnn_decode,
                                          grid_rcnn_loss, grid_targets)
    from lsnet_tpu.models import build_detector

    # target semantics: the center grid point of an aligned roi lands in
    # the middle of its sub-region map
    t = grid_targets(jnp.asarray([[10.0, 10, 42, 42]]),
                     jnp.asarray([[10.0, 10, 42, 42]]))
    assert t.shape == (1, 28, 28, 9)
    assert float(t.sum()) > 0

    model, _ = build_detector(dict(
        type="GridRCNN",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=-1),
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        roi_head=dict(bbox_head=dict(num_classes=4, fc_out_channels=64),
                      grid_head=dict(grid_points=9, num_convs=2,
                                     point_feat_channels=8))))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    cfg = TwoStageConfig(image_shape=(64, 64), num_classes=4,
                         nms_pre=64, proposal_count=16, rcnn_num_samples=8)
    batch = {
        "image": img,
        "img_shape": jnp.asarray([[64, 64]], jnp.int32),
        "gt_bboxes": jnp.asarray([[[8, 8, 40, 40], [0, 0, 0, 0]]],
                                 jnp.float32),
        "gt_labels": jnp.asarray([[1, 0]], jnp.int32),
        "gt_valid": jnp.asarray([[True, False]]),
    }
    total, losses = grid_rcnn_loss(model, variables, batch, cfg)
    assert np.isfinite(float(total))
    assert "loss_grid" in losses
    tcfg = TestConfig(image_shape=(64, 64), num_classes=4, task="bbox",
                      num_vectors=4, nms_pre=64, score_thr=0.0,
                      nms_iou=0.5, max_per_img=8)
    det = grid_rcnn_decode(model, variables, img,
                           jnp.asarray([[64, 64]], jnp.int32),
                           jnp.ones((1, 4), jnp.float32), cfg, tcfg)
    b = np.asarray(det.bboxes)
    assert np.isfinite(b).all()
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()


@pytest.mark.slow
def test_htc():
    """HTC: cascade + per-stage mask + semantic losses train; decode runs."""
    import jax
    import jax.numpy as jnp

    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.two_stage import (TwoStageConfig, htc_decode,
                                          htc_loss)
    from lsnet_tpu.models import build_detector

    model, _ = build_detector(dict(
        type="HybridTaskCascade",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=-1),
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        roi_head=dict(bbox_head=dict(num_classes=4, fc_out_channels=64),
                      mask_head=dict(conv_out_channels=32, num_convs=1))))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    cfg = TwoStageConfig(image_shape=(64, 64), num_classes=4,
                         nms_pre=64, proposal_count=16, rcnn_num_samples=8)
    poly = np.array([8, 8, 40, 8, 40, 40, 8, 40] * 9, np.float32)[:72]
    batch = {
        "image": img,
        "img_shape": jnp.asarray([[64, 64]], jnp.int32),
        "gt_bboxes": jnp.asarray([[[8, 8, 40, 40], [0, 0, 0, 0]]],
                                 jnp.float32),
        "gt_labels": jnp.asarray([[1, 0]], jnp.int32),
        "gt_valid": jnp.asarray([[True, False]]),
        "gt_polygons": jnp.asarray(np.stack([poly, poly])[None]),
    }
    total, losses = htc_loss(model, variables, batch, cfg)
    assert np.isfinite(float(total))
    for key in ("s0.loss_mask", "s2.loss_mask", "loss_semantic_seg"):
        assert key in losses and np.isfinite(float(losses[key]))
    tcfg = TestConfig(image_shape=(64, 64), num_classes=4, task="bbox",
                      num_vectors=4, nms_pre=64, score_thr=0.0,
                      nms_iou=0.5, max_per_img=8)
    det, masks = htc_decode(model, variables, img,
                            jnp.asarray([[64, 64]], jnp.int32),
                            jnp.ones((1, 4), jnp.float32), cfg, tcfg)
    assert masks.shape[:2] == (1, 8)
    assert np.isfinite(np.asarray(det.bboxes)).all()


@pytest.mark.slow
def test_point_rend():
    """PointRend: point loss trains, subdivision decode refines masks."""
    import jax
    import jax.numpy as jnp

    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.two_stage import (TwoStageConfig, point_rend_decode,
                                          point_rend_loss)
    from lsnet_tpu.models import build_detector

    model, _ = build_detector(dict(
        type="PointRend",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=-1),
        neck=dict(type="FPN", out_channels=32, num_outs=5),
        roi_head=dict(bbox_head=dict(num_classes=4, fc_out_channels=64),
                      mask_head=dict(conv_out_channels=32, num_convs=1))))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    cfg = TwoStageConfig(image_shape=(64, 64), num_classes=4,
                         nms_pre=64, proposal_count=16, rcnn_num_samples=8)
    poly = np.array([8, 8, 40, 8, 40, 40, 8, 40] * 9, np.float32)[:72]
    batch = {
        "image": img,
        "img_shape": jnp.asarray([[64, 64]], jnp.int32),
        "gt_bboxes": jnp.asarray([[[8, 8, 40, 40], [0, 0, 0, 0]]],
                                 jnp.float32),
        "gt_labels": jnp.asarray([[1, 0]], jnp.int32),
        "gt_valid": jnp.asarray([[True, False]]),
        "gt_polygons": jnp.asarray(np.stack([poly, poly])[None]),
    }
    total, losses = point_rend_loss(model, variables, batch, cfg,
                                    num_points=32)
    assert np.isfinite(float(total))
    assert "loss_point" in losses
    tcfg = TestConfig(image_shape=(64, 64), num_classes=4, task="bbox",
                      num_vectors=4, nms_pre=64, score_thr=0.0,
                      nms_iou=0.5, max_per_img=8)
    det, masks = point_rend_decode(
        model, variables, img, jnp.asarray([[64, 64]], jnp.int32),
        jnp.ones((1, 4), jnp.float32), cfg, tcfg,
        subdivision_steps=1, num_points=64)
    assert masks.shape == (1, 8, 56, 56)
