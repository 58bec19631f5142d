"""Inherited dense-head zoo tests (RetinaNet / FCOS / ATSS) — the reference
`tests/test_heads.py` analogue: forward shape contracts, with-gt / zero-gt
loss behavior, decode validity, and anchor/coder math checks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

IMG = (64, 64)
STRIDES = (8, 16, 32, 64, 128)


def _feats(channels=32, B=2):
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.randn(B, -(-IMG[0] // s), -(-IMG[1] // s),
                                  channels).astype(np.float32))
            for s in STRIDES]


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


def _loss_cfg(kind):
    from lsnet_tpu.core.dense_loss import DenseLossConfig
    return DenseLossConfig(image_shape=IMG, num_classes=4, head=kind,
                           strides=STRIDES)


def _make_head(kind):
    from lsnet_tpu.models.heads.dense import ATSSHead, FCOSHead, RetinaHead
    if kind == "retina":
        return RetinaHead(num_classes=4, in_channels=32, feat_channels=32,
                          stacked_convs=1)
    if kind == "fcos":
        return FCOSHead(num_classes=4, in_channels=32, feat_channels=32,
                        stacked_convs=1, strides=STRIDES)
    return ATSSHead(num_classes=4, in_channels=32, feat_channels=32,
                    stacked_convs=1)


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["retina", "fcos", "atss"])
def test_forward_shapes(kind):
    head = _make_head(kind)
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    A = 9 if kind == "retina" else 1
    for lvl, s in enumerate(STRIDES):
        h, w = -(-IMG[0] // s), -(-IMG[1] // s)
        assert outs["cls"][lvl].shape == (2, h, w, A * 4)
        assert outs["reg"][lvl].shape == (2, h, w, A * 4)
        if kind != "retina":
            assert outs["centerness"][lvl].shape == (2, h, w, 1)
    if kind == "fcos":   # exp-scaled distances must be positive
        assert float(np.asarray(outs["reg"][0]).min()) > 0


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["retina", "fcos", "atss"])
def test_loss_with_and_without_gt(kind):
    from lsnet_tpu.core.dense_loss import dense_loss

    head = _make_head(kind)
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    cfg = _loss_cfg(kind)

    total, losses = dense_loss(outs, _batch(), cfg)
    assert np.isfinite(float(total))
    assert float(losses["loss_cls"]) > 0
    assert float(losses["loss_bbox"]) > 0

    # zero-gt: cls loss stays finite, bbox loss is zero
    total0, losses0 = dense_loss(outs, _batch(empty=True), cfg)
    assert np.isfinite(float(total0))
    assert float(losses0["loss_bbox"]) == 0.0


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["retina", "fcos", "atss"])
def test_loss_is_jittable_and_differentiable(kind):
    from lsnet_tpu.core.dense_loss import dense_loss

    head = _make_head(kind)
    feats = _feats(B=1)
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch(B=1)
    cfg = _loss_cfg(kind)

    @jax.jit
    def loss_fn(params):
        outs = head.apply({"params": params}, feats)
        total, _ = dense_loss(outs, batch, cfg)
        return total

    g = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["retina", "fcos", "atss"])
def test_decode_produces_valid_detections(kind):
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.dense_decode import dense_decode

    head = _make_head(kind)
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(1), feats)
    outs = head.apply(variables, feats)
    tcfg = TestConfig(image_shape=IMG, num_classes=4, nms_pre=200,
                      score_thr=0.0, max_per_img=10)
    det = dense_decode(outs, jnp.asarray([[64, 64]] * 2, jnp.int32),
                       jnp.ones((2, 4), jnp.float32), tcfg, _loss_cfg(kind))
    assert det.bboxes.shape == (2, 10, 4)
    b = np.asarray(det.bboxes)
    assert np.isfinite(b).all()
    v = np.asarray(det.valid)
    assert v.any()
    assert (b[..., 2] >= b[..., 0])[v].all()


def test_anchor_generator_matches_reference_semantics():
    """mmdet AnchorGenerator invariants: A = ratios x octave scales, base
    box areas = (stride * scale)^2, grid shift by stride."""
    from lsnet_tpu.core.anchors import AnchorConfig, base_anchors, grid_anchors

    cfg = AnchorConfig()
    base = base_anchors(cfg, 8)
    assert base.shape == (9, 4)
    ws = base[:, 2] - base[:, 0]
    hs = base[:, 3] - base[:, 1]
    # ratio = h/w; areas invariant across ratios for the same scale
    np.testing.assert_allclose(ws * hs, (8 * np.array(
        [4 * 2 ** (i / 3) for i in range(3)] * 3)) ** 2, rtol=1e-5)
    ratios = np.repeat([0.5, 1.0, 2.0], 3)
    np.testing.assert_allclose(hs / ws, ratios, rtol=1e-5)

    anchors, counts = grid_anchors(cfg, (32, 32))
    assert counts[0] == 4 * 4 * 9
    # second cell of level0 shifted by stride 8 in x
    np.testing.assert_allclose(anchors[9] - anchors[0], [8, 0, 8, 0])


def test_delta_coder_roundtrip():
    from lsnet_tpu.core.anchors import bbox2delta, delta2bbox

    rng = np.random.RandomState(0)
    anchors = np.concatenate([rng.rand(20, 2) * 50,
                              50 + rng.rand(20, 2) * 50], 1).astype(np.float32)
    gt = np.concatenate([rng.rand(20, 2) * 40,
                         60 + rng.rand(20, 2) * 40], 1).astype(np.float32)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = bbox2delta(jnp.asarray(anchors), jnp.asarray(gt), stds=stds)
    back = delta2bbox(jnp.asarray(anchors), deltas, stds=stds)
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-3)


def test_distance_coder_roundtrip():
    from lsnet_tpu.core.anchors import bbox2distance, distance2bbox

    rng = np.random.RandomState(1)
    pts = jnp.asarray((rng.rand(10, 2) * 20 + 40).astype(np.float32))
    boxes = jnp.asarray(np.concatenate(
        [rng.rand(10, 2) * 30, 70 + rng.rand(10, 2) * 30], 1
    ).astype(np.float32))
    d = bbox2distance(pts, boxes)
    back = distance2bbox(pts, d)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                               rtol=1e-5, atol=1e-4)


def test_max_iou_assigner_semantics():
    from lsnet_tpu.core.assign import max_iou_assign

    anchors = jnp.asarray(np.array(
        [[0, 0, 10, 10],      # IoU 1.0 with gt0 -> pos
         [0, 0, 12, 12],      # IoU ~0.69 -> pos
         [4, 4, 14, 14],      # IoU ~0.2 -> neg
         [2, 2, 12, 12],      # IoU ~0.47 -> ignore band [0.4, 0.5)
         [50, 50, 60, 60]], np.float32))   # IoU 0 -> neg
    gts = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    r = max_iou_assign(anchors, jnp.ones(5, bool), gts, jnp.ones(1, bool))
    got = np.asarray(r.gt_idx)
    assert got[0] == 0 and got[1] == 0
    assert got[2] == -1 and got[4] == -1
    assert got[3] == -1 and bool(np.asarray(r.ignore)[3])

    # low-IoU best anchor still claimed by the GT (step 3)
    far_anchors = jnp.asarray(np.array(
        [[0, 0, 4, 4], [30, 30, 40, 40]], np.float32))
    r2 = max_iou_assign(far_anchors, jnp.ones(2, bool), gts,
                        jnp.ones(1, bool), min_pos_iou=0.0)
    assert int(np.asarray(r2.gt_idx)[0]) == 0


def test_dense_configs_build():
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.utils.config import Config

    for path in ("configs/retinanet/retinanet_r50_fpn_1x_coco.py",
                 "configs/fcos/fcos_r50_fpn_1x_coco.py",
                 "configs/atss/atss_r50_fpn_1x_coco.py"):
        cfg = Config.fromfile(path)
        model, _ = build_detector(cfg.model.to_dict())
        assert model is not None


@pytest.mark.slow
def test_gfl_head_loss_decode():
    """GFL: forward shapes, finite loss with/without GT, integral decode."""
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.dense_decode import dense_decode
    from lsnet_tpu.core.dense_loss import dense_loss, _integral
    from lsnet_tpu.models.heads.dense import GFLHead

    head = GFLHead(num_classes=4, in_channels=32, feat_channels=32,
                   stacked_convs=1, reg_max=8)
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    assert outs["reg"][0].shape[-1] == 4 * 9
    # integral of a softmax distribution lies within [0, reg_max]
    d = np.asarray(_integral(jnp.asarray(outs["reg"][0]), 8))
    assert (d >= 0).all() and (d <= 8).all()

    from lsnet_tpu.core.dense_loss import gfl_loss
    cfg = _loss_cfg("gfl")
    total, losses = gfl_loss(outs, _batch(), cfg, reg_max=8)
    assert np.isfinite(float(total))
    assert {"loss_cls", "loss_bbox", "loss_dfl"} == set(losses)
    total0, _ = gfl_loss(outs, _batch(empty=True), cfg, reg_max=8)
    assert np.isfinite(float(total0))

    tcfg = TestConfig(image_shape=IMG, num_classes=4, nms_pre=200,
                      score_thr=0.0, max_per_img=10)
    det = dense_decode(outs, jnp.asarray([[64, 64]] * 2, jnp.int32),
                       jnp.ones((2, 4), jnp.float32), tcfg, cfg, reg_max=8)
    b = np.asarray(det.bboxes)
    assert np.isfinite(b).all()
    assert np.asarray(det.valid).any()


def test_dfl_golden_math():
    """DFL on a hand-computed case: target 2.3 between bins 2 and 3."""
    from lsnet_tpu.core.dense_loss import _dfl

    logits = jnp.asarray(np.log(np.array(
        [[0.1, 0.1, 0.5, 0.2, 0.1]], np.float32)))
    t = jnp.asarray(np.array([2.3], np.float32))
    got = float(_dfl(logits, t)[0])
    want = -(0.7 * np.log(0.5) + 0.3 * np.log(0.2))
    np.testing.assert_allclose(got, want, rtol=1e-5)
