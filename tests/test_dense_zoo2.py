"""SSD / FoveaBox / FSAF tests — forward contracts, anchor math,
loss/grad finiteness and positivity, decode validity, config builds."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

IMG = (64, 64)


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


def test_ssd_anchor_counts():
    from lsnet_tpu.core.anchors import ssd_base_anchors
    b = ssd_base_anchors([8, 16, 32, 64, 100, 300],
                         [[2], [2, 3], [2, 3], [2, 3], [2], [2]],
                         (0.15, 0.9), 300)
    assert [x.shape[0] for x in b] == [4, 6, 6, 6, 4, 4]
    # first anchor: min_size 21 square centered at stride/2
    w0 = b[0][0, 2] - b[0][0, 0]
    np.testing.assert_allclose(w0, 21.0, atol=1e-4)
    # level-1 min_size = 300*15/100 = 45; its scale-2 anchor = sqrt(45*99)
    w1 = b[1][0, 2] - b[1][0, 0]
    np.testing.assert_allclose(w1, 45.0, atol=1e-4)
    w1b = b[1][1, 2] - b[1][1, 0]
    np.testing.assert_allclose(w1b, np.sqrt(45.0 * 99.0), rtol=1e-5)


def _ssd_cfg():
    from lsnet_tpu.core.dense_loss import DenseLossConfig
    return DenseLossConfig(
        image_shape=IMG, num_classes=4, head="ssd",
        strides=(8, 16, 32, 64, 100, 300))


def _ssd_feats(B=2):
    rng = np.random.RandomState(0)
    chans = (512, 1024, 512, 256, 256, 256)
    out = []
    for s, c in zip((8, 16, 32, 64, 100, 300), chans):
        h, w = -(-IMG[0] // s), -(-IMG[1] // s)
        out.append(jnp.asarray(rng.randn(B, h, w, c).astype(np.float32)))
    return out


@pytest.mark.parametrize("empty", [False, True])
def test_ssd_loss_and_grads(empty):
    from lsnet_tpu.core.dense_loss import ssd_loss
    from lsnet_tpu.models.heads.dense import SSDHead

    head = SSDHead(num_classes=4)
    feats = _ssd_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch(empty=empty)
    cfg = _ssd_cfg()

    def lf(p):
        outs = head.apply({"params": p}, feats)
        return ssd_loss(outs, batch, cfg)

    (total, losses), grads = jax.value_and_grad(
        lambda p: lf(p), has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm))
    if not empty:
        assert float(losses["loss_bbox"]) > 0


def test_ssd_decode():
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.dense_decode import dense_decode
    from lsnet_tpu.models.heads.dense import SSDHead

    head = SSDHead(num_classes=4)
    feats = _ssd_feats()
    variables = head.init(jax.random.PRNGKey(1), feats)
    outs = head.apply(variables, feats)
    tcfg = TestConfig(image_shape=IMG, num_classes=4, task="bbox",
                      num_vectors=4, nms_pre=100, score_thr=0.0,
                      nms_iou=0.45, max_per_img=10)
    det = dense_decode(outs, jnp.asarray([[64, 64]] * 2, jnp.int32),
                       jnp.ones((2, 4), jnp.float32), tcfg, _ssd_cfg())
    assert det.bboxes.shape == (2, 10, 4)


def _pt_head(kind):
    from lsnet_tpu.models.heads.dense import FoveaHead, FSAFHead
    cls = {"fovea": FoveaHead, "fsaf": FSAFHead}[kind]
    return cls(num_classes=4, in_channels=32, feat_channels=32,
               stacked_convs=1)


def _pt_feats(B=2, channels=32):
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.randn(B, -(-IMG[0] // s), -(-IMG[1] // s),
                                  channels).astype(np.float32))
            for s in (8, 16, 32, 64, 128)]


def _pt_cfg(kind):
    from lsnet_tpu.core.dense_loss import DenseLossConfig
    return DenseLossConfig(image_shape=IMG, num_classes=4, head=kind,
                           fovea_scale_ranges=((1, 64), (32, 128), (64, 256),
                                               (128, 512), (256, 2048)))


@pytest.mark.parametrize("kind", ["fovea", "fsaf"])
@pytest.mark.parametrize("empty", [False, True])
def test_point_heads_loss_and_grads(kind, empty):
    from lsnet_tpu.core.dense_loss import dense_loss

    head = _pt_head(kind)
    feats = _pt_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch(empty=empty)
    cfg = _pt_cfg(kind)

    def lf(p):
        outs = head.apply({"params": p}, feats)
        return dense_loss(outs, batch, cfg)

    (total, losses), grads = jax.value_and_grad(
        lambda p: lf(p), has_aux=True)(variables["params"])
    assert np.isfinite(float(total)), losses
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm))
    if not empty:
        assert float(losses["loss_bbox"]) > 0
        assert float(gnorm) > 0


@pytest.mark.parametrize("kind", ["fovea", "fsaf"])
def test_point_heads_decode(kind):
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.dense_decode import dense_decode

    head = _pt_head(kind)
    feats = _pt_feats()
    variables = head.init(jax.random.PRNGKey(1), feats)
    outs = head.apply(variables, feats)
    tcfg = TestConfig(image_shape=IMG, num_classes=4, task="bbox",
                      num_vectors=4, nms_pre=100, score_thr=0.0,
                      nms_iou=0.5, max_per_img=10)
    det = dense_decode(outs, jnp.asarray([[64, 64]] * 2, jnp.int32),
                       jnp.ones((2, 4), jnp.float32), tcfg, _pt_cfg(kind))
    b = np.asarray(det.bboxes)
    v = np.asarray(det.valid)
    assert (b[v][:, 2] >= b[v][:, 0] - 1e-4).all()


def test_fovea_target_semantics():
    """A gt centered in the image must produce positives only in its fovea
    (sigma-shrunk) region at the scale-matched level."""
    from lsnet_tpu.core.dense_loss import _fovea_targets

    cfg = _pt_cfg("fovea")
    gt = jnp.asarray([[16.0, 16.0, 48.0, 48.0]])     # sqrt(area)=32
    labels, tgts = _fovea_targets(cfg, gt, jnp.asarray([True]),
                                  jnp.asarray([2], jnp.int32))
    labels = np.asarray(labels)
    n_l0 = 8 * 8
    lvl0 = labels[:n_l0].reshape(8, 8)
    # level0 range (1, 64) includes 32 -> positives around center
    assert (lvl0 == 2).any()
    # positives confined to the central region
    assert (lvl0[0, :] == 4).all() and (lvl0[:, 0] == 4).all()


@pytest.mark.slow
def test_zoo2_configs_build():
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.train.loop import dense_cfg_from, make_loss_for
    from lsnet_tpu.utils.config import Config

    for path, head_t in [
            ("configs/ssd/ssd300_coco.py", "SSDHead"),
            ("configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py", "FoveaHead"),
            ("configs/fsaf/fsaf_r50_fpn_1x_coco.py", "FSAFHead")]:
        cfg = Config.fromfile(path)
        assert cfg.model.bbox_head.type == head_t
        model, _ = build_detector(cfg.model.to_dict())
        img = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img)
        outs = model.apply(variables, img)
        assert "cls" in outs and "reg" in outs
        dcfg = dense_cfg_from(cfg, IMG)
        assert dcfg.head in ("ssd", "fovea", "fsaf")
        assert make_loss_for(cfg, IMG) is not None


@pytest.mark.parametrize("empty", [False, True])
def test_free_anchor_loss(empty):
    from lsnet_tpu.core.dense_loss import DenseLossConfig, dense_loss
    from lsnet_tpu.models.heads.dense import RetinaHead

    head = RetinaHead(num_classes=4, in_channels=32, feat_channels=32,
                      stacked_convs=1, norm_groups=8)
    feats = _pt_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch(empty=empty)
    cfg = DenseLossConfig(image_shape=IMG, num_classes=4,
                          head="free_anchor")

    def lf(p):
        outs = head.apply({"params": p}, feats)
        return dense_loss(outs, batch, cfg)

    (total, losses), grads = jax.value_and_grad(
        lambda p: lf(p), has_aux=True)(variables["params"])
    assert np.isfinite(float(total)), losses
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm))
    if not empty:
        assert float(losses["positive_bag_loss"]) > 0
        assert float(gnorm) > 0


def test_free_anchor_config_builds():
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.train.loop import dense_cfg_from
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile(
        "configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py")
    assert cfg.model.bbox_head.type == "FreeAnchorRetinaHead"
    model, _ = build_detector(cfg.model.to_dict())
    assert dense_cfg_from(cfg, IMG).head == "free_anchor"


def test_retina_sepbn_head():
    """Shared tower convs, per-level BN (NAS-FPN recipe head)."""
    from lsnet_tpu.core.dense_loss import DenseLossConfig, dense_loss
    from lsnet_tpu.models.heads.dense import RetinaSepBNHead

    head = RetinaSepBNHead(num_classes=4, in_channels=32, feat_channels=32,
                           stacked_convs=1)
    feats = _pt_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    assert outs["cls"][0].shape[-1] == 9 * 4
    # conv weights shared across levels; one BN per (block, level)
    p = variables["params"]
    assert "cls_conv0" in p and "cls_bn0_l0" in p and "cls_bn0_l4" in p
    cfg = DenseLossConfig(image_shape=IMG, num_classes=4, head="retina")
    total, _ = dense_loss(outs, _batch(), cfg)
    assert np.isfinite(float(total))


def test_rank_in_groups():
    from lsnet_tpu.core.dense_loss import _rank_in_groups
    keys = jnp.asarray([0.9, 0.5, 0.7, 0.3, 0.8], jnp.float32)
    groups = jnp.asarray([0, 0, 1, 1, 0], jnp.int32)
    valid = jnp.ones((5,), bool)
    r = np.asarray(_rank_in_groups(keys, groups, valid))
    # group 0: keys .9 .5 .8 -> ranks 0 2 1; group 1: .7 .3 -> 0 1
    np.testing.assert_array_equal(r, [0, 2, 0, 1, 1])


@pytest.mark.parametrize("empty", [False, True])
def test_pisa_retina_loss(empty):
    from lsnet_tpu.core.dense_loss import DenseLossConfig, dense_loss
    from lsnet_tpu.models.heads.dense import RetinaHead

    head = RetinaHead(num_classes=4, in_channels=32, feat_channels=32,
                      stacked_convs=1)
    feats = _pt_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch(empty=empty)
    cfg = DenseLossConfig(image_shape=IMG, num_classes=4,
                          head="pisa_retina")

    def lf(p):
        outs = head.apply({"params": p}, feats)
        return dense_loss(outs, batch, cfg)

    (total, losses), grads = jax.value_and_grad(
        lambda p: lf(p), has_aux=True)(variables["params"])
    assert np.isfinite(float(total)), losses
    assert "loss_carl" in losses
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm))
    if not empty:
        assert float(gnorm) > 0


@pytest.mark.parametrize("empty", [False, True])
def test_ga_retina_loss_and_decode(empty):
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.dense_decode import dense_decode
    from lsnet_tpu.core.dense_loss import DenseLossConfig, dense_loss
    from lsnet_tpu.models.heads.dense import GARetinaHead

    head = GARetinaHead(num_classes=4, in_channels=32, feat_channels=32,
                        stacked_convs=1)
    feats = _pt_feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch(empty=empty)
    cfg = DenseLossConfig(image_shape=IMG, num_classes=4, head="ga_retina")

    def lf(p):
        outs = head.apply({"params": p}, feats)
        return dense_loss(outs, batch, cfg)

    (total, losses), grads = jax.value_and_grad(
        lambda p: lf(p), has_aux=True)(variables["params"])
    assert np.isfinite(float(total)), losses
    for k in ("loss_loc", "loss_shape", "loss_cls", "loss_bbox"):
        assert k in losses
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm))
    if not empty:
        assert float(gnorm) > 0

    outs = head.apply(variables, feats)
    tcfg = TestConfig(image_shape=IMG, num_classes=4, task="bbox",
                      num_vectors=4, nms_pre=100, score_thr=0.0,
                      nms_iou=0.5, max_per_img=10)
    det = dense_decode(outs, jnp.asarray([[64, 64]] * 2, jnp.int32),
                       jnp.ones((2, 4), jnp.float32), tcfg, cfg)
    assert det.bboxes.shape == (2, 10, 4)
