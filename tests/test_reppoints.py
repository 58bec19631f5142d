"""RepPoints v1 tests — forward contracts, transform math, loss/grad,
decode, config build (reference `reppoints_head.py` parity surface)."""

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


def _head(method="moment"):
    from lsnet_tpu.models.heads.reppoints import RepPointsHead
    return RepPointsHead(num_classes=4, in_channels=32, feat_channels=32,
                         point_feat_channels=32, stacked_convs=1,
                         transform_method=method)


def _cfg(method="moment"):
    from lsnet_tpu.core.reppoints import RepPointsConfig
    return RepPointsConfig(image_shape=IMG, num_classes=4,
                           point_strides=STRIDES, transform_method=method)


def test_forward_shapes():
    head = _head()
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    for lvl, s in enumerate(STRIDES):
        h, w = -(-IMG[0] // s), -(-IMG[1] // s)
        assert outs["cls"][lvl].shape == (2, h, w, 4)
        assert outs["pts_init"][lvl].shape == (2, h, w, 18)
        assert outs["pts_refine"][lvl].shape == (2, h, w, 18)
    assert outs["moment"].shape == (2,)


@pytest.mark.parametrize("method", ["minmax", "partial_minmax", "moment"])
def test_points2bbox(method):
    from lsnet_tpu.core.reppoints import points2bbox
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(7, 9, 2).astype(np.float32) * 10)
    box = np.asarray(points2bbox(pts, method, jnp.zeros(2)))
    assert box.shape == (7, 4)
    assert (box[:, 2] >= box[:, 0]).all() and (box[:, 3] >= box[:, 1]).all()
    if method == "minmax":
        xs = np.asarray(pts)[..., 0]
        np.testing.assert_allclose(box[:, 0], xs.min(1), rtol=1e-6)
        np.testing.assert_allclose(box[:, 2], xs.max(1), rtol=1e-6)


@pytest.mark.parametrize("empty", [False, True])
def test_loss_finite_and_grads(empty):
    from lsnet_tpu.core.reppoints import reppoints_loss

    head = _head()
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch(empty=empty)
    cfg = _cfg()

    def lf(params):
        outs = head.apply({"params": params}, feats)
        total, losses = reppoints_loss(outs, batch, cfg)
        return total, losses

    (total, losses), grads = jax.value_and_grad(lf, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                         for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm))
    if not empty:
        assert float(losses["loss_pts_init"]) > 0
        assert float(gnorm) > 0


def test_decode_shapes_and_validity():
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.reppoints import reppoints_decode

    head = _head()
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(1), feats)
    outs = head.apply(variables, feats)
    tcfg = TestConfig(image_shape=IMG, num_classes=4, task="bbox",
                      num_vectors=4, point_strides=STRIDES, nms_pre=100,
                      score_thr=0.0, nms_iou=0.5, max_per_img=10)
    det = reppoints_decode(outs, jnp.asarray([[64, 64]] * 2, jnp.int32),
                           jnp.ones((2, 4), jnp.float32), tcfg, _cfg())
    assert det.bboxes.shape == (2, 10, 4)
    b = np.asarray(det.bboxes)
    v = np.asarray(det.valid)
    assert (b[v][:, 2] >= b[v][:, 0]).all()


def test_config_builds_and_dispatch():
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile(
        "configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py")
    assert cfg.model.bbox_head.type == "RepPointsHead"
    model, _ = build_detector(cfg.model.to_dict())
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    outs = model.apply(variables, img)
    assert outs["cls"][0].shape[-1] == 80
    assert outs["pts_refine"][0].shape[-1] == 18

    from lsnet_tpu.train.loop import make_loss_for, reppoints_cfg_from
    rcfg = reppoints_cfg_from(cfg, IMG)
    assert rcfg.transform_method == "moment"
    assert rcfg.init_weight == 0.5
    loss_fn = make_loss_for(cfg, IMG)
    assert loss_fn is not None


@pytest.mark.slow
def test_overfit_smoke():
    """A few SGD steps on one batch must reduce the loss (the head learns)."""
    import optax
    from lsnet_tpu.core.reppoints import reppoints_loss

    head = _head("minmax")
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch()
    cfg = _cfg("minmax")
    tx = optax.sgd(1e-2, momentum=0.9)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, opt):
        def lf(p):
            outs = head.apply({"params": p}, feats)
            return reppoints_loss(outs, batch, cfg)[0]
        loss, g = jax.value_and_grad(lf)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    params = variables["params"]
    first = None
    for i in range(25):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def _v2_head():
    from lsnet_tpu.models.heads.reppoints import RepPointsV2Head
    return RepPointsV2Head(num_classes=4, in_channels=32, feat_channels=32,
                           point_feat_channels=32, stacked_convs=1,
                           corner_dim=8, norm_groups=8)


def test_v2_forward_shapes():
    head = _v2_head()
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    for lvl, s in enumerate(STRIDES):
        h, w = -(-IMG[0] // s), -(-IMG[1] // s)
        assert outs["cls"][lvl].shape == (2, h, w, 4)
        assert outs["pts_refine"][lvl].shape == (2, h, w, 18)
        assert outs["hem_score"][lvl].shape == (2, h, w, 2)
        assert outs["hem_offset"][lvl].shape == (2, h, w, 4)
        assert outs["sem_score"][lvl].shape == (2, h, w, 4)


@pytest.mark.parametrize("empty", [False, True])
def test_v2_loss_and_grads(empty):
    from lsnet_tpu.core.reppoints import reppoints_v2_loss

    head = _v2_head()
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch(empty=empty)
    cfg = _cfg()

    def lf(p):
        outs = head.apply({"params": p}, feats)
        return reppoints_v2_loss(outs, batch, cfg)

    (total, losses), grads = jax.value_and_grad(
        lambda p: lf(p), has_aux=True)(variables["params"])
    assert np.isfinite(float(total)), losses
    assert "loss_heatmap" in losses and "loss_sem" in losses
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm))
    if not empty:
        assert float(gnorm) > 0


def test_v2_decode_and_config():
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.reppoints import reppoints_v2_decode
    from lsnet_tpu.utils.config import Config
    from lsnet_tpu.models import build_detector

    head = _v2_head()
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(1), feats)
    outs = head.apply(variables, feats)
    tcfg = TestConfig(image_shape=IMG, num_classes=4, task="bbox",
                      num_vectors=4, point_strides=STRIDES, nms_pre=100,
                      score_thr=0.0, nms_iou=0.5, max_per_img=10)
    det = reppoints_v2_decode(outs, jnp.asarray([[64, 64]] * 2, jnp.int32),
                              jnp.ones((2, 4), jnp.float32), tcfg, _cfg())
    assert det.bboxes.shape == (2, 10, 4)
    cfg = Config.fromfile(
        "configs/reppoints/reppoints_v2_moment_r50_fpn_1x_coco.py")
    assert cfg.model.bbox_head.type == "RepPointsV2Head"
    model, _ = build_detector(cfg.model.to_dict())
    assert model is not None
