"""DenseRepPoints v1/v2 (VERDICT r3 missing #1 — the last reference head
family): sampling-helper units, forward contracts, loss/grad finiteness,
decode validity, point->mask conversion, config builds."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

IMG = (64, 96)
CFG_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

# small geometry for CPU tests
HEAD_KW = dict(num_classes=4, in_channels=32, feat_channels=32,
               point_feat_channels=32, stacked_convs=1,
               stacked_mask_convs=1, num_points=49, num_group=7,
               num_score_group=25)


def _feats(B=2, C=32):
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.randn(B, -(-IMG[0] // s), -(-IMG[1] // s), C)
                        .astype(np.float32)) for s in (8, 16, 32, 64, 128)]


def _cfg():
    from lsnet_tpu.core.dense_reppoints import DenseRepPointsConfig
    return DenseRepPointsConfig(
        image_shape=IMG, num_classes=4, num_points=49, num_group=7,
        num_score_group=25, max_pos_chamfer=8, gt_contour_points=24)


def _batch(B=2, M=4, V=8, empty=False):
    gt = np.zeros((B, M, 4), np.float32)
    valid = np.zeros((B, M), bool)
    labels = np.zeros((B, M), np.int32)
    polys = np.zeros((B, M, V * 2), np.float32)

    def rect_poly(x1, y1, x2, y2):
        xs = [x1, (x1 + x2) / 2, x2, x2, x2, (x1 + x2) / 2, x1, x1]
        ys = [y1, y1, y1, (y1 + y2) / 2, y2, y2, y2, (y1 + y2) / 2]
        return np.stack([xs, ys], -1).reshape(-1)

    if not empty:
        gt[:, 0] = [8, 8, 40, 40]
        gt[:, 1] = [30, 16, 80, 56]
        valid[:, :2] = True
        labels[:, 0] = 1
        labels[:, 1] = 2
        polys[:, 0] = rect_poly(8, 8, 40, 40)
        polys[:, 1] = rect_poly(30, 16, 80, 56)
    return {"gt_bboxes": jnp.asarray(gt), "gt_valid": jnp.asarray(valid),
            "gt_labels": jnp.asarray(labels),
            "gt_polygons": jnp.asarray(polys),
            "img_shape": jnp.asarray([list(IMG)] * B, jnp.int32),
            "pad_shape": jnp.asarray([list(IMG)] * B, jnp.int32)}


# -------------------------------------------------------------- helpers --

def test_border_sample_matches_manual():
    from lsnet_tpu.models.heads.dense_reppoints import border_sample
    feat = jnp.arange(12, dtype=jnp.float32).reshape(3, 4, 1)
    # exact grid points
    v = border_sample(feat, jnp.asarray([1.0]), jnp.asarray([2.0]))
    assert float(v[0, 0]) == 9.0
    # midpoint interpolation
    v = border_sample(feat, jnp.asarray([0.5]), jnp.asarray([0.0]))
    assert float(v[0, 0]) == pytest.approx(0.5)
    # border clamp far outside
    v = border_sample(feat, jnp.asarray([99.0]), jnp.asarray([-5.0]))
    assert float(v[0, 0]) == 3.0


def test_resample_polygon_arclength():
    from lsnet_tpu.core.dense_reppoints import resample_polygon
    sq = jnp.asarray([[0, 0], [4, 0], [4, 4], [0, 4]], jnp.float32)
    out = np.asarray(resample_polygon(sq, 8))
    assert out.shape == (8, 2)
    np.testing.assert_allclose(out[0], [0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1], [2, 0], atol=1e-5)  # mid of edge 1
    np.testing.assert_allclose(out[2], [4, 0], atol=1e-5)
    np.testing.assert_allclose(out[5], [2, 4], atol=1e-5)


def test_point_in_polygon():
    from lsnet_tpu.core.dense_reppoints import point_in_polygon
    sq = jnp.asarray([[0, 0], [4, 0], [4, 4], [0, 4]], jnp.float32)
    pts = jnp.asarray([[2, 2], [5, 2], [-1, -1], [3.9, 3.9]], jnp.float32)
    got = np.asarray(point_in_polygon(sq, pts))
    np.testing.assert_array_equal(got, [True, False, False, True])


def test_grid_group_partition():
    from lsnet_tpu.models.heads.dense_reppoints import grid_group_partition
    pts = jnp.asarray(
        np.random.RandomState(0).rand(1, 2, 2, 9, 2).astype(np.float32))
    g = np.asarray(grid_group_partition(pts, 25))
    assert g.shape == (1, 2, 2, 9)
    assert g.min() >= 0 and g.max() < 25


# -------------------------------------------------------------- forward --

@pytest.mark.parametrize("v2", [False, True])
def test_forward_contract(v2):
    from lsnet_tpu.models.heads.dense_reppoints import (
        DenseRepPointsHead, DenseRepPointsV2Head)
    head = (DenseRepPointsV2Head if v2 else DenseRepPointsHead)(**HEAD_KW)
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    assert len(outs["cls"]) == 5
    assert outs["cls"][0].shape[-1] == 4
    assert outs["pts_init"][0].shape[-1] == 2 * 49
    assert outs["pts_refine"][0].shape[-1] == 2 * 49
    assert outs["pts_score"][0].shape[-1] == 49
    if v2:
        assert outs["sem"][0].shape[-1] == 4
        assert outs["hm_tl"][0].shape[-1] == 1
        assert outs["off_tl"][0].shape[-1] == 2


# ----------------------------------------------------------------- loss --

@pytest.mark.parametrize("v2,empty", [(False, False), (False, True),
                                      (True, False)])
def test_loss_and_grads(v2, empty):
    from lsnet_tpu.core.dense_reppoints import (dense_reppoints_loss,
                                                dense_reppoints_v2_loss)
    from lsnet_tpu.models.heads.dense_reppoints import (
        DenseRepPointsHead, DenseRepPointsV2Head)
    head = (DenseRepPointsV2Head if v2 else DenseRepPointsHead)(**HEAD_KW)
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    batch = _batch(empty=empty)
    cfg = _cfg()
    fn = dense_reppoints_v2_loss if v2 else dense_reppoints_loss

    def lf(p):
        outs = head.apply({"params": p}, feats)
        return fn(outs, batch, cfg)

    (total, losses), grads = jax.value_and_grad(
        lambda p: lf(p), has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm))
    if not empty:
        assert float(losses["loss_pts_refine"]) > 0.0


# --------------------------------------------------------------- decode --

def test_decode_and_masks():
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.dense_reppoints import (dense_points_to_masks,
                                                dense_reppoints_decode)
    from lsnet_tpu.models.heads.dense_reppoints import DenseRepPointsHead
    head = DenseRepPointsHead(**HEAD_KW)
    feats = _feats()
    variables = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(variables, feats)
    cfg = _cfg()
    tcfg = TestConfig(image_shape=IMG, num_classes=4, task="segm",
                      num_vectors=36, nms_pre=100, score_thr=0.0,
                      nms_iou=0.6, max_per_img=10)
    dets = dense_reppoints_decode(outs, jnp.asarray([list(IMG)] * 2,
                                                    jnp.int32),
                                  jnp.ones((2, 4), jnp.float32), tcfg, cfg)
    assert dets.bboxes.shape == (2, 10, 4)
    assert dets.pts.shape == (2, 10, 2 * 49)
    assert dets.pts_scores.shape == (2, 10, 49)
    v = np.asarray(dets.valid[0])
    b = np.asarray(dets.bboxes[0])
    assert np.all(b[v][:, 2] >= b[v][:, 0])
    one = jax.tree.map(lambda x: x[0], dets)
    masks = dense_points_to_masks(one, IMG)
    assert len(masks) == 10
    assert masks[0].shape == IMG


def test_mask_from_synthetic_points():
    """A dense point set with high scores inside a box rasterizes to a
    mask covering that box."""
    from lsnet_tpu.core.dense_reppoints import (DensePointDetections,
                                                dense_points_to_masks)
    gx, gy = np.meshgrid(np.linspace(10, 30, 7), np.linspace(10, 30, 7))
    pts = np.stack([gx.ravel(), gy.ravel()], -1).reshape(1, -1)
    dets = DensePointDetections(
        bboxes=np.asarray([[10, 10, 30, 30]], np.float32),
        scores=np.asarray([0.9], np.float32),
        labels=np.asarray([0], np.int32),
        pts=pts.astype(np.float32),
        pts_scores=np.ones((1, 49), np.float32),
        valid=np.asarray([True]))
    masks = dense_points_to_masks(dets, (64, 64))
    m = masks[0]
    assert m[20, 20] == 1
    assert m[5, 5] == 0
    assert m[40, 40] == 0


def test_dense_reppoints_configs_build():
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.utils.config import Config
    for rel in ("dense_reppoints/dense_reppoints_r50_fpn_1x_coco.py",
                "dense_reppoints/dense_reppoints_v2_r50_fpn_1x_coco.py"):
        cfg = Config.fromfile(os.path.join(CFG_ROOT, rel))
        model, _ = build_detector(cfg.model.to_dict())
        assert type(model.head).__name__ in ("DenseRepPointsHead",
                                             "DenseRepPointsV2Head")
        assert model.head.num_points == 729
