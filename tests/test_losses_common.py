"""Loss zoo sanity tests (IoU family identities, CE vs manual, GHM/AE)."""

import numpy as np
import jax.numpy as jnp

from lsnet_tpu.models.losses.common import (ae_loss,
                                            binary_cross_entropy_loss,
                                            bbox_overlaps_aligned,
                                            chamfer_loss, ciou_loss,
                                            cross_entropy_loss, diou_loss,
                                            ghm_c_loss, giou_loss, iou_loss,
                                            l1_loss, smooth_l1_loss)


def boxes():
    pred = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15.]])
    return pred, pred + jnp.array([[0.0, 0, 0, 0], [2, 2, 2, 2]])


def test_iou_family_zero_at_identity():
    p = jnp.array([[0, 0, 10, 10.]])
    for fn in (iou_loss, giou_loss, diou_loss, ciou_loss):
        v = float(fn(p, p))
        assert abs(v) < 1e-4, fn.__name__


def test_iou_family_positive_when_shifted():
    pred, target = boxes()
    for fn in (iou_loss, giou_loss, diou_loss, ciou_loss):
        assert float(fn(pred, target)) > 0


def test_overlaps_aligned():
    pred, target = boxes()
    ious = np.asarray(bbox_overlaps_aligned(pred, target))
    assert np.isclose(ious[0], 1.0)
    assert 0 < ious[1] < 1


def test_smooth_l1_matches_manual():
    p = jnp.array([0.0, 2.0])
    t = jnp.array([0.0, 0.0])
    v = float(smooth_l1_loss(p, t, beta=1.0, reduction="sum"))
    assert np.isclose(v, 0.0 + (2 - 0.5))
    assert np.isclose(float(l1_loss(p, t, reduction="sum")), 2.0)


def test_cross_entropy():
    logits = jnp.array([[10.0, 0, 0], [0, 10, 0.]])
    labels = jnp.array([0, 1])
    assert float(cross_entropy_loss(logits, labels)) < 1e-3
    labels_bad = jnp.array([1, 0])
    assert float(cross_entropy_loss(logits, labels_bad)) > 5


def test_bce():
    p = jnp.array([[10.0, -10.0]])
    t = jnp.array([[1.0, 0.0]])
    assert float(binary_cross_entropy_loss(p, t)) < 1e-3


def test_ghm_finite():
    rng = np.random.RandomState(0)
    pred = jnp.array(rng.randn(8, 4).astype(np.float32))
    target = jnp.array((rng.rand(8, 4) > 0.7).astype(np.float32))
    lw = jnp.ones((8, 4))
    v = float(ghm_c_loss(pred, target, lw))
    assert np.isfinite(v) and v > 0


def test_ae_loss_pull_push():
    # identical pair tags -> zero pull; distant means -> zero push
    tags = jnp.array([[1.0, 1.0], [5.0, 5.0]])
    mask = jnp.array([1.0, 1.0])
    assert float(ae_loss(tags, mask)) < 1e-6
    tags2 = jnp.array([[1.0, 1.2], [1.1, 1.3]])   # close means -> push > 0
    assert float(ae_loss(tags2, mask)) > 0


def test_chamfer_loss_zero_identity():
    pts = jnp.array([[[0, 0], [1, 1], [2, 2.]]])
    assert float(chamfer_loss(pts, pts)) < 1e-6
