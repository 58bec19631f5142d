"""End-to-end loss tests (mirrors the reference head-loss unit tests in
`code/tests/test_heads.py`: zero-GT and with-GT behaviour on fake inputs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lsnet_tpu.core.loss import LossConfig, lsnet_loss
from lsnet_tpu.core import points as P


IMG = (64, 64)
STRIDES = (8, 16, 32, 64, 128)


def fake_outs(task, B=2, nv=4, num_classes=4, rng=None):
    rng = rng or np.random.RandomState(0)
    shapes = P.level_shapes(IMG, STRIDES)
    outs = {"cls": [jnp.array(rng.randn(B, h, w, num_classes).astype(np.float32))
                    for h, w in shapes]}
    def sp_maps(dim):
        return [jnp.array(
            np.log1p(np.exp(rng.randn(B, h, w, dim))).astype(np.float32))
            for h, w in shapes]
    if task in ("bbox", "pose_bbox"):
        outs["bbox_init"] = sp_maps(20)
        outs["bbox_refine"] = sp_maps(20)
    if task == "segm":
        outs["segm_init"] = sp_maps((nv + 1) * 4)
        outs["segm_refine"] = sp_maps((nv + 1) * 4)
    if task in ("pose_bbox", "pose_kbox"):
        outs["pose_init"] = sp_maps((nv + 1) * 4)
        outs["pose_refine"] = sp_maps((nv + 1) * 4)
    return outs


def base_batch(B=2, M=3):
    return {
        "pad_shape": jnp.array([[64, 64]] * B, jnp.int32),
        "gt_bboxes": jnp.array(
            [[[10, 10, 40, 40], [20, 5, 60, 35], [0, 0, 0, 0]]] * B,
            jnp.float32),
        "gt_labels": jnp.array([[1, 2, 0]] * B, jnp.int32),
        "gt_valid": jnp.array([[True, True, False]] * B),
    }


def test_bbox_loss_finite_and_positive():
    cfg = LossConfig(image_shape=IMG, num_classes=4, task="bbox")
    outs = fake_outs("bbox")
    total, losses = jax.jit(
        lambda o, b: lsnet_loss(o, b, cfg))(outs, base_batch())
    assert set(losses) == {"loss_cls", "loss_bbox_init", "loss_bbox_refine"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_cls"]) > 0


def test_bbox_loss_zero_gt():
    cfg = LossConfig(image_shape=IMG, num_classes=4, task="bbox")
    outs = fake_outs("bbox")
    batch = base_batch()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, losses = lsnet_loss(outs, batch, cfg)
    assert np.isfinite(float(total))
    # with no positives, regression losses vanish; cls loss is pure negative
    assert float(losses["loss_bbox_init"]) == 0.0
    assert float(losses["loss_bbox_refine"]) == 0.0
    assert float(losses["loss_cls"]) > 0


def test_bbox_loss_has_gradients():
    cfg = LossConfig(image_shape=IMG, num_classes=4, task="bbox")
    outs = fake_outs("bbox")
    batch = base_batch()

    def f(outs):
        total, _ = lsnet_loss(outs, batch, cfg)
        return total

    grads = jax.grad(f)(outs)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.abs(g).sum()) > 0 for g in flat)


def test_segm_loss():
    nv = 8
    cfg = LossConfig(image_shape=IMG, num_classes=4, task="segm",
                     num_vectors=nv)
    outs = fake_outs("segm", nv=nv)
    batch = base_batch()
    rng = np.random.RandomState(1)
    theta = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    poly = np.stack([25 + 12 * np.cos(theta), 25 + 12 * np.sin(theta)],
                    -1).reshape(-1)
    batch["gt_polygons"] = jnp.array(
        np.tile(poly, (2, 3, 1)).astype(np.float32))
    total, losses = lsnet_loss(outs, batch, cfg)
    assert set(losses) == {"loss_cls", "loss_segm_init", "loss_segm_refine"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


@pytest.mark.parametrize("task", ["pose_bbox", "pose_kbox"])
def test_pose_loss(task):
    nv = 17
    cfg = LossConfig(image_shape=IMG, num_classes=1, task=task,
                     num_vectors=nv)
    outs = fake_outs(task, nv=nv, num_classes=1)
    batch = base_batch()
    rng = np.random.RandomState(2)
    kps = np.zeros((2, 3, nv * 3), np.float32)
    kps[..., 0::3] = rng.uniform(10, 50, (2, 3, nv))
    kps[..., 1::3] = rng.uniform(10, 50, (2, 3, nv))
    kps[..., 2::3] = 2.0
    kps[:, :, 5] = 0  # one invisible keypoint
    batch["gt_keypoints_vs"] = jnp.array(kps)
    total, losses = lsnet_loss(outs, batch, cfg)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    if task == "pose_bbox":
        assert "loss_bbox_init" in losses and "loss_pose_init" in losses
    else:
        assert "loss_pose_init" in losses and "loss_bbox_init" not in losses
