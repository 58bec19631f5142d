"""RepPoints v1 loss + decode — pure functions.

Rebuilds `/root/reference/code/mmdet/models/dense_heads/reppoints_head.py`
target/loss/decode flow (:366-712) with static shapes:

* init stage: PointAssigner — per-GT closest grid point at the matched
  level (the same family as LSNet's CentroidAssigner, ``iou_type='center'``)
* refine stage: MaxIoUAssigner on init-decoded boxes (ref :586-605)
* losses: sigmoid focal cls (refine labels) + SmoothL1(beta=1/9) on the
  points2bbox transform, normalized by ``point_base_scale * stride``
  (ref ``loss_single`` :514-549)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.focal_loss import sigmoid_focal_loss
from . import points as P
from .assign import centroid_assign, max_iou_assign
from .decode import Detections, TestConfig, nms_candidates

Array = jax.Array


@dataclass(frozen=True)
class RepPointsConfig:
    image_shape: Tuple[int, int]
    num_classes: int
    num_points: int = 9
    point_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    transform_method: str = "moment"
    # init assigner (PointAssigner defaults)
    init_scale: float = 4.0
    init_pos_num: int = 1
    # refine assigner (MaxIoUAssigner reppoints defaults)
    refine_pos_iou: float = 0.5
    refine_neg_iou: float = 0.4
    refine_min_pos_iou: float = 0.0
    # loss weights (ref defaults: init 0.5, refine 1.0, beta 1/9)
    cls_weight: float = 1.0
    init_weight: float = 0.5
    refine_weight: float = 1.0
    smooth_beta: float = 1.0 / 9.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25


def points2bbox(pts_xy: Array, method: str, moment: Array) -> Array:
    """(..., K, 2) xy point sets -> (..., 4) boxes (ref :154-212)."""
    xs = pts_xy[..., 0]
    ys = pts_xy[..., 1]
    if method == "minmax":
        return jnp.stack([xs.min(-1), ys.min(-1), xs.max(-1), ys.max(-1)],
                         axis=-1)
    if method == "partial_minmax":
        xs4, ys4 = xs[..., :4], ys[..., :4]
        return jnp.stack([xs4.min(-1), ys4.min(-1), xs4.max(-1),
                          ys4.max(-1)], axis=-1)
    if method == "moment":
        mx = xs.mean(-1)
        my = ys.mean(-1)
        # torch.std: unbiased (N-1) normalization
        n = xs.shape[-1]
        sx = jnp.sqrt(jnp.sum((xs - mx[..., None]) ** 2, -1)
                      / max(n - 1, 1) + 1e-12)
        sy = jnp.sqrt(jnp.sum((ys - my[..., None]) ** 2, -1)
                      / max(n - 1, 1) + 1e-12)
        hw = sx * jnp.exp(moment[0])
        hh = sy * jnp.exp(moment[1])
        return jnp.stack([mx - hw, my - hh, mx + hw, my + hh], axis=-1)
    raise ValueError(method)


def _pts_flat_xy(maps: Sequence[Array], K: int) -> Array:
    """[(B,H,W,2K) y-first maps...] -> (B, N, K, 2) xy in STRIDE units."""
    flats = [m.reshape(m.shape[0], -1, K, 2) for m in maps]
    yx = jnp.concatenate(flats, axis=1).astype(jnp.float32)
    return yx[..., ::-1]                                  # (y,x) -> (x,y)


def _pts_to_img(pts_xy: Array, points: Array, stride: Array) -> Array:
    """Stride-unit point sets -> image coords (ref offset_to_pts :345-365)."""
    ctr = points[None, :, None, :2]
    return ctr + pts_xy * stride[None, :, None, None]


def _smooth_l1(pred: Array, tgt: Array, beta: float) -> Array:
    d = jnp.abs(pred - tgt)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).sum(-1)


def reppoints_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
                   cfg: RepPointsConfig) -> Tuple[Array, Dict[str, Array]]:
    K = cfg.num_points
    C = cfg.num_classes
    points = P.multi_level_points(cfg.image_shape, cfg.point_strides)
    stride = points[:, 2]
    valid = jax.vmap(lambda ps: P.valid_flags(
        cfg.image_shape, cfg.point_strides, ps))(batch["pad_shape"])

    cls_flat = jnp.concatenate(
        [m.reshape(m.shape[0], -1, C) for m in outs["cls"]],
        axis=1).astype(jnp.float32)
    pts_init = _pts_flat_xy(outs["pts_init"], K)          # (B,N,K,2) strides
    pts_refine = _pts_flat_xy(outs["pts_refine"], K)
    moment = outs["moment"].astype(jnp.float32)

    init_img = _pts_to_img(pts_init, points, stride)
    refine_img = _pts_to_img(pts_refine, points, stride)
    bbox_init = points2bbox(init_img, cfg.transform_method, moment)
    bbox_refine = points2bbox(refine_img, cfg.transform_method, moment)

    gt_bboxes = batch["gt_bboxes"]
    gt_labels = batch["gt_labels"]
    gt_valid = batch["gt_valid"]

    # init: closest point per GT at the matched level
    init_assign = jax.vmap(
        lambda pv, gb, gv: centroid_assign(
            points, pv, gb, gv, scale=cfg.init_scale,
            pos_num=cfg.init_pos_num, iou_type="center")
    )(valid, gt_bboxes, gt_valid)

    # refine: MaxIoU on init-decoded boxes (stop-grad — ref detaches)
    cand = jax.lax.stop_gradient(bbox_init)
    refine_assign = jax.vmap(
        lambda bb, pv, gb, gv: max_iou_assign(
            bb, pv, gb, gv, pos_iou_thr=cfg.refine_pos_iou,
            neg_iou_thr=cfg.refine_neg_iou,
            min_pos_iou=cfg.refine_min_pos_iou)
    )(cand, valid, gt_bboxes, gt_valid)

    B, N = valid.shape
    norm = (cfg.point_base_scale * stride)[None, :, None]

    def stage_loss(bbox_pred, gt_idx, weight):
        pos = gt_idx >= 0
        tgt = jnp.take_along_axis(
            gt_bboxes, jnp.maximum(gt_idx, 0)[..., None], axis=1)
        n_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        l = _smooth_l1(bbox_pred / norm, tgt / norm, cfg.smooth_beta)
        return jnp.sum(l * pos.astype(jnp.float32)) / n_pos * weight, n_pos

    loss_init, _ = stage_loss(bbox_init, init_assign.gt_idx, cfg.init_weight)
    loss_refine, n_pos_r = stage_loss(bbox_refine, refine_assign.gt_idx,
                                      cfg.refine_weight)

    pos_r = refine_assign.gt_idx >= 0
    labels = jnp.where(
        pos_r,
        jnp.take_along_axis(gt_labels, jnp.maximum(refine_assign.gt_idx, 0),
                            axis=1), C)
    lw = (valid & ~refine_assign.ignore).astype(jnp.float32)
    loss_cls = sigmoid_focal_loss(
        cls_flat.reshape(B * N, C), labels.reshape(B * N),
        lw.reshape(B * N), gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
        avg_factor=n_pos_r) * cfg.cls_weight

    losses = {"loss_cls": loss_cls, "loss_pts_init": loss_init,
              "loss_pts_refine": loss_refine}
    return sum(losses.values()), losses


def reppoints_decode(outs: Dict[str, Sequence[Array]], img_shapes: Array,
                     scale_factors: Array, tcfg: TestConfig,
                     cfg: RepPointsConfig, rescale: bool = True
                     ) -> Detections:
    """get_bboxes (ref :634-712): points2bbox on refine preds, clip, NMS."""
    K = cfg.num_points
    C = cfg.num_classes
    points = P.multi_level_points(cfg.image_shape, cfg.point_strides)
    stride = points[:, 2]
    cls = jnp.concatenate(
        [m.reshape(m.shape[0], -1, C) for m in outs["cls"]],
        axis=1).astype(jnp.float32)
    pts = _pts_to_img(_pts_flat_xy(outs["pts_refine"], K), points, stride)
    boxes = points2bbox(pts, cfg.transform_method,
                        outs["moment"].astype(jnp.float32))

    def single(cls_i, boxes_i, img_shape, sf):
        scores = jax.nn.sigmoid(cls_i)
        x1 = jnp.clip(boxes_i[:, 0], 0, img_shape[1])
        y1 = jnp.clip(boxes_i[:, 1], 0, img_shape[0])
        x2 = jnp.clip(boxes_i[:, 2], 0, img_shape[1])
        y2 = jnp.clip(boxes_i[:, 3], 0, img_shape[0])
        b = jnp.stack([x1, y1, x2, y2], -1)
        if rescale:
            b = b / sf[None, :]
        lms = jnp.zeros((b.shape[0], 8), b.dtype)
        return nms_candidates(b, lms, scores, tcfg)

    return jax.vmap(single)(cls, boxes, img_shapes, scale_factors)
