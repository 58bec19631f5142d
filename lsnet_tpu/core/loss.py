"""LSNet training loss — one jittable pure function.

Composes point generation, init/refine label assignment, target encoding and
the focal + cross-IOU losses exactly as the reference ``LSHead.loss``
(`/root/reference/code/mmdet/models/dense_heads/lsnet_head.py:1272-1437`)
but fully vectorized: per-image python loops become ``vmap``, per-level
lists stay concatenated (the per-level sums of the reference are equal to
one flat weighted sum because every factor is per-point).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.heads.ls_head import extreme_points2bbox, vectors2bbox
from ..models.losses.cross_iou import cross_iou_loss
from ..ops.focal_loss import sigmoid_focal_loss
from . import points as P
from .assign import atss_assign, centroid_assign
from .targets import (build_stage_targets, encode_gt_reg, get_border_center,
                      keypoints_with_bbox, keypoints_with_kbox,
                      polygons_to_gt)

Array = jax.Array


@dataclass(frozen=True)
class LossConfig:
    """Static loss configuration (mirrors train_cfg + head loss cfgs)."""
    image_shape: Tuple[int, int]
    num_classes: int
    task: str = "bbox"
    num_vectors: int = 4
    point_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    # init assigner (CentroidAssigner)
    init_scale: float = 4.0
    init_pos_num: int = 1
    init_iou_type: str = "center"
    # refine assigner (ATSS)
    refine_topk: int = 9
    # losses
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    cls_loss_weight: float = 1.0
    init_loss_weight: float = 1.0
    refine_loss_weight: float = 2.0
    pose_init_loss_weight: float = 1.0
    pose_refine_loss_weight: float = 2.0
    cross_iou_alpha: float = 0.2
    cross_iou_stride: int = 9


def _flatten_levels(level_maps: Sequence[Array]) -> Array:
    """[(B,H,W,C)...] -> (B, N, C), level-concatenated row-major (matches
    grid point ordering)."""
    return jnp.concatenate(
        [m.reshape(m.shape[0], -1, m.shape[-1]) for m in level_maps], axis=1)


def _per_point_stride(cfg: LossConfig) -> Array:
    counts = P.num_level_points(cfg.image_shape, cfg.point_strides)
    return jnp.concatenate([
        jnp.full((n,), s, jnp.float32)
        for n, s in zip(counts, cfg.point_strides)])


def _decode_init_boxes(init_flat: Array, points: Array, stride: Array,
                       task: str) -> Array:
    """Init landmark field -> boxes for the refine-stage ATSS assigner
    (ref :1333-1361), with stop_gradient (ref ``.detach()``)."""
    sp = jax.lax.stop_gradient(init_flat)
    if task in ("bbox", "pose_bbox"):
        _, bbox = extreme_points2bbox(sp)
    else:
        _, bbox = vectors2bbox(sp)
    shift = bbox * stride[None, :, None]
    center = jnp.concatenate([points[:, :2], points[:, :2]], axis=-1)
    return center[None] + shift


def _landmark_loss(pred_flat: Array, lm_gt: Array, row_w: Array,
                   points: Array, stride: Array, bboxes_gt: Optional[Array],
                   num_pos: Array, cfg: LossConfig, loss_type: str,
                   loss_weight: float, vs: Optional[Array] = None) -> Array:
    """One cross-IOU term over the flat point set (both stages use this)."""
    B, N, D = pred_flat.shape
    norm = (cfg.point_base_scale * stride)[None, :, None]     # (1,N,1)
    pred = (pred_flat * stride[None, :, None] / norm).reshape(B * N, D)
    anchor = jnp.broadcast_to(points[None, :, :2], (B, N, 2))
    anchor = (anchor / norm[..., :1]).reshape(B * N, 2)
    # encode GT in image units, then normalize like the reference
    gt_reg, pos_inds = encode_gt_reg(
        lm_gt.reshape(B * N, -1),
        jnp.broadcast_to(points[None, :, :2], (B, N, 2)).reshape(B * N, 2),
        row_w.reshape(B * N))
    gt_reg = gt_reg / jnp.broadcast_to(norm, (B, N, 1)).reshape(B * N, 1)
    bbox_gt = (None if bboxes_gt is None else
               (bboxes_gt / norm).reshape(B * N, 4))
    return cross_iou_loss(
        pred, gt_reg, row_w.reshape(B * N), loss_type=loss_type,
        anchor_pts=anchor, bbox_gt=bbox_gt, pos_inds=pos_inds,
        vs=None if vs is None else vs.reshape(B * N, -1),
        avg_factor=num_pos, alpha=cfg.cross_iou_alpha,
        stride=cfg.cross_iou_stride, loss_weight=loss_weight)


def lsnet_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
               cfg: LossConfig) -> Tuple[Array, Dict[str, Array]]:
    """Compute the LSNet loss dict.

    batch keys: ``gt_bboxes`` (B,M,4), ``gt_labels`` (B,M), ``gt_valid``
    (B,M) bool, ``pad_shape`` (B,2); task extras: ``gt_extremes`` (B,M,10),
    ``gt_polygons`` (B,M,nv*2), ``gt_keypoints_vs`` (B,M,3*nv).
    """
    task = cfg.task
    nv = cfg.num_vectors
    points = P.multi_level_points(cfg.image_shape, cfg.point_strides)
    stride = _per_point_stride(cfg)
    nlp = P.num_level_points(cfg.image_shape, cfg.point_strides)
    valid = jax.vmap(lambda ps: P.valid_flags(cfg.image_shape,
                                              cfg.point_strides, ps))(
        batch["pad_shape"])                                    # (B, N)

    gt_bboxes = batch["gt_bboxes"]
    gt_labels = batch["gt_labels"]
    gt_valid = batch["gt_valid"]

    # ---- task-specific GT prep (ref :1287-1304) ----
    kp_vs = None
    if task == "bbox":
        lm_src = batch.get("gt_extremes")
        if lm_src is None:
            lm_src = get_border_center(gt_bboxes)
    elif task == "segm":
        lm_src, gt_bboxes = polygons_to_gt(batch["gt_polygons"])
    elif task == "pose_bbox":
        lm_src, kp_vs = keypoints_with_bbox(gt_bboxes, batch["gt_keypoints_vs"])
    elif task == "pose_kbox":
        lm_src, gt_bboxes, kp_vs = keypoints_with_kbox(batch["gt_keypoints_vs"])
    else:
        raise ValueError(task)
    if task == "pose_bbox":
        bbox_lm_src = batch.get("gt_extremes")
        if bbox_lm_src is None:
            bbox_lm_src = get_border_center(gt_bboxes)

    cls_flat = _flatten_levels(outs["cls"])
    losses: Dict[str, Array] = {}

    # ---- init stage assignment (CentroidAssigner) ----
    def assign_init(pv, gb, gv, lm):
        extremes = lm if task == "bbox" else None
        return centroid_assign(points, pv, gb, gv, gt_extremes=extremes,
                               scale=cfg.init_scale, pos_num=cfg.init_pos_num,
                               iou_type=cfg.init_iou_type)

    init_assign = jax.vmap(assign_init)(valid, gt_bboxes, gt_valid, lm_src)

    def make_targets(gt_idx):
        return jax.vmap(
            lambda gi, pv, gb, gl, gv, lm, kvs: build_stage_targets(
                gi, pv, gb, gl, gv, lm, cfg.num_classes, kvs)
        )(gt_idx, valid, gt_bboxes, gt_labels, gt_valid, lm_src,
          kp_vs if kp_vs is not None else jnp.zeros_like(gt_bboxes[..., :1]))

    init_t = make_targets(init_assign.gt_idx)
    num_pos_init = jnp.sum(init_t.num_pos)

    # ---- decode init boxes -> refine assignment (ATSS, ref :1333-1374) ----
    main_key = {"bbox": "bbox", "segm": "segm", "pose_bbox": "bbox",
                "pose_kbox": "pose"}[task]
    init_flat = _flatten_levels(outs[f"{main_key}_init"])
    decoded = _decode_init_boxes(init_flat, points, stride,
                                 "bbox" if main_key == "bbox" else "vec")
    refine_assign = jax.vmap(
        lambda bb, pv, gb, gv: atss_assign(bb, pv, nlp, gb, gv,
                                           topk=cfg.refine_topk)
    )(decoded, valid, gt_bboxes, gt_valid)
    refine_t = make_targets(refine_assign.gt_idx)
    num_pos_refine = jnp.sum(refine_t.num_pos)

    # ---- classification loss (refine labels; ref :1048-1055) ----
    B, N, C = cls_flat.shape
    losses["loss_cls"] = sigmoid_focal_loss(
        cls_flat.reshape(B * N, C), refine_t.labels.reshape(B * N),
        refine_t.label_weights.reshape(B * N), gamma=cfg.focal_gamma,
        alpha=cfg.focal_alpha, avg_factor=num_pos_refine
    ) * cfg.cls_loss_weight

    # ---- landmark losses ----
    refine_flat = _flatten_levels(outs[f"{main_key}_refine"])
    if task in ("bbox", "pose_bbox"):
        # bbox branch uses border-center extremes as landmark GT
        if task == "pose_bbox":
            def remake(gt_idx):
                return jax.vmap(
                    lambda gi, pv, gb, gl, gv, lm: build_stage_targets(
                        gi, pv, gb, gl, gv, lm, cfg.num_classes, None)
                )(gt_idx, valid, gt_bboxes, gt_labels, gt_valid, bbox_lm_src)
            bbox_init_t = remake(init_assign.gt_idx)
            bbox_refine_t = remake(refine_assign.gt_idx)
        else:
            bbox_init_t, bbox_refine_t = init_t, refine_t
        losses["loss_bbox_init"] = _landmark_loss(
            init_flat, bbox_init_t.lm_gt, bbox_init_t.bbox_weights, points,
            stride, bbox_init_t.bboxes_gt, num_pos_init, cfg, "bbox",
            cfg.init_loss_weight)
        losses["loss_bbox_refine"] = _landmark_loss(
            refine_flat, bbox_refine_t.lm_gt, bbox_refine_t.bbox_weights,
            points, stride, bbox_refine_t.bboxes_gt, num_pos_refine, cfg,
            "bbox", cfg.refine_loss_weight)
    if task == "segm":
        losses["loss_segm_init"] = _landmark_loss(
            init_flat, init_t.lm_gt, init_t.bbox_weights, points, stride,
            init_t.bboxes_gt, num_pos_init, cfg, "polygon",
            cfg.init_loss_weight)
        losses["loss_segm_refine"] = _landmark_loss(
            refine_flat, refine_t.lm_gt, refine_t.bbox_weights, points,
            stride, refine_t.bboxes_gt, num_pos_refine, cfg, "polygon",
            cfg.refine_loss_weight)
    if task in ("pose_bbox", "pose_kbox"):
        pose_init_flat = _flatten_levels(outs["pose_init"])
        pose_refine_flat = _flatten_levels(outs["pose_refine"])
        losses["loss_pose_init"] = _landmark_loss(
            pose_init_flat, init_t.lm_gt, init_t.bbox_weights, points,
            stride, None, num_pos_init, cfg, "keypoint",
            cfg.pose_init_loss_weight, vs=init_t.kp_vs)
        losses["loss_pose_refine"] = _landmark_loss(
            pose_refine_flat, refine_t.lm_gt, refine_t.bbox_weights, points,
            stride, None, num_pos_refine, cfg, "keypoint",
            cfg.pose_refine_loss_weight, vs=refine_t.kp_vs)

    total = sum(losses.values())
    return total, losses
