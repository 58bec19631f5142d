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


def reppoints_v2_loss(outs: Dict[str, Sequence[Array]],
                      batch: Dict[str, Array], cfg: RepPointsConfig,
                      *, gaussian_iou: float = 0.7,
                      heatmap_loss_weight: float = 0.25,
                      offset_loss_weight: float = 1.0,
                      sem_loss_weight: float = 0.1
                      ) -> Tuple[Array, Dict[str, Array]]:
    """RepPoints v2 = v1 point losses + the corner/sem verification losses
    shared with LSCPV (`reppoints_v2_head.py` loss flow)."""
    from .cpv import cpv_aux_losses
    total, losses = reppoints_loss(outs, batch, cfg)
    points = P.multi_level_points(cfg.image_shape, cfg.point_strides)
    nlp = P.num_level_points(cfg.image_shape, cfg.point_strides)
    valid = jax.vmap(lambda ps: P.valid_flags(
        cfg.image_shape, cfg.point_strides, ps))(batch["pad_shape"])
    aux = cpv_aux_losses(outs, batch, points, nlp, valid, cfg.image_shape,
                         cfg.num_classes, gaussian_iou=gaussian_iou,
                         heatmap_loss_weight=heatmap_loss_weight,
                         offset_loss_weight=offset_loss_weight,
                         sem_loss_weight=sem_loss_weight)
    losses.update(aux)
    return total + sum(aux.values()), losses


def reppoints_v2_decode(outs: Dict[str, Sequence[Array]], img_shapes: Array,
                        scale_factors: Array, tcfg: TestConfig,
                        cfg: RepPointsConfig, rescale: bool = True
                        ) -> Detections:
    """v2 decode: v1 points2bbox + CPV corner-verification snap on levels
    > 0 (reference `reppoints_v2_head.py` get_bboxes with
    `lscpvnet_head.py:1012-1092`-style peak lookup)."""
    from ..ops.nms import NEG_INF, batched_nms
    K = cfg.num_points
    C = cfg.num_classes
    shapes = P.level_shapes(cfg.image_shape, cfg.point_strides)
    num_levels = len(outs["cls"])
    moment = outs["moment"].astype(jnp.float32)

    def snap(hm, off, x, y, lvl_i, corner):
        H, W = hm.shape[:2]
        s = cfg.point_strides[lvl_i]
        prob = jax.nn.sigmoid(hm)
        w00 = prob[:-1, :-1]
        w01 = prob[:-1, 1:]
        w10 = prob[1:, :-1]
        w11 = prob[1:, 1:]
        stack = jnp.stack([w00, w01, w10, w11], axis=-1)
        arg = jnp.argmax(stack, axis=-1)
        dy = arg // 2
        dx = arg % 2
        xr = jnp.floor(jnp.clip(x / s, 0, W - 2)).astype(jnp.int32)
        yr = jnp.floor(jnp.clip(y / s, 0, H - 2)).astype(jnp.int32)
        nx = (xr + dx[yr, xr]).astype(jnp.int32)
        ny = (yr + dy[yr, xr]).astype(jnp.int32)
        ch = (0, 1) if corner == "tl" else (2, 3)
        ox = off[ny, nx, ch[0]]
        oy = off[ny, nx, ch[1]]
        return ((nx.astype(x.dtype) + ox) * s,
                (ny.astype(y.dtype) + oy) * s)

    def single(cls_list, pts_list, hm_list, off_list, img_shape, sf):
        mlvl_scores, mlvl_bboxes = [], []
        for lvl in range(num_levels):
            h, w = shapes[lvl]
            s = cfg.point_strides[lvl]
            scores = jax.nn.sigmoid(
                cls_list[lvl].reshape(-1, C).astype(jnp.float32))
            pts = P.grid_points((h, w), s)
            k = min(tcfg.nms_pre, scores.shape[0])
            _, topk = jax.lax.top_k(scores.max(axis=1), k)
            scores = scores[topk]
            yx = pts_list[lvl].reshape(-1, K, 2)[topk].astype(jnp.float32)
            xy_pts = yx[..., ::-1] * s + pts[topk, None, :2]
            bbox = points2bbox(xy_pts, cfg.transform_method, moment)
            x1 = jnp.clip(bbox[:, 0], 0, img_shape[1])
            y1 = jnp.clip(bbox[:, 1], 0, img_shape[0])
            x2 = jnp.clip(bbox[:, 2], 0, img_shape[1])
            y2 = jnp.clip(bbox[:, 3], 0, img_shape[0])
            if lvl > 0:
                i = 0 if lvl in (1, 2) else 1
                hm = hm_list[i]
                off = off_list[i]
                x1n, y1n = snap(hm[..., 0], off, x1, y1, i, "tl")
                x2n, y2n = snap(hm[..., 1], off, x2, y2, i, "br")
                x1 = jnp.clip(x1n, 0, img_shape[1])
                y1 = jnp.clip(y1n, 0, img_shape[0])
                x2 = jnp.clip(x2n, 0, img_shape[1])
                y2 = jnp.clip(y2n, 0, img_shape[0])
            mlvl_bboxes.append(jnp.stack([x1, y1, x2, y2], -1))
            mlvl_scores.append(scores)
        scores = jnp.concatenate(mlvl_scores)
        bboxes = jnp.concatenate(mlvl_bboxes)
        if rescale:
            bboxes = bboxes / sf[None, :]
        T2, _ = scores.shape
        cand = jnp.where(scores > tcfg.score_thr, scores, NEG_INF)
        k = min(tcfg.nms_pre, T2 * C)
        flat_scores, flat_idx = jax.lax.top_k(cand.reshape(-1), k)
        ci = flat_idx // C
        labels = (flat_idx % C).astype(jnp.int32)
        keep_idx, keep_s, keep_v = batched_nms(
            bboxes[ci], flat_scores, labels, tcfg.nms_iou, tcfg.max_per_img)
        z = keep_v[:, None].astype(bboxes.dtype)
        return Detections(bboxes[ci][keep_idx] * z,
                          jnp.where(keep_v, keep_s, 0.0),
                          labels[keep_idx] * keep_v,
                          jnp.zeros((tcfg.max_per_img, 8), bboxes.dtype),
                          keep_v)

    return jax.vmap(single)(
        tuple(outs["cls"]), tuple(outs["pts_refine"]),
        tuple(outs["hem_score"]), tuple(outs["hem_offset"]),
        img_shapes, scale_factors)
