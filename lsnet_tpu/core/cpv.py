"""CPV (corner point verification) training loss + decode.

Vectorized rebuilds of the reference LSCPVHead training/test logic:

* corner-heatmap targets — ``PointHMAssigner`` (`/root/reference/code/mmdet/
  core/bbox/assigners/point_hm_assigner.py:24-143`): per FPN level, the
  closest grid point to each GT TL/BR corner becomes a positive with a
  sub-stride offset target; gaussian bumps (CornerNet radius
  ``gaussian_radius`` :145-166) soften the negatives;
* the CPV loss (`lscpvnet_head.py:717-957`): focal cls + cross-IOU
  init/refine + gaussian-focal heatmaps + smooth-L1 corner offsets +
  SEP-focal semantic maps;
* test-time corner verification (`lscpvnet_head.py:1012-1092`): predicted
  corners on levels>0 snap to the 2x2 max-pool peak of the level-0/1 corner
  heatmap, then add the predicted sub-stride offset.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.heads.ls_head import extreme_points2bbox
from ..models.losses.cross_iou import cross_iou_loss
from ..ops.focal_loss import (gaussian_focal_loss, sep_focal_loss,
                              sigmoid_focal_loss)
from ..ops.nms import NEG_INF, batched_nms
from . import points as P
from .assign import atss_assign, centroid_assign
from .decode import Detections, TestConfig
from .loss import LossConfig, _flatten_levels, _per_point_stride
from .targets import build_stage_targets, encode_gt_reg, get_border_center

Array = jax.Array


def smooth_l1(pred: Array, target: Array, beta: float = 1.0 / 9.0) -> Array:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)


def gaussian_radius(h: Array, w: Array, min_overlap: float = 0.7) -> Array:
    """CornerNet radius (`point_hm_assigner.py:145-166`): min of 3 roots."""
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * c1, 0.0))) / 2

    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2 ** 2 - 16 * c2, 0.0))) / 8

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class HMTargets(NamedTuple):
    hm_tl: Array          # (N,) gaussian in [0,1], 1 at positives
    hm_br: Array
    offset_tl: Array      # (N, 2) sub-stride offsets at positives
    offset_br: Array
    hm_weight: Array      # (N,) valid-point mask (pos+neg all weighted)
    offset_tl_w: Array    # (N,) positive mask
    offset_br_w: Array
    num_pos_tl: Array
    num_pos_br: Array


def hm_targets_single(points: Array, point_valid: Array,
                      num_level_points: Sequence[int], gt_bboxes: Array,
                      gt_valid: Array, *, gaussian_iou: float = 0.7
                      ) -> HMTargets:
    """Single image corner heatmap targets (vmap over batch)."""
    N = points.shape[0]
    M = gt_bboxes.shape[0]
    xy = points[:, :2]
    stride = points[:, 2]

    tl = gt_bboxes[:, 0:2]
    br = gt_bboxes[:, 2:4]
    w = gt_bboxes[:, 2] - gt_bboxes[:, 0]
    h = gt_bboxes[:, 3] - gt_bboxes[:, 1]
    radius = gaussian_radius(h, w, gaussian_iou)
    sigma = (2 * radius + 1) / 6.0

    def corner_targets(corner_xy: Array) -> Tuple[Array, Array, Array, Array]:
        d = jnp.linalg.norm(xy[:, None, :] - corner_xy[None, :, :], axis=2)
        d = jnp.where(point_valid[:, None] & gt_valid[None, :], d, 1e8)
        hm = jnp.zeros((N,), jnp.float32)
        offset = jnp.zeros((N, 2), jnp.float32)
        pos_mask = jnp.zeros((N,), bool)
        start = 0
        for n_l in num_level_points:
            d_l = jax.lax.dynamic_slice_in_dim(d, start, n_l, axis=0)
            # gaussian bump (per level, shared radius across levels as in ref)
            g = jnp.exp(-(d_l ** 2) / (2 * sigma[None, :] ** 2))
            g = jnp.where((d_l < radius[None, :]) & gt_valid[None, :], g, 0.0)
            g_max = jnp.max(g, axis=1)
            hm = jax.lax.dynamic_update_slice(
                hm, jnp.maximum(
                    jax.lax.dynamic_slice_in_dim(hm, start, n_l), g_max),
                (start,))
            # closest point per GT at this level
            min_idx = jnp.argmin(d_l, axis=0) + start          # (M,)
            lvl_stride = stride[start]
            off_val = (corner_xy - xy[min_idx]) / lvl_stride   # (M, 2)
            offset = offset.at[min_idx].set(
                jnp.where(gt_valid[:, None], off_val, offset[min_idx]))
            hm = hm.at[min_idx].set(
                jnp.where(gt_valid, 1.0, hm[min_idx]))
            pos_mask = pos_mask.at[min_idx].set(
                gt_valid | pos_mask[min_idx])
            start += n_l
        return hm, offset, pos_mask

    hm_tl, off_tl, pos_tl = corner_targets(tl)
    hm_br, off_br, pos_br = corner_targets(br)
    hm_w = point_valid.astype(jnp.float32)
    return HMTargets(
        hm_tl, hm_br, off_tl, off_br, hm_w,
        pos_tl.astype(jnp.float32), pos_br.astype(jnp.float32),
        jnp.maximum(pos_tl.sum(), 1.0), jnp.maximum(pos_br.sum(), 1.0))


@dataclass(frozen=True)
class CPVLossConfig:
    base: LossConfig
    heatmap_loss_weight: float = 0.25
    offset_loss_weight: float = 1.0
    sem_loss_weight: float = 0.1
    gaussian_iou: float = 0.7
    offset_beta: float = 1.0 / 9.0


def lscpv_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
               ccfg: CPVLossConfig) -> Tuple[Array, Dict[str, Array]]:
    cfg = ccfg.base
    points = P.multi_level_points(cfg.image_shape, cfg.point_strides)
    stride = _per_point_stride(cfg)
    nlp = P.num_level_points(cfg.image_shape, cfg.point_strides)
    valid = jax.vmap(lambda ps: P.valid_flags(
        cfg.image_shape, cfg.point_strides, ps))(batch["pad_shape"])

    gt_bboxes = batch["gt_bboxes"]
    gt_labels = batch["gt_labels"]
    gt_valid = batch["gt_valid"]
    lm_src = batch.get("gt_extremes")
    if lm_src is None:
        lm_src = get_border_center(gt_bboxes)

    losses: Dict[str, Array] = {}

    init_assign = jax.vmap(
        lambda pv, gb, gv, lm: centroid_assign(
            points, pv, gb, gv, gt_extremes=lm, scale=cfg.init_scale,
            pos_num=cfg.init_pos_num, iou_type=cfg.init_iou_type)
    )(valid, gt_bboxes, gt_valid, lm_src)

    def make_targets(gt_idx):
        return jax.vmap(
            lambda gi, pv, gb, gl, gv, lm: build_stage_targets(
                gi, pv, gb, gl, gv, lm, cfg.num_classes, None)
        )(gt_idx, valid, gt_bboxes, gt_labels, gt_valid, lm_src)

    init_t = make_targets(init_assign.gt_idx)
    num_pos_init = jnp.sum(init_t.num_pos)

    init_flat = _flatten_levels(outs["bbox_init"])
    sp = jax.lax.stop_gradient(init_flat)
    _, bbox = extreme_points2bbox(sp)
    decoded = (jnp.concatenate([points[:, :2], points[:, :2]], -1)[None]
               + bbox * stride[None, :, None])
    refine_assign = jax.vmap(
        lambda bb, pv, gb, gv: atss_assign(bb, pv, nlp, gb, gv,
                                           topk=cfg.refine_topk)
    )(decoded, valid, gt_bboxes, gt_valid)
    refine_t = make_targets(refine_assign.gt_idx)
    num_pos_refine = jnp.sum(refine_t.num_pos)

    cls_flat = _flatten_levels(outs["cls"])
    B, N, C = cls_flat.shape
    losses["loss_cls"] = sigmoid_focal_loss(
        cls_flat.reshape(B * N, C), refine_t.labels.reshape(B * N),
        refine_t.label_weights.reshape(B * N), gamma=cfg.focal_gamma,
        alpha=cfg.focal_alpha, avg_factor=num_pos_refine
    ) * cfg.cls_loss_weight

    from .loss import _landmark_loss
    refine_flat = _flatten_levels(outs["bbox_refine"])
    losses["loss_bbox_init"] = _landmark_loss(
        init_flat, init_t.lm_gt, init_t.bbox_weights, points, stride,
        init_t.bboxes_gt, num_pos_init, cfg, "bbox", cfg.init_loss_weight)
    losses["loss_bbox_refine"] = _landmark_loss(
        refine_flat, refine_t.lm_gt, refine_t.bbox_weights, points, stride,
        refine_t.bboxes_gt, num_pos_refine, cfg, "bbox",
        cfg.refine_loss_weight)

    losses.update(cpv_aux_losses(
        outs, batch, points, nlp, valid, cfg.image_shape, cfg.num_classes,
        gaussian_iou=ccfg.gaussian_iou,
        heatmap_loss_weight=ccfg.heatmap_loss_weight,
        offset_beta=ccfg.offset_beta,
        offset_loss_weight=ccfg.offset_loss_weight,
        sem_loss_weight=ccfg.sem_loss_weight))

    total = sum(losses.values())
    return total, losses


def cpv_aux_losses(outs, batch, points, nlp, valid, image_shape,
                   num_classes, *, gaussian_iou=0.7,
                   heatmap_loss_weight=0.25, offset_beta=1.0 / 9.0,
                   offset_loss_weight=1.0, sem_loss_weight=0.1):
    """Corner heatmap + offset + semantic-map losses — shared by LSCPV
    (`lscpvnet_head.py:605-947`) and RepPointsV2 (same verification
    module, `reppoints_v2_head.py`)."""
    gt_bboxes = batch["gt_bboxes"]
    gt_labels = batch["gt_labels"]
    gt_valid = batch["gt_valid"]
    losses: Dict[str, Array] = {}
    hmt = jax.vmap(
        lambda pv, gb, gv: hm_targets_single(
            points, pv, nlp, gb, gv, gaussian_iou=gaussian_iou)
    )(valid, gt_bboxes, gt_valid)
    hm_flat = _flatten_levels(outs["hem_score"])          # (B, N, 2)
    off_flat = _flatten_levels(outs["hem_offset"])        # (B, N, 4)
    n_tl = jnp.sum(hmt.num_pos_tl)
    n_br = jnp.sum(hmt.num_pos_br)
    hm_tl_pred = jax.nn.sigmoid(hm_flat[..., 0])
    hm_br_pred = jax.nn.sigmoid(hm_flat[..., 1])
    loss_hm = (gaussian_focal_loss(hm_tl_pred, hmt.hm_tl,
                                   hmt.hm_weight, avg_factor=n_tl)
               + gaussian_focal_loss(hm_br_pred, hmt.hm_br,
                                     hmt.hm_weight, avg_factor=n_br)) / 2.0
    losses["loss_heatmap"] = loss_hm * heatmap_loss_weight

    l_tl = smooth_l1(off_flat[..., 0:2], hmt.offset_tl, offset_beta)
    l_br = smooth_l1(off_flat[..., 2:4], hmt.offset_br, offset_beta)
    loss_off = ((l_tl * hmt.offset_tl_w[..., None]).sum() / n_tl
                + (l_br * hmt.offset_br_w[..., None]).sum() / n_br) / 2.0
    losses["loss_offset"] = loss_off * offset_loss_weight

    # ---- semantic map loss (`lscpvnet_head.py:927-947`) ----
    if "gt_sem_map" in batch:
        sem_map = batch["gt_sem_map"]      # (B, H/8, W/8, C)
        sem_w = batch["gt_sem_weights"]
    else:
        sem_map, sem_w = make_sem_targets(
            gt_bboxes, gt_labels, gt_valid, image_shape, num_classes)
    sem_terms = []
    for lvl_score in outs["sem_score"]:
        h, w = lvl_score.shape[1:3]
        gm = _nearest_resize(sem_map, (h, w))
        gw = _nearest_resize(sem_w, (h, w))
        sem_terms.append((lvl_score.reshape(-1), gm.reshape(-1),
                          gw.reshape(-1)))
    scores_c = jnp.concatenate([t[0] for t in sem_terms])
    maps_c = jnp.concatenate([t[1] for t in sem_terms])
    w_c = jnp.concatenate([t[2] for t in sem_terms])
    avg = jnp.maximum((maps_c > 0).sum(), 1)
    losses["loss_sem"] = sep_focal_loss(
        scores_c[:, None], maps_c[:, None], w_c, avg_factor=avg
    ) * sem_loss_weight
    return losses


def _nearest_resize(x: Array, hw: Tuple[int, int]) -> Array:
    """Nearest-neighbour resize on (B, H, W, C) (torch F.interpolate
    default used by the reference)."""
    B, H, W, C = x.shape
    th, tw = hw
    ridx = (jnp.arange(th) * H) // th
    cidx = (jnp.arange(tw) * W) // tw
    return x[:, ridx][:, :, cidx]


def make_sem_targets(gt_bboxes, gt_labels, gt_valid, image_shape,
                     num_classes: int):
    """gt_sem_map / gt_sem_weights at stride 8
    (`loading_reppointsv2.py:31-50`), vectorized for padded GT."""
    H8, W8 = image_shape[0] // 8, image_shape[1] // 8

    def single(boxes, labels, valid):
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        ys = jnp.arange(H8, dtype=jnp.float32)[:, None]
        xs = jnp.arange(W8, dtype=jnp.float32)[None, :]
        sem = jnp.zeros((H8, W8, num_classes), jnp.float32)
        wts = jnp.zeros((H8, W8, num_classes), jnp.float32)
        order = jnp.argsort(-jnp.where(valid, area, -1.0))
        M = boxes.shape[0]

        def body(i, carry):
            sem, wts = carry
            gi = order[i]
            b = boxes[gi]
            inside = ((ys >= jnp.floor(b[1] / 8)) &
                      (ys <= jnp.floor(b[3] / 8)) &
                      (xs >= jnp.floor(b[0] / 8)) &
                      (xs <= jnp.floor(b[2] / 8)) & valid[gi])
            onehot = jax.nn.one_hot(labels[gi], num_classes)
            sem = jnp.maximum(sem, inside[..., None] * onehot)
            w_new = inside[..., None] * onehot / jnp.maximum(area[gi], 1.0)
            wts = jnp.where(w_new > 0, w_new, wts)
            return sem, wts

        sem, wts = jax.lax.fori_loop(0, M, body, (sem, wts))
        return sem, wts

    return jax.vmap(single)(gt_bboxes, gt_labels, gt_valid)


def lscpv_decode(outs: Dict[str, Sequence[Array]], img_shapes: Array,
                 scale_factors: Array, cfg: TestConfig,
                 rescale: bool = True) -> Detections:
    """CPV decode with corner verification (`lscpvnet_head.py:1012-1092`)."""
    cls_maps = outs["cls"]
    lm_maps = outs["bbox_refine"]
    hm_maps = outs["hem_score"]
    off_maps = outs["hem_offset"]
    num_levels = len(cls_maps)
    shapes = P.level_shapes(cfg.image_shape, cfg.point_strides)

    def snap(hm: Array, off: Array, x: Array, y: Array, lvl_i: int,
             corner: str):
        """2x2 maxpool-indices corner snap on heatmap level ``lvl_i``."""
        H, W = hm.shape[:2]
        s = cfg.point_strides[lvl_i]
        prob = jax.nn.sigmoid(hm)
        # window max over 2x2 (stride 1, no pad): window (H-1, W-1)
        w00 = prob[:-1, :-1]
        w01 = prob[:-1, 1:]
        w10 = prob[1:, :-1]
        w11 = prob[1:, 1:]
        stack = jnp.stack([w00, w01, w10, w11], axis=-1)
        arg = jnp.argmax(stack, axis=-1)                  # (H-1, W-1)
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

    def single(cls_list, lm_list, hm_list, off_list, img_shape, sf):
        mlvl_scores = []
        mlvl_bboxes = []
        mlvl_exts = []
        for lvl in range(num_levels):
            h, w = shapes[lvl]
            s = cfg.point_strides[lvl]
            scores = jax.nn.sigmoid(
                cls_list[lvl].reshape(-1, cfg.num_classes))
            lm = lm_list[lvl].reshape(-1, 20)
            pts = P.grid_points((h, w), s)
            k = min(cfg.nms_pre, scores.shape[0])
            _, topk = jax.lax.top_k(scores.max(axis=1), k)
            scores = scores[topk]
            lm = lm[topk]
            xy = pts[topk, :2]
            ext, bbox = extreme_points2bbox(lm)
            # extreme-point vectors ride through CPV results, like the
            # reference LSCPV get_bboxes tail (`lscpvnet_head.py:1012-1092`)
            ext = ext * s + jnp.tile(xy, (1, 4))
            ext = ext.at[:, 0::2].set(jnp.clip(ext[:, 0::2], 0, img_shape[1]))
            ext = ext.at[:, 1::2].set(jnp.clip(ext[:, 1::2], 0, img_shape[0]))
            mlvl_exts.append(ext)
            bbox = bbox * s + jnp.concatenate([xy, xy], -1)
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
        exts = jnp.concatenate(mlvl_exts)
        if rescale:
            bboxes = bboxes / sf[None, :]
            exts = exts / jnp.tile(sf[:2], 4)[None, :]
        T, C = scores.shape
        cand_scores = jnp.where(scores > cfg.score_thr, scores, NEG_INF)
        k = min(cfg.nms_pre, T * C)
        flat_scores, flat_idx = jax.lax.top_k(cand_scores.reshape(-1), k)
        cand = flat_idx // C
        labels = (flat_idx % C).astype(jnp.int32)
        nms_boxes = bboxes[cand]
        keep_idx, keep_scores, keep_valid = batched_nms(
            nms_boxes, flat_scores, labels, cfg.nms_iou, cfg.max_per_img)
        z = keep_valid[:, None].astype(bboxes.dtype)
        keep_ext = exts[cand][keep_idx] * z
        return Detections(
            nms_boxes[keep_idx] * z,
            jnp.where(keep_valid, keep_scores, 0.0),
            labels[keep_idx] * keep_valid,
            keep_ext,
            keep_valid)

    cls_flats = [m for m in cls_maps]
    return jax.vmap(single)(
        tuple(cls_flats), tuple(lm_maps), tuple(hm_maps), tuple(off_maps),
        img_shapes, scale_factors)
