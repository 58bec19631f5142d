"""Losses for the inherited dense-head zoo (RetinaNet / FCOS / ATSS).

Vectorized, statically-shaped re-derivations of the reference loss paths:

* RetinaHead.loss  `/root/reference/code/mmdet/models/dense_heads/
  anchor_head.py` (MaxIoU assignment, focal + L1 on deltas)
* FCOSHead.loss    `.../fcos_head.py` (regress-range point assignment,
  focal + IoU + centerness BCE)
* ATSSHead.loss    `.../atss_head.py` (ATSS assignment, focal + GIoU
  weighted by centerness + centerness BCE)

Everything runs dense over padded GT (M slots + validity mask) and vmaps
over the batch — no per-image python loops (SURVEY §7 design stance).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.losses.common import giou_loss, iou_loss, l1_loss
from ..ops.focal_loss import sigmoid_focal_loss
from . import points as P
from .anchors import (AnchorConfig, anchor_valid_flags, bbox2delta,
                      bbox2distance, delta2bbox, distance2bbox,
                      grid_anchors)
from .assign import atss_assign, max_iou_assign

Array = jax.Array
INF = 1e8


@dataclass(frozen=True)
class DenseLossConfig:
    image_shape: Tuple[int, int]
    num_classes: int
    head: str = "retina"                # retina | fcos | atss
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    # retina
    anchor: AnchorConfig = AnchorConfig()
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    target_stds: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    # fcos
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))
    # atss
    topk: int = 9
    cls_weight: float = 1.0
    bbox_weight: float = 1.0
    centerness_weight: float = 1.0


def _flatten(maps: Sequence[Array], ch: int) -> Array:
    """[(B,H,W,C)...] -> (B, N_total, ch)."""
    return jnp.concatenate(
        [m.reshape(m.shape[0], -1, ch) for m in maps], axis=1)


def _bce_logits(pred: Array, target: Array) -> Array:
    return (jnp.maximum(pred, 0) - pred * target
            + jnp.log1p(jnp.exp(-jnp.abs(pred))))


# ------------------------------------------------------------- RetinaNet ---

def retina_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
                cfg: DenseLossConfig):
    anchors_np, counts = grid_anchors(cfg.anchor, cfg.image_shape)
    anchors = jnp.asarray(anchors_np)
    A = cfg.anchor.num_base_anchors
    C = cfg.num_classes
    cls = _flatten(outs["cls"], C).astype(jnp.float32)       # (B, N, C)
    reg = _flatten(outs["reg"], 4).astype(jnp.float32)       # (B, N, 4)

    def single(cls_i, reg_i, gt_bboxes, gt_valid, gt_labels, img_shape):
        pvalid = anchor_valid_flags(
            cfg.anchor, cfg.image_shape, img_shape)
        res = max_iou_assign(anchors, pvalid, gt_bboxes, gt_valid,
                             pos_iou_thr=cfg.pos_iou_thr,
                             neg_iou_thr=cfg.neg_iou_thr,
                             min_pos_iou=cfg.min_pos_iou)
        pos = res.gt_idx >= 0
        labels = jnp.where(pos, gt_labels[jnp.maximum(res.gt_idx, 0)], C)
        lw = (pvalid & ~res.ignore).astype(jnp.float32)
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        loss_cls = sigmoid_focal_loss(cls_i, labels, lw, reduction="mean",
                                      avg_factor=num_pos)
        target_boxes = gt_bboxes[jnp.maximum(res.gt_idx, 0)]
        # padded/unassigned rows would hit log(0) in bbox2delta; substitute
        # the anchor itself (zero delta) — they carry zero weight anyway
        safe_boxes = jnp.where(pos[:, None], target_boxes, anchors)
        deltas = bbox2delta(anchors, safe_boxes, stds=cfg.target_stds)
        bw = pos.astype(jnp.float32)[:, None]
        loss_bbox = l1_loss(reg_i, deltas, bw, reduction="mean",
                            avg_factor=num_pos)
        return loss_cls * cfg.cls_weight, loss_bbox * cfg.bbox_weight

    lc, lb = jax.vmap(single)(cls, reg, batch["gt_bboxes"],
                              batch["gt_valid"], batch["gt_labels"],
                              batch["img_shape"])
    losses = {"loss_cls": lc.mean(), "loss_bbox": lb.mean()}
    return losses["loss_cls"] + losses["loss_bbox"], losses


# ------------------------------------------------------------------ FCOS ---

def _fcos_points(cfg: DenseLossConfig) -> Tuple[Array, Array, Array]:
    """(points (N,2) with +stride/2 offset, per-point stride, per-point
    regress range (N,2))."""
    pts, strides, ranges = [], [], []
    for (h, w), s, rr in zip(P.level_shapes(cfg.image_shape, cfg.strides),
                             cfg.strides, cfg.regress_ranges):
        g = P.grid_points((h, w), s)[:, :2] + s / 2.0
        pts.append(g)
        strides.append(jnp.full((h * w,), s, jnp.float32))
        ranges.append(jnp.tile(jnp.asarray(rr, jnp.float32), (h * w, 1)))
    return (jnp.concatenate(pts), jnp.concatenate(strides),
            jnp.concatenate(ranges))


def _centerness_target(ltrb: Array, eps: float = 1e-12) -> Array:
    lr = ltrb[..., 0::2]
    tb = ltrb[..., 1::2]
    return jnp.sqrt(jnp.clip(
        (lr.min(-1) / jnp.maximum(lr.max(-1), eps))
        * (tb.min(-1) / jnp.maximum(tb.max(-1), eps)), 0.0))


def fcos_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
              cfg: DenseLossConfig):
    C = cfg.num_classes
    cls = _flatten(outs["cls"], C).astype(jnp.float32)
    reg = _flatten(outs["reg"], 4).astype(jnp.float32)     # positive l,t,r,b
    ctr = _flatten(outs["centerness"], 1)[..., 0].astype(jnp.float32)
    points, pt_stride, pt_range = _fcos_points(cfg)
    valid = jax.vmap(
        lambda ps: P.valid_flags(cfg.image_shape, cfg.strides, ps)
    )(batch["img_shape"])

    def single(cls_i, reg_i, ctr_i, pvalid, gt_bboxes, gt_valid, gt_labels):
        # (N, M) l,t,r,b of each point in each gt
        l = points[:, None, 0] - gt_bboxes[None, :, 0]
        t = points[:, None, 1] - gt_bboxes[None, :, 1]
        r = gt_bboxes[None, :, 2] - points[:, None, 0]
        b = gt_bboxes[None, :, 3] - points[:, None, 1]
        ltrb = jnp.stack([l, t, r, b], -1)                  # (N, M, 4)
        inside = ltrb.min(-1) > 0
        max_d = ltrb.max(-1)
        in_range = (max_d >= pt_range[:, None, 0]) & \
                   (max_d <= pt_range[:, None, 1])
        areas = ((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                 * (gt_bboxes[:, 3] - gt_bboxes[:, 1]))     # (M,)
        cand = inside & in_range & gt_valid[None, :]
        area_mat = jnp.where(cand, areas[None, :], INF)
        gt_idx = jnp.argmin(area_mat, axis=1)
        pos = (jnp.min(area_mat, axis=1) < INF / 2) & pvalid
        labels = jnp.where(pos, gt_labels[gt_idx], C)
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        loss_cls = sigmoid_focal_loss(
            cls_i, labels, pvalid.astype(jnp.float32), reduction="mean",
            avg_factor=num_pos)
        pos_ltrb = jnp.take_along_axis(
            ltrb, gt_idx[:, None, None], axis=1)[:, 0]       # (N, 4)
        ctr_t = _centerness_target(pos_ltrb)
        posf = pos.astype(jnp.float32)
        # IoU loss on decoded boxes, weighted by centerness target
        pred_boxes = distance2bbox(points, reg_i * pt_stride[:, None])
        gt_boxes = distance2bbox(points, jnp.clip(pos_ltrb, 0.0))
        ctr_sum = jnp.maximum(jnp.sum(ctr_t * posf), 1e-6)
        loss_bbox = iou_loss(pred_boxes, gt_boxes, ctr_t * posf,
                             reduction="mean", avg_factor=ctr_sum)
        loss_ctr = jnp.sum(_bce_logits(ctr_i, ctr_t) * posf) / num_pos
        return (loss_cls * cfg.cls_weight, loss_bbox * cfg.bbox_weight,
                loss_ctr * cfg.centerness_weight)

    lc, lb, lt = jax.vmap(single)(cls, reg, ctr, valid, batch["gt_bboxes"],
                                  batch["gt_valid"], batch["gt_labels"])
    losses = {"loss_cls": lc.mean(), "loss_bbox": lb.mean(),
              "loss_centerness": lt.mean()}
    return sum(losses.values()), losses


# ------------------------------------------------------------------ ATSS ---

def atss_anchor_cfg(cfg: DenseLossConfig) -> AnchorConfig:
    """ATSS: one anchor per cell, scale 8, square."""
    return AnchorConfig(strides=cfg.strides, ratios=(1.0,),
                        octave_base_scale=8.0, scales_per_octave=1)


def atss_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
              cfg: DenseLossConfig):
    acfg = atss_anchor_cfg(cfg)
    anchors_np, counts = grid_anchors(acfg, cfg.image_shape)
    anchors = jnp.asarray(anchors_np)
    C = cfg.num_classes
    cls = _flatten(outs["cls"], C).astype(jnp.float32)
    reg = _flatten(outs["reg"], 4).astype(jnp.float32)
    ctr = _flatten(outs["centerness"], 1)[..., 0].astype(jnp.float32)
    stds = (0.1, 0.1, 0.2, 0.2)

    def single(cls_i, reg_i, ctr_i, gt_bboxes, gt_valid, gt_labels,
               img_shape):
        pvalid = anchor_valid_flags(acfg, cfg.image_shape, img_shape)
        res = atss_assign(anchors, pvalid, counts, gt_bboxes, gt_valid,
                          topk=cfg.topk)
        pos = res.gt_idx >= 0
        posf = pos.astype(jnp.float32)
        labels = jnp.where(pos, gt_labels[jnp.maximum(res.gt_idx, 0)], C)
        num_pos = jnp.maximum(jnp.sum(posf), 1.0)
        loss_cls = sigmoid_focal_loss(cls_i, labels,
                                      pvalid.astype(jnp.float32),
                                      reduction="mean", avg_factor=num_pos)
        tgt = gt_bboxes[jnp.maximum(res.gt_idx, 0)]
        # centerness target from anchor centers inside the assigned gt
        cx = (anchors[:, 0] + anchors[:, 2]) / 2
        cy = (anchors[:, 1] + anchors[:, 3]) / 2
        ltrb = jnp.stack([cx - tgt[:, 0], cy - tgt[:, 1],
                          tgt[:, 2] - cx, tgt[:, 3] - cy], -1)
        ctr_t = _centerness_target(jnp.clip(ltrb, 0.0))
        pred_boxes = delta2bbox(anchors, reg_i, stds=stds)
        ctr_sum = jnp.maximum(jnp.sum(ctr_t * posf), 1e-6)
        loss_bbox = giou_loss(pred_boxes, tgt, ctr_t * posf,
                              reduction="mean", avg_factor=ctr_sum)
        loss_ctr = jnp.sum(_bce_logits(ctr_i, ctr_t) * posf) / num_pos
        return (loss_cls * cfg.cls_weight, loss_bbox * cfg.bbox_weight,
                loss_ctr * cfg.centerness_weight)

    lc, lb, lt = jax.vmap(single)(cls, reg, ctr, batch["gt_bboxes"],
                                  batch["gt_valid"], batch["gt_labels"],
                                  batch["img_shape"])
    losses = {"loss_cls": lc.mean(), "loss_bbox": lb.mean(),
              "loss_centerness": lt.mean()}
    return sum(losses.values()), losses


def dense_loss(outs, batch, cfg: DenseLossConfig):
    """Dispatch by head kind (the generic ``lsnet_loss`` counterpart)."""
    return {"retina": retina_loss, "fcos": fcos_loss,
            "atss": atss_loss, "gfl": gfl_loss}[cfg.head](outs, batch, cfg)


# ------------------------------------------------------------------- GFL ---

def _integral(reg_logits: Array, reg_max: int) -> Array:
    """Distribution -> expectation (reference gfl Integral module).
    reg_logits (..., 4*(reg_max+1)) -> distances (..., 4)."""
    shp = reg_logits.shape[:-1]
    p = jax.nn.softmax(reg_logits.reshape(*shp, 4, reg_max + 1), axis=-1)
    bins = jnp.arange(reg_max + 1, dtype=p.dtype)
    return jnp.sum(p * bins, axis=-1)


def _dfl(reg_logits: Array, target: Array) -> Array:
    """Distribution focal loss (reference `losses/gfocal_loss.py`
    distribution_focal_loss): cross-entropy on the two bins flanking the
    continuous target. reg_logits (..., n_bins), target (...) in bin units.
    """
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = target - tl.astype(target.dtype)
    logp = jax.nn.log_softmax(reg_logits, axis=-1)
    n_bins = reg_logits.shape[-1]
    ll = jnp.take_along_axis(logp, jnp.clip(tl, 0, n_bins - 1)[..., None],
                             axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, jnp.clip(tr, 0, n_bins - 1)[..., None],
                             axis=-1)[..., 0]
    return -(ll * wl + lr * wr)


def _qfl(cls_logits: Array, labels: Array, quality: Array, num_classes: int,
         beta: float = 2.0) -> Array:
    """Quality focal loss (reference quality_focal_loss): BCE against the
    per-positive IoU quality score, modulated by |q - sigma|^beta."""
    sig = jax.nn.sigmoid(cls_logits)
    # target map: quality at the labeled class, 0 elsewhere
    oh = jax.nn.one_hot(labels, num_classes, dtype=cls_logits.dtype)
    y = oh * quality[..., None]
    scale = jnp.abs(y - sig) ** beta
    bce = (jnp.maximum(cls_logits, 0) - cls_logits * y
           + jnp.log1p(jnp.exp(-jnp.abs(cls_logits))))
    return scale * bce


def gfl_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
             cfg: DenseLossConfig, reg_max: int = 16):
    acfg = atss_anchor_cfg(cfg)
    anchors_np, counts = grid_anchors(acfg, cfg.image_shape)
    anchors = jnp.asarray(anchors_np)
    C = cfg.num_classes
    cls = _flatten(outs["cls"], C).astype(jnp.float32)
    reg = _flatten(outs["reg"], 4 * (reg_max + 1)).astype(jnp.float32)
    centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                         (anchors[:, 1] + anchors[:, 3]) / 2], -1)
    stride_per = jnp.concatenate([
        jnp.full((n,), s, jnp.float32)
        for n, s in zip(counts, cfg.strides)])

    def single(cls_i, reg_i, gt_bboxes, gt_valid, gt_labels, img_shape):
        pvalid = anchor_valid_flags(acfg, cfg.image_shape, img_shape)
        res = atss_assign(anchors, pvalid, counts, gt_bboxes, gt_valid,
                          topk=cfg.topk)
        pos = res.gt_idx >= 0
        posf = pos.astype(jnp.float32)
        labels = jnp.where(pos, gt_labels[jnp.maximum(res.gt_idx, 0)], C)
        num_pos = jnp.maximum(jnp.sum(posf), 1.0)
        tgt = gt_bboxes[jnp.maximum(res.gt_idx, 0)]

        dists = _integral(reg_i, reg_max) * stride_per[:, None]
        pred_boxes = distance2bbox(centers, dists)
        from ..models.losses.common import bbox_overlaps_aligned
        quality = jax.lax.stop_gradient(
            bbox_overlaps_aligned(pred_boxes, tgt)) * posf

        lq = _qfl(cls_i, labels, quality, C)
        loss_cls = jnp.sum(lq * pvalid.astype(jnp.float32)[:, None]) / num_pos

        tgt_dist = jnp.clip(
            bbox2distance(centers, tgt) / stride_per[:, None],
            0.0, reg_max - 0.1)
        ldfl = _dfl(reg_i.reshape(-1, 4, reg_max + 1),
                    tgt_dist).mean(-1)                    # (N,)
        w = quality
        wsum = jnp.maximum(jnp.sum(w), 1e-6)
        loss_dfl = jnp.sum(ldfl * w) / wsum * 0.25
        loss_bbox = giou_loss(pred_boxes, tgt, w, reduction="mean",
                              avg_factor=wsum, loss_weight=2.0)
        return loss_cls * cfg.cls_weight, loss_bbox, loss_dfl

    lc, lb, ld = jax.vmap(single)(cls, reg, batch["gt_bboxes"],
                                  batch["gt_valid"], batch["gt_labels"],
                                  batch["img_shape"])
    losses = {"loss_cls": lc.mean(), "loss_bbox": lb.mean(),
              "loss_dfl": ld.mean()}
    return sum(losses.values()), losses
