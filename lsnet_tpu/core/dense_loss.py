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

import functools
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
    # ssd (reference configs/_base_/models/ssd300.py)
    ssd_input_size: int = 300
    ssd_ratios: Tuple[Tuple[float, ...], ...] = (
        (2.0,), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0), (2.0,), (2.0,))
    ssd_basesize_ratio_range: Tuple[float, float] = (0.15, 0.9)
    ssd_neg_pos_ratio: int = 3
    ssd_smoothl1_beta: float = 1.0
    ssd_stds: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    # fovea (reference fovea defaults: alpha .4 / gamma 1.5, bbox w .75)
    fovea_base_edges: Tuple[float, ...] = (16, 32, 64, 128, 256)
    fovea_scale_ranges: Tuple[Tuple[float, float], ...] = (
        (8, 32), (16, 64), (32, 128), (64, 256), (128, 512))
    fovea_sigma: float = 0.4
    fovea_alpha: float = 0.4
    fovea_gamma: float = 1.5
    fovea_bbox_weight: float = 0.75
    # fsaf (CenterRegionAssigner + TBLR coder, reference fsaf config)
    fsaf_pos_scale: float = 0.2
    fsaf_normalizer: float = 4.0


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
            "atss": atss_loss, "gfl": gfl_loss, "ssd": ssd_loss,
            "fovea": fovea_loss, "fsaf": fsaf_loss,
            "free_anchor": free_anchor_loss,
            "pisa_retina": pisa_retina_loss, "pisa_ssd": pisa_ssd_loss,
            "ga_retina": ga_retina_loss,
            "ga_rpn": ga_rpn_loss}[cfg.head](outs, batch, cfg)


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


# ------------------------------------------------------------------- SSD ---

def _ssd_anchors(cfg: DenseLossConfig):
    from .anchors import ssd_grid_anchors
    return ssd_grid_anchors(cfg.image_shape, cfg.strides, cfg.ssd_ratios,
                            cfg.ssd_basesize_ratio_range, cfg.ssd_input_size)


def _ssd_flatten(maps: Sequence[Array], num_base, ch: int) -> Array:
    """Per-level (B,H,W,A_l*ch) -> (B, sum(H*W*A_l), ch)."""
    flats = []
    for m, A in zip(maps, num_base):
        B, H, W, _ = m.shape
        flats.append(m.reshape(B, H * W * A, ch))
    return jnp.concatenate(flats, axis=1)


def ssd_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
             cfg: DenseLossConfig):
    """SSD multibox loss (reference `ssd_head.py:128-244`): MaxIoU
    assignment (pos=neg=0.5, per-GT best anchor forced), softmax CE with
    3:1 online hard-negative mining, SmoothL1 on deltas."""
    anchors_np, counts, num_base = _ssd_anchors(cfg)
    anchors = jnp.asarray(anchors_np)
    C = cfg.num_classes
    cls = _ssd_flatten(outs["cls"], num_base, C + 1).astype(jnp.float32)
    reg = _ssd_flatten(outs["reg"], num_base, 4).astype(jnp.float32)
    N = anchors.shape[0]

    def single(cls_i, reg_i, gt_bboxes, gt_valid, gt_labels, img_shape):
        res = max_iou_assign(anchors, jnp.ones((N,), bool), gt_bboxes,
                             gt_valid, pos_iou_thr=0.5, neg_iou_thr=0.5,
                             min_pos_iou=0.0, gt_max_assign_all=False)
        pos = res.gt_idx >= 0
        posf = pos.astype(jnp.float32)
        labels = jnp.where(pos, gt_labels[jnp.maximum(res.gt_idx, 0)], C)
        logp = jax.nn.log_softmax(cls_i, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        num_pos = jnp.sum(posf)
        # online hard negative mining: top (3 * num_pos) negative CE
        neg = ~pos & ~res.ignore
        n_neg = jnp.minimum(cfg.ssd_neg_pos_ratio * num_pos,
                            jnp.sum(neg.astype(jnp.float32)))
        neg_ce = jnp.where(neg, ce, -jnp.inf)
        sorted_ce = jax.lax.top_k(neg_ce, N)[0]
        kth = sorted_ce[jnp.clip(n_neg.astype(jnp.int32) - 1, 0, N - 1)]
        neg_sel = neg & (ce >= kth) & (n_neg > 0)
        loss_cls = (jnp.sum(ce * posf)
                    + jnp.sum(ce * neg_sel.astype(jnp.float32)))
        tgt = gt_bboxes[jnp.maximum(res.gt_idx, 0)]
        # padded rows would hit log(0) in bbox2delta -> inf*0 = NaN;
        # substitute the anchor itself (zero delta, zero weight)
        safe_tgt = jnp.where(pos[:, None], tgt, anchors)
        d = bbox2delta(anchors, safe_tgt, stds=cfg.ssd_stds)
        diff = jnp.abs(reg_i - d)
        b = cfg.ssd_smoothl1_beta
        sl1 = jnp.where(diff < b, 0.5 * diff * diff / b,
                        diff - 0.5 * b).sum(-1)
        loss_bbox = jnp.sum(sl1 * posf)
        return loss_cls, loss_bbox, num_pos

    lc, lb, np_ = jax.vmap(single)(cls, reg, batch["gt_bboxes"],
                                   batch["gt_valid"], batch["gt_labels"],
                                   batch["img_shape"])
    denom = jnp.maximum(jnp.sum(np_), 1.0)
    losses = {"loss_cls": jnp.sum(lc) / denom * cfg.cls_weight,
              "loss_bbox": jnp.sum(lb) / denom * cfg.bbox_weight}
    return sum(losses.values()), losses


# ------------------------------------------------------------- FoveaBox ---

def _fovea_targets(cfg: DenseLossConfig, gt_bboxes, gt_valid, gt_labels):
    """Per-point labels + log-space (l,t,r,b)/base targets for one image.

    Vectorized `_get_target_single` (reference fovea_head.py:200-260):
    smallest-area GT wins where fovea regions overlap."""
    C = cfg.num_classes
    areas = jnp.sqrt(jnp.clip(
        (gt_bboxes[:, 2] - gt_bboxes[:, 0])
        * (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 0.0))
    labels_all, targets_all = [], []
    H, W = cfg.image_shape
    for base, (lo, up), s in zip(cfg.fovea_base_edges,
                                 cfg.fovea_scale_ranges, cfg.strides):
        h, w = -(-H // s), -(-W // s)
        gx = jnp.arange(w, dtype=jnp.float32)
        gy = jnp.arange(h, dtype=jnp.float32)
        hit = (areas >= lo) & (areas <= up) & gt_valid          # (M,)
        gb = gt_bboxes / s
        half_w = 0.5 * (gb[:, 2] - gb[:, 0])
        half_h = 0.5 * (gb[:, 3] - gb[:, 1])
        x1 = jnp.clip(jnp.ceil(gb[:, 0] + (1 - cfg.fovea_sigma) * half_w
                               - 0.5), 0, w - 1)
        x2 = jnp.clip(jnp.floor(gb[:, 0] + (1 + cfg.fovea_sigma) * half_w
                                - 0.5), 0, w - 1)
        y1 = jnp.clip(jnp.ceil(gb[:, 1] + (1 - cfg.fovea_sigma) * half_h
                               - 0.5), 0, h - 1)
        y2 = jnp.clip(jnp.floor(gb[:, 1] + (1 + cfg.fovea_sigma) * half_h
                                - 0.5), 0, h - 1)
        in_x = (gx[:, None] >= x1[None, :]) & (gx[:, None] <= x2[None, :])
        in_y = (gy[:, None] >= y1[None, :]) & (gy[:, None] <= y2[None, :])
        inside = (in_y[:, None, :] & in_x[None, :, :]) & hit[None, None, :]
        # smallest-area GT wins (reference applies largest first, smaller
        # overwrite)
        rank = jnp.where(inside, areas[None, None, :], INF)
        gi = jnp.argmin(rank, axis=-1)                           # (h, w)
        any_hit = jnp.any(inside, axis=-1)
        labels = jnp.where(any_hit, gt_labels[gi], C).reshape(-1)
        gsel = gt_bboxes[gi.reshape(-1)]                          # (hw, 4)
        px = jnp.tile(gx, h) * s
        py = jnp.repeat(gy, w) * s
        t = jnp.stack([px - gsel[:, 0], py - gsel[:, 1],
                       gsel[:, 2] - px, gsel[:, 3] - py], -1) / base
        t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
        targets_all.append(jnp.where(any_hit.reshape(-1, 1), t, 0.0))
        labels_all.append(labels)
    return jnp.concatenate(labels_all), jnp.concatenate(targets_all)


def fovea_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
               cfg: DenseLossConfig):
    C = cfg.num_classes
    cls = _flatten(outs["cls"], C).astype(jnp.float32)
    reg = _flatten(outs["reg"], 4).astype(jnp.float32)
    B = cls.shape[0]

    def single(cls_i, reg_i, gt_bboxes, gt_valid, gt_labels):
        labels, tgts = _fovea_targets(cfg, gt_bboxes, gt_valid, gt_labels)
        pos = labels < C
        posf = pos.astype(jnp.float32)
        num_pos = jnp.sum(posf)
        lc = sigmoid_focal_loss(cls_i, labels, gamma=cfg.fovea_gamma,
                                alpha=cfg.fovea_alpha, reduction="sum")
        b = 0.11
        diff = jnp.abs(reg_i - tgts)
        sl1 = jnp.where(diff < b, 0.5 * diff * diff / b,
                        diff - 0.5 * b).mean(-1)
        lb = jnp.sum(sl1 * posf)
        return lc, lb, num_pos

    lc, lb, np_ = jax.vmap(single)(cls, reg, batch["gt_bboxes"],
                                   batch["gt_valid"], batch["gt_labels"])
    num_pos = jnp.sum(np_)
    losses = {
        "loss_cls": jnp.sum(lc) / (num_pos + B) * cfg.cls_weight,
        "loss_bbox": (jnp.sum(lb) / jnp.maximum(num_pos, 1.0)
                      * cfg.fovea_bbox_weight),
    }
    return sum(losses.values()), losses


# ----------------------------------------------------------------- FSAF ---

def _fsaf_assign(cfg: DenseLossConfig, gt_bboxes, gt_valid):
    """CenterRegionAssigner over all levels: per level, points inside the
    pos_scale-shrunk GT are positive (smallest-area GT wins).

    Returns (gt_idx (N,) int32 -1=bg, level_of_point (N,) int32)."""
    H, W = cfg.image_shape
    areas = jnp.clip((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                     * (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 0.0)
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    hw = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * cfg.fsaf_pos_scale / 2
    hh = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) * cfg.fsaf_pos_scale / 2
    gt_idx_all, lvl_all = [], []
    for li, s in enumerate(cfg.strides):
        h, w = -(-H // s), -(-W // s)
        # anchor centers: center_offset=0 in the reference fsaf anchor
        # generator -> centers at x*stride exactly
        px = jnp.tile(jnp.arange(w, dtype=jnp.float32), h) * s
        py = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w) * s
        inside = ((px[:, None] >= cx - hw) & (px[:, None] <= cx + hw)
                  & (py[:, None] >= cy - hh) & (py[:, None] <= cy + hh)
                  & gt_valid[None, :])
        rank = jnp.where(inside, areas[None, :], INF)
        gi = jnp.argmin(rank, axis=-1)
        gt_idx = jnp.where(jnp.any(inside, -1), gi, -1).astype(jnp.int32)
        gt_idx_all.append(gt_idx)
        lvl_all.append(jnp.full((h * w,), li, jnp.int32))
    return jnp.concatenate(gt_idx_all), jnp.concatenate(lvl_all)


def fsaf_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
              cfg: DenseLossConfig):
    """FSAF loss (reference `fsaf_head.py:161-288`): center-region
    assignment, focal cls + IoU loss on the TBLR decode, and ONLINE level
    selection — each GT keeps only its min-loss pyramid level."""
    C = cfg.num_classes
    L = len(cfg.strides)
    M = batch["gt_bboxes"].shape[1]
    cls = _flatten(outs["cls"], C).astype(jnp.float32)
    reg = _flatten(outs["reg"], 4).astype(jnp.float32)
    pts = P.multi_level_points(cfg.image_shape, cfg.strides)
    # anchor centers: reference FSAF anchors have center_offset 0 -> the
    # grid point itself; TBLR normalizer scales by stride
    px = pts[:, 0]
    py = pts[:, 1]
    stride = pts[:, 2]

    def single(cls_i, reg_i, gt_bboxes, gt_valid, gt_labels):
        gt_idx, lvl = _fsaf_assign(cfg, gt_bboxes, gt_valid)
        pos = gt_idx >= 0
        posf = pos.astype(jnp.float32)
        tgt = gt_bboxes[jnp.maximum(gt_idx, 0)]
        norm = cfg.fsaf_normalizer * stride
        # decode TBLR preds -> boxes (reference tblr2bboxes)
        t, b_, l, r = [reg_i[:, i] * norm for i in range(4)]
        boxes = jnp.stack([px - l, py - t, px + r, py + b_], -1)
        il = iou_loss(boxes, tgt, posf, reduction="none")
        lc_map = sigmoid_focal_loss(
            cls_i, jnp.where(pos, gt_labels[jnp.maximum(gt_idx, 0)], C),
            reduction="none").sum(-1)
        # online level selection: per (gt, level) mean pos loss; keep argmin
        comb = lc_map + il
        oh_gt = jax.nn.one_hot(jnp.where(pos, gt_idx, M), M + 1,
                               dtype=jnp.float32)[:, :M]          # (N, M)
        oh_lvl = jax.nn.one_hot(lvl, L, dtype=jnp.float32)        # (N, L)
        sel = oh_gt[:, :, None] * oh_lvl[:, None, :]              # (N, M, L)
        sums = jnp.einsum("n,nml->ml", comb, sel)
        cnts = jnp.einsum("nml->ml", sel)
        means = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0), INF)
        best_lvl = jnp.argmin(means, axis=-1)                     # (M,)
        keep = (lvl == best_lvl[jnp.maximum(gt_idx, 0)]) & pos
        keepf = keep.astype(jnp.float32)
        num_pos = jnp.maximum(jnp.sum(keepf), 1.0)
        # background everywhere except kept positives
        labels = jnp.where(keep, gt_labels[jnp.maximum(gt_idx, 0)], C)
        # positives dropped by level selection are ignored, not background
        lw = jnp.where(pos & ~keep, 0.0, 1.0)
        loss_cls = sigmoid_focal_loss(cls_i, labels, lw,
                                      avg_factor=num_pos)
        loss_bbox = jnp.sum(il * keepf) / num_pos
        return loss_cls, loss_bbox

    lc, lb = jax.vmap(single)(cls, reg, batch["gt_bboxes"],
                              batch["gt_valid"], batch["gt_labels"])
    losses = {"loss_cls": lc.mean() * cfg.cls_weight,
              "loss_bbox": lb.mean() * cfg.bbox_weight}
    return sum(losses.values()), losses


# ----------------------------------------------------------- FreeAnchor ---

def free_anchor_loss(outs: Dict[str, Sequence[Array]],
                     batch: Dict[str, Array], cfg: DenseLossConfig,
                     pre_anchor_topk: int = 50, bbox_thr: float = 0.6,
                     gamma: float = 2.0, alpha: float = 0.5,
                     smooth_beta: float = 0.11, bbox_w: float = 0.75):
    """FreeAnchor learning-to-match loss (reference
    `free_anchor_retina_head.py:51-265`): per-GT top-k anchor bags with
    mean-max positive likelihood, saturated-IoU anchor->object probability
    and a focal negative bag term. Vectorized over padded GT; the
    per-class anchor probability uses a scatter-max over GT labels instead
    of the reference's sparse-tensor dance."""
    anchors_np, _ = grid_anchors(cfg.anchor, cfg.image_shape)
    anchors = jnp.asarray(anchors_np)
    C = cfg.num_classes
    cls = _flatten(outs["cls"], C).astype(jnp.float32)
    reg = _flatten(outs["reg"], 4).astype(jnp.float32)
    from .assign import box_iou

    def single(cls_i, reg_i, gt_bboxes, gt_valid, gt_labels):
        cls_prob = jax.nn.sigmoid(cls_i)                     # (N, C)
        gvf = gt_valid.astype(jnp.float32)
        # anchor -> object probability (no grad, ref torch.no_grad block)
        pred_boxes = jax.lax.stop_gradient(
            delta2bbox(anchors, reg_i, stds=cfg.target_stds))
        iou_gp = box_iou(gt_bboxes, pred_boxes) * gvf[:, None]   # (M, N)
        t2 = jnp.clip(iou_gp.max(axis=1, keepdims=True), bbox_thr + 1e-12)
        obp = jnp.clip((iou_gp - bbox_thr) / (t2 - bbox_thr), 0.0, 1.0)
        obp = obp * gvf[:, None]
        # per-class max over same-label gts: scatter-max into (C+1, N)
        ibp = jnp.zeros((C + 1, obp.shape[1]), obp.dtype).at[
            jnp.where(gt_valid, gt_labels, C)].max(obp)[:C].T    # (N, C)

        # bags: top-k anchors per gt by ANCHOR IoU
        iou_ga = box_iou(gt_bboxes, anchors) * gvf[:, None]
        _, matched = jax.lax.top_k(iou_ga, pre_anchor_topk)      # (M, K)
        m_cls = jnp.take_along_axis(
            cls_prob[matched],                                   # (M, K, C)
            jnp.clip(gt_labels, 0, C - 1)[:, None, None], axis=2)[..., 0]
        m_anchors = anchors[matched]                             # (M, K, 4)
        # padded zero-size gts would put log(0)=-inf into the deltas and
        # NaN the smooth-l1 branch gradients (where-trap); substitute the
        # anchor itself (zero delta) — those bags carry zero weight
        safe_gt = jnp.where(gt_valid[:, None], gt_bboxes,
                            jnp.asarray([0.0, 0.0, 1.0, 1.0]))
        tgt = bbox2delta(m_anchors.reshape(-1, 4),
                         jnp.repeat(safe_gt, pre_anchor_topk, axis=0),
                         stds=cfg.target_stds).reshape(m_anchors.shape)
        d = jnp.abs(reg_i[matched] - tgt)
        sl1 = jnp.where(d < smooth_beta, 0.5 * d * d / smooth_beta,
                        d - 0.5 * smooth_beta).sum(-1) * bbox_w  # (M, K)
        m_prob = m_cls * jnp.exp(-sl1)
        w = 1.0 / jnp.clip(1.0 - m_prob, 1e-12)
        w = w / w.sum(axis=1, keepdims=True)
        bag_prob = jnp.clip((w * m_prob).sum(axis=1), 1e-12, 1.0)
        pos = alpha * (-jnp.log(bag_prob)) * gvf                 # (M,)
        n_pos = jnp.sum(gvf)

        nprob = jnp.clip(cls_prob * (1.0 - ibp), 0.0, 1.0 - 1e-12)
        neg = (1 - alpha) * (nprob ** gamma) * (-jnp.log1p(-nprob))
        return pos.sum(), neg.sum(), n_pos

    lp, ln, np_ = jax.vmap(single)(cls, reg, batch["gt_bboxes"],
                                   batch["gt_valid"], batch["gt_labels"])
    num_pos = jnp.maximum(jnp.sum(np_), 1.0)
    losses = {
        "positive_bag_loss": jnp.sum(lp) / num_pos,
        "negative_bag_loss": jnp.sum(ln) / (num_pos * pre_anchor_topk),
    }
    return sum(losses.values()), losses


# ---------------------------------------------------------------- PISA ---

def _rank_in_groups(keys: Array, groups: Array, valid: Array) -> Array:
    """Descending rank of ``keys`` within each group (vectorized IoU-HLR
    building block, reference `losses/pisa_loss.py:83-96`): rank 0 = best.
    Invalid rows get rank 0 within a dump group."""
    N = keys.shape[0]
    g = jnp.where(valid, groups, jnp.int32(2 ** 30))
    # lexicographic (group asc, key desc) via a combined sort key
    order = jnp.lexsort((-keys, g))
    sorted_g = g[order]
    idx = jnp.arange(N)
    first = jnp.where(
        jnp.concatenate([jnp.ones((1,), bool),
                         sorted_g[1:] != sorted_g[:-1]]), idx, -1)
    seg_start = jax.lax.associative_scan(jnp.maximum, first)
    rank_sorted = idx - seg_start
    ranks = jnp.zeros((N,), jnp.int32).at[order].set(
        rank_sorted.astype(jnp.int32))
    return ranks


def pisa_retina_loss(outs: Dict[str, Sequence[Array]],
                     batch: Dict[str, Array], cfg: DenseLossConfig,
                     isr_k: float = 2.0, isr_bias: float = 0.0,
                     carl_k: float = 1.0, carl_bias: float = 0.2,
                     carl_weight: float = 5.0):
    """PISA RetinaNet (reference `pisa_retinanet_head.py` +
    `losses/pisa_loss.py`): retina assignment with ISR-P importance
    reweighting of positive cls loss (IoU-HLR) and the CARL
    classification-aware regression term."""
    anchors_np, counts = grid_anchors(cfg.anchor, cfg.image_shape)
    anchors = jnp.asarray(anchors_np)
    C = cfg.num_classes
    cls = _flatten(outs["cls"], C).astype(jnp.float32)
    reg = _flatten(outs["reg"], 4).astype(jnp.float32)

    def single(cls_i, reg_i, gt_bboxes, gt_valid, gt_labels, img_shape):
        pvalid = anchor_valid_flags(cfg.anchor, cfg.image_shape, img_shape)
        res = max_iou_assign(anchors, pvalid, gt_bboxes, gt_valid,
                             pos_iou_thr=cfg.pos_iou_thr,
                             neg_iou_thr=cfg.neg_iou_thr,
                             min_pos_iou=cfg.min_pos_iou)
        pos = res.gt_idx >= 0
        posf = pos.astype(jnp.float32)
        labels = jnp.where(pos, gt_labels[jnp.maximum(res.gt_idx, 0)], C)
        lw = (pvalid & ~res.ignore).astype(jnp.float32)
        num_pos = jnp.maximum(jnp.sum(posf), 1.0)
        tgt_boxes = jnp.where(pos[:, None],
                              gt_bboxes[jnp.maximum(res.gt_idx, 0)], anchors)
        deltas = bbox2delta(anchors, tgt_boxes, stds=cfg.target_stds)

        # ---- ISR-P: IoU-HLR importance weights (no grad)
        pred_boxes = jax.lax.stop_gradient(
            delta2bbox(anchors, reg_i, stds=cfg.target_stds))
        from ..models.losses.common import bbox_overlaps_aligned
        ious = bbox_overlaps_aligned(pred_boxes, tgt_boxes)
        M = gt_bboxes.shape[0]
        grp_gt = (labels * (M + 1)
                  + jnp.maximum(res.gt_idx, 0)).astype(jnp.int32)
        r_local = _rank_in_groups(ious, grp_gt, pos)
        max_l = jnp.maximum(
            jnp.max(jnp.zeros((C + 1,), jnp.int32).at[labels].add(
                pos.astype(jnp.int32))[:C]), 1).astype(jnp.float32)
        key2 = ious + (max_l - r_local.astype(jnp.float32))
        r_hlr = _rank_in_groups(key2, labels.astype(jnp.int32), pos)
        imp = jnp.clip((max_l - r_hlr.astype(jnp.float32)) / max_l, 0.0)
        imp = (isr_bias + imp * (1 - isr_bias)) ** isr_k

        per_cls = sigmoid_focal_loss(cls_i, labels, reduction="none").sum(-1)
        ori = jnp.sum(per_cls * posf * lw)
        new = jnp.maximum(jnp.sum(per_cls * posf * imp), 1e-12)
        imp = imp * (ori / new)
        w_cls = jnp.where(pos, imp * lw, lw)
        loss_cls = jnp.sum(per_cls * w_cls) / num_pos

        bw = posf[:, None]
        loss_bbox = l1_loss(reg_i, deltas, bw, reduction="mean",
                            avg_factor=num_pos)

        # ---- CARL (classification-aware regression)
        p_cls = jax.nn.sigmoid(
            jnp.take_along_axis(cls_i, jnp.clip(labels, 0, C - 1)[:, None],
                                axis=-1))[:, 0]
        cw = (carl_bias + (1 - carl_bias) * p_cls) ** carl_k
        cw = cw * num_pos / jnp.maximum(jnp.sum(cw * posf), 1e-12)
        reg_l = jnp.abs(reg_i - deltas).sum(-1) / num_pos
        loss_carl = jnp.sum(reg_l * cw * posf) * carl_weight / num_pos
        return (loss_cls * cfg.cls_weight, loss_bbox * cfg.bbox_weight,
                loss_carl)

    lc, lb, lcarl = jax.vmap(single)(cls, reg, batch["gt_bboxes"],
                                     batch["gt_valid"], batch["gt_labels"],
                                     batch["img_shape"])
    losses = {"loss_cls": lc.mean(), "loss_bbox": lb.mean(),
              "loss_carl": lcarl.mean()}
    return sum(losses.values()), losses


def pisa_ssd_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
                  cfg: DenseLossConfig, isr_k: float = 2.0,
                  isr_bias: float = 0.25, carl_k: float = 1.0,
                  carl_bias: float = 0.25, carl_weight: float = 5.0):
    """PISA SSD (reference `pisa_ssd_head.py:11-140`): the SSD multibox
    loss with ISR-P importance reweighting of positive CE (IoU-HLR ranks,
    `losses/pisa_loss.py isr_p`) and the CARL classification-aware
    regression term (`pisa_loss.py carl_loss`); negatives keep the 3:1
    online hard-negative mining."""
    anchors_np, counts, num_base = _ssd_anchors(cfg)
    anchors = jnp.asarray(anchors_np)
    C = cfg.num_classes
    cls = _ssd_flatten(outs["cls"], num_base, C + 1).astype(jnp.float32)
    reg = _ssd_flatten(outs["reg"], num_base, 4).astype(jnp.float32)
    N = anchors.shape[0]
    from ..models.losses.common import bbox_overlaps_aligned

    def single(cls_i, reg_i, gt_bboxes, gt_valid, gt_labels, img_shape):
        res = max_iou_assign(anchors, jnp.ones((N,), bool), gt_bboxes,
                             gt_valid, pos_iou_thr=0.5, neg_iou_thr=0.5,
                             min_pos_iou=0.0, gt_max_assign_all=False)
        pos = res.gt_idx >= 0
        posf = pos.astype(jnp.float32)
        labels = jnp.where(pos, gt_labels[jnp.maximum(res.gt_idx, 0)], C)
        logp = jax.nn.log_softmax(cls_i, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        num_pos = jnp.sum(posf)
        neg = ~pos & ~res.ignore
        n_neg = jnp.minimum(cfg.ssd_neg_pos_ratio * num_pos,
                            jnp.sum(neg.astype(jnp.float32)))
        neg_ce = jnp.where(neg, ce, -jnp.inf)
        sorted_ce = jax.lax.top_k(neg_ce, N)[0]
        kth = sorted_ce[jnp.clip(n_neg.astype(jnp.int32) - 1, 0, N - 1)]
        neg_sel = neg & (ce >= kth) & (n_neg > 0)

        tgt = jnp.where(pos[:, None], gt_bboxes[jnp.maximum(res.gt_idx, 0)],
                        anchors)
        deltas = bbox2delta(anchors, tgt, stds=cfg.ssd_stds)

        # ISR-P importance (IoU-HLR) on positives
        pred_boxes = jax.lax.stop_gradient(
            delta2bbox(anchors, reg_i, stds=cfg.ssd_stds))
        ious = bbox_overlaps_aligned(pred_boxes, tgt)
        M = gt_bboxes.shape[0]
        grp_gt = (labels * (M + 1)
                  + jnp.maximum(res.gt_idx, 0)).astype(jnp.int32)
        r_local = _rank_in_groups(ious, grp_gt, pos)
        max_l = jnp.maximum(
            jnp.max(jnp.zeros((C + 1,), jnp.int32).at[labels].add(
                pos.astype(jnp.int32))[:C]), 1).astype(jnp.float32)
        key2 = ious + (max_l - r_local.astype(jnp.float32))
        r_hlr = _rank_in_groups(key2, labels.astype(jnp.int32), pos)
        imp = jnp.clip((max_l - r_hlr.astype(jnp.float32)) / max_l, 0.0)
        imp = (isr_bias + imp * (1 - isr_bias)) ** isr_k
        ori = jnp.sum(ce * posf)
        new = jnp.maximum(jnp.sum(ce * posf * imp), 1e-12)
        imp = imp * (ori / new)
        loss_cls = (jnp.sum(ce * posf * imp)
                    + jnp.sum(ce * neg_sel.astype(jnp.float32)))

        diff = jnp.abs(reg_i - deltas)
        b = cfg.ssd_smoothl1_beta
        sl1 = jnp.where(diff < b, 0.5 * diff * diff / b,
                        diff - 0.5 * b).sum(-1)
        loss_bbox = jnp.sum(sl1 * posf)

        # CARL: regression weighted by the softmax prob of the true class
        p_all = jax.nn.softmax(cls_i, axis=-1)
        p_cls = jnp.take_along_axis(
            p_all, jnp.clip(labels, 0, C - 1)[:, None], axis=-1)[:, 0]
        cw = (carl_bias + (1 - carl_bias) * p_cls) ** carl_k
        np_ = jnp.maximum(num_pos, 1.0)
        cw = cw * np_ / jnp.maximum(jnp.sum(cw * posf), 1e-12)
        loss_carl = jnp.sum(sl1 / np_ * cw * posf) * carl_weight / np_
        return loss_cls, loss_bbox, loss_carl, num_pos

    lc, lb, lcarl, np_ = jax.vmap(single)(
        cls, reg, batch["gt_bboxes"], batch["gt_valid"],
        batch["gt_labels"], batch["img_shape"])
    denom = jnp.maximum(jnp.sum(np_), 1.0)
    losses = {"loss_cls": jnp.sum(lc) / denom * cfg.cls_weight,
              "loss_bbox": jnp.sum(lb) / denom * cfg.bbox_weight,
              "loss_carl": lcarl.mean()}
    return sum(losses.values()), losses


# ------------------------------------------------------ Guided Anchoring ---

def _ga_guided_anchors(outs, cfg: DenseLossConfig, octave_base: float = 8.0):
    """Per-cell guided anchors from the shape branch: square base
    ``octave_base * stride`` scaled by exp(dw), exp(dh) around cell
    centers (reference guided_anchor_head.py anchor generation)."""
    pts = P.multi_level_points(cfg.image_shape, cfg.strides)
    stride = pts[:, 2]
    shape = _flatten(outs["shape"], 2).astype(jnp.float32)
    base = octave_base * stride
    w = base[None, :] * jnp.exp(jnp.clip(shape[..., 0], -4.0, 4.0))
    h = base[None, :] * jnp.exp(jnp.clip(shape[..., 1], -4.0, 4.0))
    cx = pts[None, :, 0]
    cy = pts[None, :, 1]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _ga_center_mask(cfg: DenseLossConfig, pts, stride, gt_bboxes, gt_valid,
                    ratio):
    """(N, M) cell centers inside the ratio-shrunk gt at the matched
    level (scale -> level via log2(sqrt(area))/octave)."""
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    hw = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * ratio / 2
    hh = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) * ratio / 2
    scale = jnp.sqrt(jnp.clip(
        (gt_bboxes[:, 2] - gt_bboxes[:, 0])
        * (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 1.0))
    gt_lvl = jnp.clip(jnp.floor(jnp.log2(scale / 8.0) + 0.5), 0,
                      len(cfg.strides) - 1)
    pt_lvl = jnp.log2(stride / cfg.strides[0])
    same_lvl = pt_lvl[:, None] == gt_lvl[None, :]
    inside = ((pts[:, None, 0] >= cx - hw) & (pts[:, None, 0] <= cx + hw)
              & (pts[:, None, 1] >= cy - hh)
              & (pts[:, None, 1] <= cy + hh))
    return inside & same_lvl & gt_valid[None, :]


def ga_retina_loss(outs: Dict[str, Sequence[Array]],
                   batch: Dict[str, Array], cfg: DenseLossConfig,
                   center_ratio: float = 0.2, ignore_ratio: float = 0.5,
                   loc_weight: float = 1.0, shape_weight: float = 1.0):
    """Guided-Anchoring RetinaNet loss (reference
    `guided_anchor_head.py:loss` flow, TPU re-derivation):

    * loc: focal BCE, positives in the center_ratio-shrunk GT at the
      matched level, ignore ring at ignore_ratio (ga_shape_target_single)
    * shape: IoU loss between the guided anchor and its best GT for cells
      in the GT center region
    * cls/reg: MaxIoU assignment ON the (stop-grad) guided anchors,
      focal + L1 deltas
    """
    C = cfg.num_classes
    pts = P.multi_level_points(cfg.image_shape, cfg.strides)
    stride = pts[:, 2]
    cls = _flatten(outs["cls"], C).astype(jnp.float32)
    reg = _flatten(outs["reg"], 4).astype(jnp.float32)
    loc = _flatten(outs["loc"], 1)[..., 0].astype(jnp.float32)
    anchors_all = _ga_guided_anchors(outs, cfg)
    from ..models.losses.common import iou_loss

    center_mask = functools.partial(_ga_center_mask, cfg, pts, stride)

    def single(cls_i, reg_i, loc_i, anchors_i, gt_bboxes, gt_valid,
               gt_labels):
        areas = jnp.clip((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                         * (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 0.0)
        pos_m = center_mask(gt_bboxes, gt_valid, center_ratio)
        ign_m = center_mask(gt_bboxes, gt_valid, ignore_ratio)
        loc_pos = jnp.any(pos_m, -1)
        loc_ign = jnp.any(ign_m, -1) & ~loc_pos
        n_loc_pos = jnp.maximum(jnp.sum(loc_pos.astype(jnp.float32)), 1.0)
        lw = jnp.where(loc_ign, 0.0, 1.0)
        loss_loc = sigmoid_focal_loss(
            loc_i[:, None], jnp.where(loc_pos, 0, 1), lw,
            num_classes=1, avg_factor=n_loc_pos) * loc_weight

        # shape: best (smallest-area) covering gt per positive cell
        rank = jnp.where(pos_m, areas[None, :], INF)
        gi = jnp.argmin(rank, -1)
        tgt = gt_bboxes[gi]
        posf = loc_pos.astype(jnp.float32)
        loss_shape = iou_loss(anchors_i, tgt, posf, reduction="sum"
                              ) / n_loc_pos * shape_weight

        # cls/reg on the guided anchors
        ga = jax.lax.stop_gradient(anchors_i)
        res = max_iou_assign(ga, jnp.ones(ga.shape[:1], bool), gt_bboxes,
                             gt_valid, pos_iou_thr=cfg.pos_iou_thr,
                             neg_iou_thr=cfg.neg_iou_thr,
                             min_pos_iou=cfg.min_pos_iou)
        pos = res.gt_idx >= 0
        labels = jnp.where(pos, gt_labels[jnp.maximum(res.gt_idx, 0)], C)
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        loss_cls = sigmoid_focal_loss(cls_i, labels, reduction="mean",
                                      avg_factor=num_pos)
        safe = jnp.where(pos[:, None],
                         gt_bboxes[jnp.maximum(res.gt_idx, 0)], ga)
        deltas = bbox2delta(ga, safe, stds=cfg.target_stds)
        loss_bbox = l1_loss(reg_i, deltas, pos.astype(jnp.float32)[:, None],
                            reduction="mean", avg_factor=num_pos)
        return loss_loc, loss_shape, loss_cls, loss_bbox

    ll, ls, lc, lb = jax.vmap(single)(cls, reg, loc, anchors_all,
                                      batch["gt_bboxes"],
                                      batch["gt_valid"],
                                      batch["gt_labels"])
    losses = {"loss_loc": ll.mean(), "loss_shape": ls.mean(),
              "loss_cls": lc.mean() * cfg.cls_weight,
              "loss_bbox": lb.mean() * cfg.bbox_weight}
    return sum(losses.values()), losses


def ga_rpn_loss(outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
                cfg: DenseLossConfig, center_ratio: float = 0.2,
                ignore_ratio: float = 0.5, loc_weight: float = 1.0,
                shape_weight: float = 1.0, num_samples: int = 256):
    """Guided-Anchoring RPN loss (reference `ga_rpn_head.py:40-61` routing
    into `guided_anchor_head.py loss`): the GA loc/shape branches as in
    :func:`ga_retina_loss`, with RPN-style binary objectness — MaxIoU
    assignment on the (stop-grad) guided anchors at 0.7/0.3 thresholds,
    sampled BCE + SmoothL1 deltas."""
    pts = P.multi_level_points(cfg.image_shape, cfg.strides)
    stride = pts[:, 2]
    cls = _flatten(outs["cls"], 1)[..., 0].astype(jnp.float32)
    reg = _flatten(outs["reg"], 4).astype(jnp.float32)
    loc = _flatten(outs["loc"], 1)[..., 0].astype(jnp.float32)
    anchors_all = _ga_guided_anchors(outs, cfg)
    from ..models.losses.common import iou_loss
    center_mask = functools.partial(_ga_center_mask, cfg, pts, stride)

    def single(cls_i, reg_i, loc_i, anchors_i, gt_bboxes, gt_valid):
        areas = jnp.clip((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                         * (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 0.0)
        pos_m = center_mask(gt_bboxes, gt_valid, center_ratio)
        ign_m = center_mask(gt_bboxes, gt_valid, ignore_ratio)
        loc_pos = jnp.any(pos_m, -1)
        loc_ign = jnp.any(ign_m, -1) & ~loc_pos
        n_loc_pos = jnp.maximum(jnp.sum(loc_pos.astype(jnp.float32)), 1.0)
        lw = jnp.where(loc_ign, 0.0, 1.0)
        loss_loc = sigmoid_focal_loss(
            loc_i[:, None], jnp.where(loc_pos, 0, 1), lw,
            num_classes=1, avg_factor=n_loc_pos) * loc_weight

        rank = jnp.where(pos_m, areas[None, :], INF)
        gi = jnp.argmin(rank, -1)
        tgt = gt_bboxes[gi]
        posf_loc = loc_pos.astype(jnp.float32)
        loss_shape = iou_loss(anchors_i, tgt, posf_loc, reduction="sum"
                              ) / n_loc_pos * shape_weight

        ga = jax.lax.stop_gradient(anchors_i)
        res = max_iou_assign(ga, jnp.ones(ga.shape[:1], bool), gt_bboxes,
                             gt_valid, pos_iou_thr=0.7, neg_iou_thr=0.3,
                             min_pos_iou=0.3)
        pos = res.gt_idx >= 0
        posf = pos.astype(jnp.float32)
        neg = (~pos) & ~res.ignore
        n_pos = jnp.sum(posf)
        neg_quota = jnp.maximum(num_samples - n_pos, 1.0)
        neg_rank = jnp.where(neg, cls_i, -jnp.inf)
        thr_k = min(num_samples, cls_i.shape[0])
        top_neg, _ = jax.lax.top_k(neg_rank, thr_k)
        kth = top_neg[jnp.clip(neg_quota.astype(jnp.int32) - 1, 0,
                               thr_k - 1)]
        neg_sel = neg & (cls_i >= kth)
        wc = posf + neg_sel.astype(jnp.float32)
        n_samp = jnp.maximum(jnp.sum(wc), 1.0)
        loss_cls = jnp.sum(_bce_logits(cls_i, posf) * wc) / n_samp
        safe = jnp.where(pos[:, None],
                         gt_bboxes[jnp.maximum(res.gt_idx, 0)], ga)
        deltas = bbox2delta(ga, safe, stds=cfg.target_stds)
        diff = jnp.abs(reg_i - deltas)
        sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5).sum(-1)
        loss_bbox = jnp.sum(sl1 * posf) / n_samp
        return loss_loc, loss_shape, loss_cls, loss_bbox

    ll, ls, lc, lb = jax.vmap(single)(cls, reg, loc, anchors_all,
                                      batch["gt_bboxes"],
                                      batch["gt_valid"])
    losses = {"loss_anchor_loc": ll.mean(), "loss_anchor_shape": ls.mean(),
              "loss_rpn_cls": lc.mean() * cfg.cls_weight,
              "loss_rpn_bbox": lb.mean() * cfg.bbox_weight}
    return sum(losses.values()), losses
