"""Two-stage (Faster R-CNN) training/inference logic — pure functions.

Rebuilds the reference flow (`/root/reference/code/mmdet/models/detectors/
two_stage.py` + `rpn_head.py` get_bboxes + `roi_heads/standard_roi_head.py`)
with static shapes throughout: proposals are fixed-count padded sets, RoI
sampling picks a fixed quota per image (deterministic top-IoU positives +
strided negatives — the TPU stand-in for mmdet's RandomSampler; the quota
and pos-fraction semantics match), and the RCNN decode reuses the on-device
class-wise NMS.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import NEG_INF, batched_nms, box_iou, nms as plain_nms
from .anchors import (AnchorConfig, anchor_valid_flags, bbox2delta,
                      delta2bbox, grid_anchors)
from .assign import max_iou_assign
from .decode import Detections, TestConfig, nms_candidates
from .dense_loss import _bce_logits, _flatten

Array = jax.Array


@dataclass(frozen=True)
class TwoStageConfig:
    image_shape: Tuple[int, int]
    num_classes: int
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    # RPN anchors: 1 scale x 3 ratios per level (reference faster_rcnn cfg)
    anchor_scales: Tuple[float, ...] = (8.0,)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # RPN assignment/sampling
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    rpn_num_samples: int = 256
    # proposals
    nms_pre: int = 1000
    proposal_count: int = 512      # post-NMS proposals kept (train+test)
    proposal_nms_iou: float = 0.7
    # RCNN
    rcnn_pos_iou: float = 0.5
    rcnn_num_samples: int = 512
    rcnn_pos_fraction: float = 0.25
    rcnn_stds: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)


def rpn_anchor_cfg(cfg: TwoStageConfig) -> AnchorConfig:
    return AnchorConfig(strides=cfg.strides, ratios=cfg.anchor_ratios,
                        octave_base_scale=float(cfg.anchor_scales[0]),
                        scales_per_octave=len(cfg.anchor_scales))


def rpn_proposals(rpn_outs: Dict[str, Sequence[Array]],
                  img_shapes: Array, cfg: TwoStageConfig
                  ) -> Tuple[Array, Array]:
    """RPN maps -> per-image fixed-count proposals.

    Returns (proposals (B, P, 4), valid (B, P))."""
    acfg = rpn_anchor_cfg(cfg)
    anchors_np, _ = grid_anchors(acfg, cfg.image_shape)
    anchors = jnp.asarray(anchors_np)
    scores = _flatten(rpn_outs["rpn_cls"], 1)[..., 0].astype(jnp.float32)
    deltas = _flatten(rpn_outs["rpn_reg"], 4).astype(jnp.float32)

    def single(score_i, delta_i, img_shape):
        k = min(cfg.nms_pre, score_i.shape[0])
        top_s, top_i = jax.lax.top_k(score_i, k)
        boxes = delta2bbox(anchors[top_i], delta_i[top_i],
                           max_shape=img_shape)
        keep_idx, keep_s, keep_v = plain_nms(
            boxes, jax.nn.sigmoid(top_s), cfg.proposal_nms_iou,
            cfg.proposal_count)
        props = boxes[keep_idx] * keep_v[:, None].astype(boxes.dtype)
        return props, keep_v

    return jax.vmap(single)(scores, deltas, img_shapes)


def _rois_with_batch_idx(proposals: Array) -> Array:
    """(B, P, 4) -> (B*P, 5) [batch_idx, x1, y1, x2, y2]."""
    B, P, _ = proposals.shape
    bi = jnp.repeat(jnp.arange(B, dtype=proposals.dtype), P)[:, None]
    return jnp.concatenate([bi, proposals.reshape(B * P, 4)], axis=1)


def sample_rois(proposals: Array, prop_valid: Array, gt_bboxes: Array,
                gt_valid: Array, gt_labels: Array, cfg: TwoStageConfig,
                pos_iou=None):
    """Fixed-quota RoI sampling + targets (reference RandomSampler +
    bbox target encoding, deterministic TPU variant).

    ``pos_iou`` optionally overrides the static threshold with a traced
    scalar (Dynamic R-CNN adapts it between iterations).

    Returns dict with rois (B, S, 4), labels (B, S) (num_classes =
    background), reg targets (B, S, 4), pos mask, valid mask."""
    S = cfg.rcnn_num_samples
    n_pos_max = int(S * cfg.rcnn_pos_fraction)
    if pos_iou is None:
        pos_iou = cfg.rcnn_pos_iou

    def single(props, pvalid, gts, gvalid, glabels):
        # append GT boxes as candidate positives (reference add_gt_as_proposals)
        cand = jnp.concatenate([gts, props], axis=0)
        cvalid = jnp.concatenate([gvalid, pvalid], axis=0)
        ious = box_iou(cand, gts)                            # (P', M)
        ious = jnp.where(cvalid[:, None] & gvalid[None, :], ious, -1.0)
        max_iou = ious.max(axis=1)
        arg = ious.argmax(axis=1)
        is_pos = (max_iou >= pos_iou) & cvalid
        is_neg = (max_iou < pos_iou) & (max_iou >= 0) & cvalid

        # deterministic quota: top-IoU positives, then top-scoring... use
        # highest-IoU negatives first (hard negatives)
        pos_rank = jnp.where(is_pos, max_iou, -jnp.inf)
        _, pos_idx = jax.lax.top_k(pos_rank, n_pos_max)
        pos_ok = is_pos[pos_idx]
        neg_rank = jnp.where(is_neg, max_iou, -jnp.inf)
        _, neg_idx = jax.lax.top_k(neg_rank, S - n_pos_max)
        neg_ok = is_neg[neg_idx]

        sel = jnp.concatenate([pos_idx, neg_idx])
        sel_pos = jnp.concatenate([pos_ok, jnp.zeros_like(neg_ok)])
        sel_ok = jnp.concatenate([pos_ok, neg_ok])
        rois = cand[sel]
        tgt_gt = gts[arg[sel]]
        labels = jnp.where(sel_pos, glabels[arg[sel]], cfg.num_classes)
        safe_tgt = jnp.where(sel_pos[:, None], tgt_gt, rois)
        # degenerate rois (padded zeros) would produce log(0) deltas
        safe_rois = jnp.where(sel_ok[:, None], rois,
                              jnp.asarray([0.0, 0.0, 1.0, 1.0]))
        deltas = bbox2delta(safe_rois, jnp.where(sel_pos[:, None], safe_tgt,
                                                 safe_rois),
                            stds=cfg.rcnn_stds)
        return rois, labels, deltas, sel_pos, sel_ok

    return jax.vmap(single)(proposals, prop_valid, gt_bboxes, gt_valid,
                            gt_labels)


def rpn_loss(rpn_outs: Dict[str, Sequence[Array]], batch: Dict[str, Array],
             cfg: TwoStageConfig):
    acfg = rpn_anchor_cfg(cfg)
    anchors_np, _ = grid_anchors(acfg, cfg.image_shape)
    anchors = jnp.asarray(anchors_np)
    scores = _flatten(rpn_outs["rpn_cls"], 1)[..., 0].astype(jnp.float32)
    deltas = _flatten(rpn_outs["rpn_reg"], 4).astype(jnp.float32)

    def single(score_i, delta_i, gts, gvalid, img_shape):
        pvalid = anchor_valid_flags(acfg, cfg.image_shape, img_shape)
        res = max_iou_assign(anchors, pvalid, gts, gvalid,
                             pos_iou_thr=cfg.rpn_pos_iou,
                             neg_iou_thr=cfg.rpn_neg_iou,
                             min_pos_iou=cfg.rpn_neg_iou)
        pos = res.gt_idx >= 0
        posf = pos.astype(jnp.float32)
        # fixed sample quota: all positives (typically few) + hardest
        # negatives up to rpn_num_samples total (reference RandomSampler)
        neg = (~pos) & pvalid & ~res.ignore
        n_pos = jnp.sum(posf)
        neg_quota = jnp.maximum(cfg.rpn_num_samples - n_pos, 1.0)
        neg_rank = jnp.where(neg, score_i, -jnp.inf)      # hard negatives
        thr_k = min(cfg.rpn_num_samples, score_i.shape[0])
        top_neg, _ = jax.lax.top_k(neg_rank, thr_k)
        kth = top_neg[jnp.clip(neg_quota.astype(jnp.int32) - 1, 0,
                               thr_k - 1)]
        neg_sel = neg & (score_i >= kth)
        wc = posf + neg_sel.astype(jnp.float32)
        n_samp = jnp.maximum(jnp.sum(wc), 1.0)
        tgt = jnp.where(pos[:, None], gts[jnp.maximum(res.gt_idx, 0)],
                        anchors)
        loss_cls = jnp.sum(
            _bce_logits(score_i, posf) * wc) / n_samp
        d = bbox2delta(anchors, tgt)
        # reference avg_factor = num_total_samples (all 256 sampled
        # anchors, `anchor_head.py` loss with sampling=True) — NOT num_pos;
        # the shipped LR (0.02) is tuned to that normalization
        loss_reg = jnp.sum(jnp.abs(delta_i - d).sum(-1) * posf) / n_samp
        return loss_cls, loss_reg

    lc, lr = jax.vmap(single)(scores, deltas, batch["gt_bboxes"],
                              batch["gt_valid"], batch["img_shape"])
    return lc.mean(), lr.mean()


def rcnn_loss(cls_logits: Array, reg: Array, labels: Array, deltas: Array,
              pos: Array, valid: Array, cfg: TwoStageConfig,
              smoothl1_beta=1.0):
    """Softmax CE + per-class smooth-L1 on sampled RoIs.

    cls_logits (B*S, C+1), reg (B*S, 4C); labels/deltas/pos/valid (B, S...).
    ``smoothl1_beta`` may be a traced scalar (Dynamic R-CNN).
    """
    C = cfg.num_classes
    BS = cls_logits.shape[0]
    labels_f = labels.reshape(-1)
    valid_f = valid.reshape(-1).astype(jnp.float32)
    pos_f = pos.reshape(-1).astype(jnp.float32)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels_f[:, None], axis=-1)[:, 0]
    n_valid = jnp.maximum(jnp.sum(valid_f), 1.0)
    loss_cls = jnp.sum(ce * valid_f) / n_valid

    n_reg = reg.shape[-1] // 4
    reg = reg.reshape(BS, n_reg, 4).astype(jnp.float32)
    cls_idx = jnp.clip(jnp.minimum(labels_f, n_reg - 1), 0, n_reg - 1)
    reg_sel = jnp.take_along_axis(reg, cls_idx[:, None, None].repeat(4, -1),
                                  axis=1)[:, 0]
    diff = jnp.abs(reg_sel - deltas.reshape(BS, 4))
    b = smoothl1_beta
    sl1 = jnp.where(diff < b, 0.5 * diff * diff / b, diff - 0.5 * b).sum(-1)
    # reference avg_factor = bbox_targets.size(0) — all 512 sampled rois
    # (`bbox_head.py` loss), not just positives
    loss_reg = jnp.sum(sl1 * pos_f) / n_valid
    return loss_cls, loss_reg


def two_stage_loss(model, variables, batch: Dict[str, Array],
                   cfg: TwoStageConfig):
    """Full Faster R-CNN training loss (one jitted function):
    backbone+neck once, RPN loss, proposals, RoI sampling, RCNN loss."""
    feats = model.apply(variables, batch["image"], method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    l_rpn_cls, l_rpn_reg = rpn_loss(rpn_outs, batch, cfg)
    props, pvalid = rpn_proposals(
        jax.tree.map(jax.lax.stop_gradient, rpn_outs),
        batch["img_shape"], cfg)
    rois, labels, deltas, pos, valid = sample_rois(
        props, pvalid, batch["gt_bboxes"], batch["gt_valid"],
        batch["gt_labels"], cfg)
    cls_logits, reg = model.apply(
        variables, feats, _rois_with_batch_idx(rois), method="roi_forward")
    l_cls, l_reg = rcnn_loss(cls_logits, reg, labels, deltas, pos, valid,
                             cfg)
    losses = {"loss_rpn_cls": l_rpn_cls, "loss_rpn_bbox": l_rpn_reg,
              "loss_cls": l_cls, "loss_bbox": l_reg}
    return sum(losses.values()), losses


def dynamic_rcnn_loss(model, variables, batch: Dict[str, Array],
                      cfg: TwoStageConfig, iou_thr, beta,
                      iou_topk: int = 75, beta_topk: int = 10):
    """Dynamic R-CNN training loss (reference
    `roi_heads/dynamic_roi_head.py:12-152`): the RoI positive-IoU threshold
    and the SmoothL1 beta are TRACED scalars adapted between iterations by
    :class:`DynamicRCNNSchedule` from the returned statistics:

    * ``stat_iou``  — mean over images of the ``iou_topk``-th largest
      proposal-to-GT IoU (`dynamic_roi_head.py:76-80`)
    * ``stat_beta`` — the ``beta_topk * B``-th smallest positive-target
      mean(|dx|,|dy|) (`dynamic_roi_head.py:118-124`)
    """
    feats = model.apply(variables, batch["image"], method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    l_rpn_cls, l_rpn_reg = rpn_loss(rpn_outs, batch, cfg)
    props, pvalid = rpn_proposals(
        jax.tree.map(jax.lax.stop_gradient, rpn_outs),
        batch["img_shape"], cfg)
    rois, labels, deltas, pos, valid = sample_rois(
        props, pvalid, batch["gt_bboxes"], batch["gt_valid"],
        batch["gt_labels"], cfg, pos_iou=iou_thr)
    cls_logits, reg = model.apply(
        variables, feats, _rois_with_batch_idx(rois), method="roi_forward")
    l_cls, l_reg = rcnn_loss(cls_logits, reg, labels, deltas, pos, valid,
                             cfg, smoothl1_beta=beta)

    # --- adaptation statistics (host reads them between steps)
    def img_iou(props_i, pvalid_i, gts, gvalid):
        ious = box_iou(props_i, gts)
        ious = jnp.where(pvalid_i[:, None] & gvalid[None, :], ious, 0.0)
        mx = ious.max(axis=1)
        k = min(iou_topk, mx.shape[0])
        return jax.lax.top_k(mx, k)[0][k - 1]
    stat_iou = jax.vmap(img_iou)(props, pvalid, batch["gt_bboxes"],
                                 batch["gt_valid"]).mean()
    err = jnp.abs(deltas.reshape(-1, 4)[:, :2]).mean(-1)
    posf = pos.reshape(-1)
    B = props.shape[0]
    k = beta_topk * B
    neg_sorted = jax.lax.top_k(jnp.where(posf, -err, -jnp.inf), k)[0]
    kth = -neg_sorted[k - 1]
    npos = jnp.sum(posf.astype(jnp.int32))
    # fewer than k positives: use the largest positive error (k = num_pos)
    largest = -jnp.max(jnp.where(posf, -err, -jnp.inf))
    stat_beta = jnp.where(npos >= k, kth,
                          jnp.where(npos > 0, largest, jnp.inf))
    losses = {"loss_rpn_cls": l_rpn_cls, "loss_rpn_bbox": l_rpn_reg,
              "loss_cls": l_cls, "loss_bbox": l_reg,
              "stat_iou": jax.lax.stop_gradient(stat_iou),
              "stat_beta": jax.lax.stop_gradient(stat_beta)}
    total = l_rpn_cls + l_rpn_reg + l_cls + l_reg
    return total, losses


class DynamicRCNNSchedule:
    """Host-side hyperparameter controller for Dynamic R-CNN (reference
    `dynamic_roi_head.py update_hyperparameters:133-152`): every
    ``update_iter_interval`` steps, iou_thr <- max(initial, mean(history))
    and beta <- min(initial, median(history))."""

    def __init__(self, initial_iou: float = 0.4, initial_beta: float = 1.0,
                 update_iter_interval: int = 100):
        self.initial_iou = initial_iou
        self.initial_beta = initial_beta
        self.interval = update_iter_interval
        self.iou_thr = initial_iou
        self.beta = initial_beta
        self.iou_history = []
        self.beta_history = []

    def update(self, stat_iou: float, stat_beta: float):
        self.iou_history.append(float(stat_iou))
        if np.isfinite(stat_beta):
            self.beta_history.append(float(stat_beta))
        if len(self.iou_history) % self.interval == 0:
            self.iou_thr = max(self.initial_iou,
                               float(np.mean(self.iou_history)))
            if self.beta_history:
                self.beta = min(self.initial_beta,
                                float(np.median(self.beta_history)))
            self.iou_history = []
            self.beta_history = []
        return self.iou_thr, self.beta


def two_stage_decode(model, variables, images: Array, img_shapes: Array,
                     scale_factors: Array, cfg: TwoStageConfig,
                     tcfg: TestConfig, rescale: bool = True) -> Detections:
    """simple_test: proposals -> RoI head -> per-class delta decode + NMS."""
    feats = model.apply(variables, images, method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    props, pvalid = rpn_proposals(rpn_outs, img_shapes, cfg)
    cls_logits, reg = model.apply(
        variables, feats, _rois_with_batch_idx(props), method="roi_forward")
    B, P, _ = props.shape
    C = cfg.num_classes
    cls_logits = cls_logits.reshape(B, P, C + 1)
    reg = reg.reshape(B, P, C, 4)

    def single(props_i, pvalid_i, cls_i, reg_i, img_shape, sf):
        probs = jax.nn.softmax(cls_i.astype(jnp.float32), -1)[:, :C]
        probs = probs * pvalid_i[:, None].astype(probs.dtype)
        boxes = delta2bbox(props_i[:, None, :].repeat(C, 1),
                           reg_i.astype(jnp.float32),
                           stds=cfg.rcnn_stds, max_shape=img_shape)
        if rescale:
            boxes = boxes / sf[None, None, :]
        # (P*C) candidates with per-class boxes
        flat_boxes = boxes.reshape(P * C, 4)
        flat_scores = probs.reshape(P * C)
        flat_labels = jnp.tile(jnp.arange(C, dtype=jnp.int32), (P,))
        cand_scores = jnp.where(flat_scores > tcfg.score_thr, flat_scores,
                                NEG_INF)
        k = min(tcfg.nms_pre, P * C)
        top_s, top_i = jax.lax.top_k(cand_scores, k)
        keep_idx, keep_s, keep_v = batched_nms(
            flat_boxes[top_i], top_s, flat_labels[top_i], tcfg.nms_iou,
            tcfg.max_per_img)
        z = keep_v[:, None].astype(boxes.dtype)
        return Detections(flat_boxes[top_i][keep_idx] * z,
                          jnp.where(keep_v, keep_s, 0.0),
                          flat_labels[top_i][keep_idx] * keep_v,
                          jnp.zeros((tcfg.max_per_img, 8), boxes.dtype),
                          keep_v)

    return jax.vmap(single)(props, pvalid, cls_logits, reg, img_shapes,
                            scale_factors)


# --------------------------------------------------------------- Mask R-CNN

def rasterize_polygon_in_roi(polys: Array, rois: Array,
                             out_size: int = 28) -> Array:
    """GT contour polygons -> per-RoI binary mask targets, ON DEVICE.

    polys (S, nv*2) xy-interleaved closed contours (the segm pipeline's
    36-pt polygons); rois (S, 4). Returns (S, out, out) {0,1} via the
    crossing-number (even-odd) test over the RoI-aligned grid — the
    TPU-native stand-in for host-side mask cropping in the reference
    mask_target.py.
    """
    S = polys.shape[0]
    nv = polys.shape[1] // 2
    px = polys[:, 0::2]                                 # (S, nv)
    py = polys[:, 1::2]
    w = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-3)
    h = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-3)
    ys = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    gx = rois[:, 0, None] + ys[None, :] * w[:, None]    # (S, out)
    gy = rois[:, 1, None] + ys[None, :] * h[:, None]
    x1 = px                                             # (S, nv)
    y1 = py
    x2 = jnp.roll(px, -1, axis=1)
    y2 = jnp.roll(py, -1, axis=1)

    # crossing number per grid point: ray to +x
    #   (S, out_y, out_x, nv)
    gyb = gy[:, :, None, None]
    gxb = gx[:, None, :, None]
    y1b, y2b = y1[:, None, None, :], y2[:, None, None, :]
    x1b, x2b = x1[:, None, None, :], x2[:, None, None, :]
    cond = (y1b <= gyb) != (y2b <= gyb)
    t = (gyb - y1b) / jnp.where(jnp.abs(y2b - y1b) < 1e-9, 1e-9, y2b - y1b)
    xint = x1b + t * (x2b - x1b)
    crossings = jnp.sum(cond & (xint > gxb), axis=-1)
    return (crossings % 2 == 1).astype(jnp.float32)


def mask_loss(mask_logits: Array, rois: Array, labels: Array, pos: Array,
              gt_polys: Array, gt_idx: Array, cfg: TwoStageConfig):
    """Per-positive-RoI BCE against rasterized polygon targets.

    mask_logits (S, 28, 28, C); rois (S, 4); labels (S,); pos (S,) bool;
    gt_polys (M, nv*2); gt_idx (S,) assigned gt per roi."""
    S, oh, ow, C = mask_logits.shape
    tgt_polys = gt_polys[jnp.maximum(gt_idx, 0)]
    targets = rasterize_polygon_in_roi(tgt_polys, rois, oh)
    cls_idx = jnp.clip(labels, 0, C - 1)
    sel = jnp.take_along_axis(
        mask_logits, cls_idx[:, None, None, None], axis=-1)[..., 0]
    bce = (jnp.maximum(sel, 0) - sel * targets
           + jnp.log1p(jnp.exp(-jnp.abs(sel))))
    posf = pos.astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum(posf), 1.0)
    return jnp.sum(bce.mean(axis=(1, 2)) * posf) / n_pos


def mask_rcnn_loss(model, variables, batch: Dict[str, Array],
                   cfg: TwoStageConfig):
    """Faster R-CNN losses + mask branch BCE (requires the segm pipeline's
    ``gt_polygons`` in the batch)."""
    feats = model.apply(variables, batch["image"], method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    l_rpn_cls, l_rpn_reg = rpn_loss(rpn_outs, batch, cfg)
    props, pvalid = rpn_proposals(
        jax.tree.map(jax.lax.stop_gradient, rpn_outs),
        batch["img_shape"], cfg)

    B = props.shape[0]
    rois, labels, deltas, pos, valid = sample_rois(
        props, pvalid, batch["gt_bboxes"], batch["gt_valid"],
        batch["gt_labels"], cfg)
    rois5 = _rois_with_batch_idx(rois)
    cls_logits, reg = model.apply(variables, feats, rois5,
                                  method="roi_forward")
    l_cls, l_reg = rcnn_loss(cls_logits, reg, labels, deltas, pos, valid,
                             cfg)
    mask_logits = model.apply(variables, feats, rois5,
                              method="mask_forward")
    # per-image gt index of each sampled roi: recompute from IoU (the
    # sampler's argmax); cheap relative to the mask branch
    S = rois.shape[1]

    def gt_of(rois_i, gts, gvalid):
        ious = box_iou(rois_i, gts)
        ious = jnp.where(gvalid[None, :], ious, -1.0)
        return ious.argmax(axis=1)

    gt_idx = jax.vmap(gt_of)(rois, batch["gt_bboxes"], batch["gt_valid"])
    l_mask = mask_loss(
        mask_logits,
        rois.reshape(B * S, 4), labels.reshape(-1), pos.reshape(-1),
        batch["gt_polygons"].reshape(-1, batch["gt_polygons"].shape[-1]),
        (gt_idx + jnp.arange(B)[:, None]
         * batch["gt_polygons"].shape[1]).reshape(-1), cfg)
    losses = {"loss_rpn_cls": l_rpn_cls, "loss_rpn_bbox": l_rpn_reg,
              "loss_cls": l_cls, "loss_bbox": l_reg, "loss_mask": l_mask}
    return sum(losses.values()), losses


def mask_rcnn_decode(model, variables, images: Array, img_shapes: Array,
                     scale_factors: Array, cfg: TwoStageConfig,
                     tcfg: TestConfig, rescale: bool = True):
    """simple_test with masks: box decode + per-detection 28x28 mask
    probabilities (reference mask_rcnn simple_test -> FCNMaskHead
    get_seg_masks; pasting to full resolution is host-side, see
    evalkit.evaluator.paste_mask)."""
    det = two_stage_decode(model, variables, images, img_shapes,
                           scale_factors, cfg, tcfg, rescale=rescale)
    feats = model.apply(variables, images, method="extract")
    # mask branch on the FINAL detection boxes (image coords; un-rescale
    # back to network coords for RoIAlign if decode rescaled)
    boxes = det.bboxes
    if rescale:
        boxes = boxes * scale_factors[:, None, :]
    rois = _rois_with_batch_idx(boxes)
    mask_logits = model.apply(variables, feats, rois, method="mask_forward")
    B, K = det.bboxes.shape[:2]
    oh, ow = mask_logits.shape[1:3]
    cls_idx = jnp.clip(det.labels.reshape(-1), 0,
                       mask_logits.shape[-1] - 1)
    sel = jnp.take_along_axis(mask_logits,
                              cls_idx[:, None, None, None], axis=-1)[..., 0]
    masks = jax.nn.sigmoid(sel.astype(jnp.float32)).reshape(B, K, oh, ow)
    return det, masks


# ------------------------------------------------------------ Cascade R-CNN

CASCADE_IOUS = (0.5, 0.6, 0.7)
CASCADE_WEIGHTS = (1.0, 0.5, 0.25)
CASCADE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
                (0.033, 0.033, 0.067, 0.067))


def cascade_rcnn_loss(model, variables, batch: Dict[str, Array],
                      cfg: TwoStageConfig):
    """3-stage cascade training: each stage re-assigns at a higher IoU on
    the previous stage's refined boxes (reference CascadeRoIHead.forward_
    train flow; class-agnostic deltas)."""
    feats = model.apply(variables, batch["image"], method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    l_rpn_cls, l_rpn_reg = rpn_loss(rpn_outs, batch, cfg)
    props, pvalid = rpn_proposals(
        jax.tree.map(jax.lax.stop_gradient, rpn_outs),
        batch["img_shape"], cfg)
    losses = {"loss_rpn_cls": l_rpn_cls, "loss_rpn_bbox": l_rpn_reg}
    total = l_rpn_cls + l_rpn_reg
    B = props.shape[0]
    S = cfg.rcnn_num_samples
    for st in range(3):
        scfg = TwoStageConfig(
            **{**cfg.__dict__, "rcnn_pos_iou": CASCADE_IOUS[st],
               "rcnn_stds": CASCADE_STDS[st]})
        rois, labels, deltas, pos, valid = sample_rois(
            props, pvalid, batch["gt_bboxes"], batch["gt_valid"],
            batch["gt_labels"], scfg)
        cls_logits, reg = model.apply(
            variables, feats, _rois_with_batch_idx(rois), stage=st,
            method="roi_forward_stage")
        # class-agnostic: reg is (BS, 4) — reuse rcnn_loss with C=1 view
        l_cls, l_reg = _cascade_stage_loss(cls_logits, reg, labels, deltas,
                                           pos, valid, cfg.num_classes)
        w = CASCADE_WEIGHTS[st]
        losses[f"s{st}.loss_cls"] = l_cls * w
        losses[f"s{st}.loss_bbox"] = l_reg * w
        total = total + (l_cls + l_reg) * w
        # refine proposals for the next stage with this stage's boxes
        refined = delta2bbox(
            rois.reshape(B * S, 4),
            jax.lax.stop_gradient(reg).astype(jnp.float32),
            stds=CASCADE_STDS[st],
            max_shape=(cfg.image_shape[0], cfg.image_shape[1]))
        props = refined.reshape(B, S, 4)
        pvalid = valid
    return total, losses


def _cascade_stage_loss(cls_logits: Array, reg: Array, labels: Array,
                        deltas: Array, pos: Array, valid: Array,
                        num_classes: int):
    BS = cls_logits.shape[0]
    labels_f = labels.reshape(-1)
    valid_f = valid.reshape(-1).astype(jnp.float32)
    pos_f = pos.reshape(-1).astype(jnp.float32)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels_f[:, None], axis=-1)[:, 0]
    loss_cls = jnp.sum(ce * valid_f) / jnp.maximum(jnp.sum(valid_f), 1.0)
    diff = jnp.abs(reg.astype(jnp.float32) - deltas.reshape(BS, 4))
    sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5).sum(-1)
    # avg_factor = all sampled rois (see rcnn_loss)
    loss_reg = jnp.sum(sl1 * pos_f) / jnp.maximum(jnp.sum(valid_f), 1.0)
    return loss_cls, loss_reg


def cascade_rcnn_decode(model, variables, images: Array, img_shapes: Array,
                        scale_factors: Array, cfg: TwoStageConfig,
                        tcfg: TestConfig, rescale: bool = True) -> Detections:
    """Cascade inference: refine boxes through the 3 stages, average the
    per-stage class scores on the final boxes (reference
    CascadeRoIHead.simple_test)."""
    feats = model.apply(variables, images, method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    props, pvalid = rpn_proposals(rpn_outs, img_shapes, cfg)
    B, P, _ = props.shape
    C = cfg.num_classes
    scores_sum = 0.0
    for st in range(3):
        cls_logits, reg = model.apply(
            variables, feats, _rois_with_batch_idx(props), stage=st,
            method="roi_forward_stage")
        scores_sum = scores_sum + jax.nn.softmax(
            cls_logits.astype(jnp.float32), -1)
        refined = delta2bbox(props.reshape(B * P, 4),
                             reg.astype(jnp.float32),
                             stds=CASCADE_STDS[st])
        props = refined.reshape(B, P, 4)
    # final-stage scores are re-evaluated on the final boxes by mmdet; the
    # running average over stages is the standard ensemble
    probs = (scores_sum / 3.0).reshape(B, P, C + 1)[..., :C]
    probs = probs * pvalid[..., None].astype(probs.dtype)

    def single(props_i, probs_i, img_shape, sf):
        x1 = jnp.clip(props_i[:, 0], 0, img_shape[1])
        y1 = jnp.clip(props_i[:, 1], 0, img_shape[0])
        x2 = jnp.clip(props_i[:, 2], 0, img_shape[1])
        y2 = jnp.clip(props_i[:, 3], 0, img_shape[0])
        boxes = jnp.stack([x1, y1, x2, y2], -1)
        if rescale:
            boxes = boxes / sf[None, :]
        flat_scores = probs_i.reshape(P * C)
        flat_labels = jnp.tile(jnp.arange(C, dtype=jnp.int32), (P,))
        flat_boxes = jnp.repeat(boxes, C, axis=0)
        cand = jnp.where(flat_scores > tcfg.score_thr, flat_scores, NEG_INF)
        k = min(tcfg.nms_pre, P * C)
        top_s, top_i = jax.lax.top_k(cand, k)
        keep_idx, keep_s, keep_v = batched_nms(
            flat_boxes[top_i], top_s, flat_labels[top_i], tcfg.nms_iou,
            tcfg.max_per_img)
        z = keep_v[:, None].astype(boxes.dtype)
        return Detections(flat_boxes[top_i][keep_idx] * z,
                          jnp.where(keep_v, keep_s, 0.0),
                          flat_labels[top_i][keep_idx] * keep_v,
                          jnp.zeros((tcfg.max_per_img, 8), boxes.dtype),
                          keep_v)

    return jax.vmap(single)(props, probs, img_shapes, scale_factors)


def fast_rcnn_decode(model, variables, images: Array, proposals: Array,
                     prop_valid: Array, img_shapes: Array,
                     scale_factors: Array, cfg: TwoStageConfig,
                     tcfg: TestConfig, rescale: bool = True) -> Detections:
    """Fast R-CNN simple_test (reference `fast_rcnn.py` +
    `standard_roi_head.simple_test`): externally supplied per-image
    proposals (B, P, 4) -> RoI head -> per-class decode + NMS."""
    feats = model.apply(variables, images, method="extract")
    cls_logits, reg = model.apply(
        variables, feats, _rois_with_batch_idx(proposals),
        method="roi_forward")
    B, P, _ = proposals.shape
    C = cfg.num_classes
    cls_logits = cls_logits.reshape(B, P, C + 1)
    reg = reg.reshape(B, P, C, 4)

    def single(props_i, pvalid_i, cls_i, reg_i, img_shape, sf):
        probs = jax.nn.softmax(cls_i.astype(jnp.float32), -1)[:, :C]
        probs = probs * pvalid_i[:, None].astype(probs.dtype)
        boxes = delta2bbox(props_i[:, None, :].repeat(C, 1),
                           reg_i.astype(jnp.float32),
                           stds=cfg.rcnn_stds, max_shape=img_shape)
        if rescale:
            boxes = boxes / sf[None, None, :]
        flat_boxes = boxes.reshape(P * C, 4)
        flat_scores = probs.reshape(P * C)
        flat_labels = jnp.tile(jnp.arange(C, dtype=jnp.int32), (P,))
        cand = jnp.where(flat_scores > tcfg.score_thr, flat_scores, NEG_INF)
        k = min(tcfg.nms_pre, P * C)
        top_s, top_i = jax.lax.top_k(cand, k)
        keep_idx, keep_s, keep_v = batched_nms(
            flat_boxes[top_i], top_s, flat_labels[top_i], tcfg.nms_iou,
            tcfg.max_per_img)
        z = keep_v[:, None].astype(boxes.dtype)
        return Detections(flat_boxes[top_i][keep_idx] * z,
                          jnp.where(keep_v, keep_s, 0.0),
                          flat_labels[top_i][keep_idx] * keep_v,
                          jnp.zeros((tcfg.max_per_img, 8), boxes.dtype),
                          keep_v)

    return jax.vmap(single)(proposals, prop_valid, cls_logits, reg,
                            img_shapes, scale_factors)


# ---------------------------------------------------- Mask Scoring R-CNN

def mask_iou_targets(mask_logits: Array, rois: Array, labels: Array,
                     gt_polys: Array, gt_idx: Array) -> Array:
    """Actual IoU between the binarized predicted mask and the rasterized
    GT polygon per RoI (reference `mask_scoring_roi_head.py` +
    `maskiou_head.get_targets` — there computed from area ratios; here
    directly on the 28x28 grids)."""
    S, oh, ow, C = mask_logits.shape
    tgt = rasterize_polygon_in_roi(gt_polys[jnp.maximum(gt_idx, 0)], rois,
                                   oh)
    cls_idx = jnp.clip(labels, 0, C - 1)
    pred = jax.nn.sigmoid(jnp.take_along_axis(
        mask_logits, cls_idx[:, None, None, None], axis=-1)[..., 0]) > 0.5
    predf = pred.astype(jnp.float32)
    inter = (predf * tgt).sum(axis=(1, 2))
    union = jnp.maximum(predf.sum(axis=(1, 2)) + tgt.sum(axis=(1, 2))
                        - inter, 1.0)
    return inter / union


def mask_scoring_rcnn_loss(model, variables, batch: Dict[str, Array],
                           cfg: TwoStageConfig):
    """Mask R-CNN losses + MaskIoU regression (L2 on positive RoIs,
    reference `maskiou_head.loss`)."""
    total, losses = mask_rcnn_loss(model, variables, batch, cfg)
    # recompute the pieces needed for the maskiou branch (cheap next to
    # the extra forward)
    feats = model.apply(variables, batch["image"], method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    props, pvalid = rpn_proposals(
        jax.tree.map(jax.lax.stop_gradient, rpn_outs),
        batch["img_shape"], cfg)
    rois, labels, deltas, pos, valid = sample_rois(
        props, pvalid, batch["gt_bboxes"], batch["gt_valid"],
        batch["gt_labels"], cfg)
    B, S = rois.shape[:2]
    rois5 = _rois_with_batch_idx(rois)
    mask_logits = model.apply(variables, feats, rois5, method="mask_forward")
    maskiou = model.apply(variables, feats, rois5, mask_logits,
                          method="maskiou_forward")

    def gt_of(rois_i, gts, gvalid):
        ious = box_iou(rois_i, gts)
        return jnp.where(gvalid[None, :], ious, -1.0).argmax(axis=1)

    gt_idx = jax.vmap(gt_of)(rois, batch["gt_bboxes"], batch["gt_valid"])
    flat_polys = batch["gt_polygons"].reshape(
        -1, batch["gt_polygons"].shape[-1])
    flat_gt = (gt_idx + jnp.arange(B)[:, None]
               * batch["gt_polygons"].shape[1]).reshape(-1)
    iou_t = mask_iou_targets(mask_logits, rois.reshape(B * S, 4),
                             labels.reshape(-1), flat_polys, flat_gt)
    cls_idx = jnp.clip(labels.reshape(-1), 0, maskiou.shape[-1] - 1)
    iou_p = jnp.take_along_axis(maskiou, cls_idx[:, None], axis=-1)[:, 0]
    posf = pos.reshape(-1).astype(jnp.float32)
    n_pos = jnp.maximum(posf.sum(), 1.0)
    l_iou = 0.5 * jnp.sum((iou_p - jax.lax.stop_gradient(iou_t)) ** 2
                          * posf) / n_pos
    losses["loss_mask_iou"] = l_iou
    return total + l_iou, losses


def mask_scoring_rcnn_decode(model, variables, images: Array,
                             img_shapes: Array, scale_factors: Array,
                             cfg: TwoStageConfig, tcfg: TestConfig,
                             rescale: bool = True):
    """Mask R-CNN decode + maskiou rescoring (score *= predicted IoU)."""
    det, masks = mask_rcnn_decode(model, variables, images, img_shapes,
                                  scale_factors, cfg, tcfg, rescale=rescale)
    feats = model.apply(variables, images, method="extract")
    boxes = det.bboxes
    if rescale:
        boxes = boxes * scale_factors[:, None, :]
    rois = _rois_with_batch_idx(boxes)
    mask_logits = model.apply(variables, feats, rois, method="mask_forward")
    maskiou = model.apply(variables, feats, rois, mask_logits,
                          method="maskiou_forward")
    B, Kd = det.bboxes.shape[:2]
    cls_idx = jnp.clip(det.labels.reshape(-1), 0, maskiou.shape[-1] - 1)
    iou = jnp.take_along_axis(maskiou, cls_idx[:, None],
                              axis=-1)[:, 0].reshape(B, Kd)
    scores = det.scores * jnp.clip(iou, 0.0, 1.0)
    return det._replace(scores=jnp.where(det.valid, scores, 0.0)), masks


# ---------------------------------------------------------- Grid R-CNN ---

def _grid_sub_regions(grid_points: int, whole: int):
    """Per-point half-size sub-region origins (Grid R-CNN Plus,
    `grid_head.py:189-219`)."""
    gs = int(np.sqrt(grid_points))
    half = whole // 4 * 2
    regions = []
    for i in range(grid_points):
        xi, yi = i // gs, i % gs
        if xi == 0:
            sx = 0
        elif xi == gs - 1:
            sx = half
        else:
            sx = max(int((xi / (gs - 1) - 0.25) * whole), 0)
        if yi == 0:
            sy = 0
        elif yi == gs - 1:
            sy = half
        else:
            sy = max(int((yi / (gs - 1) - 0.25) * whole), 0)
        regions.append((sx, sy))
    return regions, half


def grid_targets(pos_bboxes: Array, gt_bboxes: Array, grid_points: int = 9,
                 whole: int = 56, radius: int = 1) -> Array:
    """Per-positive-RoI grid-point disk targets in the half-sized
    sub-region maps (vectorized `grid_head.get_targets`, ref :220-287)."""
    gs = int(np.sqrt(grid_points))
    regions, half = _grid_sub_regions(grid_points, whole)
    x1 = pos_bboxes[:, 0] - (pos_bboxes[:, 2] - pos_bboxes[:, 0]) / 2
    y1 = pos_bboxes[:, 1] - (pos_bboxes[:, 3] - pos_bboxes[:, 1]) / 2
    x2 = pos_bboxes[:, 2] + (pos_bboxes[:, 2] - pos_bboxes[:, 0]) / 2
    y2 = pos_bboxes[:, 3] + (pos_bboxes[:, 3] - pos_bboxes[:, 1]) / 2
    w = jnp.maximum(x2 - x1, 1e-6)
    h = jnp.maximum(y2 - y1, 1e-6)
    big = (w > gs) & (h > gs)
    maps = []
    gy, gx = jnp.mgrid[0:half, 0:half]
    for j in range(grid_points):
        fx = 1 - (j // gs) / (gs - 1)
        fy = 1 - (j % gs) / (gs - 1)
        px = fx * gt_bboxes[:, 0] + (1 - fx) * gt_bboxes[:, 2]
        py = fy * gt_bboxes[:, 1] + (1 - fy) * gt_bboxes[:, 3]
        cx = jnp.floor((px - x1) / w * whole).astype(jnp.int32) - regions[j][0]
        cy = jnp.floor((py - y1) / h * whole).astype(jnp.int32) - regions[j][1]
        d2 = ((gx[None] - cx[:, None, None]) ** 2
              + (gy[None] - cy[:, None, None]) ** 2)
        maps.append(((d2 <= radius ** 2) & big[:, None, None]
                     ).astype(jnp.float32))
    return jnp.stack(maps, axis=-1)                       # (S, half, half, G)


def grid_rcnn_loss(model, variables, batch: Dict[str, Array],
                   cfg: TwoStageConfig, *, grid_points: int = 9,
                   loss_weight: float = 15.0):
    """Faster R-CNN rpn+cls losses + grid heatmap BCE (fused + unfused,
    reference `grid_roi_head.forward_train` + `grid_head.loss`)."""
    total, losses = two_stage_loss(model, variables, batch, cfg)
    feats = model.apply(variables, batch["image"], method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    props, pvalid = rpn_proposals(
        jax.tree.map(jax.lax.stop_gradient, rpn_outs),
        batch["img_shape"], cfg)
    rois, labels, deltas, pos, valid = sample_rois(
        props, pvalid, batch["gt_bboxes"], batch["gt_valid"],
        batch["gt_labels"], cfg)
    B, S = rois.shape[:2]
    grid_out = model.apply(variables, feats, _rois_with_batch_idx(rois),
                           method="grid_forward")

    def gt_of(rois_i, gts, gvalid):
        ious = box_iou(rois_i, gts)
        return jnp.where(gvalid[None, :], ious, -1.0).argmax(axis=1)

    gt_idx = jax.vmap(gt_of)(rois, batch["gt_bboxes"], batch["gt_valid"])
    flat_gt = jnp.take_along_axis(batch["gt_bboxes"],
                                  gt_idx[..., None], axis=1)
    tgt = grid_targets(rois.reshape(B * S, 4), flat_gt.reshape(B * S, 4),
                       grid_points)
    posf = pos.reshape(-1).astype(jnp.float32)[:, None, None, None]
    n_pos = jnp.maximum(posf.sum(), 1.0)
    l_grid = 0.0
    for key in ("fused", "unfused"):
        logits = grid_out[key].astype(jnp.float32)
        bce = (jnp.maximum(logits, 0) - logits * tgt
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        l_grid = l_grid + jnp.sum(bce.mean(axis=(1, 2, 3),
                                           keepdims=True) * posf) / n_pos
    losses["loss_grid"] = l_grid * loss_weight
    return total + losses["loss_grid"], losses


def grid_rcnn_decode(model, variables, images: Array, img_shapes: Array,
                     scale_factors: Array, cfg: TwoStageConfig,
                     tcfg: TestConfig, rescale: bool = True,
                     grid_points: int = 9) -> Detections:
    """two_stage decode, then box edges re-localized by grid-point heatmap
    voting (reference `grid_head.get_bboxes`, :294-370)."""
    det = two_stage_decode(model, variables, images, img_shapes,
                           scale_factors, cfg, tcfg, rescale=False)
    feats = model.apply(variables, images, method="extract")
    boxes = det.bboxes
    B, Kd = boxes.shape[:2]
    grid_out = model.apply(variables, feats,
                           _rois_with_batch_idx(boxes),
                           method="grid_forward")
    hm = jax.nn.sigmoid(grid_out["fused"].astype(jnp.float32))
    R, hh, ww, G = hm.shape
    gs = int(np.sqrt(grid_points))
    regions, half = _grid_sub_regions(grid_points, hh * 2)
    flat = hm.transpose(0, 3, 1, 2).reshape(R, G, hh * ww)
    score = flat.max(-1)
    posn = flat.argmax(-1)
    xs = (posn % ww).astype(jnp.float32) \
        + jnp.asarray([r[0] for r in regions], jnp.float32)[None, :]
    ys = (posn // ww).astype(jnp.float32) \
        + jnp.asarray([r[1] for r in regions], jnp.float32)[None, :]
    fb = boxes.reshape(R, 4)
    wdt = fb[:, 2] - fb[:, 0]
    hgt = fb[:, 3] - fb[:, 1]
    ex1 = fb[:, 0] - wdt / 2
    ey1 = fb[:, 1] - hgt / 2
    whole = float(hh * 2)
    ax = (xs + 0.5) / whole * (2 * wdt)[:, None] + ex1[:, None]
    ay = (ys + 0.5) / whole * (2 * hgt)[:, None] + ey1[:, None]
    x1i = [i for i in range(gs)]
    y1i = [i * gs for i in range(gs)]
    x2i = [grid_points - gs + i for i in range(gs)]
    y2i = [(i + 1) * gs - 1 for i in range(gs)]

    def vote(vals, sc, idx):
        s = sc[:, idx]
        return (vals[:, idx] * s).sum(-1) / jnp.maximum(s.sum(-1), 1e-6)

    nx1 = vote(ax, score, x1i)
    ny1 = vote(ay, score, y1i)
    nx2 = vote(ax, score, x2i)
    ny2 = vote(ay, score, y2i)
    new = jnp.stack([nx1, ny1, nx2, ny2], -1).reshape(B, Kd, 4)
    shp = img_shapes.astype(jnp.float32)
    new = jnp.stack([jnp.clip(new[..., 0], 0, shp[:, None, 1]),
                     jnp.clip(new[..., 1], 0, shp[:, None, 0]),
                     jnp.clip(new[..., 2], 0, shp[:, None, 1]),
                     jnp.clip(new[..., 3], 0, shp[:, None, 0])], -1)
    if rescale:
        new = new / scale_factors[:, None, :]
    new = new * det.valid[..., None].astype(new.dtype)
    return det._replace(bboxes=new)


# ------------------------------------------------------------------ HTC ---

def htc_loss(model, variables, batch: Dict[str, Array],
             cfg: TwoStageConfig, *, sem_loss_weight: float = 0.2):
    """Hybrid Task Cascade training (reference
    `htc_roi_head.forward_train`, interleaved): per stage — bbox loss,
    refine, mask loss on the refined rois with mask info flow; plus the
    semantic branch CE. Requires the segm pipeline's gt_polygons."""
    feats = model.apply(variables, batch["image"], method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    l_rpn_cls, l_rpn_reg = rpn_loss(rpn_outs, batch, cfg)
    props, pvalid = rpn_proposals(
        jax.tree.map(jax.lax.stop_gradient, rpn_outs),
        batch["img_shape"], cfg)
    sem_logits, sem_feat = model.apply(variables, feats, method="semantic")
    losses = {"loss_rpn_cls": l_rpn_cls, "loss_rpn_bbox": l_rpn_reg}
    total = l_rpn_cls + l_rpn_reg
    B = props.shape[0]
    S = cfg.rcnn_num_samples
    last_feat = None
    for st in range(3):
        scfg = TwoStageConfig(
            **{**cfg.__dict__, "rcnn_pos_iou": CASCADE_IOUS[st],
               "rcnn_stds": CASCADE_STDS[st]})
        rois, labels, deltas, pos, valid = sample_rois(
            props, pvalid, batch["gt_bboxes"], batch["gt_valid"],
            batch["gt_labels"], scfg)
        rois5 = _rois_with_batch_idx(rois)
        cls_logits, reg = model.apply(
            variables, feats, rois5, st, sem_feat,
            method="roi_forward_stage")
        l_cls, l_reg = _cascade_stage_loss(cls_logits, reg, labels, deltas,
                                           pos, valid, cfg.num_classes)
        w = CASCADE_WEIGHTS[st]
        losses[f"s{st}.loss_cls"] = l_cls * w
        losses[f"s{st}.loss_bbox"] = l_reg * w
        total = total + (l_cls + l_reg) * w
        # interleaved: refine rois BEFORE the mask branch (ref :268-290)
        refined = delta2bbox(
            rois.reshape(B * S, 4),
            jax.lax.stop_gradient(reg).astype(jnp.float32),
            stds=CASCADE_STDS[st],
            max_shape=(cfg.image_shape[0], cfg.image_shape[1]))
        props = refined.reshape(B, S, 4)
        pvalid = valid
        mrois = _rois_with_batch_idx(props)
        mask_logits, last_feat = model.apply(
            variables, feats, mrois, st, sem_feat, last_feat,
            method="mask_forward_stage")

        def gt_of(rois_i, gts, gvalid):
            ious = box_iou(rois_i, gts)
            return jnp.where(gvalid[None, :], ious, -1.0).argmax(axis=1)

        gt_idx = jax.vmap(gt_of)(props, batch["gt_bboxes"],
                                 batch["gt_valid"])
        l_mask = mask_loss(
            mask_logits, props.reshape(B * S, 4), labels.reshape(-1),
            pos.reshape(-1),
            batch["gt_polygons"].reshape(-1,
                                         batch["gt_polygons"].shape[-1]),
            (gt_idx + jnp.arange(B)[:, None]
             * batch["gt_polygons"].shape[1]).reshape(-1), cfg)
        losses[f"s{st}.loss_mask"] = l_mask * w
        total = total + l_mask * w

    # semantic CE against the box-derived class map (the reference trains
    # on stuff+thing panoptic maps, unavailable in a detection-only
    # pipeline — boxes are the best offline supervision here)
    from .cpv import make_sem_targets
    sem_map, sem_w = make_sem_targets(
        batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
        cfg.image_shape, cfg.num_classes)
    sh, sw = sem_logits.shape[1:3]
    tgt = jax.image.resize(sem_map, (sem_map.shape[0], sh, sw,
                                     sem_map.shape[-1]), method="nearest")
    cls_map = jnp.where(tgt.max(-1) > 0, tgt.argmax(-1),
                        cfg.num_classes)
    logp = jax.nn.log_softmax(sem_logits.astype(jnp.float32), -1)
    ce = -jnp.take_along_axis(logp, cls_map[..., None], axis=-1)[..., 0]
    losses["loss_semantic_seg"] = ce.mean() * sem_loss_weight
    total = total + losses["loss_semantic_seg"]
    return total, losses


def htc_decode(model, variables, images: Array, img_shapes: Array,
               scale_factors: Array, cfg: TwoStageConfig,
               tcfg: TestConfig, rescale: bool = True):
    """HTC simple_test: cascade box ensemble + per-stage masks averaged on
    the final boxes (reference `htc_roi_head.simple_test` merge)."""
    feats = model.apply(variables, images, method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    _, sem_feat = model.apply(variables, feats, method="semantic")
    props, pvalid = rpn_proposals(rpn_outs, img_shapes, cfg)
    B, P, _ = props.shape
    C = cfg.num_classes
    scores_sum = 0.0
    for st in range(3):
        cls_logits, reg = model.apply(
            variables, feats, _rois_with_batch_idx(props), st, sem_feat,
            method="roi_forward_stage")
        scores_sum = scores_sum + jax.nn.softmax(
            cls_logits.astype(jnp.float32), -1)
        refined = delta2bbox(props.reshape(B * P, 4),
                             reg.astype(jnp.float32),
                             stds=CASCADE_STDS[st])
        props = refined.reshape(B, P, 4)
    probs = (scores_sum / 3.0).reshape(B, P, C + 1)[..., :C]
    probs = probs * pvalid[..., None].astype(probs.dtype)

    def single(props_i, probs_i, img_shape, sf):
        x1 = jnp.clip(props_i[:, 0], 0, img_shape[1])
        y1 = jnp.clip(props_i[:, 1], 0, img_shape[0])
        x2 = jnp.clip(props_i[:, 2], 0, img_shape[1])
        y2 = jnp.clip(props_i[:, 3], 0, img_shape[0])
        boxes = jnp.stack([x1, y1, x2, y2], -1)
        if rescale:
            boxes = boxes / sf[None, :]
        flat_scores = probs_i.reshape(P * C)
        flat_labels = jnp.tile(jnp.arange(C, dtype=jnp.int32), (P,))
        flat_boxes = jnp.repeat(boxes, C, axis=0)
        cand = jnp.where(flat_scores > tcfg.score_thr, flat_scores, NEG_INF)
        k = min(tcfg.nms_pre, P * C)
        top_s, top_i = jax.lax.top_k(cand, k)
        keep_idx, keep_s, keep_v = batched_nms(
            flat_boxes[top_i], top_s, flat_labels[top_i], tcfg.nms_iou,
            tcfg.max_per_img)
        z = keep_v[:, None].astype(boxes.dtype)
        return Detections(flat_boxes[top_i][keep_idx] * z,
                          jnp.where(keep_v, keep_s, 0.0),
                          flat_labels[top_i][keep_idx] * keep_v,
                          jnp.zeros((tcfg.max_per_img, 8), boxes.dtype),
                          keep_v)

    det = jax.vmap(single)(props, probs, img_shapes, scale_factors)
    boxes = det.bboxes
    if rescale:
        boxes = boxes * scale_factors[:, None, :]
    rois = _rois_with_batch_idx(boxes)
    msum = 0.0
    last = None
    for st in range(3):
        m, last = model.apply(variables, feats, rois, st, sem_feat, last,
                              method="mask_forward_stage")
        msum = msum + jax.nn.sigmoid(m.astype(jnp.float32))
    B2, K2 = det.bboxes.shape[:2]
    oh = msum.shape[1]
    cls_idx = jnp.clip(det.labels.reshape(-1), 0, msum.shape[-1] - 1)
    sel = jnp.take_along_axis(msum / 3.0, cls_idx[:, None, None, None],
                              axis=-1)[..., 0]
    return det, sel.reshape(B2, K2, oh, oh)


# ------------------------------------------------------------ PointRend ---

def _uncertain_points(mask_logits_cls: Array, n_points: int) -> Array:
    """Top-``n_points`` most uncertain (|logit| smallest) locations of a
    (S, H, W) map as normalized xy (deterministic stand-in for the
    reference's oversample-random mix — static shapes on TPU)."""
    S, H, W = mask_logits_cls.shape
    unc = -jnp.abs(mask_logits_cls).reshape(S, H * W)
    _, idx = jax.lax.top_k(unc, n_points)
    xs = ((idx % W).astype(jnp.float32) + 0.5) / W
    ys = ((idx // W).astype(jnp.float32) + 0.5) / H
    return jnp.stack([xs, ys], -1)


def point_rend_loss(model, variables, batch: Dict[str, Array],
                    cfg: TwoStageConfig, *, num_points: int = 196):
    """Mask R-CNN losses + PointRend point BCE at the most uncertain
    coarse-mask points (reference `point_rend_roi_head.py` train flow;
    deterministic uncertainty-only point selection)."""
    total, losses = mask_rcnn_loss(model, variables, batch, cfg)
    feats = model.apply(variables, batch["image"], method="extract")
    rpn_outs = model.apply(variables, feats, method="rpn")
    props, pvalid = rpn_proposals(
        jax.tree.map(jax.lax.stop_gradient, rpn_outs),
        batch["img_shape"], cfg)
    rois, labels, deltas, pos, valid = sample_rois(
        props, pvalid, batch["gt_bboxes"], batch["gt_valid"],
        batch["gt_labels"], cfg)
    B, S = rois.shape[:2]
    rois5 = _rois_with_batch_idx(rois)
    mask_logits = model.apply(variables, feats, rois5,
                              method="mask_forward")
    cls_idx = jnp.clip(labels.reshape(-1), 0, mask_logits.shape[-1] - 1)
    sel = jnp.take_along_axis(mask_logits, cls_idx[:, None, None, None],
                              axis=-1)[..., 0]
    pts = _uncertain_points(jax.lax.stop_gradient(sel), num_points)
    pt_logits = model.apply(variables, feats, rois5, pts, mask_logits,
                            method="point_forward")
    pt_sel = jnp.take_along_axis(pt_logits, cls_idx[:, None, None],
                                 axis=-1)[..., 0]

    def gt_of(rois_i, gts, gvalid):
        ious = box_iou(rois_i, gts)
        return jnp.where(gvalid[None, :], ious, -1.0).argmax(axis=1)

    gt_idx = jax.vmap(gt_of)(rois, batch["gt_bboxes"], batch["gt_valid"])
    flat_polys = batch["gt_polygons"].reshape(
        -1, batch["gt_polygons"].shape[-1])
    flat_gt = (gt_idx + jnp.arange(B)[:, None]
               * batch["gt_polygons"].shape[1]).reshape(-1)
    # GT values at the sampled points: rasterize at a fine grid and sample
    tgt_grid = rasterize_polygon_in_roi(
        flat_polys[jnp.maximum(flat_gt, 0)], rois.reshape(B * S, 4), 56)
    from ..models.heads.two_stage import point_sample
    tgt = point_sample(tgt_grid[..., None], pts)[..., 0]
    bce = (jnp.maximum(pt_sel, 0) - pt_sel * tgt
           + jnp.log1p(jnp.exp(-jnp.abs(pt_sel))))
    posf = pos.reshape(-1).astype(jnp.float32)
    n_pos = jnp.maximum(posf.sum(), 1.0)
    l_point = jnp.sum(bce.mean(-1) * posf) / n_pos
    losses["loss_point"] = l_point
    return total + l_point, losses


def point_rend_decode(model, variables, images: Array, img_shapes: Array,
                      scale_factors: Array, cfg: TwoStageConfig,
                      tcfg: TestConfig, rescale: bool = True,
                      subdivision_steps: int = 2, num_points: int = 784):
    """Mask R-CNN decode + PointRend subdivision refinement: at each step,
    upsample 2x and replace the most uncertain points with point-head
    predictions (reference `point_rend_roi_head.simple_test_mask`)."""
    det, _ = mask_rcnn_decode(model, variables, images, img_shapes,
                              scale_factors, cfg, tcfg, rescale=rescale)
    feats = model.apply(variables, images, method="extract")
    boxes = det.bboxes
    if rescale:
        boxes = boxes * scale_factors[:, None, :]
    rois = _rois_with_batch_idx(boxes)
    mask_logits = model.apply(variables, feats, rois, method="mask_forward")
    B, Kd = det.bboxes.shape[:2]
    cls_idx = jnp.clip(det.labels.reshape(-1), 0, mask_logits.shape[-1] - 1)
    cur = jnp.take_along_axis(mask_logits, cls_idx[:, None, None, None],
                              axis=-1)[..., 0]                  # (N, 28, 28)
    from ..models.heads.two_stage import point_sample
    for _ in range(subdivision_steps):
        N, H, W = cur.shape
        cur = jax.image.resize(cur, (N, H * 2, W * 2), method="bilinear")
        pts = _uncertain_points(cur, num_points)
        pt_logits = model.apply(variables, feats, rois, pts, mask_logits,
                                method="point_forward")
        pt_sel = jnp.take_along_axis(pt_logits, cls_idx[:, None, None],
                                     axis=-1)[..., 0]
        H2, W2 = cur.shape[1:]
        xi = jnp.clip((pts[..., 0] * W2).astype(jnp.int32), 0, W2 - 1)
        yi = jnp.clip((pts[..., 1] * H2).astype(jnp.int32), 0, H2 - 1)
        flat = cur.reshape(N, H2 * W2)
        flat = jax.vmap(lambda f, i, v: f.at[i].set(v))(
            flat, yi * W2 + xi, pt_sel)
        cur = flat.reshape(N, H2, W2)
    masks = jax.nn.sigmoid(cur.astype(jnp.float32))
    oh = masks.shape[1]
    return det, masks.reshape(B, Kd, oh, oh)
