"""General loss zoo — parity with the reference's loss inventory
(`/root/reference/code/mmdet/models/losses/`): IoU family (iou_loss.py:
IoU/GIoU/DIoU/CIoU), SmoothL1/L1, cross-entropy (+BCE), GHM-C, associative
embedding (ae_loss.py) and Chamfer loss (chamfer_loss.py, DenseRepPointsV2).

All are pure elementwise/reduction JAX with the mmdet ``weight`` /
``avg_factor`` conventions.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _reduce(loss, weight, reduction, avg_factor):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / jnp.maximum(avg_factor, 1e-12)


# ----------------------------------------------------------------- IoU family

def bbox_overlaps_aligned(pred: Array, target: Array, eps: float = 1e-6):
    """Element-wise IoU of aligned (N,4) x1y1x2y2 boxes."""
    lt = jnp.maximum(pred[:, :2], target[:, :2])
    rb = jnp.minimum(pred[:, 2:], target[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    ap = jnp.clip(pred[:, 2] - pred[:, 0], 0) * jnp.clip(
        pred[:, 3] - pred[:, 1], 0)
    at = jnp.clip(target[:, 2] - target[:, 0], 0) * jnp.clip(
        target[:, 3] - target[:, 1], 0)
    return inter / jnp.maximum(ap + at - inter, eps)


def iou_loss(pred, target, weight=None, *, eps=1e-6, reduction="mean",
             avg_factor=None, loss_weight=1.0):
    loss = -jnp.log(jnp.clip(bbox_overlaps_aligned(pred, target, eps),
                             eps, 1.0))
    return loss_weight * _reduce(loss, weight, reduction, avg_factor)


def giou_loss(pred, target, weight=None, *, eps=1e-6, reduction="mean",
              avg_factor=None, loss_weight=1.0):
    ious = bbox_overlaps_aligned(pred, target, eps)
    lt = jnp.minimum(pred[:, :2], target[:, :2])
    rb = jnp.maximum(pred[:, 2:], target[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    enclose = jnp.maximum(wh[:, 0] * wh[:, 1], eps)
    ap = jnp.clip(pred[:, 2] - pred[:, 0], 0) * jnp.clip(
        pred[:, 3] - pred[:, 1], 0)
    at = jnp.clip(target[:, 2] - target[:, 0], 0) * jnp.clip(
        target[:, 3] - target[:, 1], 0)
    lti = jnp.maximum(pred[:, :2], target[:, :2])
    rbi = jnp.minimum(pred[:, 2:], target[:, 2:])
    whi = jnp.clip(rbi - lti, 0)
    union = ap + at - whi[:, 0] * whi[:, 1]
    gious = ious - (enclose - union) / enclose
    return loss_weight * _reduce(1 - gious, weight, reduction, avg_factor)


def diou_loss(pred, target, weight=None, *, eps=1e-6, reduction="mean",
              avg_factor=None, loss_weight=1.0):
    ious = bbox_overlaps_aligned(pred, target, eps)
    lt = jnp.minimum(pred[:, :2], target[:, :2])
    rb = jnp.maximum(pred[:, 2:], target[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    c2 = wh[:, 0] ** 2 + wh[:, 1] ** 2 + eps
    pc = (pred[:, :2] + pred[:, 2:]) / 2
    tc = (target[:, :2] + target[:, 2:]) / 2
    rho2 = jnp.sum((pc - tc) ** 2, -1)
    return loss_weight * _reduce(1 - ious + rho2 / c2, weight, reduction,
                                 avg_factor)


def ciou_loss(pred, target, weight=None, *, eps=1e-6, reduction="mean",
              avg_factor=None, loss_weight=1.0):
    ious = bbox_overlaps_aligned(pred, target, eps)
    lt = jnp.minimum(pred[:, :2], target[:, :2])
    rb = jnp.maximum(pred[:, 2:], target[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    c2 = wh[:, 0] ** 2 + wh[:, 1] ** 2 + eps
    pc = (pred[:, :2] + pred[:, 2:]) / 2
    tc = (target[:, :2] + target[:, 2:]) / 2
    rho2 = jnp.sum((pc - tc) ** 2, -1)
    w1 = jnp.clip(pred[:, 2] - pred[:, 0], eps)
    h1 = jnp.clip(pred[:, 3] - pred[:, 1], eps)
    w2 = jnp.clip(target[:, 2] - target[:, 0], eps)
    h2 = jnp.clip(target[:, 3] - target[:, 1], eps)
    factor = 4 / math.pi ** 2
    v = factor * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = v / jnp.maximum(1 - ious + v, eps)
    alpha = jax.lax.stop_gradient(alpha)
    return loss_weight * _reduce(1 - ious + rho2 / c2 + alpha * v, weight,
                                 reduction, avg_factor)


# ----------------------------------------------------------------- L1 family

def smooth_l1_loss(pred, target, weight=None, *, beta=1.0,
                   reduction="mean", avg_factor=None, loss_weight=1.0):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    return loss_weight * _reduce(loss, weight, reduction, avg_factor)


def l1_loss(pred, target, weight=None, *, reduction="mean",
            avg_factor=None, loss_weight=1.0):
    return loss_weight * _reduce(jnp.abs(pred - target), weight, reduction,
                                 avg_factor)


# --------------------------------------------------------------- cross-entropy

def cross_entropy_loss(pred, label, weight=None, *, reduction="mean",
                       avg_factor=None, class_weight=None, loss_weight=1.0):
    """Softmax CE, integer labels (N,) over logits (N, C)."""
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, label[:, None].astype(jnp.int32),
                              axis=-1)[:, 0]
    if class_weight is not None:
        ce = ce * jnp.asarray(class_weight)[label]
    return loss_weight * _reduce(ce, weight, reduction, avg_factor)


def binary_cross_entropy_loss(pred, label, weight=None, *, reduction="mean",
                              avg_factor=None, loss_weight=1.0):
    """BCE with logits; label same shape as pred."""
    p = pred.astype(jnp.float32)
    t = label.astype(jnp.float32)
    loss = jnp.maximum(p, 0) - p * t + jnp.log1p(jnp.exp(-jnp.abs(p)))
    return loss_weight * _reduce(loss, weight, reduction, avg_factor)


# --------------------------------------------------------------------- GHM-C

def ghm_c_loss(pred, target, label_weight, *, bins=10, momentum=0.0,
               loss_weight=1.0):
    """Gradient-harmonizing classification loss (`ghm_loss.py` reference):
    reweight examples inversely to the local gradient-norm density.
    target/label_weight: (N, C) one-hot / valid masks."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    t = target.astype(jnp.float32)
    valid = label_weight.astype(bool)
    g = jnp.abs(p - t)
    tot = jnp.maximum(valid.sum(), 1.0)
    weights = jnp.zeros_like(p)
    edges = jnp.linspace(0, 1, bins + 1).at[-1].add(1e-6)
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum()
        w = jnp.where(num_in_bin > 0, tot / jnp.maximum(num_in_bin, 1.0),
                      0.0)
        weights = jnp.where(inds, w, weights)
    weights = weights / bins
    pl = pred.astype(jnp.float32)
    bce = jnp.maximum(pl, 0) - pl * t + jnp.log1p(jnp.exp(-jnp.abs(pl)))
    return loss_weight * (bce * weights).sum() / tot


# ------------------------------------------------------- associative embedding

def ae_loss(tag_preds, match_mask, *, pull_weight=0.25, push_weight=0.25):
    """Grouping loss for corner embeddings (`ae_loss.py` reference):
    pull matched pairs together, push different objects apart.

    tag_preds: (M, 2) [tl_tag, br_tag] per (padded) object;
    match_mask: (M,) valid-object mask.
    """
    t = tag_preds.astype(jnp.float32)
    m = match_mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(), 1.0)
    mean = (t[:, 0] + t[:, 1]) / 2
    pull = (((t[:, 0] - mean) ** 2 + (t[:, 1] - mean) ** 2) * m).sum() / n
    diff = jnp.abs(mean[:, None] - mean[None, :])
    pair_m = m[:, None] * m[None, :] * (1 - jnp.eye(t.shape[0]))
    push = (jnp.maximum(0.0, 1.0 - diff) * pair_m).sum() / jnp.maximum(
        n * (n - 1), 1.0)
    return pull_weight * pull + push_weight * push


def chamfer_loss(pred_pts, gt_pts, weight=None, *, reduction="mean",
                 avg_factor=None, loss_weight=1.0):
    """Point-set chamfer loss (`chamfer_loss.py` reference) on
    (N, P, 2) point sets."""
    from ...ops.misc import chamfer_distance
    d1, d2 = chamfer_distance(pred_pts, gt_pts)
    loss = d1.mean(-1) + d2.mean(-1)
    return loss_weight * _reduce(loss, weight, reduction, avg_factor)
