"""Cross-IOU loss — fully vectorized, mask-driven (no boolean indexing).

Re-derivation of `/root/reference/code/mmdet/models/losses/cross_iou_loss.py`
(172 LoC).  Semantics reproduced exactly:

* the 4-slot landmark layout: per coordinate a (neg, pos) slot pair; the GT
  fills one slot with |offset| and the *other* slot is alpha-filled with
  ``alpha * positive_value`` (ref :65-66, done here via masks rather than
  in-place indexing);
* ``bbox`` mode: single cross-IOU ratio over all 4*(nv+1) components (:79-84);
* ``polygon`` mode: stride-grouped subsets (stride=9) averaged (:68-77);
* ``keypoint`` mode: per-point pair IOU, visibility-masked, normalized by the
  total pair count (:85-96), no DIoU penalty (:129-130);
* bbox/polygon add the DIoU/CIoU-style penalty from decoded enclosing boxes
  ``rho2/c2 + v^2/(1-IoU+v)`` (:98-128);
* zero-positive batches reduce to 0 with zero gradients (:153-154).

All inputs are flat (N, D) with a per-row weight; reduction is
``sum(loss * w) / avg_factor``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def decode_bbox_from_extreme(pred: Array, anchor_pts: Array) -> Array:
    """(N, 20) 4-slot landmarks + (N, 2) anchors -> (N, 4) x1y1x2y2
    (ref ``get_bbox_from_extreme`` :10-33)."""
    pairs = pred.reshape(pred.shape[0], -1, 2)
    val = jnp.max(pairs, axis=2)
    sign = jnp.where(jnp.argmax(pairs, axis=2) == 0, -1.0, 1.0)
    signed = (val * sign).reshape(pred.shape[0], -1, 2)   # (N, 5, [y, x])
    xs = signed[:, :, 1] + anchor_pts[:, None, 0]
    ys = signed[:, :, 0] + anchor_pts[:, None, 1]
    # point order: top, left, bottom, right, center
    return jnp.stack([xs[:, 1], ys[:, 0], xs[:, 3], ys[:, 2]], axis=1)


def decode_bbox_from_polygon(pred: Array, anchor_pts: Array) -> Array:
    """(N, (nv+1)*4) landmarks -> enclosing box of the nv polygon points
    (ref ``get_bbox_from_polygon`` :35-59; drops the final center group)."""
    body = pred[:, :-4]
    pairs = body.reshape(body.shape[0], -1, 2)
    val = jnp.max(pairs, axis=2)
    sign = jnp.where(jnp.argmax(pairs, axis=2) == 0, -1.0, 1.0)
    signed = (val * sign).reshape(body.shape[0], -1, 2)   # (N, nv, [y, x])
    xs = signed[:, :, 1] + anchor_pts[:, None, 0]
    ys = signed[:, :, 0] + anchor_pts[:, None, 1]
    return jnp.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1)


def _alpha_fill(target: Array, pos_inds: Array, alpha: float) -> Array:
    """Fill each pair's negative slot with alpha * its positive slot."""
    N, D = target.shape
    tp = target.reshape(N, -1, 2)
    pm = pos_inds.reshape(N, -1, 2)
    pos_val = jnp.sum(jnp.where(pm, tp, 0.0), axis=2, keepdims=True)
    return jnp.where(pm, tp, alpha * pos_val).reshape(N, D)


def _diou_penalty(bbox_pred: Array, bbox_gt: Array, overlaps: Array,
                  eps: float) -> Array:
    enclose_x1y1 = jnp.minimum(bbox_pred[:, :2], bbox_gt[:, :2])
    enclose_x2y2 = jnp.maximum(bbox_pred[:, 2:], bbox_gt[:, 2:])
    wh = jnp.clip(enclose_x2y2 - enclose_x1y1, 0.0)
    c2 = wh[:, 0] ** 2 + wh[:, 1] ** 2 + eps
    b1x1, b1y1, b1x2, b1y2 = (bbox_pred[:, i] for i in range(4))
    b2x1, b2y1, b2x2, b2y2 = (bbox_gt[:, i] for i in range(4))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    rho2 = (((b2x1 + b2x2) - (b1x1 + b1x2)) ** 2
            + ((b2y1 + b2y2) - (b1y1 + b1y2)) ** 2) / 4.0
    factor = 4.0 / math.pi ** 2
    v = factor * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    return rho2 / c2 + v ** 2 / jnp.maximum(1.0 - overlaps + v, eps)


def cross_iou_loss(pred: Array, target: Array, weight: Array, *,
                   loss_type: str, anchor_pts: Optional[Array] = None,
                   vs: Optional[Array] = None,
                   bbox_gt: Optional[Array] = None,
                   pos_inds: Optional[Array] = None,
                   avg_factor: Array | float = 1.0,
                   eps: float = 1e-6, alpha: float = 0.2, stride: int = 9,
                   loss_weight: float = 1.0) -> Array:
    """Weighted cross-IOU loss (mean reduction over avg_factor).

    Args:
      pred: (N, D) softplus'd 4-slot landmark predictions (stride units
        already multiplied in by the caller).
      target: (N, D) encoded GT regression (same layout).
      weight: (N,) row weights (1 for positives).
      pos_inds: (N, D) bool — which slot of each pair is the GT slot.
      vs: (N, nv) keypoint visibility (keypoint mode).
      bbox_gt: (N, 4) GT boxes (bbox/polygon modes).
    """
    pred = pred.astype(jnp.float32)
    target = _alpha_fill(target.astype(jnp.float32), pos_inds, alpha)
    N = pred.shape[0]

    if loss_type == "polygon":
        total = jnp.stack([pred, target], -1)             # (N, D, 2)
        groups = total.reshape(N, -1, 4, 2)               # (N, G, 4, 2)
        subs = []
        for i in range(stride):
            sub = groups[:, i::stride].reshape(N, -1, 2)
            l_max = jnp.max(sub, axis=2)
            l_min = jnp.min(sub, axis=2)
            subs.append(l_min.sum(1) / jnp.maximum(l_max.sum(1), eps))
        overlaps = jnp.stack(subs, -1).sum(-1) / stride
    elif loss_type == "bbox":
        total = jnp.stack([pred, target], -1)
        l_max = jnp.max(total, axis=2)
        l_min = jnp.min(total, axis=2)
        overlaps = l_min.sum(1) / jnp.maximum(l_max.sum(1), eps)
    else:  # keypoint
        tr = target.reshape(N, -1, 2)
        pr = pred.reshape(N, -1, 2)
        total = jnp.stack([pr, tr], -1)                   # (N, P, 2, 2)
        l_max = jnp.clip(jnp.max(total, axis=-1), eps)
        l_min = jnp.min(total, axis=-1)
        pair_iou = l_min.sum(-1) / l_max.sum(-1)          # (N, P)
        vsb = (vs > 0).astype(pair_iou.dtype)             # (N, nv)
        vs2 = jnp.repeat(vsb, 2, axis=1)                  # (N, 2*nv)
        mask = jnp.concatenate(
            [vs2, jnp.ones((N, 2), pair_iou.dtype)], axis=1)
        pair_iou = pair_iou * mask
        overlaps = pair_iou.sum(-1) / total.shape[1]

    if loss_type == "bbox":
        bbox_pred = decode_bbox_from_extreme(pred, anchor_pts)
        loss = 1.0 - (overlaps - _diou_penalty(bbox_pred, bbox_gt, overlaps, eps))
    elif loss_type == "polygon":
        bbox_pred = decode_bbox_from_polygon(pred, anchor_pts)
        loss = 1.0 - (overlaps - _diou_penalty(bbox_pred, bbox_gt, overlaps, eps))
    else:
        loss = 1.0 - overlaps

    w = weight.astype(jnp.float32)
    return loss_weight * jnp.sum(loss * w) / jnp.maximum(avg_factor, 1.0)
