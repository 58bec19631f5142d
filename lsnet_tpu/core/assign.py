"""Label assignment — vectorized, statically-shaped, vmap-able.

TPU-native re-design of the reference per-image python assigners:

* ``centroid_assign``  — `/root/reference/code/mmdet/core/bbox/assigners/
  centroid_assigner.py:26-140` (init stage; per-GT nearest grid point at the
  GT's matched FPN level; optional polygon-centroid anchor point).
* ``atss_assign``      — `.../atss_assigner.py:29-164` (refine stage; per-level
  top-k by center distance, IoU threshold = mean+std, center-in-gt).

Instead of boolean indexing + per-image loops, everything is dense (N points x
M padded GTs) with validity masks; the outputs are per-point assigned GT
indices (−1 = background) usable by a fully vectorized target builder.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops.nms import box_iou

Array = jax.Array

INF = 1e8


class AssignResult(NamedTuple):
    """Per-point assignment. gt_idx: (N,) int32, −1 for background.

    ``max_overlaps`` is only populated by ATSS (reference parity)."""
    gt_idx: Array
    max_overlaps: Array


def centroid_assign(points: Array, point_valid: Array, gt_bboxes: Array,
                    gt_valid: Array, gt_extremes: Array | None = None, *,
                    scale: float = 4.0, pos_num: int = 1,
                    iou_type: str = "center") -> AssignResult:
    """Init-stage assigner.

    Args:
      points: (N, 3) (x, y, stride).
      point_valid: (N,) bool.
      gt_bboxes: (M, 4) padded; gt_valid (M,) bool.
      gt_extremes: (M, 10) extreme points + center, for iou_type='centroid'.
    """
    N = points.shape[0]
    M = gt_bboxes.shape[0]

    points_xy = points[:, :2]
    points_lvl = jnp.log2(points[:, 2]).astype(jnp.int32)
    lvl_min = jnp.min(points_lvl)
    lvl_max = jnp.max(points_lvl)

    if iou_type == "centroid":
        assert gt_extremes is not None
        gt_xy = _gen_centroid(gt_extremes)
    else:
        gt_xy = (gt_bboxes[:, :2] + gt_bboxes[:, 2:]) / 2.0

    gt_wh = jnp.clip(gt_bboxes[:, 2:] - gt_bboxes[:, :2], 1e-6)
    gt_lvl = ((jnp.log2(gt_wh[:, 0] / scale)
               + jnp.log2(gt_wh[:, 1] / scale)) / 2.0).astype(jnp.int32)
    gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)

    diff = (points_xy[:, None, :] - gt_xy[None, :, :]) / gt_wh[None, :, :]
    distances = jnp.linalg.norm(diff, axis=2)                       # (N, M)
    bad = ((points_lvl[:, None] != gt_lvl[None, :])
           | ~point_valid[:, None] | ~gt_valid[None, :])
    distances = jnp.where(bad, INF, distances)

    # per-GT: pos_num closest points
    neg_d, top_idx = jax.lax.top_k(-distances.T, pos_num)           # (M, k)
    top_d = -neg_d
    # rebuild the "distances_inf" matrix: INF except at the selected points
    dist_inf = jnp.full((N, M), INF, distances.dtype)
    cols = jnp.broadcast_to(jnp.arange(M)[:, None], top_idx.shape)
    dist_inf = dist_inf.at[top_idx.reshape(-1), cols.reshape(-1)].min(
        top_d.reshape(-1))
    # per-point: closest among GTs that selected it
    min_dist = jnp.min(dist_inf, axis=1)
    argmin = jnp.argmin(dist_inf, axis=1)
    gt_idx = jnp.where(min_dist < INF / 2, argmin, -1).astype(jnp.int32)
    return AssignResult(gt_idx, jnp.zeros((N,), distances.dtype))


def _gen_centroid(extremes: Array) -> Array:
    """Polygon centroid of the 4 extreme points via the triangle-centroid
    line-intersection construction (`centroid_assigner.py:95-140`)."""
    pts = extremes[:, :8].reshape(-1, 4, 2)                          # (M,4,2)
    pts_rep = jnp.concatenate([pts, pts], axis=1)                    # (M,8,2)
    cx = []
    cy = []
    for i in range(4):
        tri = pts_rep[:, i:i + 3]                                    # (M,3,2)
        cx.append(jnp.sum(tri[..., 0], -1) / 3.0)
        cy.append(jnp.sum(tri[..., 1], -1) / 3.0)
    cxs = jnp.stack(cx, -1)
    cys = jnp.stack(cy, -1)                                          # (M,4)
    det_l1 = cxs[:, 0] * cys[:, 2] - cys[:, 0] * cxs[:, 2]
    det_l2 = cxs[:, 1] * cys[:, 3] - cys[:, 1] * cxs[:, 3]
    x1mx2 = cxs[:, 0] - cxs[:, 2]
    x3mx4 = cxs[:, 1] - cxs[:, 3]
    y1my2 = cys[:, 0] - cys[:, 2]
    y3my4 = cys[:, 1] - cys[:, 3]
    xnom = det_l1 * x3mx4 - det_l2 * x1mx2
    ynom = det_l1 * y3my4 - det_l2 * y1my2
    denom = x1mx2 * y3my4 - y1my2 * x3mx4
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    return jnp.stack([xnom / denom, ynom / denom], axis=-1)


def atss_assign(bboxes: Array, point_valid: Array,
                num_level_bboxes: Sequence[int], gt_bboxes: Array,
                gt_valid: Array, *, topk: int = 9) -> AssignResult:
    """Refine-stage ATSS assigner on decoded init boxes.

    Args:
      bboxes: (N, 4) decoded init-stage boxes (one per grid point).
      point_valid: (N,) bool; invalid points never become candidates.
      num_level_bboxes: static per-level counts (sum == N).
    """
    N = bboxes.shape[0]
    M = gt_bboxes.shape[0]
    dt = bboxes.dtype

    overlaps = box_iou(bboxes, gt_bboxes)                            # (N, M)

    gt_c = jnp.stack([(gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2.0,
                      (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2.0], -1)
    bb_c = jnp.stack([(bboxes[:, 0] + bboxes[:, 2]) / 2.0,
                      (bboxes[:, 1] + bboxes[:, 3]) / 2.0], -1)
    distances = jnp.sqrt(
        jnp.sum((bb_c[:, None, :] - gt_c[None, :, :]) ** 2, -1))     # (N, M)
    distances = jnp.where(point_valid[:, None], distances, INF)

    # per-level top-k closest candidates per GT
    cand_idx = []
    start = 0
    for n_lvl in num_level_bboxes:
        d_lvl = jax.lax.dynamic_slice_in_dim(distances, start, n_lvl, axis=0)
        k = min(topk, n_lvl)
        _, idx = jax.lax.top_k(-d_lvl.T, k)                          # (M, k)
        cand_idx.append(idx.T + start)                               # (k, M)
        start += n_lvl
    cand_idx = jnp.concatenate(cand_idx, axis=0)                     # (K, M)
    K = cand_idx.shape[0]

    cols = jnp.broadcast_to(jnp.arange(M)[None, :], (K, M))
    cand_overlaps = overlaps[cand_idx, cols]                         # (K, M)

    mean = jnp.mean(cand_overlaps, axis=0)
    # torch.std is Bessel-corrected (unbiased): ddof=1
    std = jnp.std(cand_overlaps, axis=0, ddof=1)
    thr = mean + std
    is_pos = cand_overlaps >= thr[None, :]

    cand_cx = bb_c[cand_idx, 0]
    cand_cy = bb_c[cand_idx, 1]
    l_ = cand_cx - gt_bboxes[None, :, 0]
    t_ = cand_cy - gt_bboxes[None, :, 1]
    r_ = gt_bboxes[None, :, 2] - cand_cx
    b_ = gt_bboxes[None, :, 3] - cand_cy
    in_gts = jnp.minimum(jnp.minimum(l_, t_), jnp.minimum(r_, b_)) > 0.01
    cand_valid = point_valid[cand_idx]
    is_pos = is_pos & in_gts & gt_valid[None, :] & cand_valid

    # duplicate-GT resolution: keep the GT with highest IoU per point
    over_inf = jnp.full((N, M), -INF, dt)
    vals = jnp.where(is_pos, cand_overlaps, -INF)
    over_inf = over_inf.at[cand_idx.reshape(-1), cols.reshape(-1)].max(
        vals.reshape(-1))
    max_overlaps = jnp.max(over_inf, axis=1)
    argmax = jnp.argmax(over_inf, axis=1)
    gt_idx = jnp.where(max_overlaps > -INF / 2, argmax, -1).astype(jnp.int32)
    max_overlaps_out = jnp.where(max_overlaps > -INF / 2, max_overlaps, 0.0)
    return AssignResult(gt_idx, max_overlaps_out)


class MaxIoUAssignResult(NamedTuple):
    """Per-anchor assignment with an ignore band.

    gt_idx: (N,) int32, -1 = background; ignore: (N,) bool — anchors whose
    max IoU falls in [neg_iou_thr, pos_iou_thr) get zero loss weight
    (reference MaxIoUAssigner's assigned==-1 band)."""
    gt_idx: Array
    max_overlaps: Array
    ignore: Array


def max_iou_assign(bboxes: Array, valid: Array, gt_bboxes: Array,
                   gt_valid: Array, *, pos_iou_thr: float = 0.5,
                   neg_iou_thr: float = 0.4, min_pos_iou: float = 0.0,
                   gt_max_assign_all: bool = True) -> MaxIoUAssignResult:
    """Classic anchor IoU assigner (reference
    `/root/reference/code/mmdet/core/bbox/assigners/max_iou_assigner.py`):

    1. anchor -> argmax-IoU GT where max IoU >= pos_iou_thr
    2. max IoU < neg_iou_thr -> background; in between -> ignored
    3. every GT claims its best anchor(s) when that IoU >= min_pos_iou
    """
    N = bboxes.shape[0]
    M = gt_bboxes.shape[0]
    overlaps = box_iou(bboxes, gt_bboxes)                        # (N, M)
    overlaps = jnp.where(valid[:, None] & gt_valid[None, :], overlaps, -1.0)

    max_ov = jnp.max(overlaps, axis=1)
    arg_ov = jnp.argmax(overlaps, axis=1)
    pos = max_ov >= pos_iou_thr
    neg = (max_ov < neg_iou_thr) & (max_ov >= -0.5)
    gt_idx = jnp.where(pos, arg_ov, -1).astype(jnp.int32)
    ignore = ~pos & ~neg

    # step 3: per-GT force-assign the best anchor(s)
    gt_best = jnp.max(overlaps, axis=0)                          # (M,)
    claim_ok = (gt_best >= min_pos_iou) & gt_valid & (gt_best > 0)
    if gt_max_assign_all:
        is_best = (overlaps == gt_best[None, :]) & claim_ok[None, :]
    else:
        best_anchor = jnp.argmax(overlaps, axis=0)               # (M,)
        is_best = (jnp.zeros((N, M), bool)
                   .at[best_anchor, jnp.arange(M)].set(True)
                   & claim_ok[None, :])
    # later GTs override earlier (reference sequential loop order)
    claim_gt = jnp.where(
        jnp.any(is_best, axis=1),
        (is_best * jnp.arange(1, M + 1)[None, :]).max(axis=1) - 1, -1)
    gt_idx = jnp.where(claim_gt >= 0, claim_gt, gt_idx).astype(jnp.int32)
    ignore = ignore & (claim_gt < 0)
    max_ov = jnp.where(max_ov < 0, 0.0, max_ov)
    return MaxIoUAssignResult(gt_idx, max_ov, ignore)
