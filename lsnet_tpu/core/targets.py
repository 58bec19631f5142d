"""Vectorized target construction for the LSHead loss.

Replaces the reference per-image python loop (`lsnet_head.py:796-1019`,
``_target_single``/``get_targets``) with dense, mask-driven gathers over
padded GT arrays: boolean indexing becomes ``jnp.where`` on a per-point
assigned-GT index, ``unmap`` becomes validity masks, and
``images_to_levels`` disappears because points are kept level-concatenated
throughout.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def get_border_center(gt_bboxes: Array) -> Array:
    """(…, M, 4) -> (…, M, 10) border midpoints t,l,b,r + center
    (ref `lsnet_head.py:1677-1697`)."""
    x1, y1, x2, y2 = (gt_bboxes[..., i] for i in range(4))
    cx = (x1 + x2) / 2.0
    cy = (y1 + y2) / 2.0
    return jnp.stack([cx, y1, x1, cy, cx, y2, x2, cy, cx, cy], axis=-1)


def keypoints_with_bbox(gt_bboxes: Array, gt_keypoints_vs: Array):
    """(…,M,4), (…,M,3*nv) -> (kps (…,M,(nv+1)*2), vs (…,M,nv))
    (ref ``process_keypoints_with_bbox`` :1758-1784)."""
    kx = gt_keypoints_vs[..., 0::3]
    ky = gt_keypoints_vs[..., 1::3]
    vs = gt_keypoints_vs[..., 2::3]
    cx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) / 2.0
    cy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) / 2.0
    kps = jnp.stack([kx, ky], axis=-1).reshape(*kx.shape[:-1], -1)
    kps = jnp.concatenate([kps, cx[..., None], cy[..., None]], axis=-1)
    return kps, vs


def keypoints_with_kbox(gt_keypoints_vs: Array):
    """-> (kps, kboxes, vs): box = extent of *visible* keypoints
    (ref ``process_keypoints_with_kbox`` :1786-1828)."""
    kx = gt_keypoints_vs[..., 0::3]
    ky = gt_keypoints_vs[..., 1::3]
    vs = gt_keypoints_vs[..., 2::3]
    vis = vs > 0
    big = 1e7
    xmin = jnp.min(jnp.where(vis, kx, big), axis=-1)
    ymin = jnp.min(jnp.where(vis, ky, big), axis=-1)
    xmax = jnp.max(jnp.where(vis, kx, -1.0), axis=-1)
    ymax = jnp.max(jnp.where(vis, ky, -1.0), axis=-1)
    cx = (xmin + xmax) / 2.0
    cy = (ymin + ymax) / 2.0
    kps = jnp.stack([kx, ky], axis=-1).reshape(*kx.shape[:-1], -1)
    kps = jnp.concatenate([kps, cx[..., None], cy[..., None]], axis=-1)
    kboxes = jnp.stack([xmin, ymin, xmax, ymax], axis=-1)
    return kps, kboxes, vs


def polygons_to_gt(gt_polygons: Array):
    """(…,M,nv*2) xy-interleaved contour -> (polys+center (…,M,(nv+1)*2),
    bboxes (…,M,4)) (ref ``process_polygons`` :1717-1756; the per-instance
    max-area component selection happens in the data pipeline)."""
    px = gt_polygons[..., 0::2]
    py = gt_polygons[..., 1::2]
    xmin = px.min(-1)
    ymin = py.min(-1)
    xmax = px.max(-1)
    ymax = py.max(-1)
    cx = (xmin + xmax) / 2.0
    cy = (ymin + ymax) / 2.0
    polys = jnp.concatenate([gt_polygons, cx[..., None], cy[..., None]], -1)
    bboxes = jnp.stack([xmin, ymin, xmax, ymax], axis=-1)
    return polys, bboxes


class StageTargets(NamedTuple):
    labels: Array          # (N,) int — background = num_classes
    label_weights: Array   # (N,)
    bboxes_gt: Array       # (N, 4)
    bbox_weights: Array    # (N,) row weight (ref keeps (N,4) of equal cols)
    lm_gt: Array           # (N, P*2) landmark targets (extremes/polys/kps)
    kp_vs: Optional[Array] # (N, nv) or None
    num_pos: Array         # scalar — max(count, 1) (ref :984)


def build_stage_targets(gt_idx: Array, point_valid: Array, gt_bboxes: Array,
                        gt_labels: Array, gt_valid: Array, lm_gt_src: Array,
                        num_classes: int,
                        kp_vs_src: Optional[Array] = None) -> StageTargets:
    """Single-image target gather (vmap over batch).

    Args:
      gt_idx: (N,) assigned GT per point, −1 = background.
      lm_gt_src: (M, P*2) per-GT landmark coordinates (image units).
    """
    pos = gt_idx >= 0
    safe = jnp.clip(gt_idx, 0)
    labels = jnp.where(pos, gt_labels[safe], num_classes).astype(jnp.int32)
    # valid points all contribute to cls loss (pos_weight<=0 => weight 1,
    # negatives weight 1, out-of-image points 0 — ref :885-890 + unmap)
    label_weights = point_valid.astype(jnp.float32)
    posf = pos.astype(jnp.float32)
    bboxes_gt = jnp.where(pos[:, None], gt_bboxes[safe], 0.0)
    lm_gt = jnp.where(pos[:, None], lm_gt_src[safe], 0.0)
    kp_vs = (jnp.where(pos[:, None], kp_vs_src[safe], 0.0)
             if kp_vs_src is not None else None)
    num_pos = jnp.maximum(jnp.sum(posf), 1.0)
    return StageTargets(labels, label_weights, bboxes_gt, posf, lm_gt,
                        kp_vs, num_pos)


def encode_gt_reg(gt_pts: Array, anchor_xy: Array, row_weight: Array):
    """GT landmark -> 4-slot regression encoding
    (ref ``get_bbox_gt_reg``/``get_poly_gt_reg`` :402-454).

    Args:
      gt_pts: (N, P*2) xy-interleaved landmark coordinates.
      anchor_xy: (N, 2) grid-point coordinates.
      row_weight: (N,) positive-row indicator.

    Returns:
      (gt_reg (N, P*4) [y-, y+, x-, x+] per point, pos_inds (N, P*4) bool).
    """
    N = gt_pts.shape[0]
    pts = gt_pts.reshape(N, -1, 2)
    off = pts - anchor_xy[:, None, :]
    ox = off[..., 0]
    oy = off[..., 1]

    def pair(o):
        return jnp.stack([jnp.where(o < 0, -o, 0.0),
                          jnp.where(o >= 0, o, 0.0)], axis=-1)

    yx = jnp.concatenate([pair(oy), pair(ox)], axis=-1)   # (N, P, 4)
    gt_reg = yx.reshape(N, -1) * row_weight[:, None]
    pos_inds = jnp.concatenate(
        [jnp.stack([oy < 0, oy >= 0], -1), jnp.stack([ox < 0, ox >= 0], -1)],
        axis=-1).reshape(N, -1)
    return gt_reg, pos_inds
