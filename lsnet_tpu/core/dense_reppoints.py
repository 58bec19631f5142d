"""DenseRepPoints v1/v2 training targets, losses and decode — pure fns.

Rebuilds the reference flow
(`/root/reference/code/mmdet/models/dense_heads/dense_reppoints_head.py:
481-881` + `dense_reppoints_v2_head.py` + `detectors/
dense_reppoints_detector.py`) with static shapes:

* GT point sets: the reference samples ``num_points`` points from a
  distance-transform band around each mask contour on the host
  (`dense_reppoints_head.py:1029-1092`, cv2 + numpy, random).  This build
  resamples the pipeline's GT contour polygons (36 vertices, already
  carried for the segm task) to ``num_points`` by exact arc-length
  interpolation ON DEVICE — deterministic, jittable, no cv2.  The chamfer
  target is the contour either way; the reference's ±2 px band jitter is
  train-time noise around it.
* Per-point mask labels: the reference reads ``gt_mask[pred_point]``
  (`:558-563`); here an exact point-in-polygon test (crossing number over
  the 36 contour edges) evaluated at the predicted init points — jittable.
* Chamfer loss runs on a fixed quota of top-IoU positives
  (``max_pos_chamfer``) instead of a dynamic positive set.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.focal_loss import sigmoid_focal_loss
from ..ops.misc import chamfer_distance
from ..ops.nms import NEG_INF, batched_nms
from . import points as P
from .assign import centroid_assign, max_iou_assign
from .decode import TestConfig

Array = jax.Array


@dataclass(frozen=True)
class DenseRepPointsConfig:
    image_shape: Tuple[int, int]
    num_classes: int
    num_points: int = 729
    num_group: int = 9
    num_score_group: int = 121
    point_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    init_scale: int = 4
    init_pos_num: int = 1
    refine_pos_iou: float = 0.5
    refine_neg_iou: float = 0.4
    refine_min_pos_iou: float = 0.0
    cls_weight: float = 1.0
    bbox_init_weight: float = 0.5
    bbox_refine_weight: float = 1.0
    pts_init_weight: float = 0.5
    pts_refine_weight: float = 1.0
    mask_score_weight: float = 1.0
    smooth_beta: float = 1.0 / 9.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    max_pos_chamfer: int = 32
    gt_contour_points: int = 128   # resampled contour size for chamfer


def resample_polygon(poly: Array, n: int) -> Array:
    """(V, 2) closed polygon -> (n, 2) exact arc-length resampling
    (device-side analogue of the reference's host-side contour sampling;
    see module docstring)."""
    V = poly.shape[0]
    nxt = jnp.roll(poly, -1, axis=0)
    seg = jnp.sqrt(jnp.sum((nxt - poly) ** 2, axis=-1) + 1e-12)   # (V,)
    cum = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(seg)])     # (V+1,)
    total = cum[-1]
    t = jnp.arange(n, dtype=jnp.float32) / n * total
    idx = jnp.clip(jnp.searchsorted(cum, t, side="right") - 1, 0, V - 1)
    frac = (t - cum[idx]) / jnp.maximum(seg[idx], 1e-12)
    return poly[idx] + (nxt[idx] - poly[idx]) * frac[:, None]


def point_in_polygon(poly: Array, pts: Array) -> Array:
    """Crossing-number inside test. poly (V, 2); pts (..., 2) -> bool."""
    x = pts[..., 0][..., None]
    y = pts[..., 1][..., None]
    x1 = poly[:, 0]
    y1 = poly[:, 1]
    x2 = jnp.roll(poly[:, 0], -1)
    y2 = jnp.roll(poly[:, 1], -1)
    cond = ((y1 <= y) != (y2 <= y))
    xint = x1 + (y - y1) * (x2 - x1) / jnp.where(
        jnp.abs(y2 - y1) < 1e-12, 1e-12, y2 - y1)
    cross = cond & (x < xint)
    return jnp.sum(cross.astype(jnp.int32), axis=-1) % 2 == 1


def _flat(maps: Sequence[Array], ch: int) -> Array:
    return jnp.concatenate(
        [m.reshape(m.shape[0], -1, ch) for m in maps], axis=1)


def _pts_img(pts_flat: Array, points: Array, stride: Array) -> Array:
    """(B, N, 2P) stride-unit [x,y] offsets -> image coords (B, N, P, 2)."""
    B, N, C2 = pts_flat.shape
    p = pts_flat.reshape(B, N, -1, 2)
    ctr = points[None, :, None, :2]
    return p * stride[None, :, None, None] + ctr


def _minmax_bbox(pts: Array) -> Array:
    """(..., P, 2) -> (..., 4) minmax box (ref points2bbox :183-204)."""
    x = pts[..., 0]
    y = pts[..., 1]
    return jnp.stack([x.min(-1), y.min(-1), x.max(-1), y.max(-1)], -1)


def _smooth_l1(pred, tgt, beta):
    d = jnp.abs(pred - tgt)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).sum(-1)


def dense_reppoints_loss(outs: Dict[str, Sequence[Array]],
                         batch: Dict[str, Array],
                         cfg: DenseRepPointsConfig):
    """Full v1 loss (`dense_reppoints_head.py:715-881`): focal cls +
    smooth-l1 minmax bbox (init/refine) + chamfer point sets (init/refine)
    + BCE mask scores."""
    Pn = cfg.num_points
    C = cfg.num_classes
    points = P.multi_level_points(cfg.image_shape, cfg.point_strides)
    stride = points[:, 2]
    valid = jax.vmap(lambda ps: P.valid_flags(
        cfg.image_shape, cfg.point_strides, ps))(batch["pad_shape"])

    cls = _flat(outs["cls"], C).astype(jnp.float32)
    pts_init = _pts_img(_flat(outs["pts_init"], 2 * Pn).astype(jnp.float32),
                        points, stride)
    pts_refine = _pts_img(
        _flat(outs["pts_refine"], 2 * Pn).astype(jnp.float32),
        points, stride)
    pts_score = _flat(outs["pts_score"], Pn).astype(jnp.float32)
    bbox_init = _minmax_bbox(pts_init)
    bbox_refine = _minmax_bbox(pts_refine)

    gt_bboxes = batch["gt_bboxes"]
    gt_labels = batch["gt_labels"]
    gt_valid = batch["gt_valid"]
    gt_polys = batch["gt_polygons"].reshape(
        *batch["gt_polygons"].shape[:2], -1, 2)             # (B, M, V, 2)
    gt_contour = jax.vmap(jax.vmap(
        lambda p: resample_polygon(p, cfg.gt_contour_points)))(gt_polys)

    init_assign = jax.vmap(
        lambda pv, gb, gv: centroid_assign(
            points, pv, gb, gv, scale=cfg.init_scale,
            pos_num=cfg.init_pos_num, iou_type="center")
    )(valid, gt_bboxes, gt_valid)
    cand = jax.lax.stop_gradient(bbox_init)
    refine_assign = jax.vmap(
        lambda bb, pv, gb, gv: max_iou_assign(
            bb, pv, gb, gv, pos_iou_thr=cfg.refine_pos_iou,
            neg_iou_thr=cfg.refine_neg_iou,
            min_pos_iou=cfg.refine_min_pos_iou)
    )(cand, valid, gt_bboxes, gt_valid)

    B, N = valid.shape
    norm = (cfg.point_base_scale * stride)[None, :, None]

    def bbox_loss(bbox_pred, gt_idx, weight):
        pos = gt_idx >= 0
        tgt = jnp.take_along_axis(
            gt_bboxes, jnp.maximum(gt_idx, 0)[..., None], axis=1)
        n_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        l = _smooth_l1(bbox_pred / norm, tgt / norm, cfg.smooth_beta)
        return jnp.sum(l * pos.astype(jnp.float32)) / n_pos * weight, n_pos

    def chamfer_loss(pts_pred, gt_idx, weight):
        """Chamfer on a fixed top-score quota of positives (docstring)."""
        pos = gt_idx >= 0
        Q = cfg.max_pos_chamfer
        norm1 = (cfg.point_base_scale * stride)[None, :]

        def single(pp, gi, posm, contours):
            rank = jnp.where(posm, 1.0, -jnp.inf) + jnp.arange(
                N, dtype=jnp.float32) * 1e-9
            _, sel = jax.lax.top_k(rank, Q)
            ok = posm[sel]
            pred = pp[sel] / norm1[0, sel][:, None, None]   # (Q, P, 2)
            tgt = contours[jnp.maximum(gi[sel], 0)] \
                / norm1[0, sel][:, None, None]              # (Q, Vc, 2)
            d1, d2 = chamfer_distance(pred, tgt)
            l = (jnp.sqrt(d1 + 1e-12).mean(-1)
                 + jnp.sqrt(d2 + 1e-12).mean(-1))
            return jnp.sum(l * ok), jnp.sum(ok.astype(jnp.float32))

        ls, ns = jax.vmap(single)(pts_pred, gt_idx, pos, gt_contour)
        return jnp.sum(ls) / jnp.maximum(jnp.sum(ns), 1.0) * weight

    loss_bbox_init, _ = bbox_loss(bbox_init, init_assign.gt_idx,
                                  cfg.bbox_init_weight)
    loss_bbox_refine, n_pos_r = bbox_loss(bbox_refine,
                                          refine_assign.gt_idx,
                                          cfg.bbox_refine_weight)
    loss_pts_init = chamfer_loss(pts_init, init_assign.gt_idx,
                                 cfg.pts_init_weight)
    loss_pts_refine = chamfer_loss(pts_refine, refine_assign.gt_idx,
                                   cfg.pts_refine_weight)

    pos_r = refine_assign.gt_idx >= 0
    labels = jnp.where(
        pos_r,
        jnp.take_along_axis(gt_labels, jnp.maximum(refine_assign.gt_idx, 0),
                            axis=1), C)
    lw = (valid & ~refine_assign.ignore).astype(jnp.float32)
    loss_cls = sigmoid_focal_loss(
        cls.reshape(B * N, C), labels.reshape(B * N), lw.reshape(B * N),
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
        avg_factor=n_pos_r) * cfg.cls_weight

    # mask score: BCE at init points vs inside-polygon labels at the
    # refine-assigned gt (ref :769-782 uses bbox_weights_refine positives)
    def score_single(ps, pp, gi, posm, polys):
        tgt_poly = polys[jnp.maximum(gi, 0)]                 # (N, V, 2)
        inside = jax.vmap(point_in_polygon)(tgt_poly, pp)    # (N, P)
        y = inside.astype(jnp.float32)
        bce = (jnp.maximum(ps, 0) - ps * y
               + jnp.log1p(jnp.exp(-jnp.abs(ps))))
        return jnp.sum(bce.mean(-1) * posm), jnp.sum(posm)

    ls, ns = jax.vmap(score_single)(
        pts_score, jax.lax.stop_gradient(pts_init),
        refine_assign.gt_idx, pos_r.astype(jnp.float32), gt_polys)
    loss_mask = (jnp.sum(ls) / jnp.maximum(jnp.sum(ns), 1.0)
                 * cfg.mask_score_weight)

    losses = {"loss_cls": loss_cls, "loss_bbox_init": loss_bbox_init,
              "loss_bbox_refine": loss_bbox_refine,
              "loss_pts_init": loss_pts_init,
              "loss_pts_refine": loss_pts_refine,
              "loss_mask_score_init": loss_mask}
    return sum(losses.values()), losses


def dense_reppoints_v2_loss(outs, batch, cfg: DenseRepPointsConfig,
                            *, cont_loss_weight: float = 1.0,
                            sem_loss_weight: float = 0.1):
    """v2 = v1 + contour heatmap/offset + semantic-map aux losses
    (`dense_reppoints_v2_head.py` loss flow; contour targets are gaussian
    bumps at the GT polygon vertices — the reference uses the mask contour
    pixels, of which the pipeline's 36-vertex polygon is the subsample)."""
    from ..ops.focal_loss import gaussian_focal_loss, sep_focal_loss
    from .cpv import make_sem_targets
    total, losses = dense_reppoints_loss(outs, batch, cfg)

    gt_polys = batch["gt_polygons"].reshape(
        *batch["gt_polygons"].shape[:2], -1, 2)
    gt_valid = batch["gt_valid"]
    H, W = cfg.image_shape
    cont_terms = []
    for lvl, s in enumerate(cfg.point_strides):
        score = outs["hm_tl"][lvl][..., 0].astype(jnp.float32)
        off = outs["off_tl"][lvl].astype(jnp.float32)
        h, w = score.shape[1:3]

        def single(polys, gv):
            hm = jnp.zeros((h, w), jnp.float32)
            vx = jnp.clip(polys[..., 0] / s, 0, w - 1)
            vy = jnp.clip(polys[..., 1] / s, 0, h - 1)
            xi = vx.astype(jnp.int32).reshape(-1)
            yi = vy.astype(jnp.int32).reshape(-1)
            ok = jnp.repeat(gv, polys.shape[1]).astype(jnp.float32)
            hm = hm.at[yi, xi].max(ok)
            offx = (vx - vx.astype(jnp.int32)).reshape(-1)
            offy = (vy - vy.astype(jnp.int32)).reshape(-1)
            om = jnp.zeros((h, w, 2), jnp.float32)
            om = om.at[yi, xi].set(jnp.stack([offx, offy], -1))
            return hm, om

        hm_t, off_t = jax.vmap(single)(gt_polys, gt_valid)
        cont_terms.append((score.reshape(score.shape[0], -1),
                           hm_t.reshape(hm_t.shape[0], -1),
                           off.reshape(off.shape[0], -1, 2),
                           off_t.reshape(off_t.shape[0], -1, 2)))
    sc = jnp.concatenate([t[0] for t in cont_terms], 1)
    hm = jnp.concatenate([t[1] for t in cont_terms], 1)
    of = jnp.concatenate([t[2] for t in cont_terms], 1)
    oft = jnp.concatenate([t[3] for t in cont_terms], 1)
    n_pos = jnp.maximum(jnp.sum(hm), 1.0)
    w = jnp.ones_like(hm)
    losses["loss_cont_heatmap"] = gaussian_focal_loss(
        jax.nn.sigmoid(sc), hm, w, avg_factor=n_pos) * cont_loss_weight
    d = jnp.abs(of - oft).sum(-1)
    losses["loss_cont_offset"] = (jnp.sum(d * hm) / n_pos
                                  * cont_loss_weight)

    sem_map, sem_w = make_sem_targets(
        batch["gt_bboxes"], batch["gt_labels"], gt_valid, cfg.image_shape,
        cfg.num_classes)
    sem_terms = []
    for lvl_score in outs["sem"]:
        h, w2 = lvl_score.shape[1:3]
        ridx = (jnp.arange(h) * sem_map.shape[1]) // h
        cidx = (jnp.arange(w2) * sem_map.shape[2]) // w2
        gm = sem_map[:, ridx][:, :, cidx]
        gw = sem_w[:, ridx][:, :, cidx]
        sem_terms.append((lvl_score.reshape(-1), gm.reshape(-1),
                          gw.reshape(-1)))
    scores_c = jnp.concatenate([t[0] for t in sem_terms])
    maps_c = jnp.concatenate([t[1] for t in sem_terms])
    w_c = jnp.concatenate([t[2] for t in sem_terms])
    avg = jnp.maximum((maps_c > 0).sum(), 1)
    losses["loss_sem"] = sep_focal_loss(
        scores_c[:, None], maps_c[:, None], w_c,
        avg_factor=avg) * sem_loss_weight
    return sum(losses.values()), losses


# ------------------------------------------------------------------ decode

class DensePointDetections:
    """Per-image padded detections with point sets + per-point scores."""

    def __init__(self, bboxes, scores, labels, pts, pts_scores, valid):
        self.bboxes = bboxes
        self.scores = scores
        self.labels = labels
        self.pts = pts
        self.pts_scores = pts_scores
        self.valid = valid

    def tree_flatten(self):
        return ((self.bboxes, self.scores, self.labels, self.pts,
                 self.pts_scores, self.valid), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    DensePointDetections,
    lambda d: d.tree_flatten(),
    DensePointDetections.tree_unflatten)


def dense_reppoints_decode(outs, img_shapes: Array, scale_factors: Array,
                           tcfg: TestConfig, cfg: DenseRepPointsConfig,
                           rescale: bool = True) -> DensePointDetections:
    """get_bboxes (`dense_reppoints_head.py:883-993`): mask-scoring-
    weighted class scores, minmax boxes, class-wise NMS carrying the point
    sets and their scores."""
    Pn = cfg.num_points
    C = cfg.num_classes
    points = P.multi_level_points(cfg.image_shape, cfg.point_strides)
    stride = points[:, 2]
    cls = _flat(outs["cls"], C).astype(jnp.float32)
    pts = _pts_img(_flat(outs["pts_refine"], 2 * Pn).astype(jnp.float32),
                   points, stride)
    pscore = jax.nn.sigmoid(_flat(outs["pts_score"], Pn)
                            .astype(jnp.float32))
    boxes = _minmax_bbox(pts)

    def single(cls_i, pts_i, ps_i, boxes_i, img_shape, sf):
        scores = jax.nn.sigmoid(cls_i)
        over = (ps_i > 0.5).astype(jnp.float32)
        mask_score = (over * ps_i).sum(-1) / (over.sum(-1) + 1e-6)
        scores = scores * mask_score[:, None]
        b = jnp.stack([jnp.clip(boxes_i[:, 0], 0, img_shape[1]),
                       jnp.clip(boxes_i[:, 1], 0, img_shape[0]),
                       jnp.clip(boxes_i[:, 2], 0, img_shape[1]),
                       jnp.clip(boxes_i[:, 3], 0, img_shape[0])], -1)
        px = jnp.clip(pts_i[..., 0], 0, img_shape[1] - 1)
        py = jnp.clip(pts_i[..., 1], 0, img_shape[0] - 1)
        if rescale:
            b = b / sf[None, :]
            px = px / sf[None, None, 0]
            py = py / sf[None, None, 1]
        smax = scores.max(-1)
        lbl = scores.argmax(-1).astype(jnp.int32)
        cand = jnp.where(smax > tcfg.score_thr, smax, NEG_INF)
        k = min(tcfg.nms_pre, cand.shape[0])
        top_s, top_i = jax.lax.top_k(cand, k)
        keep_idx, keep_s, keep_v = batched_nms(
            b[top_i], top_s, lbl[top_i], tcfg.nms_iou, tcfg.max_per_img)
        sel = top_i[keep_idx]
        z = keep_v[:, None].astype(b.dtype)
        ptsel = jnp.stack([px[sel], py[sel]], -1).reshape(sel.shape[0], -1)
        return DensePointDetections(
            b[sel] * z, jnp.where(keep_v, keep_s, 0.0),
            lbl[sel] * keep_v, ptsel * z, ps_i[sel] * z, keep_v)

    return jax.vmap(single)(cls, pts, pscore, boxes, img_shapes,
                            scale_factors)


def dense_points_to_masks(dets: DensePointDetections, img_hw,
                          pts_score_thr: float = 0.5):
    """Host-side point-set -> binary masks (reference
    `dense_reppoints_detector.py:69-131`: scipy griddata linear
    interpolation of point scores inside the det box, threshold 0.5)."""
    import scipy.interpolate
    img_h, img_w = int(img_hw[0]), int(img_hw[1])
    bboxes = np.asarray(dets.bboxes)
    pts = np.asarray(dets.pts)
    ps = np.asarray(dets.pts_scores)
    valid = np.asarray(dets.valid)
    masks = []
    for i in range(bboxes.shape[0]):
        if not valid[i]:
            masks.append(np.zeros((img_h, img_w), np.uint8))
            continue
        bb = bboxes[i].astype(np.int32)
        w = max(bb[2] - bb[0], 1)
        h = max(bb[3] - bb[1], 1)
        p = pts[i].reshape(-1, 2).copy()
        p[:, 0] -= bb[0]
        p[:, 1] -= bb[1]
        corner = np.array([[0, 0], [h - 1, 0], [0, w - 1], [w - 1, h - 1]],
                          np.float32)
        allp = np.concatenate([p, corner], 0)
        alls = np.concatenate([ps[i], np.zeros(4, np.float32)], 0)
        grids = tuple(np.mgrid[0:w:1, 0:h:1])
        try:
            bm = scipy.interpolate.griddata(allp, alls, grids).T
        except Exception:
            bm = np.zeros((h, w), np.float32)
        bm = np.nan_to_num(bm, nan=0.0)
        im = np.zeros((img_h, img_w), np.uint8)
        y2 = min(bb[1] + h, img_h)
        x2 = min(bb[0] + w, img_w)
        if y2 > bb[1] and x2 > bb[0]:
            im[max(bb[1], 0):y2, max(bb[0], 0):x2] = (
                bm[:y2 - max(bb[1], 0), :x2 - max(bb[0], 0)]
                > pts_score_thr)
        masks.append(im)
    return masks
