"""Inference decoding: head outputs -> detections (on-device, fixed shape).

Rebuilds `LSHead.get_bboxes/_get_bboxes_single`
(`/root/reference/code/mmdet/models/dense_heads/lsnet_head.py:1439-1668`) and
``multiclass_nms_lsvr`` (`core/post_processing/bbox_nms.py:60-99`) as one
jittable function: per-level top-k pre-selection (nms_pre), stride decode +
grid-center shift, clipping, score threshold, class-wise NMS (coordinate
offset trick), top max_per_img.  The landmark vector (extremes / polygon /
keypoints) rides along through every filtering step.

Outputs are padded to ``max_per_img`` with a validity mask — the host side
slices valid rows when packing COCO results.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.heads.ls_head import extreme_points2bbox, vectors2bbox
from ..ops.nms import NEG_INF, batched_nms
from . import points as P

Array = jax.Array


@dataclass(frozen=True)
class TestConfig:
    image_shape: Tuple[int, int]
    num_classes: int
    task: str = "bbox"
    num_vectors: int = 4
    point_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou: float = 0.6
    max_per_img: int = 100
    nms_type: str = "nms"        # 'nms' | 'soft_nms'
    soft_sigma: float = 0.5
    soft_min_score: float = 1e-3


TestConfig.__test__ = False  # not a pytest class


class Detections(NamedTuple):
    bboxes: Array      # (B, max_per_img, 4) — image-coordinate x1y1x2y2
    scores: Array      # (B, max_per_img)
    labels: Array      # (B, max_per_img) int32
    landmarks: Array   # (B, max_per_img, 2*nv) xy-interleaved
    valid: Array       # (B, max_per_img) bool


def _decode_single(cls_flats, lm_flats, img_shape, scale_factor,
                   cfg: TestConfig, rescale: bool) -> Detections:
    """Single image. cls_flats/lm_flats: per-level (n_l, C) flats."""
    nv = cfg.num_vectors
    mlvl_scores = []
    mlvl_bboxes = []
    mlvl_lms = []
    for lvl, (score_l, lm_l, s) in enumerate(
            zip(cls_flats, lm_flats, cfg.point_strides)):
        scores = jax.nn.sigmoid(score_l)                        # (n, C)
        pts = P.grid_points(
            P.level_shapes(cfg.image_shape, cfg.point_strides)[lvl], s)
        n = scores.shape[0]
        k = min(cfg.nms_pre, n)
        max_scores = scores.max(axis=1)
        _, topk = jax.lax.top_k(max_scores, k)
        scores = scores[topk]
        lm = lm_l[topk]
        xy = pts[topk, :2]

        if cfg.task in ("bbox",):
            extremes, bbox = extreme_points2bbox(lm)
            lm_dec = extremes * s + jnp.tile(xy, 4)
            # reference packs extremes as [xt,y1, x1,yl, xb,y2, x2,yr]
            bbox_dec = bbox * s + jnp.concatenate([xy, xy], -1)
            x1 = jnp.clip(bbox_dec[:, 0], 0, img_shape[1])
            y1 = jnp.clip(bbox_dec[:, 1], 0, img_shape[0])
            x2 = jnp.clip(bbox_dec[:, 2], 0, img_shape[1])
            y2 = jnp.clip(bbox_dec[:, 3], 0, img_shape[0])
            xt = jnp.clip(lm_dec[:, 0], 0, img_shape[1])
            yl = jnp.clip(lm_dec[:, 3], 0, img_shape[0])
            xb = jnp.clip(lm_dec[:, 4], 0, img_shape[1])
            yr = jnp.clip(lm_dec[:, 7], 0, img_shape[0])
            lm_pack = jnp.stack([xt, y1, x1, yl, xb, y2, x2, yr], axis=-1)
            bbox_pack = jnp.stack([x1, y1, x2, y2], axis=-1)
        else:
            vectors, bbox = vectors2bbox(lm)
            lm_dec = vectors * s + jnp.tile(xy, nv)
            bbox_dec = bbox * s + jnp.concatenate([xy, xy], -1)
            x1 = jnp.clip(bbox_dec[:, 0], 0, img_shape[1])
            y1 = jnp.clip(bbox_dec[:, 1], 0, img_shape[0])
            x2 = jnp.clip(bbox_dec[:, 2], 0, img_shape[1])
            y2 = jnp.clip(bbox_dec[:, 3], 0, img_shape[0])
            lm_x = jnp.clip(lm_dec[:, 0::2], 0, img_shape[1])
            lm_y = jnp.clip(lm_dec[:, 1::2], 0, img_shape[0])
            lm_pack = jnp.stack([lm_x, lm_y], -1).reshape(lm_dec.shape[0], -1)
            bbox_pack = jnp.stack([x1, y1, x2, y2], axis=-1)
        mlvl_scores.append(scores)
        mlvl_bboxes.append(bbox_pack)
        mlvl_lms.append(lm_pack)

    scores = jnp.concatenate(mlvl_scores)                      # (T, C)
    bboxes = jnp.concatenate(mlvl_bboxes)                      # (T, 4)
    lms = jnp.concatenate(mlvl_lms)                            # (T, 2nv)
    if rescale:
        sf = scale_factor                                       # (4,)
        bboxes = bboxes / sf[None, :]
        lms = lms / jnp.tile(sf[:2], lms.shape[-1] // 2)[None, :]
    return bboxes, lms, scores


def nms_candidates(bboxes: Array, lms: Array, scores: Array,
                   cfg: TestConfig) -> Detections:
    """multiclass_nms_lsvr tail: (T,4)/(T,2nv)/(T,C) -> padded Detections."""
    # flatten (candidate, class) pairs
    T, C = scores.shape
    cand_scores = jnp.where(scores > cfg.score_thr, scores, NEG_INF)
    # keep top (nms_pre) (cand, class) pairs to bound the NMS problem size
    k = min(cfg.nms_pre, T * C)
    flat_scores, flat_idx = jax.lax.top_k(cand_scores.reshape(-1), k)
    cand = flat_idx // C
    labels = (flat_idx % C).astype(jnp.int32)
    nms_boxes = bboxes[cand]
    if cfg.nms_type == "soft_nms":
        from ..ops.nms import soft_nms
        max_coord = jnp.max(jnp.where(flat_scores > NEG_INF / 2,
                                      nms_boxes.max(axis=-1), 0.0))
        shifted = nms_boxes + (labels.astype(nms_boxes.dtype)
                               * (max_coord + 1.0))[:, None]
        keep_idx, keep_scores, keep_valid = soft_nms(
            shifted, flat_scores, cfg.nms_iou, cfg.max_per_img,
            sigma=cfg.soft_sigma, min_score=cfg.soft_min_score)
    else:
        keep_idx, keep_scores, keep_valid = batched_nms(
            nms_boxes, flat_scores, labels, cfg.nms_iou, cfg.max_per_img)
    out_boxes = nms_boxes[keep_idx]
    out_labels = labels[keep_idx]
    out_lms = lms[cand[keep_idx]]
    out_scores = jnp.where(keep_valid, keep_scores, 0.0)
    z = keep_valid[:, None].astype(bboxes.dtype)
    return Detections(out_boxes * z, out_scores, out_labels * keep_valid,
                      out_lms * z, keep_valid)


def lsnet_decode(outs: Dict[str, Sequence[Array]], img_shapes: Array,
                 scale_factors: Array, cfg: TestConfig,
                 rescale: bool = True) -> Detections:
    """Batched decode + class-wise NMS. img_shapes (B,2) [h,w] (pre-pad,
    post-resize); scale_factors (B,4)."""
    main_key = {"bbox": "bbox", "segm": "segm", "pose_bbox": "pose",
                "pose_kbox": "pose"}[cfg.task]
    cls_flats = [m.reshape(m.shape[0], -1, m.shape[-1]) for m in outs["cls"]]
    lm_flats = [m.reshape(m.shape[0], -1, m.shape[-1])
                for m in outs[f"{main_key}_refine"]]

    def single(cls_b, lm_b, shape_b, sf_b):
        bboxes, lms, scores = _decode_single(
            list(cls_b), list(lm_b), shape_b, sf_b, cfg, rescale)
        return nms_candidates(bboxes, lms, scores, cfg)

    return jax.vmap(single)(tuple(cls_flats), tuple(lm_flats), img_shapes,
                            scale_factors)


def lsnet_decode_candidates(outs: Dict[str, Sequence[Array]],
                            img_shapes: Array, scale_factors: Array,
                            cfg: TestConfig, rescale: bool = True):
    """Pre-NMS candidate extraction (the reference ``nms=False`` path used
    by aug_test_simple, `lsnet_head.py:1662-1668`).

    Returns (bboxes (B,T,4), landmarks (B,T,2nv), scores (B,T,C))."""
    main_key = {"bbox": "bbox", "segm": "segm", "pose_bbox": "pose",
                "pose_kbox": "pose"}[cfg.task]
    cls_flats = [m.reshape(m.shape[0], -1, m.shape[-1]) for m in outs["cls"]]
    lm_flats = [m.reshape(m.shape[0], -1, m.shape[-1])
                for m in outs[f"{main_key}_refine"]]

    def single(cls_b, lm_b, shape_b, sf_b):
        return _decode_single(list(cls_b), list(lm_b), shape_b, sf_b, cfg,
                              rescale)

    return jax.vmap(single)(tuple(cls_flats), tuple(lm_flats), img_shapes,
                            scale_factors)
