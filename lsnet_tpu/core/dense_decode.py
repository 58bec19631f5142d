"""Inference decode for the inherited dense heads (RetinaNet/FCOS/ATSS).

Rebuilds the reference ``get_bboxes`` paths (`anchor_head.py`,
`fcos_head.py`, `atss_head.py`) as one jittable batched function per head
kind, reusing the LSNet on-device class-wise NMS
(:func:`lsnet_tpu.core.decode.nms_candidates`). Landmark slots are
zero-filled (these heads have none).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from . import points as P
from .anchors import delta2bbox, distance2bbox, grid_anchors
from .decode import Detections, TestConfig, nms_candidates
from .dense_loss import (DenseLossConfig, _fcos_points, _integral,
                         atss_anchor_cfg)

Array = jax.Array


def dense_decode(outs: Dict[str, Sequence[Array]], img_shapes: Array,
                 scale_factors: Array, tcfg: TestConfig,
                 lcfg: DenseLossConfig, rescale: bool = True,
                 reg_max: int = 16) -> Detections:
    """Batched decode + NMS for retina/fcos/atss/gfl/ssd/fovea/fsaf heads."""
    C = tcfg.num_classes
    kind = lcfg.head
    if kind == "ssd":
        return _ssd_decode(outs, img_shapes, scale_factors, tcfg, lcfg,
                           rescale)
    if kind == "fovea":
        return _fovea_decode(outs, img_shapes, scale_factors, tcfg, lcfg,
                             rescale)
    if kind == "fsaf":
        return _fsaf_decode(outs, img_shapes, scale_factors, tcfg, lcfg,
                            rescale)
    if kind == "ga_retina":
        return ga_decode(outs, img_shapes, scale_factors, tcfg, lcfg,
                         rescale)
    if kind == "ga_rpn":
        return ga_rpn_decode(outs, img_shapes, scale_factors, tcfg, lcfg,
                             rescale)
    if kind == "pisa_ssd":
        return _ssd_decode(outs, img_shapes, scale_factors, tcfg, lcfg,
                           rescale)
    reg_ch = (4 * (reg_max + 1) if kind == "gfl" else 4)
    cls = jnp.concatenate([m.reshape(m.shape[0], -1, C)
                           for m in outs["cls"]], axis=1)
    reg = jnp.concatenate([m.reshape(m.shape[0], -1, reg_ch)
                           for m in outs["reg"]], axis=1)
    if kind == "gfl":
        acfg = atss_anchor_cfg(lcfg)
        anchors_np, counts = grid_anchors(acfg, lcfg.image_shape)
        anchors = jnp.asarray(anchors_np)
        centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                             (anchors[:, 1] + anchors[:, 3]) / 2], -1)
        stride_per = jnp.concatenate([
            jnp.full((n,), s, jnp.float32)
            for n, s in zip(counts, lcfg.strides)])
        ctr = None
    elif kind in ("retina", "free_anchor", "pisa_retina"):
        anchors_np, _ = grid_anchors(lcfg.anchor, lcfg.image_shape)
        anchors = jnp.asarray(anchors_np)
        ctr = None
        stds = lcfg.target_stds
    elif kind == "atss":
        anchors_np, _ = grid_anchors(atss_anchor_cfg(lcfg), lcfg.image_shape)
        anchors = jnp.asarray(anchors_np)
        ctr = jnp.concatenate([m.reshape(m.shape[0], -1)
                               for m in outs["centerness"]], axis=1)
        stds = (0.1, 0.1, 0.2, 0.2)
    else:  # fcos
        pts, pt_stride, _ = _fcos_points(lcfg)
        ctr = jnp.concatenate([m.reshape(m.shape[0], -1)
                               for m in outs["centerness"]], axis=1)

    def single(cls_i, reg_i, ctr_i, img_shape, sf):
        scores = jax.nn.sigmoid(cls_i.astype(jnp.float32))
        if kind == "gfl":
            d = _integral(reg_i.astype(jnp.float32), reg_max) \
                * stride_per[:, None]
            boxes = distance2bbox(centers, d, max_shape=img_shape)
        elif kind == "fcos":
            boxes = distance2bbox(pts, reg_i * pt_stride[:, None],
                                  max_shape=img_shape)
        else:
            boxes = delta2bbox(anchors, reg_i, stds=stds,
                               max_shape=img_shape)
        if ctr_i is not None:
            scores = scores * jax.nn.sigmoid(
                ctr_i.astype(jnp.float32))[:, None]
        if rescale:
            boxes = boxes / sf[None, :]
        lms = jnp.zeros((boxes.shape[0], 8), boxes.dtype)
        return nms_candidates(boxes, lms, scores, tcfg)

    if ctr is None:
        ctr = jnp.zeros(cls.shape[:2], cls.dtype)
        single_fn = lambda c, r, t, s, f: single(c, r, None, s, f)  # noqa
    else:
        single_fn = single
    return jax.vmap(single_fn)(cls, reg, ctr, img_shapes, scale_factors)


def _ssd_decode(outs, img_shapes, scale_factors, tcfg, lcfg, rescale):
    """SSD get_bboxes: softmax scores over C+1, delta decode, NMS."""
    from .dense_loss import _ssd_anchors, _ssd_flatten
    anchors_np, counts, num_base = _ssd_anchors(lcfg)
    anchors = jnp.asarray(anchors_np)
    C = tcfg.num_classes
    cls = _ssd_flatten(outs["cls"], num_base, C + 1)
    reg = _ssd_flatten(outs["reg"], num_base, 4)

    def single(cls_i, reg_i, img_shape, sf):
        scores = jax.nn.softmax(cls_i.astype(jnp.float32), -1)[:, :C]
        boxes = delta2bbox(anchors, reg_i.astype(jnp.float32),
                           stds=lcfg.ssd_stds, max_shape=img_shape)
        if rescale:
            boxes = boxes / sf[None, :]
        lms = jnp.zeros((boxes.shape[0], 8), boxes.dtype)
        return nms_candidates(boxes, lms, scores, tcfg)

    return jax.vmap(single)(cls, reg, img_shapes, scale_factors)


def _fovea_decode(outs, img_shapes, scale_factors, tcfg, lcfg, rescale):
    """Fovea get_bboxes (ref fovea_head.py:292-343): exp'd distances in
    per-level base_edge units around the grid point."""
    C = tcfg.num_classes
    cls = jnp.concatenate([m.reshape(m.shape[0], -1, C)
                           for m in outs["cls"]], axis=1)
    reg = jnp.concatenate([m.reshape(m.shape[0], -1, 4)
                           for m in outs["reg"]], axis=1)
    pts = P.multi_level_points(lcfg.image_shape, lcfg.strides)
    base_per = jnp.concatenate([
        jnp.full((n,), b, jnp.float32) for n, b in zip(
            P.num_level_points(lcfg.image_shape, lcfg.strides),
            lcfg.fovea_base_edges)])

    def single(cls_i, reg_i, img_shape, sf):
        scores = jax.nn.sigmoid(cls_i.astype(jnp.float32))
        d = jnp.exp(reg_i.astype(jnp.float32)) * base_per[:, None]
        x1 = jnp.clip(pts[:, 0] - d[:, 0], 0, img_shape[1] - 1)
        y1 = jnp.clip(pts[:, 1] - d[:, 1], 0, img_shape[0] - 1)
        x2 = jnp.clip(pts[:, 0] + d[:, 2], 0, img_shape[1] - 1)
        y2 = jnp.clip(pts[:, 1] + d[:, 3], 0, img_shape[0] - 1)
        boxes = jnp.stack([x1, y1, x2, y2], -1)
        if rescale:
            boxes = boxes / sf[None, :]
        lms = jnp.zeros((boxes.shape[0], 8), boxes.dtype)
        return nms_candidates(boxes, lms, scores, tcfg)

    return jax.vmap(single)(cls, reg, img_shapes, scale_factors)


def _fsaf_decode(outs, img_shapes, scale_factors, tcfg, lcfg, rescale):
    """FSAF get_bboxes: TBLR decode around cell centers."""
    C = tcfg.num_classes
    cls = jnp.concatenate([m.reshape(m.shape[0], -1, C)
                           for m in outs["cls"]], axis=1)
    reg = jnp.concatenate([m.reshape(m.shape[0], -1, 4)
                           for m in outs["reg"]], axis=1)
    pts = P.multi_level_points(lcfg.image_shape, lcfg.strides)
    px = pts[:, 0]           # center_offset=0 (matches fsaf_loss)
    py = pts[:, 1]
    norm = lcfg.fsaf_normalizer * pts[:, 2]

    def single(cls_i, reg_i, img_shape, sf):
        scores = jax.nn.sigmoid(cls_i.astype(jnp.float32))
        r = reg_i.astype(jnp.float32) * norm[:, None]
        x1 = jnp.clip(px - r[:, 2], 0, img_shape[1])
        y1 = jnp.clip(py - r[:, 0], 0, img_shape[0])
        x2 = jnp.clip(px + r[:, 3], 0, img_shape[1])
        y2 = jnp.clip(py + r[:, 1], 0, img_shape[0])
        boxes = jnp.stack([x1, y1, x2, y2], -1)
        if rescale:
            boxes = boxes / sf[None, :]
        lms = jnp.zeros((boxes.shape[0], 8), boxes.dtype)
        return nms_candidates(boxes, lms, scores, tcfg)

    return jax.vmap(single)(cls, reg, img_shapes, scale_factors)


def ga_decode(outs, img_shapes, scale_factors, tcfg, lcfg,
              rescale: bool = True, loc_thr: float = 0.01):
    """Guided-Anchoring decode: guided anchors + deltas, scores gated by
    the location mask (the static-shape equivalent of the reference's
    loc_filter_thr anchor filtering)."""
    from .dense_loss import _ga_guided_anchors
    C = tcfg.num_classes
    cls = jnp.concatenate([m.reshape(m.shape[0], -1, C)
                           for m in outs["cls"]], axis=1)
    reg = jnp.concatenate([m.reshape(m.shape[0], -1, 4)
                           for m in outs["reg"]], axis=1)
    loc = jnp.concatenate([m.reshape(m.shape[0], -1)
                           for m in outs["loc"]], axis=1)
    anchors = _ga_guided_anchors(outs, lcfg)

    def single(cls_i, reg_i, loc_i, anchors_i, img_shape, sf):
        scores = jax.nn.sigmoid(cls_i.astype(jnp.float32))
        keep = (jax.nn.sigmoid(loc_i.astype(jnp.float32))
                > loc_thr)[:, None]
        scores = scores * keep.astype(scores.dtype)
        boxes = delta2bbox(anchors_i, reg_i.astype(jnp.float32),
                           stds=lcfg.target_stds, max_shape=img_shape)
        if rescale:
            boxes = boxes / sf[None, :]
        lms = jnp.zeros((boxes.shape[0], 8), boxes.dtype)
        return nms_candidates(boxes, lms, scores, tcfg)

    return jax.vmap(single)(cls, reg, loc, anchors, img_shapes,
                            scale_factors)


def ga_rpn_decode(outs, img_shapes, scale_factors, tcfg, lcfg,
                  rescale: bool = True, loc_thr: float = 0.01):
    """GA-RPN proposal decode (reference `ga_rpn_head.py:63-140`): binary
    objectness on loc-masked guided anchors, delta decode, NMS; emitted as
    label-0 Detections (the standalone-RPN proposal evaluation surface)."""
    from .dense_loss import _ga_guided_anchors
    cls = jnp.concatenate([m.reshape(m.shape[0], -1, 1)
                           for m in outs["cls"]], axis=1)[..., 0]
    reg = jnp.concatenate([m.reshape(m.shape[0], -1, 4)
                           for m in outs["reg"]], axis=1)
    loc = jnp.concatenate([m.reshape(m.shape[0], -1)
                           for m in outs["loc"]], axis=1)
    anchors = _ga_guided_anchors(outs, lcfg)

    def single(cls_i, reg_i, loc_i, anchors_i, img_shape, sf):
        scores = jax.nn.sigmoid(cls_i.astype(jnp.float32))[:, None]
        keep = (jax.nn.sigmoid(loc_i.astype(jnp.float32))
                > loc_thr)[:, None]
        scores = scores * keep.astype(scores.dtype)
        boxes = delta2bbox(anchors_i, reg_i.astype(jnp.float32),
                           stds=lcfg.target_stds, max_shape=img_shape)
        if rescale:
            boxes = boxes / sf[None, :]
        lms = jnp.zeros((boxes.shape[0], 8), boxes.dtype)
        return nms_candidates(boxes, lms, scores, tcfg)

    return jax.vmap(single)(cls, reg, loc, anchors, img_shapes,
                            scale_factors)
