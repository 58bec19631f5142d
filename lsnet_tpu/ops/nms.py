"""On-device, fixed-shape NMS family.

TPU-native replacement for the reference CUDA/CPU NMS ops
(`/root/reference/code/mmdet/ops/nms/src/cuda/nms_kernel.cu`,
`cpu/nms_cpu.cpp`).  Everything here is statically shaped and jittable:
inputs are padded candidate sets, outputs are padded keep sets with validity
encoded by score > -inf sentinels (callers treat score <= ``VALID_MIN`` as
padding).

Algorithm: score-sort, then exact greedy suppression as a sequential scan
over *blocks* of candidates — within a block the O(block²) suppression is a
small unrolled loop, across blocks suppression is applied with one masked
IoU matmul-style broadcast.  This is the standard TPU formulation: it gives
bit-exact greedy NMS while keeping the sequential chain N/BLOCK long instead
of N.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e10


def box_iou(boxes1: Array, boxes2: Array, eps: float = 0.0) -> Array:
    """Pairwise IoU. boxes (..., N, 4) x1y1x2y2 -> (..., N, M)."""
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter + eps
    return inter / jnp.maximum(union, 1e-10)


def _suppression_scan(iou: Array, valid: Array, iou_thr: float,
                      block: int = 32) -> Array:
    """Greedy NMS keep mask given a pre-sorted (desc score) IoU matrix.

    Args:
      iou: (N, N) IoU between candidates sorted by descending score.
      valid: (N,) bool — padding / below-threshold flags.
    Returns:
      (N,) bool keep mask (exact greedy result).
    """
    N = iou.shape[0]
    assert N % block == 0, "candidate count must be a multiple of the block"
    n_blocks = N // block
    sup = iou > iou_thr

    def body(b, keep):
        start = b * block
        blk_keep = jax.lax.dynamic_slice(keep, (start,), (block,))
        # suppression by earlier blocks is already folded into `keep`;
        # resolve the sequential dependency inside the block
        blk_sup = jax.lax.dynamic_slice(sup, (start, start), (block, block))
        for i in range(1, block):
            # row i is suppressed if any kept earlier row j<i suppresses it
            hit = jnp.any(blk_keep[:i] & blk_sup[:i, i])
            blk_keep = blk_keep.at[i].set(blk_keep[i] & ~hit)
        keep = jax.lax.dynamic_update_slice(keep, blk_keep, (start,))
        # propagate this block's kept rows onto all later candidates
        blk_rows = jax.lax.dynamic_slice(sup, (start, 0), (block, N))
        later = jnp.arange(N) >= (start + block)
        suppressed_later = jnp.any(blk_keep[:, None] & blk_rows, axis=0) & later
        return keep & ~suppressed_later

    keep0 = valid
    return jax.lax.fori_loop(0, n_blocks, body, keep0)


def _pad_to_block(n: int, block: int) -> int:
    return ((n + block - 1) // block) * block


@partial(jax.jit, static_argnames=("max_out", "block"))
def nms(boxes: Array, scores: Array, iou_thr: float, max_out: int,
        block: int = 32) -> Tuple[Array, Array, Array]:
    """Exact greedy NMS (reference `nms_cpu.cpp` semantics: keep boxes whose
    IoU with any previously kept box is <= thr).

    Args:
      boxes: (N, 4); scores: (N,) with padding marked by score <= NEG_INF/2.
    Returns:
      (keep_idx (max_out,), keep_scores (max_out,), keep_valid (max_out,));
      invalid slots have idx 0 / score NEG_INF.
    """
    N = boxes.shape[0]
    Np = _pad_to_block(N, block)
    if Np != N:
        boxes = jnp.pad(boxes, ((0, Np - N), (0, 0)))
        scores = jnp.pad(scores, (0, Np - N), constant_values=NEG_INF)
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    sscores = scores[order]
    valid = sscores > NEG_INF / 2
    iou = box_iou(sboxes, sboxes)
    keep = _suppression_scan(iou, valid, iou_thr, block=block)

    keep_scores = jnp.where(keep, sscores, NEG_INF)
    top_scores, top_pos = jax.lax.top_k(keep_scores, max_out)
    keep_valid = top_scores > NEG_INF / 2
    keep_idx = jnp.where(keep_valid, order[top_pos], 0)
    return keep_idx, top_scores, keep_valid


@partial(jax.jit, static_argnames=("max_out", "block"))
def batched_nms(boxes: Array, scores: Array, idxs: Array, iou_thr: float,
                max_out: int, block: int = 32) -> Tuple[Array, Array, Array]:
    """Class-wise NMS via the coordinate-offset trick
    (reference `mmdet/ops/nms/nms_wrapper.py` batched_nms semantics)."""
    max_coord = jnp.max(jnp.where(scores > NEG_INF / 2, boxes.max(axis=-1), 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, iou_thr, max_out, block=block)


@partial(jax.jit, static_argnames=("max_out", "method"))
def soft_nms(boxes: Array, scores: Array, iou_thr: float, max_out: int,
             sigma: float = 0.5, min_score: float = 1e-3,
             method: str = "linear") -> Tuple[Array, Array, Array]:
    """Soft-NMS (`nms_cpu.cpp` soft_nms_cpu semantics, linear/gaussian decay).

    Sequential over max_out selections: pick argmax score, decay neighbours.
    """
    N = boxes.shape[0]

    def body(carry, _):
        scores_cur = carry
        i = jnp.argmax(scores_cur)
        top_score = scores_cur[i]
        top_box = boxes[i]
        ious = box_iou(top_box[None], boxes)[0]
        if method == "gaussian":
            decay = jnp.exp(-(ious * ious) / sigma)
        else:
            decay = jnp.where(ious > iou_thr, 1.0 - ious, 1.0)
        new_scores = scores_cur * decay
        new_scores = new_scores.at[i].set(NEG_INF)
        new_scores = jnp.where(new_scores < min_score, NEG_INF, new_scores)
        return new_scores, (i, top_score)

    _, (idx, kept_scores) = jax.lax.scan(body, scores, None, length=max_out)
    valid = kept_scores > NEG_INF / 2
    return jnp.where(valid, idx, 0), jnp.where(valid, kept_scores, NEG_INF), valid
