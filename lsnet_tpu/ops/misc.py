"""Remaining op-zoo parity: CARAFE, masked conv, chamfer distance, nms_match.

XLA equivalents of the reference CUDA ops (each cited):
* :func:`carafe` — content-aware upsampling
  (`/root/reference/code/mmdet/ops/carafe/src/carafe_cuda_kernel.cu`):
  normalized predicted kernels reassemble an upsampled map from a k x k
  neighbourhood; formulated as extract-patches + einsum (MXU friendly).
* :func:`masked_conv2d` — conv evaluated only at masked positions
  (`masked_conv/src/masked_conv2d_kernel.cu`); on TPU dense conv + mask
  multiply is the right trade (no dynamic shapes).
* :func:`chamfer_distance` — bidirectional nearest-point distance
  (`chamfer_2d/src/chamfer_2d.cu`), used by DenseRepPointsV2's ChamferLoss.
* :func:`nms_match` — greedy NMS grouping (`nms/src/cpu/nms_cpu.cpp`
  nms_match), returning a suppression-group id per box.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .nms import NEG_INF, box_iou

Array = jax.Array


@partial(jax.jit, static_argnames=("kernel_size", "group_size", "scale"))
def carafe(feats: Array, masks: Array, kernel_size: int = 5,
           group_size: int = 1, scale: int = 2) -> Array:
    """CARAFE reassembly.

    feats (B,H,W,C); masks (B, sH, sW, G*k*k) softmax-normalized kernels
    (caller normalizes, as in the reference wrapper). Returns (B,sH,sW,C).
    """
    B, H, W, C = feats.shape
    k = kernel_size
    G = group_size
    sH, sW = H * scale, W * scale
    pad = k // 2
    padded = jnp.pad(feats, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # source pixel for each upsampled position
    ys = jnp.arange(sH) // scale
    xs = jnp.arange(sW) // scale
    # extract k*k neighbourhoods of the source pixels: (B,sH,sW,k*k,C)
    rows = ys[:, None] + jnp.arange(k)[None, :]           # (sH, k)
    cols = xs[:, None] + jnp.arange(k)[None, :]           # (sW, k)
    patch = padded[:, rows][:, :, :, cols]                # (B,sH,k,sW,k,C)
    patch = patch.transpose(0, 1, 3, 2, 4, 5).reshape(B, sH, sW, k * k, C)
    m = masks.reshape(B, sH, sW, G, k * k)
    patch_g = patch.reshape(B, sH, sW, k * k, G, C // G)
    out = jnp.einsum("bhwkgc,bhwgk->bhwgc", patch_g, m)
    return out.reshape(B, sH, sW, C)


def masked_conv2d(x: Array, mask: Array, weight: Array,
                  bias: Array | None = None, padding: int = 1) -> Array:
    """Conv evaluated where mask>0 (zero elsewhere).

    x (B,H,W,Cin), mask (B,H,W), weight (kh,kw,Cin,Cout)."""
    out = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    return out * (mask[..., None] > 0).astype(out.dtype)


@jax.jit
def chamfer_distance(xyz1: Array, xyz2: Array,
                     valid1: Array | None = None,
                     valid2: Array | None = None
                     ) -> Tuple[Array, Array]:
    """Bidirectional squared nearest-neighbour distances.

    xyz1 (N, P1, 2), xyz2 (N, P2, 2) -> (dist1 (N,P1), dist2 (N,P2))."""
    d = jnp.sum((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2, axis=-1)
    if valid2 is not None:
        d = jnp.where(valid2[:, None, :], d, 1e10)
    dist1 = d.min(axis=2)
    d2 = d
    if valid1 is not None:
        d2 = jnp.where(valid1[:, :, None], d, 1e10)
    dist2 = d2.min(axis=1)
    return dist1, dist2


@partial(jax.jit, static_argnames=())
def nms_match(boxes: Array, scores: Array, iou_thr: float) -> Array:
    """Greedy NMS grouping: each box gets the index of the kept box that
    suppressed it (its own index if kept). Padding: score <= NEG_INF/2."""
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    iou = box_iou(boxes[order], boxes[order])
    valid = scores[order] > NEG_INF / 2

    def body(i, state):
        group, taken = state
        is_new = (~taken[i]) & valid[i]
        sup = (iou[i] > iou_thr) & ~taken & valid
        group = jnp.where(is_new & sup, i, group)
        taken = taken | (is_new & sup)
        return group, taken

    group0 = jnp.full((N,), -1, jnp.int32)
    group, _ = jax.lax.fori_loop(0, N, body, (group0,
                                              jnp.zeros((N,), bool)))
    # map back to original order
    out = jnp.full((N,), -1, jnp.int32)
    out = out.at[order].set(jnp.where(group >= 0, order[group], -1))
    return out
