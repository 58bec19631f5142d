"""RoI feature extraction ops (XLA gather formulations).

TPU-native equivalents of the reference CUDA ops
(`/root/reference/code/mmdet/ops/roi_align/src/roi_align_kernel.cu`,
`roi_pool/src/roi_pool_kernel.cu`): statically-shaped per-RoI bilinear
sampling, usable for the two-stage model zoo the reference framework also
carries.  Layout NHWC; rois are (N, 5) [batch_idx, x1, y1, x2, y2].
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .deform_conv import bilinear_gather

Array = jax.Array


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "aligned"))
def roi_align(feats: Array, rois: Array, out_size: Tuple[int, int] = (7, 7),
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = True) -> Array:
    """RoIAlign (v2 'aligned' semantics by default).

    feats (B,H,W,C), rois (N,5) -> (N, oh, ow, C)."""
    B, H, W, C = feats.shape
    N = rois.shape[0]
    oh, ow = out_size
    s = sampling_ratio

    batch_idx = rois[:, 0].astype(jnp.int32)
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset
    roi_w = jnp.maximum(x2 - x1, 1e-6 if aligned else 1.0)
    roi_h = jnp.maximum(y2 - y1, 1e-6 if aligned else 1.0)
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    # sample grid: (oh*s, ow*s) per roi
    gy = (jnp.arange(oh * s) + 0.5) / s                  # in bin units
    gx = (jnp.arange(ow * s) + 0.5) / s
    ys = y1[:, None] + gy[None, :] * bin_h[:, None]      # (N, oh*s)
    xs = x1[:, None] + gx[None, :] * bin_w[:, None]      # (N, ow*s)
    yy = jnp.broadcast_to(ys[:, :, None], (N, oh * s, ow * s))
    xx = jnp.broadcast_to(xs[:, None, :], (N, oh * s, ow * s))

    per_img = feats[batch_idx]                           # (N,H,W,C)
    vals = bilinear_gather(per_img, yy.reshape(N, -1), xx.reshape(N, -1))
    vals = vals.reshape(N, oh, s, ow, s, C)
    return vals.mean(axis=(2, 4))


@partial(jax.jit, static_argnames=("out_size", "sample_per_part"))
def deform_roi_pool(feats: Array, rois: Array, offsets: Array,
                    out_size: Tuple[int, int] = (7, 7),
                    spatial_scale: float = 1.0, gamma: float = 0.1,
                    sample_per_part: int = 4) -> Array:
    """Deformable RoI pooling (reference `dcn/src/cuda/deform_pool_cuda_
    kernel.cu`): each output bin's sampling window shifts by a learned,
    roi-size-normalized offset before average pooling.

    offsets: (N, oh, ow, 2) per-bin (dy, dx) normalized offsets.
    """
    B, H, W, C = feats.shape
    N = rois.shape[0]
    oh, ow = out_size
    s = sample_per_part
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale - 0.5
    y1 = rois[:, 2] * spatial_scale - 0.5
    x2 = rois[:, 3] * spatial_scale - 0.5
    y2 = rois[:, 4] * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    gy = (jnp.arange(oh * s) + 0.5) / s
    gx = (jnp.arange(ow * s) + 0.5) / s
    ys = y1[:, None] + gy[None, :] * bin_h[:, None]       # (N, oh*s)
    xs = x1[:, None] + gx[None, :] * bin_w[:, None]
    # per-bin offsets scaled by roi size (gamma)
    dy = offsets[..., 0] * gamma * roi_h[:, None, None]   # (N, oh, ow)
    dx = offsets[..., 1] * gamma * roi_w[:, None, None]
    dy_s = jnp.repeat(jnp.repeat(dy, s, axis=1), s, axis=2)
    dx_s = jnp.repeat(jnp.repeat(dx, s, axis=1), s, axis=2)
    yy = jnp.broadcast_to(ys[:, :, None], (N, oh * s, ow * s)) + dy_s
    xx = jnp.broadcast_to(xs[:, None, :], (N, oh * s, ow * s)) + dx_s
    per_img = feats[batch_idx]
    vals = bilinear_gather(per_img, yy.reshape(N, -1), xx.reshape(N, -1))
    vals = vals.reshape(N, oh, s, ow, s, C)
    return vals.mean(axis=(2, 4))


@partial(jax.jit, static_argnames=("out_size",))
def roi_pool(feats: Array, rois: Array, out_size: Tuple[int, int] = (7, 7),
             spatial_scale: float = 1.0) -> Array:
    """RoIPool (max over integer bins). feats (B,H,W,C) -> (N,oh,ow,C)."""
    B, H, W, C = feats.shape
    N = rois.shape[0]
    oh, ow = out_size
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1] * spatial_scale)
    y1 = jnp.round(rois[:, 2] * spatial_scale)
    x2 = jnp.round(rois[:, 3] * spatial_scale)
    y2 = jnp.round(rois[:, 4] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1, 1.0)

    # dense integer sampling at a fixed super-resolution per bin
    S = 4
    gy = (jnp.arange(oh * S) / S)
    gx = (jnp.arange(ow * S) / S)
    ys = jnp.clip(y1[:, None] + gy[None, :] * roi_h[:, None] / oh, 0, H - 1)
    xs = jnp.clip(x1[:, None] + gx[None, :] * roi_w[:, None] / ow, 0, W - 1)
    yi = jnp.floor(ys).astype(jnp.int32)
    xi = jnp.floor(xs).astype(jnp.int32)
    per_img = feats[batch_idx]
    flat = per_img.reshape(N, H * W, C)
    idx = (yi[:, :, None] * W + xi[:, None, :]).reshape(N, -1)
    vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
    vals = vals.reshape(N, oh, S, ow, S, C)
    return vals.max(axis=(2, 4))
