"""Anchor generation + box coders for the inherited dense-head zoo.

TPU-native re-derivation of the reference anchor machinery
(`/root/reference/code/mmdet/core/anchor/anchor_generator.py` and
`core/bbox/coder/delta_xywh_bbox_coder.py`): everything is static-shaped
numpy/JAX — per-level anchors are precomputed host-side once per canvas and
the coders are jittable elementwise math.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class AnchorConfig:
    """mmdet AnchorGenerator semantics (v2): per-level base size = stride,
    anchors = octave scales x aspect ratios, zero center offset."""
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    octave_base_scale: float = 4.0
    scales_per_octave: int = 3
    center_offset: float = 0.0

    @property
    def num_base_anchors(self) -> int:
        return len(self.ratios) * self.scales_per_octave


def base_anchors(cfg: AnchorConfig, stride: int) -> np.ndarray:
    """(A, 4) base anchors for one level (x1, y1, x2, y2 around the cell
    origin; reference ``gen_single_level_base_anchors``)."""
    scales = np.array([cfg.octave_base_scale * 2 ** (i / cfg.scales_per_octave)
                       for i in range(cfg.scales_per_octave)], np.float32)
    ratios = np.asarray(cfg.ratios, np.float32)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (stride * w_ratios[:, None] * scales[None, :]).reshape(-1)
    hs = (stride * h_ratios[:, None] * scales[None, :]).reshape(-1)
    xc = cfg.center_offset * stride
    yc = cfg.center_offset * stride
    return np.stack([xc - 0.5 * ws, yc - 0.5 * hs,
                     xc + 0.5 * ws, yc + 0.5 * hs], axis=1)


def grid_anchors(cfg: AnchorConfig, image_shape: Tuple[int, int]
                 ) -> Tuple[np.ndarray, List[int]]:
    """All-level anchors for a padded canvas.

    Returns (anchors (N_total*A, 4) float32, per-level counts)."""
    all_anchors = []
    counts = []
    H, W = image_shape
    for s in cfg.strides:
        h, w = -(-H // s), -(-W // s)
        base = base_anchors(cfg, s)                     # (A, 4)
        xs = (np.arange(w, dtype=np.float32) * s)
        ys = (np.arange(h, dtype=np.float32) * s)
        shift_x, shift_y = np.meshgrid(xs, ys)
        shifts = np.stack([shift_x.ravel(), shift_y.ravel(),
                           shift_x.ravel(), shift_y.ravel()], 1)
        anchors = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)
        all_anchors.append(anchors.astype(np.float32))
        counts.append(anchors.shape[0])
    return np.concatenate(all_anchors), counts


def anchor_valid_flags(cfg: AnchorConfig, image_shape: Tuple[int, int],
                       img_shape: Array) -> Array:
    """(N,) bool — anchor center cell inside the un-padded image (the
    reference ``valid_flags`` semantics)."""
    H, W = image_shape
    flags = []
    for s in cfg.strides:
        h, w = -(-H // s), -(-W // s)
        vy = (jnp.arange(h) * s) < img_shape[0]
        vx = (jnp.arange(w) * s) < img_shape[1]
        v = (vy[:, None] & vx[None, :]).reshape(-1)
        flags.append(jnp.repeat(v, cfg.num_base_anchors))
    return jnp.concatenate(flags)


# ------------------------------------------------------------- box coders --

def bbox2delta(proposals: Array, gt: Array,
               means=(0.0, 0.0, 0.0, 0.0),
               stds=(1.0, 1.0, 1.0, 1.0)) -> Array:
    """Reference DeltaXYWHBBoxCoder.encode."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], -1)
    return (deltas - jnp.asarray(means)) / jnp.asarray(stds)


def delta2bbox(anchors: Array, deltas: Array,
               means=(0.0, 0.0, 0.0, 0.0), stds=(1.0, 1.0, 1.0, 1.0),
               max_shape=None, wh_ratio_clip: float = 16.0 / 1000.0) -> Array:
    """Reference DeltaXYWHBBoxCoder.decode."""
    d = deltas * jnp.asarray(stds) + jnp.asarray(means)
    max_ratio = abs(math.log(wh_ratio_clip))
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
    px = (anchors[..., 0] + anchors[..., 2]) * 0.5
    py = (anchors[..., 1] + anchors[..., 3]) * 0.5
    pw = anchors[..., 2] - anchors[..., 0]
    ph = anchors[..., 3] - anchors[..., 1]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], -1)


def distance2bbox(points: Array, distances: Array, max_shape=None) -> Array:
    """FCOS-style (l, t, r, b) -> box (reference ``distance2bbox``)."""
    x1 = points[..., 0] - distances[..., 0]
    y1 = points[..., 1] - distances[..., 1]
    x2 = points[..., 0] + distances[..., 2]
    y2 = points[..., 1] + distances[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], -1)


def bbox2distance(points: Array, bbox: Array, max_dist=None) -> Array:
    l = points[..., 0] - bbox[..., 0]
    t = points[..., 1] - bbox[..., 1]
    r = bbox[..., 2] - points[..., 0]
    b = bbox[..., 3] - points[..., 1]
    d = jnp.stack([l, t, r, b], -1)
    if max_dist is not None:
        d = jnp.clip(d, 0, max_dist)
    return d


def ssd_base_anchors(strides: Sequence[int],
                     ratios: Sequence[Sequence[float]],
                     basesize_ratio_range: Tuple[float, float],
                     input_size: int = 300) -> List[np.ndarray]:
    """SSDAnchorGenerator base anchors (reference
    `core/anchor/anchor_generator.py:355-451`): per-level min/max sizes from
    the basesize ratio range, scales [1, sqrt(max/min)], ratios
    [1, 1/r, r, ...] with scale_major=False and the SSD row reorder
    (ratio-1 anchors at both scales first, other ratios at scale 1)."""
    n_levels = len(strides)
    min_ratio = int(basesize_ratio_range[0] * 100)
    max_ratio = int(basesize_ratio_range[1] * 100)
    step = int(np.floor(max_ratio - min_ratio) / (n_levels - 2))
    min_sizes = [int(input_size * r / 100)
                 for r in range(min_ratio, max_ratio + 1, step)]
    max_sizes = [int(input_size * (r + step) / 100)
                 for r in range(min_ratio, max_ratio + 1, step)]
    if input_size == 300 and basesize_ratio_range[0] == 0.15:   # COCO
        min_sizes.insert(0, int(input_size * 7 / 100))
        max_sizes.insert(0, int(input_size * 15 / 100))
    elif input_size == 300 and basesize_ratio_range[0] == 0.2:  # VOC
        min_sizes.insert(0, int(input_size * 10 / 100))
        max_sizes.insert(0, int(input_size * 20 / 100))
    elif input_size == 512 and basesize_ratio_range[0] == 0.1:  # COCO
        min_sizes.insert(0, int(input_size * 4 / 100))
        max_sizes.insert(0, int(input_size * 10 / 100))
    elif input_size == 512 and basesize_ratio_range[0] == 0.15:  # VOC
        min_sizes.insert(0, int(input_size * 7 / 100))
        max_sizes.insert(0, int(input_size * 15 / 100))
    else:
        raise ValueError("unsupported SSD basesize_ratio_range/input_size")
    bases = []
    for lvl, s in enumerate(strides):
        base = float(min_sizes[lvl])
        scales = np.array([1.0, np.sqrt(max_sizes[lvl] / min_sizes[lvl])],
                          np.float32)
        rs = [1.0]
        for r in ratios[lvl]:
            rs += [1.0 / r, r]
        rs = np.asarray(rs, np.float32)
        h_ratios = np.sqrt(rs)
        w_ratios = 1.0 / h_ratios
        # scale_major=False: SCALE-major enumeration (index = s*R + r)
        ws = (base * scales[:, None] * w_ratios[None, :]).reshape(-1)
        hs = (base * scales[:, None] * h_ratios[None, :]).reshape(-1)
        xc = yc = s / 2.0
        anchors = np.stack([xc - 0.5 * ws, yc - 0.5 * hs,
                            xc + 0.5 * ws, yc + 0.5 * hs], 1)
        # reference row reorder (:447-449): (ratio1, scale1),
        # (ratio1, scale2), then the other ratios at scale 1
        R = len(rs)
        keep = [0, R] + list(range(1, R))
        bases.append(anchors[keep].astype(np.float32))
    return bases


def ssd_grid_anchors(image_shape: Tuple[int, int], strides: Sequence[int],
                     ratios: Sequence[Sequence[float]],
                     basesize_ratio_range: Tuple[float, float],
                     input_size: int = 300
                     ) -> Tuple[np.ndarray, List[int], List[int]]:
    """(anchors (N,4), per-level anchor counts, per-level num_base)."""
    bases = ssd_base_anchors(strides, ratios, basesize_ratio_range,
                             input_size)
    H, W = image_shape
    all_anchors, counts, num_base = [], [], []
    for s, base in zip(strides, bases):
        h, w = -(-H // s), -(-W // s)
        xs = np.arange(w, dtype=np.float32) * s
        ys = np.arange(h, dtype=np.float32) * s
        shift_x, shift_y = np.meshgrid(xs, ys)
        shifts = np.stack([shift_x.ravel(), shift_y.ravel(),
                           shift_x.ravel(), shift_y.ravel()], 1)
        anchors = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)
        all_anchors.append(anchors.astype(np.float32))
        counts.append(anchors.shape[0])
        num_base.append(base.shape[0])
    return np.concatenate(all_anchors), counts, num_base
