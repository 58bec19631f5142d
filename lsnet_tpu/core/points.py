"""FPN grid-point generation — vectorized equivalent of the reference
``PointGenerator`` (`/root/reference/code/mmdet/core/anchor/point_generator.py:7-37`).

Points are (x, y, stride) triples laid out row-major per level, concatenated
over levels — identical ordering to the reference so that target/decode logic
lines up index-for-index.  Everything is statically shaped; per-image
validity (the reference's ``valid_flags``, driven by each image's pre-batch
pad shape) is a dynamic mask.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def level_shapes(image_shape: Tuple[int, int],
                 strides: Sequence[int]) -> List[Tuple[int, int]]:
    """Feature-map (H, W) per FPN level for a padded canvas.

    Matches conv arithmetic of the backbone+FPN (ceil division by stride).
    """
    H, W = image_shape
    return [(-(-H // s), -(-W // s)) for s in strides]


def grid_points(featmap_size: Tuple[int, int], stride: int,
                dtype=jnp.float32) -> Array:
    """(H*W, 3) points: (x, y, stride), row-major (x fastest)."""
    h, w = featmap_size
    xs = jnp.arange(w, dtype=dtype) * stride
    ys = jnp.arange(h, dtype=dtype) * stride
    xx = jnp.tile(xs, h)
    yy = jnp.repeat(ys, w)
    ss = jnp.full((h * w,), stride, dtype=dtype)
    return jnp.stack([xx, yy, ss], axis=-1)


def multi_level_points(image_shape: Tuple[int, int],
                       strides: Sequence[int],
                       dtype=jnp.float32) -> Array:
    """All levels concatenated: (sum_l H_l*W_l, 3)."""
    shapes = level_shapes(image_shape, strides)
    return jnp.concatenate(
        [grid_points(sh, s, dtype) for sh, s in zip(shapes, strides)], axis=0)


def num_level_points(image_shape: Tuple[int, int],
                     strides: Sequence[int]) -> List[int]:
    return [h * w for h, w in level_shapes(image_shape, strides)]


def valid_flags(image_shape: Tuple[int, int], strides: Sequence[int],
                pad_shape: Array) -> Array:
    """Per-point validity for one image.

    Args:
      image_shape: static padded canvas (H, W).
      pad_shape: (2,) dynamic per-image (h, w) — the image's own pad shape
        before batch collation (reference `lsnet_head.py:781-792`).

    Returns:
      (sum_l H_l*W_l,) bool.
    """
    flags = []
    for (fh, fw), s in zip(level_shapes(image_shape, strides), strides):
        valid_h = jnp.minimum(-(-pad_shape[0] // s), fh)
        valid_w = jnp.minimum(-(-pad_shape[1] // s), fw)
        row = jnp.arange(fh)[:, None] < valid_h
        col = jnp.arange(fw)[None, :] < valid_w
        flags.append((row & col).reshape(-1))
    return jnp.concatenate(flags, axis=0)


def np_multi_level_points(image_shape: Tuple[int, int],
                          strides: Sequence[int]) -> np.ndarray:
    """Host-side (numpy) twin of ``multi_level_points`` for data prep."""
    out = []
    for (h, w), s in zip(level_shapes(image_shape, strides), strides):
        xs = np.arange(w, dtype=np.float32) * s
        ys = np.arange(h, dtype=np.float32) * s
        xx = np.tile(xs, h)
        yy = np.repeat(ys, w)
        ss = np.full((h * w,), s, dtype=np.float32)
        out.append(np.stack([xx, yy, ss], axis=-1))
    return np.concatenate(out, axis=0)
