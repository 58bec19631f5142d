"""Optical-flow utilities: warp, (de)quantize, .flo IO.

TPU-native rebuild of the reference video/optflow stack
(`code/mmcv/mmcv/video/optflow.py:89-168`,
`optflow_warp/flow_warp.cpp:4-55`): the C++ per-pixel warp loop becomes
one vectorized XLA gather/one-hot interpolation, batched over images.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def flow_warp(img: Array, flow: Array, filling_value: float = 0,
              interpolate_mode: str = "nearest") -> Array:
    """Warp ``img`` by ``flow`` (reference `optflow.py:141-168`).

    img: (H, W, C) or (B, H, W, C); flow: matching (..., H, W, 2) with
    flow[..., 0] the horizontal (w) and flow[..., 1] the vertical (h)
    displacement. A pixel whose sample point falls outside
    [0, H-1) x [0, W-1) is set to ``filling_value`` (reference
    `flow_warp.cpp:16-21` — note the EXCLUSIVE upper bound at H-1/W-1).
    """
    if interpolate_mode not in ("bilinear", "nearest"):
        raise ValueError(f"unknown interpolate_mode {interpolate_mode!r}")
    batched = img.ndim == 4
    if not batched:
        img = img[None]
        flow = flow[None]
    B, H, W, C = img.shape
    dt = jnp.result_type(img.dtype, jnp.float32)
    x = (jnp.arange(H, dtype=dt)[None, :, None]
         + flow[..., 1].astype(dt))                     # vertical
    y = (jnp.arange(W, dtype=dt)[None, None, :]
         + flow[..., 0].astype(dt))                     # horizontal
    invalid = (x < 0) | (x >= H - 1) | (y < 0) | (y >= W - 1)

    flat = img.reshape(B, H * W, C).astype(dt)
    if interpolate_mode == "nearest":
        # reference NNInterpolate: round-half-up via int(x + 0.5)
        xi = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, H - 1)
        yi = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, W - 1)
        out = jnp.take_along_axis(
            flat, (xi * W + yi).reshape(B, -1, 1), axis=1)
        out = out.reshape(B, H, W, C)
    else:
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        dx = jnp.clip(x - x0, 0.0, 1.0)
        dy = jnp.clip(y - y0, 0.0, 1.0)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        out = jnp.zeros((B, H, W, C), dt)
        for m in (0, 1):
            for n in (0, 1):
                xi = jnp.clip(x0i + m, 0, H - 1)
                yi = jnp.clip(y0i + n, 0, W - 1)
                w = (jnp.abs(1 - m - dx) * jnp.abs(1 - n - dy))[..., None]
                g = jnp.take_along_axis(
                    flat, (xi * W + yi).reshape(B, -1, 1), axis=1)
                out = out + g.reshape(B, H, W, C) * w
    out = jnp.where(invalid[..., None],
                    jnp.asarray(filling_value, dt), out)
    out = out.astype(img.dtype)
    return out if batched else out[0]


def quantize_flow(flow: np.ndarray, max_val: float = 0.02,
                  norm: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Flow -> two uint8 maps (reference `optflow.py:89-114`; 255 levels
    so 0 survives the round trip)."""
    h, w, _ = flow.shape
    dx = flow[..., 0] / w if norm else flow[..., 0]
    dy = flow[..., 1] / h if norm else flow[..., 1]
    outs = []
    for d in (dx, dy):
        # mmcv.arraymisc.quantize(d, -max_val, max_val, 255, uint8):
        # clip -> floor(levels * (d - min) / range) capped at levels-1
        d = np.clip(d, -max_val, max_val) + max_val
        outs.append(np.minimum(
            np.floor(255 * d / (2 * max_val)), 254).astype(np.uint8))
    return tuple(outs)


def dequantize_flow(dx: np.ndarray, dy: np.ndarray, max_val: float = 0.02,
                    denorm: bool = True) -> np.ndarray:
    """Inverse of :func:`quantize_flow` (reference `optflow.py:117-138`)."""
    assert dx.shape == dy.shape
    # mmcv.arraymisc.dequantize: (q + 0.5) * range / levels + min
    dx, dy = [(d.astype(np.float64) + 0.5) * 2 * max_val / 255 - max_val
              for d in (dx, dy)]
    if denorm:
        dx = dx * dx.shape[1]
        dy = dy * dy.shape[0]
    return np.dstack((dx, dy)).astype(np.float32)


def flowread(flow_or_path, quantize: bool = False, concat_axis: int = 0,
             *args, **kwargs) -> np.ndarray:
    """Read a .flo file / pass through an array (reference
    `optflow.py:10-57`)."""
    if isinstance(flow_or_path, np.ndarray):
        if flow_or_path.ndim != 3 or flow_or_path.shape[-1] != 2:
            raise ValueError(
                f"invalid flow with shape {flow_or_path.shape}")
        return flow_or_path
    if not quantize:
        with open(flow_or_path, "rb") as f:
            header = f.read(4).decode("utf-8", errors="replace")
            if header != "PIEH":
                raise IOError(f"invalid flow file: {flow_or_path}")
            w = int(np.fromfile(f, np.int32, 1)[0])
            h = int(np.fromfile(f, np.int32, 1)[0])
            flow = np.fromfile(f, np.float32, w * h * 2).reshape(h, w, 2)
        return flow
    assert concat_axis in (0, 1)
    from PIL import Image
    cat = np.asarray(Image.open(flow_or_path))
    if cat.ndim != 2:
        raise IOError(f"{flow_or_path} is not a quantized flow file")
    assert cat.shape[concat_axis] % 2 == 0
    dx, dy = np.split(cat, 2, axis=concat_axis)
    return dequantize_flow(dx, dy, *args, **kwargs)


def flowwrite(flow: np.ndarray, filename: str, quantize: bool = False,
              concat_axis: int = 0, *args, **kwargs) -> None:
    """Write flow as .flo (lossless) or a concatenated quantized image
    (reference `optflow.py:60-86`)."""
    if not quantize:
        with open(filename, "wb") as f:
            f.write(b"PIEH")
            np.array([flow.shape[1], flow.shape[0]], np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
        return
    assert concat_axis in (0, 1)
    dx, dy = quantize_flow(flow, *args, **kwargs)
    from PIL import Image
    Image.fromarray(np.concatenate((dx, dy), axis=concat_axis)).save(
        filename)
