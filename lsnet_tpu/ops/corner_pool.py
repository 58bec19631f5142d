"""Corner pooling via directional cumulative max (XLA ``cummax``).

Replaces the reference C++ op (`/root/reference/code/mmdet/ops/corner_pool/
src/corner_pool.cpp`); the reference itself falls back to ``torch.cummax``
for torch >= 1.5 (`corner_pool/corner_pool.py:106-116`), confirming the
cummax formulation is exact.

Layout NHWC: x (B, H, W, C).
  top_pool(x)[h]    = max over h' >= h   (propagates bottom -> top)
  bottom_pool(x)[h] = max over h' <= h
  left_pool(x)[w]   = max over w' >= w
  right_pool(x)[w]  = max over w' <= w
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _cummax(x: Array, axis: int, reverse: bool) -> Array:
    return jax.lax.associative_scan(jnp.maximum, x, axis=axis, reverse=reverse)


def top_pool(x: Array) -> Array:
    return _cummax(x, axis=1, reverse=True)


def bottom_pool(x: Array) -> Array:
    return _cummax(x, axis=1, reverse=False)


def left_pool(x: Array) -> Array:
    return _cummax(x, axis=2, reverse=True)


def right_pool(x: Array) -> Array:
    return _cummax(x, axis=2, reverse=False)


_POOLS = {"top": top_pool, "bottom": bottom_pool,
          "left": left_pool, "right": right_pool}


def corner_pool(x: Array, mode: str) -> Array:
    return _POOLS[mode](x)
