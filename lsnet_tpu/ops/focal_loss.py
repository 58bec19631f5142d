"""Focal-loss family — pure-JAX elementwise (VPU) implementations.

Replaces the reference CUDA op
(`/root/reference/code/mmdet/ops/sigmoid_focal_loss/src/cuda/sigmoid_focal_loss_cuda.cu`)
and the python variants in `code/mmdet/models/losses/focal_loss.py`
(py_sigmoid_focal_loss :11-42, SEPFocalLoss :190-223) and
`gaussian_focal_loss.py`.

Conventions match the reference: classification targets are class *indices*
in [0, num_classes]; index == num_classes means background (all-zero one-hot).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _reduce(loss: Array, weight: Optional[Array], reduction: str,
            avg_factor: Optional[Array]) -> Array:
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    # mean
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / avg_factor


def sigmoid_focal_loss(pred: Array, target: Array,
                       weight: Optional[Array] = None, *, gamma: float = 2.0,
                       alpha: float = 0.25, reduction: str = "mean",
                       avg_factor: Optional[Array] = None,
                       num_classes: Optional[int] = None) -> Array:
    """Sigmoid focal loss.

    Args:
      pred: (N, C) logits.
      target: (N,) int class indices; C (== num_classes) denotes background.
      weight: (N,) per-sample label weights.
    """
    C = pred.shape[-1] if num_classes is None else num_classes
    one_hot = jax.nn.one_hot(target, C, dtype=pred.dtype)          # bg -> zeros
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    oh = one_hot.astype(jnp.float32)
    pt = (1.0 - p) * oh + p * (1.0 - oh)
    focal_weight = (alpha * oh + (1.0 - alpha) * (1.0 - oh)) * pt ** gamma
    # numerically-stable BCE with logits
    logits = pred.astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * oh + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = bce * focal_weight                                       # (N, C)
    if weight is not None:
        weight = weight.reshape(-1, 1)
    return _reduce(loss, weight, reduction, avg_factor)


def sep_focal_loss(pred: Array, target: Array, weight: Optional[Array] = None,
                   *, gamma: float = 2.0, alpha: float = 0.25,
                   reduction: str = "mean",
                   avg_factor: Optional[Array] = None) -> Array:
    """Separate pos/neg focal loss (`focal_loss.py:190-223`):

    positives use ``alpha * (1-p)^gamma * log(p)``, negatives use
    ``(1-alpha) * p^gamma * log(1-p)``; here target is a (N, C) {0,1} map
    (used by the CPV semantic branch).
    """
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    t = target.astype(jnp.float32)
    eps = 1e-12
    pos = -alpha * ((1.0 - p) ** gamma) * jnp.log(jnp.maximum(p, eps)) * t
    neg = -(1.0 - alpha) * (p ** gamma) * jnp.log(jnp.maximum(1.0 - p, eps)) * (1.0 - t)
    loss = pos + neg
    if weight is not None and weight.ndim == 1:
        weight = weight.reshape(-1, 1)
    return _reduce(loss, weight, reduction, avg_factor)


def gaussian_focal_loss(pred: Array, gaussian_target: Array,
                        weight: Optional[Array] = None, *, alpha: float = 2.0,
                        gamma: float = 4.0, reduction: str = "mean",
                        avg_factor: Optional[Array] = None) -> Array:
    """CornerNet-style gaussian focal loss
    (`code/mmdet/models/losses/gaussian_focal_loss.py:8-29`):

    pred is a *probability* heatmap (post-sigmoid); targets in [0,1] with 1 at
    the gaussian bump centres.
    """
    p = pred.astype(jnp.float32)
    t = gaussian_target.astype(jnp.float32)
    eps = 1e-12
    pos_weights = (t == 1.0).astype(jnp.float32)
    neg_weights = (1.0 - t) ** gamma
    pos = -jnp.log(jnp.maximum(p, eps)) * ((1.0 - p) ** alpha) * pos_weights
    neg = -jnp.log(jnp.maximum(1.0 - p, eps)) * (p ** alpha) * neg_weights
    loss = pos + neg
    return _reduce(loss, weight, reduction, avg_factor)
