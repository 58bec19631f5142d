"""Optimizer + LR schedule — reference training recipe in optax.

Reproduces the reference stack (`/root/reference/code/configs/_base_/
schedules/schedule_1x.py`, `mmcv/runner/hooks/optimizer.py:8-28`,
`lr_updater.py` step policy): SGD momentum 0.9, weight decay 1e-4 (torch
semantics: wd added to grad before momentum), linear warmup (500 iters,
ratio 0.001), step decay x0.1 at given epochs, gradient clipping by global
norm 35 *before* the optimizer.  Frozen backbone stages are masked out
(reference ``requires_grad=False``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def step_lr_schedule(base_lr: float, steps_per_epoch: int,
                     decay_epochs: Sequence[int], *, gamma: float = 0.1,
                     warmup_iters: int = 500,
                     warmup_ratio: float = 0.001) -> Callable:
    """mmcv 'step' LR policy with linear warmup
    (`mmcv/runner/hooks/lr_updater.py` StepLrUpdaterHook + warmup)."""
    boundaries = [e * steps_per_epoch for e in decay_epochs]

    def schedule(step):
        step = jnp.asarray(step)
        exp = jnp.sum(jnp.asarray(
            [step >= b for b in boundaries], jnp.int32)) if boundaries else 0
        regular = base_lr * gamma ** exp
        # linear warmup: lr * (1 - (1-k/warmup)*(1-ratio))
        frac = jnp.minimum(step.astype(jnp.float32) / max(warmup_iters, 1), 1.0)
        warm = regular * (1.0 - (1.0 - frac) * (1.0 - warmup_ratio))
        return jnp.where(step < warmup_iters, warm, regular)

    return schedule


def make_frozen_mask(params: Any, frozen_prefixes: Sequence[str],
                     backbone_key: str = "backbone") -> Any:
    """Pytree bool mask: True = trainable."""
    def path_frozen(path) -> bool:
        keys = [str(getattr(p, "key", p)) for p in path]
        if backbone_key not in keys:
            return False
        # only the module name directly under the backbone counts —
        # "conv1" must match the stem, not conv1 inside residual blocks
        mod = keys[keys.index(backbone_key) + 1]
        return any(mod.startswith(pref) for pref in frozen_prefixes)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: not path_frozen(path), params)


def build_optimizer(base_lr: float, steps_per_epoch: int,
                    decay_epochs: Sequence[int], *, momentum: float = 0.9,
                    weight_decay: float = 1e-4, clip_norm: float = 35.0,
                    warmup_iters: int = 500, warmup_ratio: float = 0.001,
                    trainable_mask: Optional[Any] = None,
                    schedule: Optional[Callable] = None
                    ) -> Tuple[optax.GradientTransformation, Callable]:
    if schedule is None:
        schedule = step_lr_schedule(base_lr, steps_per_epoch, decay_epochs,
                                    warmup_iters=warmup_iters,
                                    warmup_ratio=warmup_ratio)
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )
    if trainable_mask is not None:
        labels = jax.tree.map(
            lambda t: "train" if t else "frozen", trainable_mask)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx, schedule


def cosine_lr_schedule(base_lr: float, total_steps: int, *,
                       min_lr_ratio: float = 0.0, warmup_iters: int = 500,
                       warmup_ratio: float = 0.001) -> Callable:
    """mmcv 'CosineAnnealing' LR policy with linear warmup
    (`mmcv/runner/hooks/lr_updater.py` CosineAnnealingLrUpdaterHook)."""
    import math as _math

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        prog = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        target = base_lr * min_lr_ratio
        regular = target + 0.5 * (base_lr - target) * (
            1.0 + jnp.cos(_math.pi * prog))
        frac = jnp.minimum(step / max(warmup_iters, 1), 1.0)
        warm = regular * (1.0 - (1.0 - frac) * (1.0 - warmup_ratio))
        return jnp.where(step < warmup_iters, warm, regular)

    return schedule


def poly_lr_schedule(base_lr: float, total_steps: int, *, power: float = 1.0,
                     min_lr: float = 0.0, warmup_iters: int = 500,
                     warmup_ratio: float = 0.001) -> Callable:
    """mmcv 'poly' LR policy with linear warmup."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        prog = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        regular = (base_lr - min_lr) * (1.0 - prog) ** power + min_lr
        frac = jnp.minimum(step / max(warmup_iters, 1), 1.0)
        warm = regular * (1.0 - (1.0 - frac) * (1.0 - warmup_ratio))
        return jnp.where(step < warmup_iters, warm, regular)

    return schedule


def build_lr_schedule(lr_config: dict, base_lr: float, steps_per_epoch: int,
                      total_epochs: int) -> Callable:
    """Config-driven LR policy selection (reference ``lr_config.policy``)."""
    policy = lr_config.get("policy", "step")
    warmup_iters = lr_config.get("warmup_iters", 500)
    warmup_ratio = lr_config.get("warmup_ratio", 0.001)
    if policy == "step":
        return step_lr_schedule(base_lr, steps_per_epoch,
                                lr_config.get("step", [8, 11]),
                                gamma=lr_config.get("gamma", 0.1),
                                warmup_iters=warmup_iters,
                                warmup_ratio=warmup_ratio)
    total = steps_per_epoch * total_epochs
    if policy in ("CosineAnnealing", "cosine"):
        min_lr = lr_config.get("min_lr")
        ratio = (min_lr / base_lr if min_lr is not None
                 else lr_config.get("min_lr_ratio", 0.0))
        return cosine_lr_schedule(base_lr, total, min_lr_ratio=ratio,
                                  warmup_iters=warmup_iters,
                                  warmup_ratio=warmup_ratio)
    if policy == "poly":
        return poly_lr_schedule(base_lr, total,
                                power=lr_config.get("power", 1.0),
                                min_lr=lr_config.get("min_lr", 0.0),
                                warmup_iters=warmup_iters,
                                warmup_ratio=warmup_ratio)
    raise ValueError(f"unknown lr policy {policy!r}")
