#!/usr/bin/env python
"""Training-step throughput on the attached chip (fwd+bwd+assign+optimizer)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def mint_variables(model, example):
    """eval_shape + ONE jitted random init — avoids the eager full-scale
    model.init (hundreds of sequential dispatches over the axon tunnel)."""
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               example))
    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def mint(key):
        keys = jax.random.split(key, len(leaves))
        return jax.tree.unflatten(treedef, [
            0.03 * jax.random.normal(k, s.shape, s.dtype)
            if jnp.issubdtype(s.dtype, jnp.floating)
            else jnp.zeros(s.shape, s.dtype)
            for k, s in zip(keys, leaves)])

    return mint(jax.random.PRNGKey(0))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config",
                        default="configs/lsnet/lsnet_bbox_r50_fpn_1x_coco.py",
                        nargs="?")
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--hw", type=int, nargs=2, default=(800, 1344))
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--chunk-budget-mb", type=int, default=None,
                        help="patch-transient budget in Mi-elements "
                        "(default: library auto-scaling by batch)")
    args = parser.parse_args()

    from lsnet_tpu.core.loss import LossConfig
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.models.backbones.resnet import frozen_param_paths
    from lsnet_tpu.train.loop import loss_cfg_from
    from lsnet_tpu.train.optim import build_optimizer, make_frozen_mask
    from lsnet_tpu.train.step import create_train_state, make_train_step
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    canvas = tuple(args.hw)
    B = args.batch
    if args.chunk_budget_mb is not None:
        from lsnet_tpu.ops.flat_deform import set_chunk_budget
        set_chunk_budget(args.chunk_budget_mb * 1024 * 1024)
    model, _ = build_detector(cfg.model.to_dict())
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.array(rng.randn(B, *canvas, 3).astype(np.float32)),
        "pad_shape": jnp.array([[canvas[0], canvas[1]]] * B, jnp.int32),
        "gt_bboxes": jnp.array(
            rng.uniform(0, 400, (B, 20, 4)).astype(np.float32)),
        "gt_labels": jnp.array(rng.randint(0, 80, (B, 20)), jnp.int32),
        "gt_valid": jnp.ones((B, 20), bool),
    }
    bb = batch["gt_bboxes"]
    batch["gt_bboxes"] = jnp.concatenate(
        [jnp.minimum(bb[..., :2], bb[..., 2:]),
         jnp.maximum(bb[..., :2], bb[..., 2:]) + 8], -1)

    variables = mint_variables(model, batch["image"][:1])
    mask = make_frozen_mask(variables["params"], frozen_param_paths(50, 1))
    tx, _ = build_optimizer(0.01, 1000, [8, 11], trainable_mask=mask)
    state = create_train_state(variables, tx)
    lcfg = loss_cfg_from(cfg, canvas)
    step = make_train_step(model, tx, lcfg)

    def once(state):
        state, metrics = step(state, batch)
        float(metrics["loss"])   # force completion
        return state

    state = once(state)
    state = once(state)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state = once(state)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step: {dt*1000:.1f} ms  ({B/dt:.2f} img/s, batch {B}, "
          f"canvas {canvas})")


if __name__ == "__main__":
    main()
