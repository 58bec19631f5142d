"""Jitted, mesh-sharded train / eval steps.

The whole reference iteration (`EpochBasedRunner.train` ->
``train_step`` -> backward -> ``OptimizerHook`` clip+step,
`/root/reference/code/mmcv/mmcv/runner/epoch_based_runner.py:20-50`)
collapses into one jitted function: forward + loss + grad + clip + SGD
update, compiled over the device mesh with the batch sharded on the
``data`` axis and params replicated — XLA inserts the gradient all-reduce
(the DDP/NCCL equivalent) automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as PS

from ..core.loss import LossConfig, lsnet_loss

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(model, tx, loss_cfg: LossConfig, mesh=None,
                    mixed_precision: bool = True,
                    loss_fn_impl=None, full_loss_fn=None) -> Callable[
                        [TrainState, Dict[str, Array]],
                        Tuple[TrainState, Dict[str, Array]]]:
    """Build the jitted train step.  If ``mesh`` is given, shard the batch
    over the 'data' axis and replicate state.

    ``mixed_precision``: bf16 compute with f32 master params (the TPU
    equivalent of the reference fp16 hooks — no loss scaling needed).

    ``full_loss_fn(variables, batch) -> (total, losses)`` replaces the
    standard forward+loss entirely (two-stage detectors apply model methods
    mid-loss); it receives bf16-cast variables and image under mixed
    precision."""
    from ..utils.precision import cast_floating
    compute_loss = loss_fn_impl or lsnet_loss

    def loss_fn(params, batch_stats, batch):
        if mixed_precision:
            params_c = cast_floating(params, jnp.bfloat16)
            stats_c = cast_floating(batch_stats, jnp.bfloat16)
            image = batch["image"].astype(jnp.bfloat16)
        else:
            params_c, stats_c, image = params, batch_stats, batch["image"]
        if full_loss_fn is not None:
            return full_loss_fn(
                {"params": params_c, "batch_stats": stats_c},
                dict(batch, image=image))
        outs = model.apply({"params": params_c, "batch_stats": stats_c},
                           image)
        # losses/assignment in f32 for numerical fidelity
        outs = cast_floating(outs, jnp.float32)
        total, losses = compute_loss(outs, batch, loss_cfg)
        return total, losses

    def train_step(state: TrainState, batch):
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, PS())
    data = NamedSharding(mesh, PS("data"))
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_forward(model, mesh=None) -> Callable:
    """Jitted forward for inference (decode happens in core.decode)."""
    from ..ops.flat_deform import inference_sampling

    def forward(variables, images):
        with inference_sampling():   # inference-default DCN policy (trace)
            return model.apply(variables, images)

    if mesh is None:
        return jax.jit(forward)
    repl = NamedSharding(mesh, PS())
    data = NamedSharding(mesh, PS("data"))
    return jax.jit(forward, in_shardings=(repl, data), out_shardings=data)
