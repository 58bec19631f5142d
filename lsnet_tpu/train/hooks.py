"""Runner hook framework.

Equivalent of the reference mmcv hook system
(`/root/reference/code/mmcv/mmcv/runner/hooks/` — lr/ckpt/logger/eval hooks
driven by ``BaseRunner.call_hook``): a small protocol with registration
priorities, built from config (``custom_hooks`` list), driving the epoch
loop in :func:`lsnet_tpu.train.loop.train_detector`.

The LR schedule itself stays *inside* the jitted step (TPU-first: no
host-side LR mutation), so there is no LrUpdaterHook — the config-driven
policies live in :mod:`lsnet_tpu.train.optim`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

from ..utils.registry import Registry

HOOKS = Registry("hook")


class RunnerContext:
    """Mutable state handed to hooks (the reference ``runner``)."""

    def __init__(self, cfg, work_dir: str, steps_per_epoch: int,
                 total_epochs: int):
        self.cfg = cfg
        self.work_dir = work_dir
        self.steps_per_epoch = steps_per_epoch
        self.total_epochs = total_epochs
        self.epoch = 0                      # 0-based current epoch
        self.iter = 0                       # iteration within the epoch
        self.global_step = 0
        self.state = None                   # TrainState
        self.lr = 0.0
        self.metrics: Dict[str, float] = {}
        self.eval_fn = None                 # () -> Dict[str, float]
        self.should_stop = False


class Hook:
    priority: int = 50                      # lower runs first

    def before_train(self, ctx: RunnerContext):  # noqa: D102
        pass

    def before_epoch(self, ctx: RunnerContext):
        pass

    def after_iter(self, ctx: RunnerContext):
        pass

    def after_epoch(self, ctx: RunnerContext):
        pass

    def after_train(self, ctx: RunnerContext):
        pass


@HOOKS.register_module()
class LoggerHook(Hook):
    """Console + json logging (reference TextLoggerHook, interval 50)."""
    priority = 90

    def __init__(self, logger):
        self.logger = logger

    def after_iter(self, ctx):
        self.logger.log_iter(ctx.epoch + 1, ctx.iter, ctx.steps_per_epoch,
                             ctx.lr, ctx.metrics)


@HOOKS.register_module()
class CheckpointHook(Hook):
    """Per-epoch orbax save (reference CheckpointHook interval=1)."""
    priority = 70

    def __init__(self, interval: int = 1, out_dir: Optional[str] = None,
                 max_keep: Optional[int] = None):
        self.interval = interval
        self.out_dir = out_dir
        self.max_keep = max_keep

    def after_epoch(self, ctx):
        if ctx.state is None or (ctx.epoch + 1) % self.interval:
            return
        from .checkpoint import save_checkpoint
        out = self.out_dir or os.path.join(ctx.work_dir, "ckpts")
        path = save_checkpoint(out, ctx.state, int(ctx.state.step))
        print(f"epoch {ctx.epoch + 1}: checkpoint -> {path}", flush=True)
        if self.max_keep:
            import re
            import shutil
            steps = sorted(
                int(m.group(1)) for m in
                (re.fullmatch(r"step_(\d+)", n) for n in os.listdir(out))
                if m)
            for s in steps[:-self.max_keep]:
                shutil.rmtree(os.path.join(out, f"step_{s}"),
                              ignore_errors=True)


@HOOKS.register_module()
class EvalHook(Hook):
    """Periodic COCO eval (reference EvalHook/DistEvalHook)."""
    priority = 80

    def __init__(self, interval: int = 1, logger=None):
        self.interval = interval
        self.logger = logger

    def after_epoch(self, ctx):
        if ctx.eval_fn is None or (ctx.epoch + 1) % self.interval:
            return
        metrics = ctx.eval_fn()
        if self.logger is not None:
            self.logger.log_eval(ctx.epoch + 1, metrics)


@HOOKS.register_module()
class TensorboardHook(Hook):
    """Scalar event files, TensorBoard layout (reference
    TensorboardLoggerHook). Uses tensorboardX or tf.summary when present;
    otherwise falls back to a plain jsonl scalars file that tools can
    convert — the dependency is not baked into this image."""
    priority = 91

    def __init__(self, log_dir: Optional[str] = None, interval: int = 50):
        self.log_dir = log_dir
        self.interval = interval
        self._writer = None
        self._fallback = None

    def before_train(self, ctx):
        log_dir = self.log_dir or os.path.join(ctx.work_dir, "tf_logs")
        os.makedirs(log_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter  # type: ignore
            self._writer = SummaryWriter(log_dir)
        except ImportError:
            self._fallback = open(os.path.join(log_dir, "scalars.jsonl"),
                                  "a")

    def after_iter(self, ctx):
        if ctx.global_step % self.interval:
            return
        scalars = dict(ctx.metrics, lr=ctx.lr)
        if self._writer is not None:
            for k, v in scalars.items():
                self._writer.add_scalar(f"train/{k}", v, ctx.global_step)
        elif self._fallback is not None:
            import json
            self._fallback.write(json.dumps(
                {"step": ctx.global_step, **scalars}) + "\n")
            self._fallback.flush()

    def after_train(self, ctx):
        if self._writer is not None:
            self._writer.close()
        if self._fallback is not None:
            self._fallback.close()


@HOOKS.register_module()
class WandbHook(Hook):
    """Weights & Biases scalar logging (reference WandbLoggerHook,
    `/root/reference/code/mmcv/mmcv/runner/hooks/logger/wandb.py`).

    ``wandb`` is not baked into this image; when absent the hook degrades
    to a jsonl scalars file in the same layout, so configs carrying the
    hook stay runnable everywhere."""
    priority = 92

    def __init__(self, init_kwargs: Optional[Dict[str, Any]] = None,
                 interval: int = 50, log_artifact: bool = False):
        self.init_kwargs = init_kwargs or {}
        self.interval = interval
        self.log_artifact = log_artifact
        self._run = None
        self._fallback = None

    def before_train(self, ctx):
        from lsnet_tpu.parallel.mesh import is_main_process
        if not is_main_process():   # reference hooks are @master_only
            return
        try:
            import wandb  # type: ignore
            self._run = wandb.init(**self.init_kwargs)
        except Exception as ex:  # absent lib OR runtime init failure
            # (missing credentials, unreachable server) -> jsonl fallback
            if not isinstance(ex, ImportError):
                import logging
                logging.getLogger(__name__).warning(
                    "wandb.init failed (%s: %s); falling back to jsonl",
                    type(ex).__name__, ex)
            path = os.path.join(ctx.work_dir, "wandb_scalars.jsonl")
            os.makedirs(ctx.work_dir, exist_ok=True)
            self._fallback = open(path, "a")

    def after_iter(self, ctx):
        if ctx.global_step % self.interval:
            return
        scalars = dict(ctx.metrics, lr=ctx.lr, epoch=ctx.epoch + 1)
        if self._run is not None:
            self._run.log(scalars, step=ctx.global_step)
        elif self._fallback is not None:
            import json
            self._fallback.write(json.dumps(
                {"step": ctx.global_step, **scalars}) + "\n")
            self._fallback.flush()

    def after_train(self, ctx):
        if self._run is not None:
            if self.log_artifact:
                import wandb  # type: ignore
                art = wandb.Artifact("checkpoints", type="model")
                ckpt_dir = os.path.join(ctx.work_dir, "ckpts")
                if os.path.isdir(ckpt_dir):
                    art.add_dir(ckpt_dir)
                self._run.log_artifact(art)
            self._run.finish()
        if self._fallback is not None:
            self._fallback.close()


@HOOKS.register_module()
class MlflowHook(Hook):
    """MLflow metric logging (reference MlflowLoggerHook,
    `/root/reference/code/mmcv/mmcv/runner/hooks/logger/mlflow.py`).
    Same gated-import/jsonl-fallback contract as :class:`WandbHook`."""
    priority = 93

    def __init__(self, exp_name: Optional[str] = None,
                 tags: Optional[Dict[str, Any]] = None, interval: int = 50):
        self.exp_name = exp_name
        self.tags = tags
        self.interval = interval
        self._mlflow = None
        self._fallback = None

    def before_train(self, ctx):
        from lsnet_tpu.parallel.mesh import is_main_process
        if not is_main_process():   # reference hooks are @master_only
            return
        try:
            import mlflow  # type: ignore
            if self.exp_name:
                mlflow.set_experiment(self.exp_name)
            mlflow.start_run()
            if self.tags:
                mlflow.set_tags(self.tags)
            self._mlflow = mlflow
        except Exception as ex:  # absent lib OR runtime init failure
            # (bad tracking URI, already-active run) -> jsonl fallback
            if not isinstance(ex, ImportError):
                import logging
                logging.getLogger(__name__).warning(
                    "mlflow start_run failed (%s: %s); falling back to "
                    "jsonl", type(ex).__name__, ex)
            path = os.path.join(ctx.work_dir, "mlflow_scalars.jsonl")
            os.makedirs(ctx.work_dir, exist_ok=True)
            self._fallback = open(path, "a")

    def after_iter(self, ctx):
        if ctx.global_step % self.interval:
            return
        scalars = dict(ctx.metrics, lr=ctx.lr)
        if self._mlflow is not None:
            self._mlflow.log_metrics(
                {k: float(v) for k, v in scalars.items()},
                step=ctx.global_step)
        elif self._fallback is not None:
            import json
            self._fallback.write(json.dumps(
                {"step": ctx.global_step, **scalars}) + "\n")
            self._fallback.flush()

    def after_train(self, ctx):
        if self._mlflow is not None:
            self._mlflow.end_run()
        if self._fallback is not None:
            self._fallback.close()


def build_hooks(cfg, logger, eval_interval: int) -> List[Hook]:
    """Default hook set + config-driven ``custom_hooks`` (reference
    ``register_training_hooks`` + custom_hooks)."""
    hooks: List[Hook] = [
        LoggerHook(logger),
        CheckpointHook(interval=cfg.get("checkpoint_config",
                                        {}).get("interval", 1)),
        EvalHook(interval=eval_interval, logger=logger),
    ]
    for hc in cfg.get("custom_hooks", []) or []:
        hc = dict(hc)
        kind = hc.pop("type")
        cls = HOOKS.get(kind)
        if cls is None:
            raise KeyError(f"unknown hook type {kind!r}")
        hooks.append(cls(**hc))
    return sorted(hooks, key=lambda h: h.priority)


def call_hooks(hooks: List[Hook], stage: str, ctx: RunnerContext) -> None:
    for h in hooks:
        getattr(h, stage)(ctx)
