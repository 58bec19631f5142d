"""Runner hook framework tests (reference mmcv runner hooks analogue)."""

import os

import numpy as np
import pytest


def test_hook_ordering_and_build():
    from lsnet_tpu.train.hooks import (HOOKS, CheckpointHook, EvalHook, Hook,
                                       LoggerHook, RunnerContext, build_hooks,
                                       call_hooks)
    from lsnet_tpu.utils.config import Config

    calls = []

    @HOOKS.register_module()
    class ProbeHook(Hook):
        priority = 10

        def __init__(self, tag="probe"):
            self.tag = tag

        def after_iter(self, ctx):
            calls.append((self.tag, ctx.global_step))

        def after_epoch(self, ctx):
            if ctx.epoch >= 0:
                ctx.should_stop = True   # early-stop plumbing

    class _Log:
        def log_iter(self, *a):
            calls.append(("log", a[0]))

        def log_eval(self, *a):
            pass

    cfg = Config(dict(custom_hooks=[dict(type="ProbeHook", tag="custom")]))
    hooks = build_hooks(cfg, _Log(), eval_interval=1)
    kinds = [type(h).__name__ for h in hooks]
    assert kinds == ["ProbeHook", "CheckpointHook", "EvalHook", "LoggerHook"]

    ctx = RunnerContext(cfg, "/tmp", 10, 1)
    ctx.global_step = 7
    ctx.metrics = {"loss": 1.0}
    call_hooks(hooks, "after_iter", ctx)
    # probe (priority 10) fires before the logger (priority 90)
    assert calls[0] == ("custom", 7)
    call_hooks(hooks, "after_epoch", ctx)   # no state -> ckpt must not fire
    assert ctx.should_stop

    with pytest.raises(KeyError):
        build_hooks(Config(dict(custom_hooks=[dict(type="Nope")])), _Log(), 1)


def test_tensorboard_hook(tmp_path, monkeypatch):
    from lsnet_tpu.train.hooks import RunnerContext, TensorboardHook
    from lsnet_tpu.utils.config import Config

    def drive(hook):
        ctx = RunnerContext(Config({}), str(tmp_path), 10, 1)
        hook.before_train(ctx)
        ctx.global_step = 1
        ctx.metrics = {"loss": 2.5}
        ctx.lr = 0.01
        hook.after_iter(ctx)
        hook.after_train(ctx)

    # tensorboardX is in this image -> real event files
    drive(TensorboardHook(log_dir=str(tmp_path / "tb"), interval=1))
    names = os.listdir(tmp_path / "tb")
    assert any(n.startswith("events") for n in names), names

    # forced fallback (dependency absent) -> jsonl scalars
    import builtins
    real_import = builtins.__import__

    def no_tbx(name, *a, **k):
        if name.startswith("tensorboardX"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_tbx)
    drive(TensorboardHook(log_dir=str(tmp_path / "tb2"), interval=1))
    scalars = (tmp_path / "tb2" / "scalars.jsonl").read_text().strip()
    assert '"loss": 2.5' in scalars


def test_wandb_mlflow_hooks_fallback(tmp_path):
    """W&B / MLflow hooks degrade to jsonl when the client libs are absent
    (they are not baked into this image), and build from custom_hooks."""
    import json

    from lsnet_tpu.train.hooks import (MlflowHook, RunnerContext, WandbHook,
                                       build_hooks)
    from lsnet_tpu.utils.config import Config

    class _Log:
        def log_iter(self, *a):
            pass

        def log_eval(self, *a):
            pass

    cfg = Config(dict(custom_hooks=[
        dict(type="WandbHook", interval=1),
        dict(type="MlflowHook", interval=1, exp_name="lsnet"),
    ]))
    hooks = build_hooks(cfg, _Log(), eval_interval=1)
    assert any(isinstance(h, WandbHook) for h in hooks)
    assert any(isinstance(h, MlflowHook) for h in hooks)

    ctx = RunnerContext(cfg, str(tmp_path), 10, 1)
    for h in hooks:
        h.before_train(ctx)
    ctx.global_step = 2
    ctx.metrics = {"loss": 1.25}
    ctx.lr = 0.02
    for h in hooks:
        h.after_iter(ctx)
        h.after_train(ctx)

    wandb_rec = json.loads((tmp_path / "wandb_scalars.jsonl")
                           .read_text().strip())
    assert wandb_rec["step"] == 2
    assert wandb_rec["loss"] == 1.25 and wandb_rec["epoch"] == 1
    mlflow_rec = json.loads((tmp_path / "mlflow_scalars.jsonl")
                            .read_text().strip())
    assert mlflow_rec["step"] == 2 and mlflow_rec["lr"] == 0.02
