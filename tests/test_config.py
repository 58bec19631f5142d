"""Config system tests — mirrors the reference mmcv config semantics
(`code/mmcv/tests/test_config.py` coverage: _base_ merge, _delete_, CLI
override)."""

import os
import textwrap

import pytest

from lsnet_tpu.utils.config import Config, ConfigDict, merge_dict
from lsnet_tpu.utils.registry import Registry, build_from_cfg


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_basic_load(tmp_path):
    f = _write(tmp_path, "a.py", """
        item1 = [1, 2]
        item2 = dict(a=1)
        item3 = True
    """)
    cfg = Config.fromfile(f)
    assert cfg.item1 == [1, 2]
    assert cfg.item2.a == 1
    assert cfg.item3 is True
    assert cfg.filename == f


def test_base_inheritance(tmp_path):
    _write(tmp_path, "base.py", """
        model = dict(backbone=dict(depth=50, frozen=1), neck=dict(ch=256))
        lr = 0.02
    """)
    f = _write(tmp_path, "child.py", """
        _base_ = './base.py'
        model = dict(backbone=dict(depth=101))
        lr = 0.01
    """)
    cfg = Config.fromfile(f)
    assert cfg.model.backbone.depth == 101
    assert cfg.model.backbone.frozen == 1        # merged, not replaced
    assert cfg.model.neck.ch == 256
    assert cfg.lr == 0.01


def test_multi_base(tmp_path):
    _write(tmp_path, "b1.py", "a = 1\nshared = dict(x=1)")
    _write(tmp_path, "b2.py", "b = 2\nshared = dict(y=2)")
    f = _write(tmp_path, "c.py", "_base_ = ['./b1.py', './b2.py']\nc = 3")
    cfg = Config.fromfile(f)
    assert cfg.a == 1 and cfg.b == 2 and cfg.c == 3
    assert cfg.shared.x == 1 and cfg.shared.y == 2


def test_delete_key(tmp_path):
    _write(tmp_path, "base.py", """
        opt = dict(type='SGD', lr=0.1, momentum=0.9)
    """)
    f = _write(tmp_path, "child.py", """
        _base_ = './base.py'
        opt = dict(type='Adam', lr=0.001, _delete_=True)
    """)
    cfg = Config.fromfile(f)
    assert cfg.opt.type == "Adam"
    assert "momentum" not in cfg.opt


def test_merge_from_dict(tmp_path):
    f = _write(tmp_path, "a.py", "model = dict(head=dict(nv=4))\nlr = 0.1")
    cfg = Config.fromfile(f)
    cfg.merge_from_dict({"model.head.nv": 36, "lr": 0.5})
    assert cfg.model.head.nv == 36
    assert cfg.lr == 0.5


def test_registry_build():
    REG = Registry("thing")

    @REG.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = build_from_cfg(dict(type="Foo", a=1), REG)
    assert obj.a == 1 and obj.b == 2
    with pytest.raises(KeyError):
        build_from_cfg(dict(type="Bar"), REG)
    with pytest.raises(KeyError):
        @REG.register_module()
        class Foo:  # noqa: F811 — duplicate registration must fail
            pass
