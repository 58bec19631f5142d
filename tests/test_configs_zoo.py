"""Build every shipped config — the de-facto schema test (mirrors the
reference `tests/test_config.py` which parses all configs and builds the
detector)."""

import glob
import os

import pytest

from lsnet_tpu.models import build_detector
from lsnet_tpu.utils.config import Config

CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "lsnet")
ALL_CONFIGS = sorted(glob.glob(os.path.join(CFG_DIR, "*.py")))


def test_found_all_configs():
    assert len(ALL_CONFIGS) == 17


@pytest.mark.parametrize("cfg_path", ALL_CONFIGS,
                         ids=[os.path.basename(p) for p in ALL_CONFIGS])
def test_config_builds(cfg_path):
    cfg = Config.fromfile(cfg_path)
    model, loss_cfgs = build_detector(cfg.model.to_dict())
    name = os.path.basename(cfg_path)
    head = model.head
    if "cpv" in name:
        assert type(head).__name__ == "LSCPVHead"
    else:
        assert type(head).__name__ == "LSHead"
        if "segm" in name:
            assert head.task == "segm" and head.num_vectors == 36
        elif "pose_kbox" in name:
            assert head.task == "pose_kbox" and head.num_vectors == 17
        elif "pose_bbox" in name:
            assert head.task == "pose_bbox" and head.num_vectors == 17
        else:
            assert head.task == "bbox" and head.num_vectors == 4
    # backbone family
    bb = model.backbone
    if "x101" in name:
        assert bb.block_type == "resnext" and bb.depth == 101
        assert bb.groups == 64 and bb.base_width == 4
    elif "res2" in name:
        assert bb.block_type == "res2net" and bb.depth == 101
    else:
        assert bb.block_type == "resnet" and bb.depth == 50
    if "dconv_c3-c5" in name:
        assert tuple(bb.stage_with_dcn) == (False, True, True, True)
    # schedule knobs exist
    assert cfg.optimizer.lr == 0.01
    assert cfg.optimizer_config.grad_clip.max_norm == 35
    assert cfg.test_cfg.nms.iou_thr == 0.6


ZOO_DIR = os.path.dirname(CFG_DIR)
ZOO_CONFIGS = sorted(p for p in glob.glob(os.path.join(ZOO_DIR, "*", "*.py"))
                     if "_base_" not in p and os.sep + "lsnet" + os.sep
                     not in p)


def test_found_zoo_families():
    fams = {os.path.basename(os.path.dirname(p)) for p in ZOO_CONFIGS}
    for fam in ("retinanet", "fcos", "atss", "gfl", "reppoints", "ssd",
                "foveabox", "fsaf", "free_anchor", "guided_anchoring",
                "pisa", "nas_fcos", "faster_rcnn", "mask_rcnn",
                "cascade_rcnn", "ms_rcnn", "grid_rcnn", "htc",
                "point_rend", "detectors"):
        assert fam in fams, fam


@pytest.mark.parametrize("cfg_path", ZOO_CONFIGS,
                         ids=[os.path.join(os.path.basename(
                             os.path.dirname(p)), os.path.basename(p))
                             for p in ZOO_CONFIGS])
def test_zoo_config_builds(cfg_path):
    """Every inherited-zoo config parses and builds its detector module."""
    cfg = Config.fromfile(cfg_path)
    model, _ = build_detector(cfg.model.to_dict())
    assert model is not None
