"""Multi-scale training pipeline tests (VERDICT r1 item 1).

Covers the reference Resize multiscale semantics
(`/root/reference/code/mmdet/datasets/pipelines/transforms.py:79-176`):
'range' / 'value' / ratio_range sampling, canvas coverage, and the
orientation-grouped DataLoader actually training-iterating with the zoo's
list-valued ``img_scale``.
"""

import json
import os

import numpy as np
import pytest

from lsnet_tpu.data.transforms import (canvas_for_scale, rescale_size,
                                       sample_scale, scale_bounds)

MSTRAIN = [(1333, 480), (1333, 960)]


def test_sample_scale_range_bounds_and_jitter():
    rng = np.random.RandomState(0)
    longs, shorts = set(), set()
    for _ in range(200):
        l, s = sample_scale(MSTRAIN, "range", None, rng)
        longs.add(l)
        shorts.add(s)
        assert l == 1333
        assert 480 <= s <= 960
    # independent uniform short edge: many distinct values
    assert len(shorts) > 50


def test_sample_scale_value_picks_from_list():
    rng = np.random.RandomState(1)
    seen = {sample_scale(MSTRAIN, "value", None, rng) for _ in range(50)}
    assert seen == {(1333, 480), (1333, 960)}


def test_sample_scale_single_and_ratio():
    assert sample_scale((1333, 800)) == (1333, 800)
    rng = np.random.RandomState(2)
    for _ in range(20):
        l, s = sample_scale((1000, 600), ratio_range=(0.5, 1.5), rng=rng)
        assert 500 <= l <= 1500 and 300 <= s <= 900
    with pytest.raises(ValueError):
        sample_scale([(1, 2), (3, 4), (5, 6)], "range")


def test_scale_bounds_and_canvas_cover_every_resize():
    assert scale_bounds(MSTRAIN) == (1333, 960)
    land = canvas_for_scale(MSTRAIN, portrait=False)
    port = canvas_for_scale(MSTRAIN, portrait=True)
    assert land == (960, 1344) and port == (1344, 960)
    rng = np.random.RandomState(3)
    for _ in range(100):
        sc = sample_scale(MSTRAIN, "range", None, rng)
        for (h, w), canvas in (((500, 700), land), ((700, 500), port)):
            nh, nw = rescale_size(h, w, sc)
            assert nh <= canvas[0] and nw <= canvas[1], (sc, (nh, nw), canvas)


def _synthetic_coco(root, sizes):
    from PIL import Image
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    for i, (h, w) in enumerate(sizes):
        arr = np.zeros((h, w, 3), np.uint8)
        arr[h // 4: h // 2, w // 4: w // 2] = (0, 255, 0)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.png"))
        images.append(dict(id=i, file_name=f"{i}.png", width=w, height=h))
        x1, y1 = w / 4.0, h / 4.0
        annotations.append(dict(
            id=i + 1, image_id=i, category_id=1,
            bbox=[x1, y1, w / 4.0, h / 4.0], area=w * h / 16.0, iscrowd=0,
            segmentation=[[x1, y1, x1 + w / 4.0, y1,
                           x1 + w / 4.0, y1 + h / 4.0, x1, y1 + h / 4.0]]))
    ann_file = os.path.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="thing")]), f)
    return ann_file, img_dir


def test_loader_mstrain_grouped_epoch(tmp_path):
    """DataLoader.epoch with a list-valued img_scale: per-sample scale
    jitter + orientation-grouped static canvases (4 landscape + 4
    portrait images)."""
    from lsnet_tpu.data.coco import CocoDataset, DataLoader, DatasetConfig

    sizes = [(60, 100), (50, 90), (64, 96), (48, 80),      # landscape
             (100, 60), (90, 50), (96, 64), (80, 48)]      # portrait
    ann_file, img_dir = _synthetic_coco(str(tmp_path), sizes)
    scale_list = [(133, 48), (133, 96)]
    ds = CocoDataset(DatasetConfig(ann_file=ann_file, img_prefix=img_dir,
                                   img_scale=scale_list,
                                   multiscale_mode="range",
                                   max_instances=4))
    loader = DataLoader(ds, batch_size=2, seed=0, prefetch=2)
    land = canvas_for_scale(scale_list)
    assert loader.canvases == {"landscape": land,
                               "portrait": (land[1], land[0])}
    assert loader.steps_per_epoch() == 4

    canvases_seen = set()
    img_shapes = []
    for batch in loader.epoch(0):
        cv = batch["image"].shape[1:3]
        canvases_seen.add(tuple(cv))
        for hw, valid_hw in zip(batch["img_shape"], batch["pad_shape"]):
            h, w = int(hw[0]), int(hw[1])
            assert h <= cv[0] and w <= cv[1]
            img_shapes.append((h, w))
        # a batch mixes only one orientation
        orient = {h > w for h, w in
                  [(int(s[0]), int(s[1])) for s in batch["img_shape"]]}
        assert len(orient) == 1
    assert canvases_seen == {land, (land[1], land[0])}
    # per-sample scale jitter: multiple distinct resized shapes
    assert len(set(img_shapes)) > 2

    # different epoch -> different jitter
    shapes2 = [tuple(int(v) for v in s)
               for b in loader.epoch(1) for s in b["img_shape"]]
    assert shapes2 != img_shapes


@pytest.mark.slow
def test_train_detector_mstrain_e2e(tmp_path):
    """train_detector runs with multiscale 'range' img_scale (the shipped
    mstrain config shape) end-to-end on a tiny model."""
    from test_e2e_train import make_cfg

    # batch = samples_per_gpu * 8 virtual devices = 8, so give each
    # orientation group a full batch
    sizes = [(60, 100)] * 4 + [(50, 90)] * 4 + [(100, 60)] * 4 + [(90, 50)] * 4
    ann_file, img_dir = _synthetic_coco(str(tmp_path), sizes)
    cfg = make_cfg(ann_file, img_dir)
    cfg.data.train.img_scale = [(96, 48), (96, 80)]
    cfg.data.train.multiscale_mode = "range"
    cfg.canvas_shape = None
    cfg.data.val.img_scale = (96, 64)

    from lsnet_tpu.train.loop import train_detector
    out = train_detector(cfg, str(tmp_path / "work"), total_epochs=1,
                         max_iters_per_epoch=2, eval_interval=100)
    assert int(out["state"].step) >= 1


def test_mstrain_zoo_configs_have_valid_scale_specs():
    """Every shipped mstrain config declares a scale spec the sampler and
    canvas logic accept (the r1 failure mode: TypeError in rescale_size)."""
    import glob

    from lsnet_tpu.utils.config import Config
    cfgs = sorted(glob.glob("configs/lsnet/*mstrain*.py"))
    assert len(cfgs) >= 10
    rng = np.random.RandomState(0)
    for path in cfgs:
        cfg = Config.fromfile(path)
        spec = cfg.data.train.img_scale
        mode = cfg.data.train.get("multiscale_mode", "range")
        sc = sample_scale(spec, mode, cfg.data.train.get("ratio_range"), rng)
        nh, nw = rescale_size(500, 700, sc)
        land = canvas_for_scale(spec)
        assert nh <= land[0] and nw <= land[1]
