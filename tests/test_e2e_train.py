"""End-to-end integration: synthetic COCO dataset on disk -> train_detector
(epoch loop, checkpointing, eval hook) and a fixed-batch overfit check.
This covers what the reference exercises only in real runs (runner + hooks +
eval), per SURVEY.md §4."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

IMG = 64


def make_synthetic_coco(root, n_images=4):
    from PIL import Image
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        arr = np.zeros((IMG, IMG, 3), np.uint8)
        x1, y1 = rng.randint(5, 20, 2)
        w, h = rng.randint(20, 35, 2)
        x2, y2 = min(x1 + w, IMG - 1), min(y1 + h, IMG - 1)
        arr[y1:y2, x1:x2] = (255, 0, 0)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i:04d}.png"))
        images.append(dict(id=i, file_name=f"{i:04d}.png",
                           width=IMG, height=IMG))
        annotations.append(dict(
            id=aid, image_id=i, category_id=1,
            bbox=[float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
            area=float((x2 - x1) * (y2 - y1)), iscrowd=0,
            segmentation=[[float(x1), float(y1), float(x2), float(y1),
                           float(x2), float(y2), float(x1), float(y2)]]))
        aid += 1
    ann = dict(images=images, annotations=annotations,
               categories=[dict(id=1, name="thing")])
    ann_file = os.path.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return ann_file, img_dir


def make_cfg(ann_file, img_dir):
    from lsnet_tpu.utils.config import Config
    return Config(dict(
        model=dict(
            type="LSDetector",
            backbone=dict(type="ResNet", depth=18, num_stages=4,
                          out_indices=(0, 1, 2, 3), frozen_stages=-1),
            neck=dict(type="FPN", out_channels=32, start_level=1,
                      add_extra_convs="on_input", num_outs=5,
                      norm_cfg=dict(type="GN", num_groups=8)),
            bbox_head=dict(type="LSHead", task="bbox", num_vectors=4,
                           num_classes=1, in_channels=32, feat_channels=32,
                           point_feat_channels=32, stacked_convs=1,
                           norm_cfg=dict(type="GN", num_groups=8),
                           conv_module_type="norm")),
        train_cfg=dict(
            init=dict(assigner=dict(type="CentroidAssigner", scale=4,
                                    pos_num=1, iou_type="center")),
            refine=dict(assigner=dict(type="ATSSAssigner", topk=9))),
        test_cfg=dict(nms_pre=200, score_thr=0.05,
                      nms=dict(type="nms", iou_thr=0.6), max_per_img=10),
        data=dict(samples_per_gpu=1,
                  train=dict(ann_file=ann_file, img_prefix=img_dir,
                             img_scale=(IMG, IMG)),
                  val=dict(ann_file=ann_file, img_prefix=img_dir,
                           img_scale=(IMG, IMG))),
        optimizer=dict(lr=0.005, momentum=0.9, weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(step=[100]),
        canvas_shape=(IMG, IMG),
        max_instances=8,
        log_interval=2,
        total_epochs=1,
        eval_max_images=2,
        seed=0,
    ))


@pytest.mark.slow
def test_train_detector_end_to_end(tmp_path):
    from lsnet_tpu.ops import flat_deform as fd
    from lsnet_tpu.train.checkpoint import load_deploy_meta
    from lsnet_tpu.train.loop import train_detector
    ann_file, img_dir = make_synthetic_coco(str(tmp_path), n_images=8)
    cfg = make_cfg(ann_file, img_dir)
    # declarative nearest-aware train recipe (cfg wins over env); the
    # checkpoint sidecar must record it so eval deploys skew-free
    cfg.train_cfg["dcn_sampling"] = "nearest_ste"
    prev = (fd.SAMPLING[0], dict(fd.SAMPLING_POLICY), fd._SAMPLING_EXPLICIT[0])
    try:
        out = train_detector(cfg, str(tmp_path / "work"), total_epochs=1,
                             max_iters_per_epoch=3)
        assert fd.SAMPLING[0] == "nearest_ste"
    finally:
        fd.SAMPLING[0] = prev[0]
        fd.SAMPLING_POLICY.clear()
        fd.SAMPLING_POLICY.update(prev[1])
        fd._SAMPLING_EXPLICIT[0] = prev[2]
    state = out["state"]
    assert int(state.step) == 1
    ckpts = os.listdir(str(tmp_path / "work" / "ckpts"))
    assert any(c.startswith("step_") for c in ckpts)
    step_dir = [c for c in ckpts if c.startswith("step_")][0]
    meta = load_deploy_meta(str(tmp_path / "work" / "ckpts" / step_dir))
    assert meta["dcn_sampling_train"] == "nearest_ste"
    logs = [f for f in os.listdir(str(tmp_path / "work"))
            if f.endswith(".log.json")]
    assert logs
    with open(str(tmp_path / "work" / logs[0])) as f:
        records = [json.loads(l) for l in f]
    assert any(r["mode"] == "val" for r in records)


@pytest.mark.slow
def test_overfit_single_batch(tmp_path):
    """Loss must drop markedly when overfitting one batch — validates the
    assign→target→loss→grad chain end to end."""
    from lsnet_tpu.core.loss import LossConfig
    from lsnet_tpu.data.coco import CocoDataset, DatasetConfig, collate_batch
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.train.optim import build_optimizer
    from lsnet_tpu.train.step import create_train_state, make_train_step

    ann_file, img_dir = make_synthetic_coco(str(tmp_path), n_images=2)
    cfg = make_cfg(ann_file, img_dir)
    ds = CocoDataset(DatasetConfig(ann_file=ann_file, img_prefix=img_dir,
                                   img_scale=(IMG, IMG), max_instances=8))
    batch = collate_batch([ds.get_sample(0), ds.get_sample(1)], (IMG, IMG),
                          max_instances=8)
    batch = jax.tree.map(jnp.asarray, batch)
    model, _ = build_detector(cfg.model.to_dict())
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1])
    tx, _ = build_optimizer(0.01, 1000, [10_000], warmup_iters=10)
    state = create_train_state(variables, tx)
    lcfg = LossConfig(image_shape=(IMG, IMG), num_classes=1, task="bbox")
    step = make_train_step(model, tx, lcfg)
    first = None
    for i in range(25):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)
