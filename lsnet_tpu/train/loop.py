"""Training orchestration — the runner.

Equivalent of the reference `train_detector` + ``EpochBasedRunner`` + hooks
(`/root/reference/code/mmdet/apis/train.py:33`, `mmcv/runner/
epoch_based_runner.py:14-76`): epoch loop, LR schedule (inside the jitted
step), 50-iter json/console logging, per-epoch orbax checkpoint, per-epoch
COCO eval, ``--resume-from``.  The per-iteration work is one jitted
mesh-sharded function (see :mod:`lsnet_tpu.train.step`).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.decode import TestConfig, lsnet_decode
from ..core.loss import LossConfig
from ..data.coco import CocoDataset, DataLoader, DatasetConfig, collate_batch
from ..evalkit.evaluator import (coco_gt_from_annotations, detections_to_coco,
                                 evaluate_coco)
from ..models import build_detector
from ..models.backbones.resnet import frozen_param_paths
from ..parallel.mesh import make_mesh, shard_batch_pytree
from ..utils.logging import JsonLogger, collect_env
from .checkpoint import (latest_checkpoint, load_pretrained_backbone,
                         restore_checkpoint, save_checkpoint)
from .optim import build_optimizer, make_frozen_mask
from .step import create_train_state, make_eval_forward, make_train_step


def loss_cfg_from(cfg, image_shape) -> LossConfig:
    head = cfg.model.bbox_head
    tc = cfg.train_cfg
    return LossConfig(
        image_shape=image_shape,
        num_classes=head.num_classes,
        task=head.get("task", "bbox"),
        num_vectors=head.get("num_vectors", 4),
        point_strides=tuple(head.get("point_strides", (8, 16, 32, 64, 128))),
        point_base_scale=head.get("point_base_scale", 4),
        init_scale=tc.init.assigner.get("scale", 4),
        init_pos_num=tc.init.assigner.get("pos_num", 1),
        init_iou_type=tc.init.assigner.get("iou_type", "center"),
        refine_topk=tc.refine.assigner.get("topk", 9),
        cls_loss_weight=head.get("loss_cls", {}).get("loss_weight", 1.0),
        init_loss_weight=head.get("loss_bbox_init",
                                  head.get("loss_segm_init", {})
                                  ).get("loss_weight", 1.0),
        refine_loss_weight=head.get("loss_bbox_refine",
                                    head.get("loss_segm_refine", {})
                                    ).get("loss_weight", 2.0),
        pose_init_loss_weight=head.get("loss_pose_init", {}
                                       ).get("loss_weight", 1.0),
        pose_refine_loss_weight=head.get("loss_pose_refine", {}
                                         ).get("loss_weight", 2.0),
    )


def two_stage_cfg_from(cfg, image_shape):
    """TwoStageConfig from a faster_rcnn-style config tree."""
    from ..core.two_stage import TwoStageConfig
    tc = cfg.get("train_cfg", {}) or {}
    rpn = tc.get("rpn", {}).get("assigner", {})
    prop = tc.get("rpn_proposal", {})
    rcnn = tc.get("rcnn", {})
    if isinstance(rcnn, (list, tuple)):   # cascade: per-stage train cfgs;
        rcnn = rcnn[0] if rcnn else {}    # sampler knobs come from stage 1
    bh = cfg.model.roi_head.bbox_head
    if isinstance(bh, (list, tuple)):     # cascade: per-stage head list
        bh = bh[0]
    num_classes = bh.num_classes
    return TwoStageConfig(
        image_shape=image_shape,
        num_classes=num_classes,
        rpn_pos_iou=rpn.get("pos_iou_thr", 0.7),
        rpn_neg_iou=rpn.get("neg_iou_thr", 0.3),
        rpn_num_samples=tc.get("rpn", {}).get("sampler", {}).get("num", 256),
        nms_pre=prop.get("nms_pre", 1000),
        proposal_count=min(prop.get("max_per_img", 512), 512),
        proposal_nms_iou=prop.get("nms", {}).get("iou_threshold", 0.7),
        rcnn_pos_iou=rcnn.get("assigner", {}).get("pos_iou_thr", 0.5),
        rcnn_num_samples=rcnn.get("sampler", {}).get("num", 512),
        rcnn_pos_fraction=rcnn.get("sampler", {}).get("pos_fraction", 0.25),
    )


def _is_two_stage(cfg) -> bool:
    return cfg.model.type in ("FasterRCNN", "TwoStageDetector", "MaskRCNN",
                              "CascadeRCNN", "MaskScoringRCNN",
                              "GridRCNN", "HybridTaskCascade", "HTC",
                              "PointRend")


def _head_cfg(cfg):
    """The (first) head config dict — single-stage ``bbox_head``, two-stage
    ``roi_head.bbox_head``; cascade configs carry a per-stage list, whose
    first stage defines the shared schema (num_classes, task, ...)."""
    head = cfg.model.get(
        "bbox_head", cfg.model.get("roi_head", {}).get("bbox_head", {}))
    if not head and cfg.model.get("type") == "RPN":
        head = cfg.model.get("rpn_head", {})
    if isinstance(head, (list, tuple)):
        head = head[0] if head else {}
    return head


def _head_num_vectors(cfg, head) -> int:
    """num_vectors for the data pipeline. Mask R-CNN has no LSHead-style
    num_vectors key; its mask targets are rasterized from gt_polygons, so
    the pipeline must carry full-resolution contours (reference mask
    targets crop real masks, `mask_target.py`) — 36 points, matching the
    segm pipeline, not the 4-vertex bbox default."""
    return head.get("num_vectors",
                    36 if cfg.model.type in ("MaskRCNN", "MaskScoringRCNN",
                                             "HybridTaskCascade", "HTC",
                                             "PointRend",
                                             "DenseRepPointsDetector",
                                             "DenseRepPointsV2Detector")
                    else 4)


DENSE_HEAD_KINDS = {"RetinaHead": "retina", "RetinaSepBNHead": "retina",
                    "FCOSHead": "fcos",
                    "ATSSHead": "atss", "GFLHead": "gfl",
                    "SSDHead": "ssd", "FoveaHead": "fovea",
                    "FSAFHead": "fsaf",
                    "FreeAnchorRetinaHead": "free_anchor",
                    "PISARetinaHead": "pisa_retina",
                    "PISASSDHead": "pisa_ssd",
                    "GARetinaHead": "ga_retina",
                    "GARPNHead": "ga_rpn"}


def dense_cfg_from(cfg, image_shape):
    """DenseLossConfig honoring config-specified priors — shared by the
    train-time loss and the decode path so non-default strides /
    regress_ranges decode with the same anchors/points they trained with
    (ADVICE r2: the decode path used all-defaults)."""
    from ..core.dense_loss import DenseLossConfig
    head = _head_cfg(cfg)
    kind = DENSE_HEAD_KINDS[head.type]
    tc = cfg.get("train_cfg", {})
    assigner = tc.get("assigner", {})
    ag = head.get("anchor_generator", {}) or {}
    extra = {}
    if kind in ("ssd", "pisa_ssd"):
        extra = dict(
            strides=tuple(ag.get("strides", (8, 16, 32, 64, 100, 300))),
            ssd_input_size=ag.get("input_size", 300),
            ssd_ratios=tuple(tuple(r) for r in ag.get(
                "ratios", ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)))),
            ssd_basesize_ratio_range=tuple(ag.get(
                "basesize_ratio_range", (0.15, 0.9))),
            ssd_neg_pos_ratio=tc.get("neg_pos_ratio", 3),
            ssd_smoothl1_beta=tc.get("smoothl1_beta", 1.0),
            ssd_stds=tuple(head.get("bbox_coder", {}).get(
                "target_stds", (0.1, 0.1, 0.2, 0.2))))
    elif kind == "fovea":
        extra = dict(
            fovea_base_edges=tuple(head.get("base_edge_list",
                                            (16, 32, 64, 128, 256))),
            fovea_scale_ranges=tuple(tuple(r) for r in head.get(
                "scale_ranges",
                ((8, 32), (16, 64), (32, 128), (64, 256), (128, 512)))),
            fovea_sigma=head.get("sigma", 0.4),
            fovea_alpha=head.get("loss_cls", {}).get("alpha", 0.4),
            fovea_gamma=head.get("loss_cls", {}).get("gamma", 1.5),
            fovea_bbox_weight=head.get("loss_bbox", {}
                                       ).get("loss_weight", 0.75))
    elif kind == "fsaf":
        extra = dict(
            fsaf_pos_scale=assigner.get("pos_scale", 0.2),
            fsaf_normalizer=head.get("bbox_coder", {}).get(
                "normalizer", 4.0))
    if "strides" not in extra:
        extra["strides"] = tuple(head.get("strides", (8, 16, 32, 64, 128)))
    return DenseLossConfig(
        image_shape=image_shape,
        num_classes=head.get("num_classes", 1),
        head=kind,
        pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
        neg_iou_thr=assigner.get("neg_iou_thr", 0.4),
        min_pos_iou=assigner.get("min_pos_iou", 0.0),
        topk=assigner.get("topk", 9),
        regress_ranges=tuple(tuple(r) for r in head.get(
            "regress_ranges",
            ((-1, 64), (64, 128), (128, 256), (256, 512), (512, 1e8)))),
        **extra,
    )


def reppoints_cfg_from(cfg, image_shape):
    from ..core.reppoints import RepPointsConfig
    head = cfg.model.bbox_head
    tc = cfg.get("train_cfg", {}) or {}
    init_a = tc.get("init", {}).get("assigner", {})
    ref_a = tc.get("refine", {}).get("assigner", {})
    return RepPointsConfig(
        image_shape=image_shape,
        num_classes=head.num_classes,
        num_points=head.get("num_points", 9),
        point_strides=tuple(head.get("point_strides",
                                     (8, 16, 32, 64, 128))),
        point_base_scale=head.get("point_base_scale", 4),
        transform_method=head.get("transform_method", "moment"),
        init_scale=init_a.get("scale", 4),
        init_pos_num=init_a.get("pos_num", 1),
        refine_pos_iou=ref_a.get("pos_iou_thr", 0.5),
        refine_neg_iou=ref_a.get("neg_iou_thr", 0.4),
        refine_min_pos_iou=ref_a.get("min_pos_iou", 0.0),
        cls_weight=head.get("loss_cls", {}).get("loss_weight", 1.0),
        init_weight=head.get("loss_bbox_init", {}).get("loss_weight", 0.5),
        refine_weight=head.get("loss_bbox_refine", {}
                               ).get("loss_weight", 1.0),
    )


def dense_reppoints_cfg_from(cfg, image_shape):
    from ..core.dense_reppoints import DenseRepPointsConfig
    head = _head_cfg(cfg)
    tc = cfg.get("train_cfg", {}) or {}
    init_a = tc.get("init", {}).get("assigner", {})
    ref_a = tc.get("refine", {}).get("assigner", {})
    return DenseRepPointsConfig(
        image_shape=image_shape,
        num_classes=head.num_classes,
        num_points=head.get("num_points", 729),
        num_group=head.get("num_group", 9),
        num_score_group=head.get("num_score_group", 121),
        point_strides=tuple(head.get("point_strides",
                                     (8, 16, 32, 64, 128))),
        point_base_scale=head.get("point_base_scale", 4),
        init_scale=init_a.get("scale", 4),
        init_pos_num=init_a.get("pos_num", 1),
        refine_pos_iou=ref_a.get("pos_iou_thr", 0.5),
        refine_neg_iou=ref_a.get("neg_iou_thr", 0.4),
        refine_min_pos_iou=ref_a.get("min_pos_iou", 0.0),
    )


def make_loss_for(cfg, image_shape):
    """(loss_fn, loss_cfg) dispatch over the head family: LSHead ->
    lsnet_loss, LSCPVHead -> lscpv_loss, Retina/FCOS/ATSS -> dense_loss."""
    head_type = _head_cfg(cfg).type
    if head_type in ("DenseRepPointsHead", "DenseRepPointsV2Head"):
        from ..core.dense_reppoints import (dense_reppoints_loss,
                                            dense_reppoints_v2_loss)
        dcfg = dense_reppoints_cfg_from(cfg, image_shape)
        fn = (dense_reppoints_loss if head_type == "DenseRepPointsHead"
              else dense_reppoints_v2_loss)
        return lambda outs, batch: fn(outs, batch, dcfg)
    if head_type == "RepPointsHead":
        from ..core.reppoints import reppoints_loss
        rcfg = reppoints_cfg_from(cfg, image_shape)
        return lambda outs, batch: reppoints_loss(outs, batch, rcfg)
    if head_type == "RepPointsV2Head":
        from ..core.reppoints import reppoints_v2_loss
        rcfg = reppoints_cfg_from(cfg, image_shape)
        return lambda outs, batch: reppoints_v2_loss(outs, batch, rcfg)
    if head_type == "LSHead":
        from ..core.loss import lsnet_loss
        lcfg = loss_cfg_from(cfg, image_shape)
        return lambda outs, batch: lsnet_loss(outs, batch, lcfg)
    if head_type == "LSCPVHead":
        from ..core.cpv import CPVLossConfig, lscpv_loss
        ccfg = CPVLossConfig(base=loss_cfg_from(cfg, image_shape))
        return lambda outs, batch: lscpv_loss(outs, batch, ccfg)
    from ..core.dense_loss import dense_loss
    dcfg = dense_cfg_from(cfg, image_shape)
    return lambda outs, batch: dense_loss(outs, batch, dcfg)


def test_cfg_from(cfg, image_shape) -> TestConfig:
    head = _head_cfg(cfg)
    tc = cfg.test_cfg
    if "rcnn" in tc:
        tc = tc.rcnn
    return TestConfig(
        image_shape=image_shape,
        num_classes=head.get("num_classes", 1),
        task=head.get("task", "bbox"),
        num_vectors=head.get("num_vectors", 4),
        point_strides=tuple(head.get("point_strides", (8, 16, 32, 64, 128))),
        nms_pre=tc.get("nms_pre", 1000),
        score_thr=tc.get("score_thr", 0.05),
        nms_iou=tc.get("nms", {}).get("iou_thr", 0.6),
        max_per_img=tc.get("max_per_img", 100),
        nms_type=tc.get("nms", {}).get("type", "nms"),
        soft_sigma=tc.get("nms", {}).get("sigma", 0.5),
        soft_min_score=tc.get("nms", {}).get("min_score", 1e-3),
    )


def train_detector(cfg, work_dir: str, *, total_epochs: Optional[int] = None,
                   max_iters_per_epoch: Optional[int] = None,
                   resume_from: Optional[str] = None,
                   eval_interval: int = 1) -> Dict[str, Any]:
    """Full training run from a Config. Returns final state + metrics."""
    from .. import enable_compile_cache
    enable_compile_cache()
    os.makedirs(work_dir, exist_ok=True)
    logger = JsonLogger(work_dir, interval=cfg.get("log_interval", 50))
    print("environment:", dict(collect_env()), flush=True)

    # declarative TRAIN-time DCN sampling recipe (e.g. "nearest_ste" to
    # train offsets on the rounded lattice so the checkpoint deploys on
    # the 1-read nearest path) — cfg wins over the env default, mirroring
    # test_cfg.dcn_sampling on the inference side; recorded per save in
    # the checkpoint meta sidecar (train/checkpoint.train_meta)
    train_sampling = cfg.get("train_cfg", {}).get("dcn_sampling")
    if train_sampling:
        from ..ops.flat_deform import set_sampling
        set_sampling(str(train_sampling))

    head = _head_cfg(cfg)
    task = {"bbox": "bbox", "segm": "segm",
            "pose_bbox": "pose", "pose_kbox": "pose"}[head.get("task", "bbox")]
    if cfg.model.type in ("MaskRCNN", "MaskScoringRCNN",
                          "HybridTaskCascade", "HTC", "PointRend",
                          "DenseRepPointsDetector",
                          "DenseRepPointsV2Detector"):
        task = "segm"   # the pipeline must carry gt_polygons for mask loss
    data_cfg = cfg.data
    raw_scale = data_cfg.train.get("img_scale", (1333, 800))
    img_scale = (tuple(tuple(s) for s in raw_scale)
                 if isinstance(raw_scale[0], (list, tuple)) else
                 tuple(raw_scale))
    from ..data.extra import build_dataset
    ds = build_dataset(data_cfg.train.get("type", "CocoDataset"), DatasetConfig(
        ann_file=data_cfg.train.ann_file,
        img_prefix=data_cfg.train.img_prefix,
        task=task, num_vectors=_head_num_vectors(cfg, head),
        img_scale=img_scale,
        multiscale_mode=data_cfg.train.get("multiscale_mode", "range"),
        ratio_range=data_cfg.train.get("ratio_range"),
        augmentations=tuple(data_cfg.train.get("augmentations", ()) or ()),
        keep_ratio=data_cfg.train.get("keep_ratio", True),
        flip_ratio=data_cfg.train.get("flip_ratio", 0.5),
        max_instances=cfg.get("max_instances", 100)))
    n_dev = jax.device_count()
    per_dev = data_cfg.get("samples_per_gpu", 2)
    batch_size = per_dev * n_dev
    # per-device batch >= 4 at the default 256M-element patch budget
    # overflows HBM in the train backward (17.95G vs 15.75G measured at
    # B4 @800x1344 R50-DCN — the compile "HTTP 500" was this OOM);
    # 48M chunks fit and measured FASTER than 96M (1226 vs 1289 ms)
    if per_dev >= 4 and cfg.get("chunk_budget_elems") is None:
        from ..ops.flat_deform import set_chunk_budget
        set_chunk_budget(48 * 1024 * 1024)
    elif cfg.get("chunk_budget_elems") is not None:
        from ..ops.flat_deform import set_chunk_budget
        set_chunk_budget(int(cfg.get("chunk_budget_elems")))
    explicit_canvas = cfg.get("canvas_shape")
    loader = DataLoader(ds, batch_size,
                        tuple(explicit_canvas) if explicit_canvas else None,
                        num_hosts=jax.process_count(),
                        host_id=jax.process_index())
    canvas = loader.canvas_hw
    steps_per_epoch = (max_iters_per_epoch
                       or loader.steps_per_epoch())

    model, _ = build_detector(cfg.model.to_dict()
                              if hasattr(cfg.model, "to_dict")
                              else dict(cfg.model))
    dummy = jnp.zeros((1, *canvas, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(cfg.get("seed", 0)), dummy)
    pretrained = cfg.model.get("pretrained")
    if pretrained and os.path.exists(str(pretrained)):
        variables = load_pretrained_backbone(variables, str(pretrained))

    depth = cfg.model.backbone.get("depth", 50)
    frozen = cfg.model.backbone.get("frozen_stages", -1)
    deep_stem = (cfg.model.backbone.get("deep_stem")
                 or cfg.model.backbone.get("type") == "Res2Net")
    mask = make_frozen_mask(variables["params"],
                            frozen_param_paths(depth, frozen, deep_stem))
    epochs = total_epochs or cfg.get("total_epochs", 12)
    from .optim import build_lr_schedule
    lr_cfg = cfg.get("lr_config", {}) or {}
    base_lr = cfg.optimizer.get("lr", 0.01)
    lr_sched = build_lr_schedule(dict(lr_cfg), base_lr, steps_per_epoch,
                                 epochs)
    tx, schedule = build_optimizer(
        base_lr, steps_per_epoch, lr_cfg.get("step", [8, 11]),
        momentum=cfg.optimizer.get("momentum", 0.9),
        weight_decay=cfg.optimizer.get("weight_decay", 1e-4),
        clip_norm=cfg.get("optimizer_config", {}).get(
            "grad_clip", {}).get("max_norm", 35.0),
        trainable_mask=mask, schedule=lr_sched)
    state = create_train_state(variables, tx)

    start_epoch = 0
    if resume_from:
        state = restore_checkpoint(resume_from, state)
        start_epoch = int(state.step) // steps_per_epoch
        print(f"resumed from {resume_from} at epoch {start_epoch}")
        # a resumed run that silently switches the DCN sampling mode would
        # train offsets against the wrong interpolation (the sidecar is
        # what makes nearest_ste checkpoints deployable skew-free)
        from .checkpoint import load_deploy_meta
        meta = load_deploy_meta(resume_from)
        if meta:
            from ..ops.flat_deform import current_sampling_spec
            saved = meta.get("dcn_sampling_train")
            if saved is not None and saved != current_sampling_spec():
                print(f"WARNING: resuming a checkpoint trained with DCN "
                      f"sampling '{saved}' but the current run uses "
                      f"'{current_sampling_spec()}' — set "
                      f"LSNET_DCN_SAMPLING={saved} unless intentional")

    mesh = make_mesh(n_data=n_dev)
    # one jitted step per canvas orientation (two static shapes total —
    # the TPU analogue of the reference aspect-ratio GroupSampler)
    step_fns: Dict[Tuple[int, int], Any] = {}

    dyn_sched = None
    if (cfg.model.get("roi_head", {}).get("type") == "DynamicRoIHead"):
        from ..core.two_stage import DynamicRCNNSchedule
        dyn_cfg = (cfg.get("train_cfg", {}).get("rcnn", {})
                   .get("dynamic_rcnn", {}))
        dyn_sched = DynamicRCNNSchedule(
            initial_iou=dyn_cfg.get("initial_iou", 0.4),
            initial_beta=dyn_cfg.get("initial_beta", 1.0),
            update_iter_interval=dyn_cfg.get("update_iter_interval", 100))

    def step_for(canvas_hw: Tuple[int, int]):
        if canvas_hw not in step_fns:
            if _is_two_stage(cfg):
                from ..core.two_stage import (cascade_rcnn_loss,
                                              mask_rcnn_loss,
                                              mask_scoring_rcnn_loss,
                                              two_stage_loss)
                tscfg = two_stage_cfg_from(cfg, canvas_hw)
                from ..core.two_stage import (dynamic_rcnn_loss,
                                              grid_rcnn_loss, htc_loss,
                                              point_rend_loss)
                ts_loss = {"MaskRCNN": mask_rcnn_loss,
                           "CascadeRCNN": cascade_rcnn_loss,
                           "MaskScoringRCNN": mask_scoring_rcnn_loss,
                           "GridRCNN": grid_rcnn_loss,
                           "HybridTaskCascade": htc_loss,
                           "HTC": htc_loss,
                           "PointRend": point_rend_loss}.get(
                               cfg.model.type, two_stage_loss)
                if dyn_sched is not None:
                    # Dynamic R-CNN: thresholds ride the batch as traced
                    # scalars; the schedule updates them from the returned
                    # statistics (reference dynamic_roi_head.py)
                    ts_loss = lambda model, variables, batch, tscfg: \
                        dynamic_rcnn_loss(model, variables,
                                          {k: v for k, v in batch.items()
                                           if not k.startswith("dyn_")},
                                          tscfg, batch["dyn_iou_thr"],
                                          batch["dyn_beta"])
                step_fns[canvas_hw] = make_train_step(
                    model, tx, None, mesh=mesh,
                    full_loss_fn=lambda variables, batch: ts_loss(
                        model, variables, batch, tscfg))
            else:
                loss_fn = make_loss_for(cfg, canvas_hw)
                step_fns[canvas_hw] = make_train_step(
                    model, tx, None, mesh=mesh,
                    loss_fn_impl=lambda outs, batch, _cfg: loss_fn(
                        outs, batch))
        return step_fns[canvas_hw]

    # hook-driven epoch loop (reference BaseRunner.call_hook machinery,
    # lsnet_tpu.train.hooks): logger/checkpoint/eval + cfg custom_hooks
    from .hooks import RunnerContext, build_hooks, call_hooks
    hooks = build_hooks(cfg, logger, eval_interval)
    ctx = RunnerContext(cfg, work_dir, steps_per_epoch, epochs)
    ctx.state = state
    if "val" in cfg.data:
        ctx.eval_fn = lambda: evaluate_detector(
            cfg, model, ctx.state, canvas,
            max_images=cfg.get("eval_max_images"))

    with mesh:
        call_hooks(hooks, "before_train", ctx)
        for epoch in range(start_epoch, epochs):
            ctx.epoch = epoch
            call_hooks(hooks, "before_epoch", ctx)
            for it, batch in enumerate(loader.epoch(epoch)):
                if max_iters_per_epoch and it >= max_iters_per_epoch:
                    break
                batch_canvas = tuple(batch["image"].shape[1:3])
                sharded = shard_batch_pytree(batch, mesh)
                if dyn_sched is not None:
                    sharded["dyn_iou_thr"] = jnp.float32(dyn_sched.iou_thr)
                    sharded["dyn_beta"] = jnp.float32(dyn_sched.beta)
                state, metrics = step_for(batch_canvas)(state, sharded)
                if dyn_sched is not None:
                    dyn_sched.update(float(metrics.pop("stat_iou")),
                                     float(metrics.pop("stat_beta")))
                ctx.state = state
                ctx.iter = it
                ctx.global_step = int(state.step)
                ctx.lr = float(schedule(int(state.step)))
                ctx.metrics = {k: float(v) for k, v in metrics.items()}
                call_hooks(hooks, "after_iter", ctx)
                if ctx.should_stop:
                    break
            call_hooks(hooks, "after_epoch", ctx)
            if ctx.should_stop:
                break
        call_hooks(hooks, "after_train", ctx)
    return {"state": ctx.state, "work_dir": work_dir}


def evaluate_detector(cfg, model, state, canvas, *, batch_size: int = 8,
                      max_images: Optional[int] = None) -> Dict[str, float]:
    """Reference EvalHook equivalent: run val set, COCO metrics.

    Batches are grouped by image orientation so each group pads onto one
    static canvas (``canvas`` is the landscape one; portrait is its
    transpose)."""
    head = _head_cfg(cfg)
    task = {"bbox": "bbox", "segm": "segm",
            "pose_bbox": "pose", "pose_kbox": "pose"}[head.get("task", "bbox")]
    corrupt_spec = cfg.data.val.get("corruption")  # robustness benchmark
    ds = CocoDataset(DatasetConfig(
        ann_file=cfg.data.val.ann_file, img_prefix=cfg.data.val.img_prefix,
        task=task, num_vectors=_head_num_vectors(cfg, head),
        filter_empty=False,
        img_scale=tuple(cfg.data.val.get("img_scale", (1333, 800))),
        corruption=None if corrupt_spec is None else
        (corrupt_spec[0], int(corrupt_spec[1]))),
        test_mode=True)
    fwd = make_eval_forward(model)
    tcfgs = {}
    head_type = _head_cfg(cfg).get(
        "type", "TwoStage" if _is_two_stage(cfg) else "LSHead")

    def decode_for(canvas_hw):
        if canvas_hw not in tcfgs:
            tcfg = test_cfg_from(cfg, canvas_hw)
            if head_type in DENSE_HEAD_KINDS:
                from ..core.dense_decode import dense_decode
                dcfg = dense_cfg_from(cfg, canvas_hw)
                fn = jax.jit(lambda outs, shapes, sf: dense_decode(
                    outs, shapes, sf, tcfg, dcfg))
            elif head_type == "RepPointsHead":
                from ..core.reppoints import reppoints_decode
                rcfg = reppoints_cfg_from(cfg, canvas_hw)
                fn = jax.jit(lambda outs, shapes, sf: reppoints_decode(
                    outs, shapes, sf, tcfg, rcfg))
            elif head_type == "RepPointsV2Head":
                from ..core.reppoints import reppoints_v2_decode
                rcfg = reppoints_cfg_from(cfg, canvas_hw)
                fn = jax.jit(lambda outs, shapes, sf: reppoints_v2_decode(
                    outs, shapes, sf, tcfg, rcfg))
            elif head_type in ("DenseRepPointsHead",
                               "DenseRepPointsV2Head"):
                from ..core.decode import Detections
                from ..core.dense_reppoints import dense_reppoints_decode
                dcfg = dense_reppoints_cfg_from(cfg, canvas_hw)

                def _drp(outs, shapes, sf, tcfg=tcfg, dcfg=dcfg):
                    d = dense_reppoints_decode(outs, shapes, sf, tcfg, dcfg)
                    lms = jnp.zeros((*d.bboxes.shape[:2], 8),
                                    d.bboxes.dtype)
                    return Detections(d.bboxes, d.scores, d.labels, lms,
                                      d.valid)
                fn = jax.jit(_drp)
            elif head_type == "LSCPVHead":
                from ..core.cpv import lscpv_decode
                fn = jax.jit(lambda outs, shapes, sf: lscpv_decode(
                    outs, shapes, sf, tcfg))
            else:
                fn = jax.jit(lambda outs, shapes, sf: lsnet_decode(
                    outs, shapes, sf, tcfg))
            tcfgs[canvas_hw] = fn
        return tcfgs[canvas_hw]

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    n = len(ds) if max_images is None else min(max_images, len(ds))
    dts = []
    segm_dts = []   # Mask R-CNN: mask branch results evaluated as segm
    img_sizes = {info["id"]: (info["height"], info["width"])
                 for info in ds.coco.img_infos}
    label_to_cat = {v: k for k, v in ds.coco.cat_to_label.items()}
    land, port = tuple(canvas), (canvas[1], canvas[0])
    groups = {land: [], port: []}
    for i in range(n):
        info = ds.img_infos[i]
        groups[port if info["height"] > info["width"] else land].append(i)
    for cv, idx_list in groups.items():
        for s0 in range(0, len(idx_list), batch_size):
            idxs = idx_list[s0:s0 + batch_size]
            samples = [ds.get_sample(i) for i in idxs]
            batch = collate_batch(samples, cv, task=task,
                                  num_vectors=_head_num_vectors(cfg, head))
            if _is_two_stage(cfg):
                from ..core.two_stage import (cascade_rcnn_decode,
                                              mask_rcnn_decode,
                                              two_stage_decode)
                tscfg = two_stage_cfg_from(cfg, cv)
                args = (model, variables, jnp.asarray(batch["image"]),
                        jnp.asarray(batch["img_shape"]),
                        jnp.asarray(batch["scale_factor"]),
                        tscfg, test_cfg_from(cfg, cv))
                if cfg.model.type in ("MaskRCNN", "MaskScoringRCNN"):
                    from ..core.two_stage import mask_scoring_rcnn_decode
                    dec = (mask_scoring_rcnn_decode
                           if cfg.model.type == "MaskScoringRCNN"
                           else mask_rcnn_decode)
                    det, masks = dec(*args)
                    from ..evalkit.evaluator import mask_detections_to_coco
                    segm_dts += mask_detections_to_coco(
                        jax.tree.map(np.asarray, det), np.asarray(masks),
                        batch["img_id"], label_to_cat, img_sizes)
                elif cfg.model.type == "CascadeRCNN":
                    det = cascade_rcnn_decode(*args)
                elif cfg.model.type == "GridRCNN":
                    from ..core.two_stage import grid_rcnn_decode
                    det = grid_rcnn_decode(*args)
                elif cfg.model.type == "PointRend":
                    from ..core.two_stage import point_rend_decode
                    from ..evalkit.evaluator import mask_detections_to_coco
                    det, masks = point_rend_decode(*args)
                    segm_dts += mask_detections_to_coco(
                        jax.tree.map(np.asarray, det), np.asarray(masks),
                        batch["img_id"], label_to_cat, img_sizes)
                elif cfg.model.type in ("HybridTaskCascade", "HTC"):
                    from ..core.two_stage import htc_decode
                    from ..evalkit.evaluator import mask_detections_to_coco
                    det, masks = htc_decode(*args)
                    segm_dts += mask_detections_to_coco(
                        jax.tree.map(np.asarray, det), np.asarray(masks),
                        batch["img_id"], label_to_cat, img_sizes)
                else:
                    det = two_stage_decode(*args)
            else:
                outs = fwd(variables, jnp.asarray(batch["image"]))
                det = decode_for(cv)(outs, jnp.asarray(batch["img_shape"]),
                                     jnp.asarray(batch["scale_factor"]))
            dts += detections_to_coco(
                jax.tree.map(np.asarray, det), batch["img_id"], label_to_cat,
                task=head.get("task", "bbox"), img_sizes=img_sizes)
    eval_ids = {int(i) for i in
                [info["id"] for info in ds.img_infos[:n]]}
    gts = coco_gt_from_annotations(ds.coco, task=head.get("task", "bbox"))
    gts = [g for g in gts if g["image_id"] in eval_ids]
    dts = [d for d in dts if d["image_id"] in eval_ids]
    iou_type = {"bbox": "bbox", "segm": "segm", "pose_bbox": "keypoints",
                "pose_kbox": "keypoints"}[head.get("task", "bbox")]
    metrics = evaluate_coco(gts, dts, img_sizes, iou_type=iou_type)
    if segm_dts:
        segm_gts = coco_gt_from_annotations(ds.coco, task="segm")
        segm_gts = [g for g in segm_gts if g["image_id"] in eval_ids]
        segm_dts = [d for d in segm_dts if d["image_id"] in eval_ids]
        metrics.update({f"segm_{k}": v for k, v in evaluate_coco(
            segm_gts, segm_dts, img_sizes, iou_type="segm").items()})
    return metrics
