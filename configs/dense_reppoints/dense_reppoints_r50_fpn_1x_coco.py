# DenseRepPoints R-50 FPN 1x (reference: code/mmdet/models/dense_heads/
# dense_reppoints_head.py + detectors/dense_reppoints_detector.py —
# 729-point dense point-set instance segmentation)
_base_ = [
    '../_base_/datasets/coco_lsvr.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='DenseRepPointsDetector',
    pretrained='checkpoints/pretrained/resnet50.pth',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN'), norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, add_extra_convs='on_input',
              num_outs=5),
    bbox_head=dict(
        type='DenseRepPointsHead', num_classes=80, in_channels=256,
        feat_channels=256, point_feat_channels=256,
        stacked_convs=3, stacked_mask_convs=3,
        num_points=729, num_group=9, num_score_group=121,
        gradient_mul=0.1, point_base_scale=4,
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox_init=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                            loss_weight=0.5),
        loss_bbox_refine=dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                              loss_weight=1.0),
        loss_pts_init=dict(type='ChamferLoss2D', loss_weight=0.5),
        loss_pts_refine=dict(type='ChamferLoss2D', loss_weight=1.0),
        loss_mask_score_init=dict(type='CrossEntropyLoss',
                                  use_sigmoid=True, loss_weight=1.0)))
train_cfg = dict(
    init=dict(assigner=dict(type='PointAssigner', scale=4, pos_num=1),
              pos_weight=-1, mask_size=56, dist_sample_thr=2),
    refine=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                              neg_iou_thr=0.4, min_pos_iou=0,
                              ignore_iof_thr=-1),
                pos_weight=-1, mask_size=56, dist_sample_thr=2))
test_cfg = dict(nms_pre=1000, min_bbox_size=0, score_thr=0.05,
                nms=dict(type='nms', iou_thr=0.6), max_per_img=100)
optimizer = dict(lr=0.01)
