# GA-RPN R-50 FPN 1x (reference: mmdet-v2 configs/guided_anchoring/
# ga_rpn_r50_caffe_fpn_1x_coco.py; head
# code/mmdet/models/dense_heads/ga_rpn_head.py) — standalone guided-anchor
# region-proposal trainer.
_base_ = [
    '../_base_/datasets/coco_lsvr.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='RPN',
    pretrained='checkpoints/pretrained/resnet50.pth',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN'), norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, num_outs=5),
    rpn_head=dict(
        type='GARPNHead', in_channels=256, feat_channels=256,
        approx_anchor_generator=dict(type='AnchorGenerator',
                                     octave_base_scale=8,
                                     scales_per_octave=3,
                                     ratios=[0.5, 1.0, 2.0],
                                     strides=[4, 8, 16, 32, 64]),
        square_anchor_generator=dict(type='AnchorGenerator',
                                     ratios=[1.0], scales=[8],
                                     strides=[4, 8, 16, 32, 64]),
        loc_filter_thr=0.01,
        loss_loc=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_shape=dict(type='BoundedIoULoss', beta=0.2, loss_weight=1.0),
        loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.0)))
train_cfg = dict(
    ga_assigner=dict(type='ApproxMaxIoUAssigner', pos_iou_thr=0.7,
                     neg_iou_thr=0.3, min_pos_iou=0.3),
    assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                  neg_iou_thr=0.3, min_pos_iou=0.3),
    center_ratio=0.2, ignore_ratio=0.5, allowed_border=-1, pos_weight=-1)
test_cfg = dict(nms_pre=2000, max_per_img=1000, score_thr=0.0,
                nms=dict(type='nms', iou_thr=0.7), min_bbox_size=0)
optimizer = dict(lr=0.01)
