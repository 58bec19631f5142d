# SSD300 (reference configs/_base_/models/ssd300.py — the model schema ships
# in the reference _base_ tree; head rebuilt from mmdet/models/dense_heads/
# ssd_head.py)
_base_ = [
    '../_base_/datasets/coco_lsvr.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
input_size = 300
model = dict(
    type='SSD',
    pretrained=None,
    backbone=dict(type='SSDVGG', input_size=input_size, depth=16,
                  l2_norm_scale=20),
    neck=None,
    bbox_head=dict(
        type='SSDHead',
        in_channels=(512, 1024, 512, 256, 256, 256),
        num_classes=80,
        anchor_generator=dict(
            type='SSDAnchorGenerator', scale_major=False,
            input_size=input_size, basesize_ratio_range=(0.15, 0.9),
            strides=[8, 16, 32, 64, 100, 300],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[.0, .0, .0, .0],
                        target_stds=[0.1, 0.1, 0.2, 0.2])))
train_cfg = dict(
    assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.5,
                  min_pos_iou=0., ignore_iof_thr=-1,
                  gt_max_assign_all=False),
    smoothl1_beta=1., allowed_border=-1, pos_weight=-1, neg_pos_ratio=3,
    debug=False)
test_cfg = dict(nms=dict(type='nms', iou_thr=0.45), min_bbox_size=0,
                score_thr=0.02, max_per_img=200)
# the real SSD training recipe (reference configs/ssd/ssd300_coco.py
# train_pipeline): photometric distortion -> mean-fill Expand ->
# MinIoURandomCrop -> exact 300x300 resize
data = dict(samples_per_gpu=8,
            train=dict(img_scale=(300, 300), keep_ratio=False,
                       augmentations=[
                           dict(type='PhotoMetricDistortion',
                                brightness_delta=32,
                                contrast_range=(0.5, 1.5),
                                saturation_range=(0.5, 1.5), hue_delta=18),
                           dict(type='Expand',
                                mean=[123.675, 116.28, 103.53],
                                ratio_range=(1, 4)),
                           dict(type='MinIoURandomCrop',
                                min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                                min_crop_size=0.3)]),
            val=dict(img_scale=(300, 300)),
            test=dict(img_scale=(300, 300)))
canvas_shape = (300, 300)
optimizer = dict(lr=2e-3)
