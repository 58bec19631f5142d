# FSAF R-50 (head rebuilt from reference mmdet/models/dense_heads/
# fsaf_head.py; standard mmdet-v2 recipe values)
_base_ = [
    '../_base_/datasets/coco_lsvr.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='FSAF',
    pretrained='checkpoints/pretrained/resnet50.pth',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN'), norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, add_extra_convs='on_input',
              num_outs=5),
    bbox_head=dict(
        type='FSAFHead', num_classes=80, in_channels=256, feat_channels=256,
        stacked_convs=4, strides=[8, 16, 32, 64, 128],
        bbox_coder=dict(type='TBLRBBoxCoder', normalizer=4.0),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='IoULoss', eps=1e-6, loss_weight=1.0)))
train_cfg = dict(
    assigner=dict(type='CenterRegionAssigner', pos_scale=0.2, neg_scale=0.2,
                  min_pos_iof=0.01),
    allowed_border=-1, pos_weight=-1, debug=False)
test_cfg = dict(nms_pre=1000, min_bbox_size=0, score_thr=0.05,
                nms=dict(type='nms', iou_thr=0.5), max_per_img=100)
optimizer = dict(lr=0.01)
