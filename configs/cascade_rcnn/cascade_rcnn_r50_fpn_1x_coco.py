# Cascade R-CNN R-50 FPN 1x (reference: code/configs/cascade_rcnn/
# cascade_rcnn_r50_fpn_1x_coco.py — 3-stage cascade, IoU 0.5/0.6/0.7)
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'

_stage_stds = ([0.1, 0.1, 0.2, 0.2], [0.05, 0.05, 0.1, 0.1],
               [0.033, 0.033, 0.067, 0.067])
model = dict(
    type='CascadeRCNN',
    roi_head=dict(
        type='CascadeRoIHead',
        num_stages=3,
        stage_loss_weights=[1, 0.5, 0.25],
        bbox_head=[
            dict(type='Shared2FCBBoxHead', in_channels=256,
                 fc_out_channels=1024, roi_feat_size=7, num_classes=80,
                 bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                 target_means=[0.0, 0.0, 0.0, 0.0],
                                 target_stds=list(_stage_stds[i])),
                 reg_class_agnostic=True,
                 loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                               loss_weight=1.0),
                 loss_bbox=dict(type='SmoothL1Loss', beta=1.0,
                                loss_weight=1.0))
            for i in range(3)
        ]))
train_cfg = dict(
    rcnn=[
        dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=thr,
                           neg_iou_thr=thr, min_pos_iou=thr),
             sampler=dict(type='RandomSampler', num=512, pos_fraction=0.25,
                          add_gt_as_proposals=True),
             pos_weight=-1)
        for thr in (0.5, 0.6, 0.7)
    ])
