# RepPoints v2 (moment) R-50 1x — head rebuilt from the reference
# code/mmdet/models/dense_heads/reppoints_v2_head.py (the CPV template)
_base_ = './reppoints_moment_r50_fpn_1x_coco.py'
model = dict(
    bbox_head=dict(
        _delete_=True,
        type='RepPointsV2Head', num_classes=80, in_channels=256,
        feat_channels=256, point_feat_channels=256, stacked_convs=3,
        shared_stacked_convs=1, first_kernel_size=3, kernel_size=1,
        corner_dim=64, num_points=9, gradient_mul=0.1,
        point_strides=[8, 16, 32, 64, 128], point_base_scale=4,
        norm_cfg=dict(type='GN', num_groups=32),
        transform_method='moment',
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox_init=dict(type='SmoothL1Loss', beta=0.1111111111111111,
                            loss_weight=0.5),
        loss_bbox_refine=dict(type='SmoothL1Loss', beta=0.1111111111111111,
                              loss_weight=1.0),
        loss_heatmap=dict(type='GaussianFocalLoss', alpha=2.0, gamma=4.0,
                          loss_weight=0.25),
        loss_offset=dict(type='SmoothL1Loss', beta=0.1111111111111111,
                         loss_weight=1.0),
        loss_sem=dict(type='SEPFocalLoss', gamma=2.0, alpha=0.25,
                      loss_weight=0.1)))
train_cfg = dict(
    heatmap=dict(assigner=dict(type='PointHMAssigner', gaussian_bump=True,
                               gaussian_iou=0.7)))
