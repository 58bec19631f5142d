# GA-RetinaNet R-50 FPN 1x (reference: code/configs/guided_anchoring/
# ga_retinanet_r50_fpn_1x_coco.py — guided anchoring: loc/shape branches
# predict anchors, dual feature adaption DCN refines features)
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    bbox_head=dict(
        _delete_=True,
        type='GARetinaHead', num_classes=80, in_channels=256,
        feat_channels=256, stacked_convs=4,
        approx_anchor_generator=dict(type='AnchorGenerator',
                                     octave_base_scale=4,
                                     scales_per_octave=3,
                                     ratios=[0.5, 1.0, 2.0],
                                     strides=[8, 16, 32, 64, 128]),
        square_anchor_generator=dict(type='AnchorGenerator',
                                     ratios=[1.0], scales=[4],
                                     strides=[8, 16, 32, 64, 128]),
        anchor_coder=dict(type='DeltaXYWHBBoxCoder',
                          target_means=[0.0, 0.0, 0.0, 0.0],
                          target_stds=[1.0, 1.0, 1.0, 1.0]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0.0, 0.0, 0.0, 0.0],
                        target_stds=[1.0, 1.0, 1.0, 1.0]),
        loc_filter_thr=0.01,
        loss_loc=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_shape=dict(type='BoundedIoULoss', beta=0.2, loss_weight=1.0),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.04, loss_weight=1.0)))
optimizer = dict(lr=0.01)
