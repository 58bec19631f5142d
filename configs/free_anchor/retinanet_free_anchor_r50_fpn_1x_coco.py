# FreeAnchor (head rebuilt from reference mmdet/models/dense_heads/
# free_anchor_retina_head.py; standard mmdet-v2 recipe)
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    bbox_head=dict(
        _delete_=True,
        type='FreeAnchorRetinaHead', num_classes=80, in_channels=256,
        feat_channels=256, stacked_convs=4,
        norm_cfg=dict(type='GN', num_groups=32),
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=4,
                              scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0.0, 0.0, 0.0, 0.0],
                        target_stds=[1.0, 1.0, 1.0, 1.0]),
        pre_anchor_topk=50, bbox_thr=0.6, gamma=2.0, alpha=0.5,
        loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=0.75)))
optimizer = dict(lr=0.01)
