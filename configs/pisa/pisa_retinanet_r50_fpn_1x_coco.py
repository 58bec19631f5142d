# PISA RetinaNet R-50 FPN 1x (reference: code/configs/pisa/
# pisa_retinanet_r50_fpn_1x_coco.py — prime-sample attention: IoU-HLR
# importance reweighting (ISR-P) + classification-aware regression (CARL))
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    bbox_head=dict(
        _delete_=True,
        type='PISARetinaHead', num_classes=80, in_channels=256,
        feat_channels=256, stacked_convs=4,
        anchor_generator=dict(type='AnchorGenerator', octave_base_scale=4,
                              scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                              strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0.0, 0.0, 0.0, 0.0],
                        target_stds=[1.0, 1.0, 1.0, 1.0]),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=1.0)))
train_cfg = dict(
    isr=dict(k=2.0, bias=0.0),
    carl=dict(k=1.0, bias=0.2))
optimizer = dict(lr=0.01)
