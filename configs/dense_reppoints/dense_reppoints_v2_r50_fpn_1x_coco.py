# DenseRepPoints v2 R-50 FPN 1x (reference: code/mmdet/models/dense_heads/
# dense_reppoints_v2_head.py — adds semantic + contour verification)
_base_ = 'dense_reppoints_r50_fpn_1x_coco.py'
model = dict(
    type='DenseRepPointsV2Detector',
    bbox_head=dict(
        type='DenseRepPointsV2Head',
        loss_cont=dict(type='GaussianFocalLoss', loss_weight=1.0),
        loss_sem=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=0.1)))
