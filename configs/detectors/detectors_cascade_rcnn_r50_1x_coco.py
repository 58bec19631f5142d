# DetectoRS (Cascade R-CNN flavour) R-50 1x (reference: code/configs/
# detectors/detectors_cascade_rcnn_r50_1x_coco.py — SAC backbone + RFP neck
# wrapped around the cascade detector)
_base_ = '../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py'
model = dict(
    backbone=dict(
        _delete_=True,
        type='DetectoRS_ResNet', depth=50, num_stages=4,
        out_indices=(0, 1, 2, 3), frozen_stages=1,
        norm_cfg=dict(type='BN'), norm_eval=True, style='pytorch',
        conv_cfg=dict(type='ConvAWS'),
        sac=dict(type='SAC', use_deform=True),
        stage_with_sac=(False, True, True, True)),
    neck=dict(
        _delete_=True,
        type='RFP', in_channels=[256, 512, 1024, 2048], out_channels=256,
        num_outs=5, rfp_steps=2, aspp_out_channels=64, aspp_dilations=(1, 3, 6, 1),
        rfp_backbone=dict(type='DetectoRS_ResNet', depth=50, num_stages=4,
                          out_indices=(0, 1, 2, 3), frozen_stages=1,
                          norm_cfg=dict(type='BN'), norm_eval=True,
                          style='pytorch', conv_cfg=dict(type='ConvAWS'),
                          sac=dict(type='SAC', use_deform=True),
                          stage_with_sac=(False, True, True, True))))
