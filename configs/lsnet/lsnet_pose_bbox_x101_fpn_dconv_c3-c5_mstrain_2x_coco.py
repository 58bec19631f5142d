_base_ = './lsnet_pose_bbox_r50_fpn_mstrain_2x_coco.py'
model = dict(
    pretrained='checkpoints/pretrained/resnext101_64x4d.pth',
    backbone=dict(type='ResNeXt', depth=101, groups=64, base_width=4,
                  num_stages=4, out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN'), norm_eval=True, style='pytorch',
                  dcn=dict(type='DCNv2', deformable_groups=1),
                  stage_with_dcn=(False, True, True, True), with_cp=True,
                  _delete_=True))
