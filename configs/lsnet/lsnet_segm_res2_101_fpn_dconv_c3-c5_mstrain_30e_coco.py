_base_ = './lsnet_segm_x101_fpn_dconv_c3-c5_mstrain_30e_coco.py'
model = dict(
    pretrained='checkpoints/pretrained/res2net101.pth',
    backbone=dict(type='Res2Net', depth=101, scales=4, base_width=26,
                  num_stages=4, out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN'), norm_eval=True, style='pytorch',
                  dcn=dict(type='DCNv2', deformable_groups=1),
                  stage_with_dcn=(False, True, True, True), with_cp=True,
                  _delete_=True))
