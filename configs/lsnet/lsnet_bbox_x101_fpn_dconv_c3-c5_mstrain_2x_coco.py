_base_ = './lsnet_bbox_x101_fpn_mstrain_2x_coco.py'
model = dict(backbone=dict(dcn=dict(type='DCNv2', deformable_groups=1),
                           stage_with_dcn=(False, True, True, True),
                           with_cp=True))
