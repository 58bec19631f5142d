_base_ = './lsnet_segm_x101_fpn_mstrain_30e_coco.py'
model = dict(backbone=dict(dcn=dict(type='DCNv2', deformable_groups=1),
                           stage_with_dcn=(False, True, True, True),
                           with_cp=True))
