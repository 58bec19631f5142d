# keypoint-box assignment variant (finetuned from pose_bbox per reference)
_base_ = './lsnet_pose_bbox_x101_fpn_dconv_c3-c5_mstrain_2x_coco.py'
model = dict(bbox_head=dict(task='pose_kbox',
                            loss_bbox_init=None, loss_bbox_refine=None))
lr_config = dict(step=[12, 20])
total_epochs = 20
