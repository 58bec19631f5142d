_base_ = './lsnet_pose_bbox_r50_fpn_1x_coco.py'
lr_config = dict(step=[16, 22])
total_epochs = 24
data = dict(train=dict(img_scale=[(1333, 480), (1333, 960)],
                       multiscale_mode='range'))
