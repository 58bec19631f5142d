# Grid R-CNN Plus (head rebuilt from reference
# roi_heads/mask_heads/grid_head.py)
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    type='GridRCNN',
    roi_head=dict(grid_head=dict(type='GridHead', grid_points=9,
                                 num_convs=8, point_feat_channels=64)))
