# Dynamic R-CNN R-50 FPN 1x (reference: mmdet-v2
# configs/dynamic_rcnn/dynamic_rcnn_r50_fpn_1x.py; RoI head
# code/mmdet/models/roi_heads/dynamic_roi_head.py — the positive-IoU
# threshold and SmoothL1 beta adapt to training statistics)
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    roi_head=dict(type='DynamicRoIHead'))
train_cfg = dict(
    rcnn=dict(
        dynamic_rcnn=dict(iou_topk=75, beta_topk=10,
                          update_iter_interval=100,
                          initial_iou=0.4, initial_beta=1.0)))
