# PointRend (rebuilt from reference detectors/point_rend.py +
# roi_heads/point_rend_roi_head.py; deterministic uncertainty-top-k point
# selection — static shapes on TPU)
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(type='PointRend')
