# Hybrid Task Cascade (rebuilt from reference detectors/htc.py +
# roi_heads/htc_roi_head.py; semantic branch trained on box-derived class
# maps — COCO-stuff panoptic maps are not available offline)
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(type='HybridTaskCascade')
