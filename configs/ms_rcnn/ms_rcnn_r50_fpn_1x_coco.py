# Mask Scoring R-CNN (head rebuilt from reference
# roi_heads/mask_heads/maskiou_head.py pattern)
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(type='MaskScoringRCNN')
