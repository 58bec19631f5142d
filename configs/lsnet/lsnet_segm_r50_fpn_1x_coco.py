# LSNet instance segmentation (36-point contour), ResNet-50, 1x
# (reference: lsnet_segm_r50_fpn_1x_coco.py)
_base_ = './lsnet_bbox_r50_fpn_1x_coco.py'
model = dict(
    bbox_head=dict(
        task='segm', num_vectors=36,
        loss_bbox_init=None, loss_bbox_refine=None,
        loss_segm_init=dict(type='CrossIOULoss', loss_type='polygon',
                            loss_weight=1.0, stride=9),
        loss_segm_refine=dict(type='CrossIOULoss', loss_type='polygon',
                              loss_weight=2.0, stride=9)))
evaluation = dict(interval=1, metric=['bbox', 'segm'])
