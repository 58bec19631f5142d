# PISA SSD300 (reference: mmdet-v2 configs/pisa/pisa_ssd300_coco.py —
# ISR-P importance reweighting + CARL on the SSD multibox loss,
# code/mmdet/models/dense_heads/pisa_ssd_head.py)
_base_ = '../ssd/ssd300_coco.py'
model = dict(bbox_head=dict(type='PISASSDHead'))
train_cfg = dict(
    isr=dict(k=2.0, bias=0.25),
    carl=dict(k=1.0, bias=0.25))
