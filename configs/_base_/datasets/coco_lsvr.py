# COCO detection with LSVR extreme-point targets. Extreme points are
# derived on the fly from segmentation polygons (lsnet_tpu.data.lsvr),
# replacing the reference's offline instances_lsvr_*.json generation.
dataset_type = 'CocoDataset'
data_root = '/data/coco/'
img_norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
data = dict(
    samples_per_gpu=2,
    train=dict(type=dataset_type,
               ann_file=data_root + 'annotations/instances_train2017.json',
               img_prefix=data_root + 'images/train2017/',
               img_scale=(1333, 800), flip_ratio=0.5),
    val=dict(type=dataset_type,
             ann_file=data_root + 'annotations/instances_val2017.json',
             img_prefix=data_root + 'images/val2017/',
             img_scale=(1333, 800)),
    test=dict(type=dataset_type,
              ann_file=data_root + 'annotations/instances_val2017.json',
              img_prefix=data_root + 'images/val2017/',
              img_scale=(1333, 800)))
evaluation = dict(interval=1, metric='bbox')
