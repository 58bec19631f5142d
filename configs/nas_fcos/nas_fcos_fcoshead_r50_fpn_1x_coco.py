# NAS-FCOS: the searched NASFCOS-FPN neck under an FCOS head (reference
# necks/nasfcos_fpn.py; detector composition per the NAS-FCOS paper)
_base_ = '../fcos/fcos_r50_fpn_1x_coco.py'
model = dict(
    type='NASFCOS',
    neck=dict(
        _delete_=True,
        type='NASFCOS_FPN', in_channels=[256, 512, 1024, 2048],
        out_channels=256, num_outs=5, start_level=1,
        norm_cfg=dict(type='GN', num_groups=32)))
