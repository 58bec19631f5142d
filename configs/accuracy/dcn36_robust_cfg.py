# R50-DCN shapes model (mirrors tools/accuracy_run.py --task bbox --dcn)
# for the robustness benchmark demo on the round-5 frontier checkpoint.
model = dict(
    type="LSDetector",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=-1,
                  stage_with_dcn=(False, True, True, True)),
    neck=dict(type="FPN", out_channels=64, start_level=1,
              add_extra_convs="on_input", num_outs=5,
              norm_cfg=dict(type="GN", num_groups=16)),
    bbox_head=dict(type="LSHead", task="bbox", num_vectors=4,
                   num_classes=3, in_channels=64, feat_channels=64,
                   point_feat_channels=64, stacked_convs=2,
                   norm_cfg=dict(type="GN", num_groups=16),
                   conv_module_type="dcn"))
train_cfg = dict(
    init=dict(assigner=dict(type="CentroidAssigner", scale=4, pos_num=1,
                            iou_type="center")),
    refine=dict(assigner=dict(type="ATSSAssigner", topk=9)))
test_cfg = dict(nms_pre=500, score_thr=0.05,
                nms=dict(type="nms", iou_thr=0.6), max_per_img=50)
data = dict(
    samples_per_gpu=8,
    val=dict(ann_file="work/acc_dcn36/data_val/ann.json",
             img_prefix="work/acc_dcn36/data_val/imgs",
             img_scale=(160, 128)))
canvas_shape = (128, 160)
