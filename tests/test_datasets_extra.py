"""Non-COCO dataset loaders + VOC mAP evaluator tests
(reference datasets zoo: voc/xml_style/wider_face/cityscapes/lvis)."""

import json
import os

import numpy as np
import pytest


def _write_voc(root, n=3, classes=("dog", "person")):
    from PIL import Image
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    ids = []
    for i in range(n):
        img_id = f"img{i:03d}"
        ids.append(img_id)
        h, w = (60, 100) if i % 2 == 0 else (100, 60)
        arr = np.zeros((h, w, 3), np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "JPEGImages", f"{img_id}.jpg"))
        objs = ""
        for j, cname in enumerate(classes):
            objs += f"""
  <object><name>{cname}</name><difficult>0</difficult>
    <bndbox><xmin>{5 + j * 10}</xmin><ymin>{6 + j * 5}</ymin>
            <xmax>{25 + j * 10}</xmax><ymax>{30 + j * 5}</ymax></bndbox>
  </object>"""
        xml = f"""<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>{objs}
</annotation>"""
        with open(os.path.join(root, "Annotations", f"{img_id}.xml"),
                  "w") as f:
            f.write(xml)
    set_file = os.path.join(root, "trainval.txt")
    with open(set_file, "w") as f:
        f.write("\n".join(ids))
    return set_file


def test_voc_dataset_loads_and_iterates(tmp_path):
    from lsnet_tpu.data.coco import DataLoader, DatasetConfig
    from lsnet_tpu.data.extra import VOCDataset

    root = str(tmp_path / "VOC2007")
    set_file = _write_voc(root, n=4, classes=("dog", "person"))
    ds = VOCDataset(DatasetConfig(ann_file=set_file, img_prefix=root,
                                  img_scale=(96, 64), max_instances=4))
    assert len(ds) == 4 and ds.year == 2007
    s = ds.get_sample(0, np.random.RandomState(0))
    assert s["gt_bboxes"].shape == (2, 4)
    assert s["gt_extremes"].shape == (2, 10)
    # VOC 1-based boxes become 0-based
    assert s["gt_labels"].tolist() == [ds.cat2label["dog"],
                                       ds.cat2label["person"]]
    loader = DataLoader(ds, batch_size=2, seed=0, prefetch=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert all(b["gt_valid"].sum() == 4 for b in batches)


def test_dataset_registry_and_lvis_filenames(tmp_path):
    from lsnet_tpu.data.coco import DatasetConfig
    from lsnet_tpu.data.extra import DATASET_TYPES, LVISDataset, build_dataset

    ann = dict(
        images=[dict(id=1, width=32, height=32,
                     coco_url="http://images.cocodataset.org/train2017/x.jpg")],
        annotations=[dict(id=1, image_id=1, category_id=1,
                          bbox=[2, 2, 10, 10], area=100,
                          segmentation=[[2, 2, 12, 2, 12, 12, 2, 12]])],
        categories=[dict(id=1, name="thing")])
    path = str(tmp_path / "lvis.json")
    with open(path, "w") as f:
        json.dump(ann, f)
    ds = build_dataset("LVISDataset",
                       DatasetConfig(ann_file=path, img_prefix="/x"))
    assert isinstance(ds, LVISDataset)
    assert ds.coco.img_infos[0]["file_name"] == "train2017/x.jpg"
    with pytest.raises(KeyError):
        build_dataset("NopeDataset", DatasetConfig(ann_file=path,
                                                   img_prefix="/x"))
    assert "CityscapesDataset" in DATASET_TYPES
    assert "WIDERFaceDataset" in DATASET_TYPES


def test_eval_map_hand_computed():
    """2 images, 1 class: 2 GTs, 3 dets (1 TP@0.9, 1 FP@0.8, 1 TP@0.7)
    -> PR = (1,1), (1/2, 1/2), (2/3, 1) -> area AP = 1*0.5 + (2/3)*0.5."""
    from lsnet_tpu.data.extra import eval_map

    gt1 = dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
               labels=np.array([0]))
    gt2 = dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
               labels=np.array([0]))
    dets1 = [np.array([[0, 0, 10, 10, 0.9],           # TP
                       [20, 20, 30, 30, 0.8]], np.float32)]  # FP
    dets2 = [np.array([[1, 1, 10, 10, 0.7]], np.float32)]    # TP (IoU .81)
    mAP, cls = eval_map([dets1, dets2], [gt1, gt2], iou_thr=0.5)
    # precision at recalls: r=0.5 -> p=1.0; r=1.0 -> p=2/3
    want = 0.5 * 1.0 + 0.5 * (2.0 / 3.0)
    np.testing.assert_allclose(mAP, want, rtol=1e-6)
    assert cls[0]["num_gts"] == 2 and cls[0]["num_dets"] == 3

    # duplicate detection of a matched GT is a FP
    dets_dup = [np.array([[0, 0, 10, 10, 0.9],
                          [0, 0, 10, 10, 0.85]], np.float32)]
    mAP2, _ = eval_map([dets_dup], [gt1], iou_thr=0.5)
    np.testing.assert_allclose(mAP2, 1.0)   # recall 1 reached at rank 1

    # 11-point VOC2007 metric
    mAP3, _ = eval_map([dets1, dets2], [gt1, gt2], iou_thr=0.5,
                       use_07_metric=True)
    want07 = (6 * 1.0 + 5 * (2.0 / 3.0)) / 11.0
    np.testing.assert_allclose(mAP3, want07, rtol=1e-6)


def test_widerface_paths(tmp_path):
    from lsnet_tpu.data.coco import DatasetConfig
    from lsnet_tpu.data.extra import WiderFaceDataset
    from PIL import Image

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    img_dir = os.path.join(root, "WIDER_train", "images", "0--Parade")
    os.makedirs(img_dir, exist_ok=True)
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(
        os.path.join(img_dir, "pic.jpg"))
    with open(os.path.join(root, "Annotations", "pic.xml"), "w") as f:
        f.write("""<annotation><folder>0--Parade</folder>
<size><width>60</width><height>40</height></size>
<object><name>face</name>
<bndbox><xmin>5</xmin><ymin>5</ymin><xmax>20</xmax><ymax>20</ymax></bndbox>
</object></annotation>""")
    set_file = os.path.join(root, "train.txt")
    with open(set_file, "w") as f:
        f.write("pic\n")
    ds = WiderFaceDataset(DatasetConfig(ann_file=set_file, img_prefix=root,
                                        img_scale=(64, 48)))
    s = ds.get_sample(0)
    assert s["gt_bboxes"].shape == (1, 4)
    assert s["image"].shape[2] == 3
