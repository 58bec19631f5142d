"""Training augmentation suite tests (VERDICT r3 missing #2): reference
semantics of PhotoMetricDistortion / Expand / MinIoURandomCrop / RandomCrop
(`/root/reference/code/mmdet/datasets/pipelines/transforms.py:508,644,739,
812`) with landmark-field consistency — the part the reference never had to
handle (its recipes that crop carry no extreme/keypoint fields)."""

import colorsys

import numpy as np
import pytest

from lsnet_tpu.data.transforms import (_hsv2rgb, _rgb2hsv,
                                       build_aug_pipeline, expand_sample,
                                       min_iou_random_crop,
                                       photometric_distortion,
                                       random_crop_sample, resize_sample)


def _sample(h=60, w=80, n=3, with_kp=False, with_poly=False):
    rng = np.random.RandomState(0)
    s = {"image": rng.randint(0, 255, (h, w, 3)).astype(np.float32),
         "img_shape": (h, w)}
    bb = np.array([[5, 5, 30, 40], [40, 10, 70, 50], [10, 30, 50, 55]],
                  np.float32)[:n]
    s["gt_bboxes"] = bb
    s["gt_labels"] = np.arange(n, dtype=np.int32)
    # extremes [tx,ty, lx,ly, bx,by, rx,ry, cx,cy] on each box
    ex = []
    for x1, y1, x2, y2 in bb:
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        ex.append([cx, y1, x1, cy, cx, y2, x2, cy, cx, cy])
    s["gt_extremes"] = np.asarray(ex, np.float32)
    if with_kp:
        kp = np.zeros((n, 9), np.float32)
        kp[:, 0::3] = bb[:, [0]] + 2
        kp[:, 1::3] = bb[:, [1]] + 2
        kp[:, 2::3] = 2.0
        kp[0, 5] = 0.0                        # one invisible joint
        s["gt_keypoints_vs"] = kp
    if with_poly:
        pg = np.zeros((n, 8), np.float32)
        pg[:, 0::2] = bb[:, [0, 2, 2, 0]].reshape(n, 4)
        pg[:, 1::2] = bb[:, [1, 1, 3, 3]].reshape(n, 4)
        s["gt_polygons"] = pg
    return s


# ------------------------------------------------------------ HSV helpers

def test_hsv_roundtrip_matches_colorsys():
    rng = np.random.RandomState(1)
    img = rng.rand(5, 7, 3).astype(np.float32) * 255
    hsv = _rgb2hsv(img)
    for i in range(5):
        for j in range(7):
            r, g, b = img[i, j] / 255.0
            h, s, v = colorsys.rgb_to_hsv(r, g, b)
            np.testing.assert_allclose(hsv[i, j, 0], h * 360.0, atol=1e-3)
            np.testing.assert_allclose(hsv[i, j, 1], s, atol=1e-5)
            np.testing.assert_allclose(hsv[i, j, 2], v * 255.0, atol=1e-3)
    back = _hsv2rgb(hsv)
    np.testing.assert_allclose(back, img, atol=1e-2)


def test_photometric_identity_when_no_ops_fire():
    """With an rng that always draws 0 for randint, no step applies."""
    class Zeros(np.random.RandomState):
        def randint(self, *a, **k):
            return 0
    s = _sample()
    out = photometric_distortion(s, Zeros(0))
    np.testing.assert_allclose(out["image"], s["image"], atol=1e-2)
    # GT untouched
    np.testing.assert_array_equal(out["gt_bboxes"], s["gt_bboxes"])


def test_photometric_changes_image_only():
    s = _sample()
    out = photometric_distortion(s, np.random.RandomState(3))
    assert out["image"].shape == s["image"].shape
    assert not np.allclose(out["image"], s["image"])
    np.testing.assert_array_equal(out["gt_extremes"], s["gt_extremes"])


# ----------------------------------------------------------------- Expand

def test_expand_translates_all_fields():
    s = _sample(with_kp=True, with_poly=True)
    rng = np.random.RandomState(7)
    out = expand_sample(s, rng, prob=1.1)     # force apply
    eh, ew = out["image"].shape[:2]
    assert eh >= 60 and ew >= 80
    # find the placement offset from the bbox shift
    dx = out["gt_bboxes"][0, 0] - s["gt_bboxes"][0, 0]
    dy = out["gt_bboxes"][0, 1] - s["gt_bboxes"][0, 1]
    np.testing.assert_allclose(out["gt_bboxes"],
                               s["gt_bboxes"] + [dx, dy, dx, dy])
    np.testing.assert_allclose(out["gt_extremes"][:, 0::2],
                               s["gt_extremes"][:, 0::2] + dx)
    np.testing.assert_allclose(out["gt_extremes"][:, 1::2],
                               s["gt_extremes"][:, 1::2] + dy)
    np.testing.assert_allclose(out["gt_polygons"][:, 0::2],
                               s["gt_polygons"][:, 0::2] + dx)
    # visible keypoints translate; the invisible one stays put
    kp_in, kp_out = s["gt_keypoints_vs"], out["gt_keypoints_vs"]
    vis = kp_in[:, 2::3] > 0
    np.testing.assert_allclose(kp_out[:, 0::3][vis],
                               kp_in[:, 0::3][vis] + dx)
    np.testing.assert_allclose(kp_out[:, 0::3][~vis], kp_in[:, 0::3][~vis])
    # the original image content sits at the offset
    oy, ox = int(dy), int(dx)
    np.testing.assert_allclose(out["image"][oy:oy + 60, ox:ox + 80],
                               s["image"])
    # canvas fill = mean
    assert abs(out["image"][0, 0, 0] - 123.675) < 1e-3 or (oy == 0 and ox == 0)


def test_expand_prob_zero_is_identity():
    s = _sample()
    out = expand_sample(s, np.random.RandomState(0), prob=0.0)
    assert out is s


# ------------------------------------------------------------ RandomCrop

def test_random_crop_semantics():
    s = _sample(with_kp=True, with_poly=True)
    rng = np.random.RandomState(5)
    out = random_crop_sample(s, (40, 40), rng)
    assert out is not None
    assert out["image"].shape[:2] == (40, 40)
    bb = out["gt_bboxes"]
    assert np.all(bb[:, 0::2] >= 0) and np.all(bb[:, 0::2] <= 40)
    assert np.all(bb[:, 2] > bb[:, 0]) and np.all(bb[:, 3] > bb[:, 1])
    # labels stay aligned with surviving boxes
    assert len(out["gt_labels"]) == len(bb)
    assert len(out["gt_extremes"]) == len(bb)
    # keypoints outside the crop became invisible, coords clipped
    kp = out["gt_keypoints_vs"]
    assert np.all(kp[:, 0::3] >= 0) and np.all(kp[:, 0::3] <= 40)


def test_random_crop_none_when_no_box_survives():
    s = _sample(n=1)
    s["gt_bboxes"] = np.array([[70, 50, 79, 59]], np.float32)  # bottom-right
    class TopLeft(np.random.RandomState):
        def randint(self, lo, hi=None, **k):
            return 0
    out = random_crop_sample(s, (20, 20), TopLeft(0))
    assert out is None


# ------------------------------------------------- MinIoURandomCrop ------

def test_min_iou_crop_respects_constraints():
    rng = np.random.RandomState(11)
    applied = 0
    for seed in range(20):
        s = _sample(with_poly=True)
        out = min_iou_random_crop(s, np.random.RandomState(seed),
                                  min_ious=(0.1, 0.3), min_crop_size=0.3)
        h, w = out["image"].shape[:2]
        assert 0.5 <= h / w <= 2.0 or (h, w) == (60, 80)
        bb = out["gt_bboxes"]
        assert len(bb) >= 1
        assert np.all(bb[:, 0::2] >= 0) and np.all(bb[:, 0::2] <= w)
        assert np.all(bb[:, 1::2] >= 0) and np.all(bb[:, 1::2] <= h)
        assert len(out["gt_labels"]) == len(bb)
        if (h, w) != (60, 80):
            applied += 1
            # surviving boxes had centers inside the patch -> nondegenerate
            assert np.all(bb[:, 2] > bb[:, 0])
    assert applied >= 5          # the crop does fire


# ------------------------------------------------------------- pipeline --

def test_build_pipeline_order_and_resize_marker():
    specs = [dict(type="PhotoMetricDistortion"),
             dict(type="Expand", ratio_range=(2, 2), prob=1.1),
             dict(type="MinIoURandomCrop")]
    run = build_aug_pipeline(specs)
    s = _sample()
    out = run(s, np.random.RandomState(0))
    assert out is not None and out["image"].ndim == 3
    with pytest.raises(KeyError):
        build_aug_pipeline([dict(type="Nope")])
    assert build_aug_pipeline([]) is None


def test_resize_keep_ratio_false():
    s = _sample(h=60, w=80)
    out = resize_sample(s, (300, 300), keep_ratio=False)
    assert out["image"].shape[:2] == (300, 300)
    # landscape non-square: W gets the long side
    out2 = resize_sample(_sample(h=60, w=80), (200, 100), keep_ratio=False)
    assert out2["image"].shape[:2] == (100, 200)
    # portrait transposes
    s3 = _sample(h=80, w=60)
    out3 = resize_sample(s3, (200, 100), keep_ratio=False)
    assert out3["image"].shape[:2] == (200, 100)


def test_ssd_dataset_pipeline_end_to_end(tmp_path):
    """The SSD300 recipe (photo+expand+min-iou-crop+square resize) produces
    valid 300x300 batches through the real dataset path."""
    import json
    from lsnet_tpu.data.coco import CocoDataset, DatasetConfig, collate_batch
    rng = np.random.RandomState(0)
    imgs, anns = [], []
    import os
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    for i in range(3):
        h, w = 120 + 8 * i, 160
        arr = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        from PIL import Image
        Image.fromarray(arr).save(tmp_path / "imgs" / f"{i}.jpg")
        imgs.append(dict(id=i, file_name=f"{i}.jpg", height=h, width=w))
        anns.append(dict(id=2 * i + 1, image_id=i, category_id=1,
                         bbox=[10, 10, 60, 50], area=3000, iscrowd=0))
        anns.append(dict(id=2 * i + 2, image_id=i, category_id=2,
                         bbox=[80, 40, 40, 40], area=1600, iscrowd=0))
    ann = dict(images=imgs, annotations=anns,
               categories=[dict(id=1, name="a"), dict(id=2, name="b")])
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    ds = CocoDataset(DatasetConfig(
        ann_file=str(ann_file), img_prefix=str(tmp_path / "imgs"),
        img_scale=(300, 300), keep_ratio=False,
        augmentations=(dict(type="PhotoMetricDistortion"),
                       dict(type="Expand", mean=[123.675, 116.28, 103.53]),
                       dict(type="MinIoURandomCrop"))))
    samples = [ds.get_sample(i, np.random.RandomState(i)) for i in range(3)]
    for s in samples:
        assert s["image"].shape[:2] == (300, 300)
        assert len(s["gt_bboxes"]) >= 1
        assert np.all(s["gt_bboxes"][:, 2] > s["gt_bboxes"][:, 0])
    batch = collate_batch(samples, (300, 300))
    assert batch["image"].shape == (3, 300, 300, 3)
    assert batch["gt_valid"].any()
