"""Eval backend tests: RLE codec roundtrips, polygon rasterization sanity,
COCOEval end-to-end AP behaviour."""

import numpy as np

from lsnet_tpu.evalkit import rle as M
from lsnet_tpu.evalkit.cocoeval import COCOEval, EvalParams


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = rng.rand(23, 17) > 0.6
    r = M.encode_mask(mask)
    np.testing.assert_array_equal(M.decode_mask(r), mask)
    assert M.area(r) == mask.sum()


def test_rle_string_roundtrip():
    rng = np.random.RandomState(1)
    mask = rng.rand(40, 30) > 0.5
    r = M.encode_mask(mask)
    s = M.rle_to_string(r)
    r2 = M.rle_from_string(s, 40, 30)
    np.testing.assert_array_equal(r.cnts, r2.cnts)


def test_polygon_rasterize_rectangle():
    # rectangle [2,3]..[12,9]: pycocotools fills ~10x6 pixels
    poly = [2, 3, 12, 3, 12, 9, 2, 9]
    r = M.rle_from_polygon(poly, 20, 20)
    m = M.decode_mask(r)
    area = m.sum()
    assert 50 <= area <= 70, area
    ys, xs = np.nonzero(m)
    assert xs.min() >= 2 and xs.max() <= 12
    assert ys.min() >= 3 and ys.max() <= 9


def test_polygon_iou_disjoint_and_identical():
    a = M.rle_from_polygon([0, 0, 10, 0, 10, 10, 0, 10], 32, 32)
    b = M.rle_from_polygon([20, 20, 30, 20, 30, 30, 20, 30], 32, 32)
    iou = M.iou([a], [a, b], [0, 0])
    assert np.isclose(iou[0, 0], 1.0)
    assert iou[0, 1] == 0.0


def test_bbox_iou_crowd():
    d = [np.array([0, 0, 10, 10.0])]
    g = [np.array([0, 0, 20, 20.0])]
    plain = M.iou(d, g, [0])[0, 0]
    crowd = M.iou(d, g, [1])[0, 0]
    assert np.isclose(plain, 100 / 400)
    assert np.isclose(crowd, 1.0)   # crowd: inter / dt area


def _make_gt_dt(n_img=4, perfect=True):
    gts, dts = [], []
    sizes = {}
    aid = 1
    for img in range(n_img):
        sizes[img] = (100, 100)
        for j in range(3):
            box = [10 * j + 5, 10, 8, 8 + j]
            gts.append(dict(id=aid, image_id=img, category_id=1, bbox=box,
                            area=box[2] * box[3], iscrowd=0))
            if perfect or j < 2:
                dts.append(dict(id=aid, image_id=img, category_id=1,
                                bbox=list(box), area=box[2] * box[3],
                                score=0.9 - 0.1 * j))
            aid += 1
    return gts, dts, sizes


def test_cocoeval_perfect_ap():
    gts, dts, sizes = _make_gt_dt(perfect=True)
    ev = COCOEval(gts, dts, sizes).evaluate()
    stats = ev.summarize()
    assert np.isclose(stats[0], 1.0), stats


def test_cocoeval_missing_detections():
    gts, dts, sizes = _make_gt_dt(perfect=False)
    ev = COCOEval(gts, dts, sizes).evaluate()
    stats = ev.summarize()
    assert 0.5 < stats[0] < 0.75   # 2/3 recall caps AP


def test_cocoeval_segm():
    gts, dts, sizes = [], [], {0: (64, 64)}
    poly = [10, 10, 40, 10, 40, 40, 10, 40]
    gts.append(dict(id=1, image_id=0, category_id=1, bbox=[10, 10, 30, 30],
                    area=900, iscrowd=0, segmentation=[poly]))
    dts.append(dict(id=1, image_id=0, category_id=1, bbox=[10, 10, 30, 30],
                    area=900, score=0.9, segmentation=[poly]))
    ev = COCOEval(gts, dts, sizes, EvalParams(iou_type="segm")).evaluate()
    stats = ev.summarize()
    assert np.isclose(stats[0], 1.0)


def test_cocoeval_keypoints_oks():
    kps = []
    for i in range(17):
        kps += [20 + i, 30, 2]
    gts = [dict(id=1, image_id=0, category_id=1, bbox=[15, 25, 30, 12],
                area=40 ** 2, iscrowd=0, keypoints=kps, num_keypoints=17)]
    dts = [dict(id=1, image_id=0, category_id=1, bbox=[15, 25, 30, 12],
                area=40 ** 2, score=0.9, keypoints=list(kps))]
    ev = COCOEval(gts, dts, {0: (64, 64)},
                  EvalParams.for_keypoints()).evaluate()
    stats = ev.summarize()
    assert np.isclose(stats[0], 1.0)
    # jitter all keypoints -> OKS drops but stays positive
    dts[0]["keypoints"] = [v + (3 if i % 3 == 0 else 0)
                           for i, v in enumerate(kps)]
    ev2 = COCOEval(gts, dts, {0: (64, 64)},
                   EvalParams.for_keypoints()).evaluate()
    s2 = ev2.summarize()
    assert s2[0] <= stats[0]


def test_native_rle_matches_numpy():
    from lsnet_tpu.evalkit.native_rle import native_available, rle_iou_native
    if not native_available():
        import pytest
        pytest.skip("no g++ available")
    rng = np.random.RandomState(3)
    masks = [rng.rand(30, 25) > 0.5 for _ in range(5)]
    rles = [M.encode_mask(m) for m in masks]
    got = rle_iou_native(rles[:2], rles[2:], [0, 0, 1])
    for i in range(2):
        for j in range(3):
            inter = (masks[i] & masks[2 + j]).sum()
            a, b = masks[i].sum(), masks[2 + j].sum()
            uni = a if j == 2 else a + b - inter
            assert np.isclose(got[i, j], inter / uni)
