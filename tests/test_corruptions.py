"""Robustness suite: corruptions, the Corrupt pipeline step, the
test_robustness/robustness_eval aggregation math, coco_error_analysis bands
and browse_dataset drawing. Reference surface:
`code/mmdet/datasets/pipelines/transforms.py:1030-1062` (Corrupt),
`code/tools/{test_robustness,robustness_eval,coco_error_analysis,
browse_dataset}.py`."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def _img(h=48, w=64, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    base[10:30, 10:40] = (200, 40, 40)   # some structure for blurs
    return base


# ----------------------------------------------------------- corruptions --

def test_every_corruption_runs_and_is_deterministic():
    from lsnet_tpu.data.corruptions import CORRUPTIONS, corrupt
    img = _img()
    for name in CORRUPTIONS:
        out1 = corrupt(img, name, 3)
        out2 = corrupt(img, name, 3)
        assert out1.shape == img.shape and out1.dtype == np.uint8, name
        np.testing.assert_array_equal(out1, out2, err_msg=name)
        assert np.abs(out1.astype(int) - img.astype(int)).mean() > 0.1, name


def test_severity_increases_distortion():
    from lsnet_tpu.data.corruptions import corrupt
    img = _img()
    for name in ("gaussian_noise", "gaussian_blur", "contrast", "pixelate",
                 "jpeg_compression"):
        d1 = np.abs(corrupt(img, name, 1).astype(float) - img).mean()
        d5 = np.abs(corrupt(img, name, 5).astype(float) - img).mean()
        assert d5 > d1, f"{name}: sev5 {d5:.2f} <= sev1 {d1:.2f}"


def test_corrupt_validation_errors():
    from lsnet_tpu.data.corruptions import corrupt
    img = _img()
    with pytest.raises(NotImplementedError):
        corrupt(img, "glass_blur", 1)        # needs external package
    with pytest.raises(KeyError):
        corrupt(img, "nope", 1)
    with pytest.raises(ValueError):
        corrupt(img, "gaussian_noise", 6)


def test_benchmark_sets_are_known_corruptions():
    from lsnet_tpu.data.corruptions import BENCHMARK, CORRUPTIONS, HOLDOUT
    assert set(BENCHMARK) <= set(CORRUPTIONS)
    assert set(HOLDOUT) <= set(CORRUPTIONS)
    assert not set(BENCHMARK) & set(HOLDOUT)


# -------------------------------------------------------- pipeline step --

def test_corrupt_sample_pixels_only():
    from lsnet_tpu.data.transforms import corrupt_sample
    s = {"image": _img(), "gt_bboxes": np.array([[1., 2., 3., 4.]]),
         "gt_labels": np.array([0])}
    out = corrupt_sample(s, "brightness", 2)
    assert out["image"].shape == s["image"].shape
    assert (out["image"] != s["image"]).any()
    np.testing.assert_array_equal(out["gt_bboxes"], s["gt_bboxes"])
    # float images round-trip through uint8 and keep dtype
    sf = {"image": _img().astype(np.float32)}
    outf = corrupt_sample(sf, "brightness", 2)
    assert outf["image"].dtype == np.float32


def test_corrupt_in_aug_pipeline():
    from lsnet_tpu.data.transforms import build_aug_pipeline
    run = build_aug_pipeline([{"type": "Corrupt",
                               "corruption": "contrast", "severity": 3}])
    s = {"image": _img(), "gt_bboxes": np.zeros((0, 4), np.float32)}
    out = run(s, np.random.RandomState(0))
    assert (out["image"] != s["image"]).any()


def test_dataset_corruption_config(tmp_path):
    from test_e2e_train import make_synthetic_coco
    from lsnet_tpu.data.coco import CocoDataset, DatasetConfig
    ann_file, img_dir = make_synthetic_coco(str(tmp_path), n_images=2)
    base = dict(ann_file=ann_file, img_prefix=img_dir, task="bbox",
                img_scale=(64, 64), filter_empty=False)
    clean = CocoDataset(DatasetConfig(**base), test_mode=True)
    dirty = CocoDataset(DatasetConfig(**base,
                                      corruption=("impulse_noise", 4)),
                        test_mode=True)
    a = clean.get_sample(0)["image"]
    b = dirty.get_sample(0)["image"]
    assert a.shape == b.shape and (a != b).any()


# ------------------------------------------------------- aggregation math --

def test_robustness_eval_p_mpc_rpc(tmp_path, capsys):
    from robustness_eval import get_results
    mk = lambda v: {"bbox_mAP": v, "bbox_mAP_50": v * 1.5,
                    "bbox_mAP_75": v, "bbox_mAP_s": v, "bbox_mAP_m": v,
                    "bbox_mAP_l": v}
    results = {
        "gaussian_noise": {0: mk(0.4), 1: mk(0.3), 2: mk(0.2)},
        "contrast": {0: mk(0.4), 1: mk(0.1), 2: mk(0.2)},
        "speckle_noise": {0: mk(0.4), 1: mk(0.0)},   # holdout: not benchmark
    }
    path = os.path.join(str(tmp_path), "rob.json")
    with open(path, "w") as f:
        json.dump(results, f)
    out = get_results(path, task="bbox", prints=("P", "mPC", "rPC"),
                      aggregate="benchmark")
    assert out["bbox_mAP"]["P"] == pytest.approx(0.4)
    # benchmark aggregate: gaussian_noise(.3,.2) + contrast(.1,.2) only
    assert out["bbox_mAP"]["mPC"] == pytest.approx(0.2)
    assert out["bbox_mAP"]["rPC"] == pytest.approx(0.5)
    out_all = get_results(path, task="bbox", aggregate="all")
    assert out_all["bbox_mAP"]["mPC"] == pytest.approx((0.3 + 0.2 + 0.1
                                                        + 0.2 + 0.0) / 5)


def test_test_robustness_group_selection():
    from test_robustness import pick_corruptions
    from lsnet_tpu.data.corruptions import BENCHMARK
    assert pick_corruptions(["benchmark"]) == BENCHMARK
    assert pick_corruptions(["noise"]) == ["gaussian_noise", "shot_noise",
                                           "impulse_noise"]
    assert pick_corruptions(["fog", "contrast"]) == ["fog", "contrast"]
    with pytest.raises(SystemExit):
        pick_corruptions(["not_a_corruption"])


# ------------------------------------------------------- error analysis --

def _toy_det_scene():
    """3 imgs, 2 cats sharing a supercategory: one good det, one class
    confusion, one localization slip, one background FP, one missed GT."""
    gts = [
        dict(image_id=0, category_id=1, bbox=[10, 10, 20, 20], area=400,
             iscrowd=0),
        dict(image_id=0, category_id=2, bbox=[50, 50, 20, 20], area=400,
             iscrowd=0),
        dict(image_id=1, category_id=1, bbox=[10, 10, 20, 20], area=400,
             iscrowd=0),
        dict(image_id=2, category_id=1, bbox=[10, 10, 20, 20], area=400,
             iscrowd=0),   # missed entirely -> FN band
    ]
    dts = [
        dict(image_id=0, category_id=1, bbox=[10, 10, 20, 20], score=0.9),
        # class confusion: cat-1 det on the cat-2 GT -> forgiven at Sim
        dict(image_id=0, category_id=1, bbox=[50, 50, 20, 20], score=0.8),
        # loc slip on img1's GT: IoU ~ .47 (passes .1, fails .5)
        dict(image_id=1, category_id=1, bbox=[14, 14, 20, 20], score=0.75),
        # pure background FP; out-scores the loc-slip TP so the precision
        # envelope can't erase it (trailing FPs cost nothing)
        dict(image_id=1, category_id=1, bbox=[80, 80, 10, 10], score=0.85),
    ]
    img_sizes = {0: (128, 128), 1: (128, 128), 2: (128, 128)}
    cats = {1: dict(id=1, name="cat", supercategory="animal"),
            2: dict(id=2, name="dog", supercategory="animal")}
    return gts, dts, img_sizes, cats


def test_error_analysis_bands_monotone():
    from coco_error_analysis import analyze_results, BAND_NAMES
    gts, dts, img_sizes, cats = _toy_det_scene()
    ps, rec_thrs, cat_ids = analyze_results(gts, dts, img_sizes, cats,
                                            progress=lambda *_: None)
    assert cat_ids == [1]
    assert ps.shape[0] == len(BAND_NAMES) == 7
    # relaxing the criterion can only help: bands are pointwise monotone
    for i in range(6):
        assert (ps[i + 1] >= ps[i] - 1e-9).all(), BAND_NAMES[i + 1]
    assert (ps[6] == 1.0).all()
    aps = ps[:, :, 0, 0].mean(axis=1)
    # the scene has a loc slip (C50 < Loc), a class confusion (Loc < Sim),
    # a background FP + a missed GT (Oth < BG < FN=1)
    assert aps[1] < aps[2] < aps[3]
    assert aps[4] < aps[5] < 1.0


def test_error_analysis_tool_end_to_end(tmp_path):
    import subprocess
    gts, dts, img_sizes, cats = _toy_det_scene()
    ann = dict(
        images=[dict(id=i, height=128, width=128, file_name=f"{i}.png")
                for i in (0, 1)],
        annotations=[dict(g, id=k + 1) for k, g in enumerate(gts)],
        categories=list(cats.values()))
    ann_p = os.path.join(str(tmp_path), "ann.json")
    res_p = os.path.join(str(tmp_path), "res.json")
    out_d = os.path.join(str(tmp_path), "analysis")
    with open(ann_p, "w") as f:
        json.dump(ann, f)
    with open(res_p, "w") as f:
        json.dump(dts, f)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/coco_error_analysis.py", res_p, out_d,
         "--ann", ann_p],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    files = os.listdir(out_d)
    assert "analysis.json" in files
    assert any(f.endswith("allclass.png") for f in files)
    with open(os.path.join(out_d, "analysis.json")) as f:
        summary = json.load(f)
    assert summary["bbox"]["FN"] == pytest.approx(1.0)


# ------------------------------------------------------- browse_dataset --

def test_browse_dataset_draw(tmp_path):
    from browse_dataset import draw_sample, denormalize
    from lsnet_tpu.data.transforms import normalize_image
    img = _img(64, 64)
    rt = denormalize(normalize_image(img.astype(np.float32)))
    assert np.abs(rt.astype(int) - img.astype(int)).max() <= 1
    sample = {"image": normalize_image(img.astype(np.float32)),
              "gt_bboxes": np.array([[5., 5., 30., 30.]], np.float32),
              "gt_labels": np.array([0], np.int32),
              "gt_extremes": np.array([[17, 5, 5, 17, 17, 30, 30, 17,
                                        17, 17]], np.float32)}
    out_file = os.path.join(str(tmp_path), "s.png")
    arr = draw_sample(sample, out_file)
    assert os.path.exists(out_file) and arr.shape == (64, 64, 3)
