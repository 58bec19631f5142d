"""Data pipeline golden tests (mirrors reference `tests/test_pipelines/`):
extreme-point extraction, polygon normalization, flip index remaps."""

import numpy as np

from lsnet_tpu.data.lsvr import (extreme_points_with_center,
                                 get_extreme_points, is_clockwise,
                                 polygon_area, unify_origin, unify_polygon,
                                 uniform_sample)
from lsnet_tpu.data.transforms import (hflip_sample, normalize_image,
                                       pad_divisor_shape, rescale_size,
                                       resize_sample)


def test_extreme_points_rectangle():
    # axis-aligned rectangle: extremes at border midpoints (integer //2)
    pts = np.array([[10, 20], [50, 20], [50, 60], [10, 60]], np.float64)
    ep = get_extreme_points(pts)
    np.testing.assert_allclose(ep[0], [30, 20])   # top
    np.testing.assert_allclose(ep[1], [10, 40])   # left
    np.testing.assert_allclose(ep[2], [30, 60])   # bottom
    np.testing.assert_allclose(ep[3], [50, 40])   # right


def test_extreme_points_with_center():
    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    out = extreme_points_with_center(pts, np.array([0, 0, 10, 10.]))
    assert out.shape == (10,)
    np.testing.assert_allclose(out[8:], [5, 5])


def test_uniform_sample_updown():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    up = uniform_sample(sq, 40)
    assert up.shape == (40, 2)
    # all resampled points lie on the square's perimeter
    on_edge = ((np.isclose(up[:, 0], 0) | np.isclose(up[:, 0], 10)
                | np.isclose(up[:, 1], 0) | np.isclose(up[:, 1], 10)))
    assert on_edge.all()
    down = uniform_sample(up, 8)
    assert down.shape == (8, 2)


def test_unify_polygon_orientation_and_origin():
    theta = np.linspace(0, 2 * np.pi, 50, endpoint=False)
    # counter-clockwise circle in image coords
    circle = np.stack([50 + 20 * np.cos(theta), 50 - 20 * np.sin(theta)], -1)
    poly = unify_polygon([circle.reshape(-1)], np.array([30, 30, 70, 70.]),
                         num_points=36)
    assert poly.shape == (36, 2)
    assert is_clockwise(poly)
    # origin near top-center
    tc = np.array([50, poly[:, 1].min()])
    d = np.linalg.norm(poly - tc, axis=1)
    assert d[0] == d.min()


def test_unify_polygon_tiny_fallback():
    tiny = np.array([[0, 0], [0.2, 0], [0.2, 0.2]], np.float64)
    poly = unify_polygon([tiny.reshape(-1)], np.array([5, 5, 20, 25.]),
                         num_points=12)
    assert poly.shape == (12, 2)
    assert poly[:, 0].min() >= 5 and poly[:, 0].max() <= 20


def test_rescale_size_reference_scale():
    # 640x480 -> (1333, 800): short side to 800 unless long > 1333
    h, w = rescale_size(480, 640, (1333, 800))
    assert (h, w) == (800, 1067)
    h, w = rescale_size(400, 1600, (1333, 800))
    assert w == 1333


def test_resize_and_flip_bboxes_extremes():
    img = np.zeros((100, 200, 3), np.uint8)
    sample = {
        "image": img,
        "gt_bboxes": np.array([[20, 10, 60, 50]], np.float32),
        "gt_extremes": np.array([[40, 10, 20, 30, 40, 50, 60, 30, 40, 30]],
                                np.float32),
    }
    s = resize_sample(sample, (400, 200))
    np.testing.assert_allclose(s["scale_factor"], [2, 2, 2, 2])
    np.testing.assert_allclose(s["gt_bboxes"][0], [40, 20, 120, 100])

    f = hflip_sample(s)
    w = s["image"].shape[1]
    np.testing.assert_allclose(f["gt_bboxes"][0],
                               [w - 120, 20, w - 40, 100])
    e = f["gt_extremes"][0]
    # top x mirrored; left slot now holds mirrored old right
    assert e[0] == w - 80
    assert e[2] == w - 120 and e[3] == 60
    assert e[6] == w - 40 and e[7] == 60
    assert e[8] == w - 80


def test_flip_keypoints_swaps_left_right():
    img = np.zeros((50, 100, 3), np.float32)
    kp = np.zeros((1, 51), np.float32)
    kp[0, 0::3] = np.arange(17)          # xs
    kp[0, 2::3] = 2                       # visible
    sample = {"image": img, "img_shape": (50, 100),
              "gt_keypoints_vs": kp}
    f = hflip_sample(sample)
    out = f["gt_keypoints_vs"][0].reshape(17, 3)
    # joint 1 (left eye) receives mirrored old joint 2 (right eye)
    assert out[1, 0] == 100 - 2
    assert out[2, 0] == 100 - 1
    assert out[0, 0] == 100 - 0


def test_flip_polygons_keeps_clockwise():
    theta = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    poly = np.stack([50 + 10 * np.cos(theta), 25 + 10 * np.sin(theta)],
                    -1)  # clockwise in image coords
    if not is_clockwise(poly):
        poly = poly[::-1]
    sample = {"image": np.zeros((50, 100, 3), np.float32),
              "img_shape": (50, 100),
              "gt_polygons": poly.reshape(1, -1).astype(np.float32)}
    f = hflip_sample(sample)
    out = f["gt_polygons"][0].reshape(-1, 2)
    assert is_clockwise(out)


def test_pad_divisor():
    assert pad_divisor_shape(800, 1067) == (800, 1088)
    assert pad_divisor_shape(33, 32) == (64, 32)
