"""Host image-utility surface vs reference mmcv semantics
(`code/mmcv/mmcv/image/{geometric,photometric,colorspace}.py`)."""

import numpy as np
import pytest

from lsnet_tpu.utils import image as I


def test_imresize_rescale():
    img = (np.random.RandomState(0).rand(20, 30, 3) * 255).astype(np.uint8)
    out, wscale, hscale = I.imresize(img, (15, 10), return_scale=True)
    assert out.shape == (10, 15, 3) and wscale == 0.5 and hscale == 0.5
    out2, sf = I.imrescale(img, (16, 8), return_scale=True)
    # long side fits 16, short side fits 8 -> factor min(16/30, 8/20)
    assert abs(sf - min(16 / 30, 8 / 20)) < 1e-6
    assert I.imresize_like(img, out).shape == out.shape


def test_rescale_size_matches_reference_rounding():
    # int(x * f + 0.5) rounding, reference geometric.py:104-106
    assert I.rescale_size((30, 20), 0.5) == (15, 10)
    assert I.rescale_size((1333, 800), (1333, 800)) == (1333, 800)
    with pytest.raises(ValueError):
        I.rescale_size((10, 10), -1)


def test_imrotate_90_exact():
    rng = np.random.RandomState(1)
    img = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    # 90 deg clockwise about the exact center of a square == np.rot90(k=-1)
    got = I.imrotate(img, 90)
    ref = np.rot90(img, k=-1)
    np.testing.assert_array_equal(got, ref)
    # auto_bound on a rectangle swaps the canvas
    rect = (rng.rand(6, 10, 3) * 255).astype(np.uint8)
    got = I.imrotate(rect, 90, auto_bound=True)
    assert got.shape == (10, 6, 3)
    np.testing.assert_array_equal(got, np.rot90(rect, k=-1))
    with pytest.raises(ValueError):
        I.imrotate(img, 30, center=(1.0, 1.0), auto_bound=True)


def test_imrotate_border_value():
    img = np.full((5, 5), 100, np.uint8)
    out = I.imrotate(img, 45, border_value=7)
    assert out.shape == (5, 5)
    # the rotated corner straddles the source corner: bilinear blend of
    # border (7) and image (100), symmetric across all four corners
    # (cv2 BORDER_CONSTANT taps the border per out-of-range corner)
    assert 7 < out[0, 0] < 100
    assert out[0, 0] == out[0, 4] == out[4, 0] == out[4, 4]
    assert out[2, 2] == 100
    # a far-outside sample is pure border
    far = I.imrotate(np.full((3, 3), 100, np.uint8), 45, border_value=7,
                     auto_bound=True)
    assert far[0, 0] == 7


def test_imcrop_pad_fill():
    img = np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3)
    patch = I.imcrop(img, np.array([1, 1, 3, 2]))
    np.testing.assert_array_equal(patch, img[1:3, 1:4])
    padded = I.imcrop(img, np.array([-2, -1, 2, 2]), pad_fill=0)
    assert padded.shape == (4, 5, 3)
    np.testing.assert_array_equal(padded[1:, 2:], img[:3, :3])
    assert (padded[0] == 0).all() and (padded[:, :2] == 0).all()
    multi = I.imcrop(img, np.array([[0, 0, 1, 1], [2, 2, 4, 4]]))
    assert isinstance(multi, list) and multi[1].shape == (3, 3, 3)


def test_impad():
    img = np.ones((3, 4, 3), np.uint8)
    out = I.impad(img, (5, 6), pad_val=9)
    assert out.shape == (5, 6, 3)
    assert (out[3:, :, :] == 9).all() and (out[:3, :4] == 1).all()
    out = I.impad_to_multiple(img, 32)
    assert out.shape == (32, 32, 3)


def test_colorspace_roundtrip():
    rng = np.random.RandomState(2)
    img = (rng.rand(6, 7, 3) * 255).astype(np.uint8)
    hsv = I.rgb2hsv(img)
    assert hsv[..., 0].max() < 360 and hsv[..., 1].max() <= 1.0
    back = (I.hsv2rgb(hsv) * 255).round().astype(np.uint8)
    np.testing.assert_allclose(back, img, atol=1)
    np.testing.assert_array_equal(I.bgr2rgb(img), img[..., ::-1])
    g = I.bgr2gray(img, keepdim=True)
    assert g.shape == (6, 7, 1)
    assert I.gray2bgr(g[..., 0]).shape == (6, 7, 3)
    np.testing.assert_array_equal(I.imconvert(img, "bgr", "rgb"),
                                  img[..., ::-1])


def test_photometric():
    img = (np.arange(256, dtype=np.uint8).reshape(16, 16))
    np.testing.assert_array_equal(I.iminvert(img), 255 - img)
    sol = I.solarize(img, 128)
    assert sol[0, 0] == 0 and sol[15, 15] == 255 - 255
    post = I.posterize(img, 1)
    assert set(np.unique(post)) == {0, 128}
    rgb = (np.random.RandomState(3).rand(4, 5, 3) * 255).astype(np.uint8)
    mean = np.array([10.0, 20.0, 30.0])
    std = np.array([2.0, 3.0, 4.0])
    norm = I.imnormalize(rgb, mean, std, to_rgb=True)
    rec = I.imdenormalize(norm, mean, std, to_bgr=True)
    np.testing.assert_allclose(rec, rgb, atol=1e-3)
