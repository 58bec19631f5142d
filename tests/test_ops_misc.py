"""roi_align / roi_pool / carafe / masked_conv / chamfer / nms_match tests."""

import numpy as np
import jax
import jax.numpy as jnp

from lsnet_tpu.ops.misc import (carafe, chamfer_distance, masked_conv2d,
                                nms_match)
from lsnet_tpu.ops.nms import NEG_INF
from lsnet_tpu.ops.roi import roi_align, roi_pool


def test_roi_align_constant_map():
    feats = jnp.ones((1, 16, 16, 3)) * 5.0
    rois = jnp.array([[0, 2, 2, 10, 10.]])
    out = roi_align(feats, rois, out_size=(4, 4))
    assert out.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_gradient_ramp():
    # ramp along x: aligned sampling must reproduce the linear values
    x = jnp.broadcast_to(jnp.arange(16, dtype=jnp.float32)[None, :, None],
                         (16, 16, 1))[None]
    rois = jnp.array([[0, 4, 4, 12, 12.]])
    out = roi_align(x, rois, out_size=(4, 4), sampling_ratio=1)
    got = np.asarray(out)[0, 0, :, 0]
    want = 4 - 0.5 + (np.arange(4) + 0.5) * 2    # x1-0.5 + (i+.5)*bin
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_pool_max():
    feats = jnp.zeros((1, 8, 8, 1)).at[0, 3, 3, 0].set(9.0)
    rois = jnp.array([[0, 0, 0, 7, 7.]])
    out = roi_pool(feats, rois, out_size=(2, 2))
    assert float(out.max()) == 9.0


def test_carafe_uniform_kernel_is_nearest():
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(1, 4, 4, 4).astype(np.float32))
    k = 3
    masks = jnp.ones((1, 8, 8, k * k)) / (k * k)
    out = carafe(x, masks, kernel_size=3, scale=2)
    assert out.shape == (1, 8, 8, 4)
    # uniform kernel = local average; center pixels of interior match avg pool
    import jax.numpy as jn
    avg = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), "SAME") / 9.0
    np.testing.assert_allclose(np.asarray(out[0, 2, 2]),
                               np.asarray(avg[0, 1, 1]), atol=1e-5)


def test_masked_conv():
    x = jnp.ones((1, 5, 5, 2))
    w = jnp.ones((3, 3, 2, 1))
    mask = jnp.zeros((1, 5, 5)).at[0, 2, 2].set(1.0)
    out = masked_conv2d(x, mask, w)
    assert float(out[0, 2, 2, 0]) == 18.0
    assert float(jnp.abs(out).sum()) == 18.0


def test_chamfer():
    a = jnp.array([[[0, 0], [1, 0.]]])
    b = jnp.array([[[0, 1], [5, 5.]]])
    d1, d2 = chamfer_distance(a, b)
    np.testing.assert_allclose(np.asarray(d1[0]), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(d2[0]), [1.0, 41.0])


def test_nms_match_groups():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60.]])
    scores = jnp.array([0.9, 0.8, 0.7])
    group = np.asarray(nms_match(boxes, scores, 0.5))
    assert group[0] == 0 and group[1] == 0 and group[2] == 2


def test_deform_roi_pool_zero_offset_equals_roi_align_mean():
    from lsnet_tpu.ops.roi import deform_roi_pool
    feats = jnp.ones((1, 12, 12, 2)) * 3.0
    rois = jnp.array([[0, 2, 2, 10, 10.]])
    offs = jnp.zeros((1, 3, 3, 2))
    out = deform_roi_pool(feats, rois, offs, out_size=(3, 3))
    assert out.shape == (1, 3, 3, 2)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_deform_roi_pool_offset_shifts_window():
    from lsnet_tpu.ops.roi import deform_roi_pool
    # ramp along x: positive dx offset increases pooled value
    x = jnp.broadcast_to(jnp.arange(16, dtype=jnp.float32)[None, :, None],
                         (16, 16, 1))[None]
    rois = jnp.array([[0, 4, 4, 12, 12.]])
    base = deform_roi_pool(x, rois, jnp.zeros((1, 2, 2, 2)), out_size=(2, 2))
    shifted = deform_roi_pool(
        x, rois, jnp.concatenate([jnp.zeros((1, 2, 2, 1)),
                                  jnp.ones((1, 2, 2, 1))], -1),
        out_size=(2, 2))
    assert float(shifted.sum()) > float(base.sum())
