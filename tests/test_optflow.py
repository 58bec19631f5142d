"""Optflow ops vs a direct numpy port of the reference C++ warp loop
(`code/mmcv/mmcv/video/optflow_warp/flow_warp.cpp:4-75`) and the mmcv
quantization formulas (`arraymisc/quantization.py:5-55`)."""

import numpy as np
import jax.numpy as jnp

from lsnet_tpu.ops.optflow import (dequantize_flow, flow_warp, flowread,
                                   flowwrite, quantize_flow)


def np_flow_warp(img, flow, filling_value=0, mode="bilinear"):
    H, W, C = img.shape
    out = np.zeros_like(img, dtype=np.float64)
    for h in range(H):
        for w in range(W):
            x = h + flow[h, w, 1]
            y = w + flow[h, w, 0]
            if x < 0 or x >= H - 1 or y < 0 or y >= W - 1:
                out[h, w] = filling_value
                continue
            if mode == "nearest":
                out[h, w] = img[int(x + 0.5), int(y + 0.5)]
            else:
                xx, yy = int(np.floor(x)), int(np.floor(y))
                dx = np.clip(x - xx, 0.0, 1.0)
                dy = np.clip(y - yy, 0.0, 1.0)
                acc = np.zeros(C)
                for m in (0, 1):
                    for n in (0, 1):
                        u = min(max(yy + n, 0), W - 1)
                        v = min(max(xx + m, 0), H - 1)
                        s = abs(1 - m - dx) * abs(1 - n - dy)
                        acc += img[v, u] * s
                out[h, w] = acc
    return out


def test_flow_warp_matches_reference_loop():
    rng = np.random.RandomState(0)
    img = rng.rand(12, 10, 3).astype(np.float32)
    flow = (4.0 * rng.randn(12, 10, 2)).astype(np.float32)
    for mode in ("bilinear", "nearest"):
        ref = np_flow_warp(img, flow, filling_value=7, mode=mode)
        got = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow),
                                   filling_value=7,
                                   interpolate_mode=mode))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_flow_warp_batched():
    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 8, 9, 2).astype(np.float32)
    flows = rng.randn(2, 8, 9, 2).astype(np.float32)
    got = np.asarray(flow_warp(jnp.asarray(imgs), jnp.asarray(flows),
                               interpolate_mode="bilinear"))
    for b in range(2):
        ref = np_flow_warp(imgs[b], flows[b], 0, "bilinear")
        np.testing.assert_allclose(got[b], ref, rtol=1e-5, atol=1e-5)


def test_quantize_roundtrip():
    rng = np.random.RandomState(2)
    # keep values inside +-max_val: clipped values reconstruct with error
    # up to the clip distance (reference behavior, not a round-trip bug)
    flow = (0.015 * rng.uniform(-1, 1, (6, 8, 2))).astype(np.float32)
    bin_w = 2 * 0.02 / 255
    dx, dy = quantize_flow(flow, norm=False)
    assert dx.dtype == np.uint8 and dx.max() <= 254
    rec = dequantize_flow(dx, dy, denorm=False)
    # 1.5 bins: the level-254 cap folds the top bin into its neighbour
    np.testing.assert_allclose(rec, flow, atol=1.5 * bin_w + 1e-6)
    # norm/denorm round trip (per-axis scale w=8, h=6)
    dxn, dyn = quantize_flow(flow, norm=True)
    recn = dequantize_flow(dxn, dyn, denorm=True)
    np.testing.assert_allclose(recn, flow, atol=1.5 * bin_w * 8 + 1e-6)


def test_flo_io_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    flow = rng.randn(5, 7, 2).astype(np.float32)
    p = str(tmp_path / "t.flo")
    flowwrite(flow, p)
    back = flowread(p)
    np.testing.assert_array_equal(back, flow)
    assert flowread(flow) is flow
