"""Deformable conv ops vs. naive numpy re-derivations of the reference CUDA
semantics (`deform_conv_cuda_kernel.cu`). The naive mirrors are written
directly from the kernel equations, so agreement checks both."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lsnet_tpu.ops.deform_conv import (bilinear_gather, deform_conv,
                                       modulated_deform_conv,
                                       pyramid_deform_conv)


def naive_bilinear(im, y, x):
    """Zero-padded bilinear at fractional (y, x). im (H, W, C)."""
    H, W, C = im.shape
    if y <= -1 or y >= H or x <= -1 or x >= W:
        return np.zeros(C, im.dtype)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    out = np.zeros(C, np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            yy, xx = y0 + dy, x0 + dx
            w = (1 - abs(y - yy)) * (1 - abs(x - xx))
            if 0 <= yy < H and 0 <= xx < W:
                out += w * im[yy, xx]
    return out


def naive_deform_conv(x, offset, weight, stride=1, pad=1, dil=1,
                      scale=(1.0, 1.0), mask=None):
    """x (H,W,Cin), offset (Ho,Wo,2K), weight (kh,kw,Cin,Cout)."""
    H, W, Cin = x.shape
    Ho, Wo, _ = offset.shape
    kh, kw, _, Cout = weight.shape
    out = np.zeros((Ho, Wo, Cout), np.float64)
    for h in range(Ho):
        for w_ in range(Wo):
            acc = np.zeros(Cout, np.float64)
            t = 0
            for i in range(kh):
                for j in range(kw):
                    oy = offset[h, w_, 2 * t]
                    ox = offset[h, w_, 2 * t + 1]
                    y = (h * stride - pad + i * dil) * scale[0] + oy
                    xx = (w_ * stride - pad + j * dil) * scale[1] + ox
                    v = naive_bilinear(x, y, xx)
                    if mask is not None:
                        v = v * mask[h, w_, t]
                    acc += v @ weight[i, j]
                    t += 1
            out[h, w_] = acc
    return out


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_bilinear_gather_matches_naive(rng):
    feat = rng.randn(1, 5, 6, 3).astype(np.float32)
    ys = rng.uniform(-2, 7, (1, 40)).astype(np.float32)
    xs = rng.uniform(-2, 8, (1, 40)).astype(np.float32)
    got = np.asarray(bilinear_gather(jnp.array(feat), jnp.array(ys),
                                     jnp.array(xs)))
    for p in range(40):
        want = naive_bilinear(feat[0], ys[0, p], xs[0, p])
        np.testing.assert_allclose(got[0, p], want, rtol=1e-5, atol=1e-5)


def test_deform_conv_matches_naive(rng):
    x = rng.randn(2, 6, 7, 4).astype(np.float32)
    offset = (rng.randn(2, 6, 7, 18) * 1.5).astype(np.float32)
    w = rng.randn(3, 3, 4, 5).astype(np.float32)
    got = np.asarray(deform_conv(jnp.array(x), jnp.array(offset),
                                 jnp.array(w), stride=1, padding=1))
    for b in range(2):
        want = naive_deform_conv(x[b], offset[b], w)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_deform_conv_zero_offset_equals_conv(rng):
    """With zero offsets, deform conv == ordinary conv (integer sampling)."""
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    offset = np.zeros((1, 8, 8, 18), np.float32)
    w = rng.randn(3, 3, 3, 6).astype(np.float32)
    got = np.asarray(deform_conv(jnp.array(x), jnp.array(offset),
                                 jnp.array(w), padding=1))
    want = jax.lax.conv_general_dilated(
        jnp.array(x), jnp.array(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)


def test_modulated_deform_conv(rng):
    x = rng.randn(1, 5, 5, 3).astype(np.float32)
    offset = (rng.randn(1, 5, 5, 18)).astype(np.float32)
    mask = rng.uniform(0, 1, (1, 5, 5, 9)).astype(np.float32)
    w = rng.randn(3, 3, 3, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    got = np.asarray(modulated_deform_conv(
        jnp.array(x), jnp.array(offset), jnp.array(mask), jnp.array(w),
        jnp.array(b), padding=1))
    want = naive_deform_conv(x[0], offset[0], w, mask=mask[0]) + b
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-4)


def test_pyramid_deform_conv_cross_level(rng):
    """Output grid = offset grid; base coords scaled into the input map
    (`deform_conv_cuda_kernel.cu:281-282`)."""
    x = rng.randn(1, 4, 5, 3).astype(np.float32)       # coarser level
    offset = (rng.randn(1, 8, 10, 18) * 0.5).astype(np.float32)
    w = rng.randn(3, 3, 3, 4).astype(np.float32)
    got = np.asarray(pyramid_deform_conv(
        jnp.array(x), jnp.array(offset), jnp.array(w), 0.5, 0.5, padding=1))
    assert got.shape == (1, 8, 10, 4)
    want = naive_deform_conv(x[0], offset[0], w, scale=(0.5, 0.5))
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-4)


def test_deform_conv_differentiable(rng):
    x = jnp.array(rng.randn(1, 5, 5, 3).astype(np.float32))
    offset = jnp.array(rng.randn(1, 5, 5, 18).astype(np.float32))
    w = jnp.array(rng.randn(3, 3, 3, 2).astype(np.float32))

    def f(x, o, w):
        return jnp.sum(deform_conv(x, o, w, padding=1) ** 2)

    gx, go, gw = jax.grad(f, argnums=(0, 1, 2))(x, offset, w)
    for g in (gx, go, gw):
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(go).sum()) > 0  # offsets get gradients
