"""Flat multi-level deform engine vs. the per-level reference ops —
bit-level agreement (both must match the CUDA-derived semantics)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lsnet_tpu.ops.deform_conv import (modulated_deform_conv,
                                       pyramid_deform_conv)
from lsnet_tpu.ops.flat_deform import (SampleJob, multilevel_modulated_dcn,
                                       multilevel_pyramid_dcn, pack_levels)

SHAPES = [(13, 21), (7, 11), (4, 6)]
C = 32


def make_feats(rng, B=2):
    return [jnp.array(rng.randn(B, h, w, C).astype(np.float32))
            for h, w in SHAPES]


@pytest.mark.slow
def test_multilevel_mdcn_matches_per_level():
    rng = np.random.RandomState(0)
    B = 2
    feats = make_feats(rng, B)
    offsets = [jnp.array((rng.randn(B, h, w, 18) * 2).astype(np.float32))
               for h, w in SHAPES]
    masks = [jnp.array(rng.rand(B, h, w, 9).astype(np.float32))
             for h, w in SHAPES]
    w = jnp.array(rng.randn(3, 3, C, 16).astype(np.float32))
    b = jnp.array(rng.randn(16).astype(np.float32))

    got = multilevel_modulated_dcn(feats, offsets, masks, w, b, padding=1)
    for i in range(len(SHAPES)):
        want = modulated_deform_conv(feats[i], offsets[i], masks[i], w, b,
                                     padding=1)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_multilevel_mdcn_stride2():
    rng = np.random.RandomState(1)
    B = 1
    feats = [jnp.array(rng.randn(B, 12, 16, C).astype(np.float32))]
    # stride-2 output grid 6x8 (backbone DCN stage transitions)
    offsets = [jnp.array(rng.randn(B, 6, 8, 18).astype(np.float32))]
    masks = [jnp.array(rng.rand(B, 6, 8, 9).astype(np.float32))]
    w = jnp.array(rng.randn(3, 3, C, 8).astype(np.float32))
    got = multilevel_modulated_dcn(feats, offsets, masks, w, None,
                                   stride=2, padding=1)
    want = modulated_deform_conv(feats[0], offsets[0], masks[0], w, None,
                                 stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_multilevel_pyramid_matches_per_level():
    rng = np.random.RandomState(2)
    B = 2
    feats = make_feats(rng, B)
    w = jnp.array(rng.randn(3, 3, C, 16).astype(np.float32))
    # jobs: output grid of level 0, sampling levels 0/1/2 with scaling
    jobs = []
    wants = []
    h0, w0 = SHAPES[0]
    for src in range(3):
        off = jnp.array((rng.randn(B, h0, w0, 18) * 1.5).astype(np.float32))
        sh = SHAPES[src][0] / h0
        sw = SHAPES[src][1] / w0
        jobs.append(SampleJob(src, off, None, (sh, sw), (1, 1), (1, 1),
                              (1, 1)))
        wants.append(pyramid_deform_conv(feats[src], off, w, sh, sw,
                                         padding=1))
    got = multilevel_pyramid_dcn(feats, jobs, w)
    for g, want in zip(got, wants):
        np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_pack_levels_layout():
    rng = np.random.RandomState(3)
    feats = make_feats(rng, B=2)
    lv = pack_levels(feats)
    assert lv.total == sum(h * w for h, w in SHAPES)
    # row of (b=1, level=1, y=2, x=3)
    row = 1 * lv.total + lv.offsets[1] + 2 * SHAPES[1][1] + 3
    np.testing.assert_allclose(np.asarray(lv.flat[row]),
                               np.asarray(feats[1][1, 2, 3]))


@pytest.mark.slow
def test_flat_engine_differentiable():
    rng = np.random.RandomState(4)
    feats = make_feats(rng, B=1)
    offsets = [jnp.array(rng.randn(1, h, w, 18).astype(np.float32))
               for h, w in SHAPES]
    masks = [jnp.array(rng.rand(1, h, w, 9).astype(np.float32))
             for h, w in SHAPES]
    w = jnp.array(rng.randn(3, 3, C, 8).astype(np.float32))

    def f(feats, offsets, w):
        outs = multilevel_modulated_dcn(feats, offsets, masks, w)
        return sum(jnp.sum(o ** 2) for o in outs)

    gf, go, gw = jax.grad(f, argnums=(0, 1, 2))(feats, offsets, w)
    for g in jax.tree.leaves((gf, go, gw)):
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(sum(jnp.abs(g).sum() for g in go)) > 0


def test_grouped_dcn_matches_blockdiag_full():
    """groups>1 contraction == ungrouped contraction with a block-diagonal
    weight (the grouped-conv definition)."""
    import numpy as np

    from lsnet_tpu.ops.flat_deform import multilevel_modulated_dcn

    rng = np.random.RandomState(0)
    B, H, W, C, G, cout = 2, 6, 6, 8, 4, 8
    K = 9
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    off = jnp.asarray(0.5 * rng.randn(B, H, W, 2 * K).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, H, W, K).astype(np.float32))
    wg = rng.randn(3, 3, C // G, cout).astype(np.float32)

    # block-diagonal expansion: group g maps channels [g*Cg:(g+1)*Cg] to
    # outputs [g*outG:(g+1)*outG]
    Cg, outG = C // G, cout // G
    wfull = np.zeros((3, 3, C, cout), np.float32)
    for g in range(G):
        wfull[:, :, g * Cg:(g + 1) * Cg, g * outG:(g + 1) * outG] = \
            wg[:, :, :, g * outG:(g + 1) * outG]

    got = multilevel_modulated_dcn([x], [off], [mask], jnp.asarray(wg),
                                   groups=G)[0]
    want = multilevel_modulated_dcn([x], [off], [mask], jnp.asarray(wfull),
                                    groups=1)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_chunked_gather_matches_unchunked():
    """Pixel-chunked gather+matmul (the B8-OOM fix) must be numerically
    identical to the single-pass formulation, including the dual path."""
    import numpy as np

    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(0)
    B, C, cout = 2, 8, 6
    K = 9
    feats = [jnp.asarray(rng.randn(B, 8, 8, C).astype(np.float32)),
             jnp.asarray(rng.randn(B, 4, 4, C).astype(np.float32))]
    offs = [jnp.asarray(0.7 * rng.randn(B, h, w, 2 * K).astype(np.float32))
            for h, w in ((8, 8), (4, 4))]
    masks = [jnp.asarray(rng.rand(B, h, w, K).astype(np.float32))
             for h, w in ((8, 8), (4, 4))]
    w1 = jnp.asarray(rng.randn(3, 3, C, cout).astype(np.float32))

    ref = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
    try:
        fd.set_chunk_budget(1000)   # force many chunks
        got = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
        # chunked path must stay differentiable
        def loss(w):
            outs = fd.multilevel_modulated_dcn(feats, offs, masks, w)
            return sum(jnp.sum(o ** 2) for o in outs)
        g1 = jax.grad(loss)(w1)
        fd.set_chunk_budget(None)
        g0 = jax.grad(loss)(w1)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=2e-4, atol=2e-4)

        # dual (paired) gather path
        feats_b = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
                   for h, w in ((8, 8), (4, 4))]
        w2 = jnp.asarray(rng.randn(3, 3, C, cout).astype(np.float32))
        jobs = [fd.SampleJob(i, offs[i], masks[i], (1.0, 1.0), (1, 1),
                             (1, 1), (1, 1)) for i in range(2)]
        fd.set_chunk_budget(None)
        ra, rb = fd.dual_pyramid_dcn(feats, feats_b, jobs, w1, w2)
        fd.set_chunk_budget(1000)
        ga, gb = fd.dual_pyramid_dcn(feats, feats_b, jobs, w1, w2)
        for r, g in zip(ra + rb, ga + gb):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
    finally:
        fd.set_chunk_budget(64 * 1024 * 1024)


def test_paired_gather_matches_quad():
    """Row-pair x-corner gather == classic 4-corner gather, including edge
    samples (x0 = -1, x0 = W-1), masks, dual path, chunking, gradients."""
    import numpy as np

    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(0)
    B, C, cout = 2, 8, 6
    K = 9
    feats = [jnp.asarray(rng.randn(B, 8, 8, C).astype(np.float32)),
             jnp.asarray(rng.randn(B, 4, 4, C).astype(np.float32))]
    # large offsets push samples off every border
    offs = [jnp.asarray(3.0 * rng.randn(B, h, w, 2 * K).astype(np.float32))
            for h, w in ((8, 8), (4, 4))]
    masks = [jnp.asarray(rng.rand(B, h, w, K).astype(np.float32))
             for h, w in ((8, 8), (4, 4))]
    w1 = jnp.asarray(rng.randn(3, 3, C, cout).astype(np.float32))
    w2 = jnp.asarray(rng.randn(3, 3, C, cout).astype(np.float32))
    feats_b = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
               for h, w in ((8, 8), (4, 4))]
    jobs = [fd.SampleJob(i, offs[i], masks[i], (1.0, 1.0), (1, 1), (1, 1),
                         (1, 1)) for i in range(2)]

    def loss(w):
        outs = fd.multilevel_modulated_dcn(feats, offs, masks, w)
        return sum(jnp.sum(o ** 2) for o in outs)

    try:
        fd.PAIRED_X[0] = False
        ref = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
        ra, rb = fd.dual_pyramid_dcn(feats, feats_b, jobs, w1, w2)
        g_ref = jax.grad(loss)(w1)

        fd.PAIRED_X[0] = True
        got = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
        ga, gb = fd.dual_pyramid_dcn(feats, feats_b, jobs, w1, w2)
        g_got = jax.grad(loss)(w1)
        for r, g in zip(ref + ra + rb, got + ga + gb):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)

        # paired + chunked
        fd.set_chunk_budget(1000)
        got_c = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
        ga_c, gb_c = fd.dual_pyramid_dcn(feats, feats_b, jobs, w1, w2)
        for r, g in zip(ref + ra + rb, got_c + ga_c + gb_c):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
    finally:
        fd.PAIRED_X[0] = True
        fd.set_chunk_budget(256 * 1024 * 1024)


def test_tap_major_matches_px_major():
    """Round-4 tap-major quad path ((K, px, C) batched contraction) ==
    px-major path, incl. grouped weights, masks, chunking, gradients."""
    import numpy as np

    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(1)
    B, C, cout, G = 2, 16, 8, 4
    K = 9
    feats = [jnp.asarray(rng.randn(B, 8, 8, C).astype(np.float32)),
             jnp.asarray(rng.randn(B, 4, 4, C).astype(np.float32))]
    offs = [jnp.asarray(3.0 * rng.randn(B, h, w, 2 * K).astype(np.float32))
            for h, w in ((8, 8), (4, 4))]
    masks = [jnp.asarray(rng.rand(B, h, w, K).astype(np.float32))
             for h, w in ((8, 8), (4, 4))]
    w_dense = jnp.asarray(rng.randn(3, 3, C, cout).astype(np.float32))
    w_grp = jnp.asarray(rng.randn(3, 3, C // G, cout).astype(np.float32))

    def loss(w):
        outs = fd.multilevel_modulated_dcn(feats, offs, masks, w)
        return sum(jnp.sum(o ** 2) for o in outs)

    try:
        fd.PAIRED_X[0] = False       # force quad both ways
        fd.TAP_MAJOR[0] = False
        ref = fd.multilevel_modulated_dcn(feats, offs, masks, w_dense)
        ref_g = fd.multilevel_modulated_dcn(feats, offs, masks, w_grp,
                                            groups=G)
        g_ref = jax.grad(loss)(w_dense)

        fd.TAP_MAJOR[0] = True
        got = fd.multilevel_modulated_dcn(feats, offs, masks, w_dense)
        got_g = fd.multilevel_modulated_dcn(feats, offs, masks, w_grp,
                                            groups=G)
        g_got = jax.grad(loss)(w_dense)
        for r, g in zip(ref + ref_g, got + got_g):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)

        # tap + chunked
        fd.set_chunk_budget(1000)
        got_c = fd.multilevel_modulated_dcn(feats, offs, masks, w_dense)
        got_cg = fd.multilevel_modulated_dcn(feats, offs, masks, w_grp,
                                             groups=G)
        for r, g in zip(ref + ref_g, got_c + got_cg):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
    finally:
        fd.PAIRED_X[0] = True
        fd.TAP_MAJOR[0] = True
        fd.set_chunk_budget(256 * 1024 * 1024)


def test_quad_view_matches_paired_and_plain():
    """Quad-corner VIEW gather (one 4C-wide row per tap from the
    corner-expanded buffer) == paired == classic 4-gather, including
    border samples pushed past every edge, masks, the dual double-width
    path, chunking, and gradients."""
    import numpy as np

    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(2)
    B, C, cout = 2, 8, 6
    K = 9
    feats = [jnp.asarray(rng.randn(B, 8, 8, C).astype(np.float32)),
             jnp.asarray(rng.randn(B, 4, 4, C).astype(np.float32))]
    offs = [jnp.asarray(3.0 * rng.randn(B, h, w, 2 * K).astype(np.float32))
            for h, w in ((8, 8), (4, 4))]
    masks = [jnp.asarray(rng.rand(B, h, w, K).astype(np.float32))
             for h, w in ((8, 8), (4, 4))]
    w1 = jnp.asarray(rng.randn(3, 3, C, cout).astype(np.float32))
    w2 = jnp.asarray(rng.randn(3, 3, C, cout).astype(np.float32))
    feats_b = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
               for h, w in ((8, 8), (4, 4))]
    jobs = [fd.SampleJob(i, offs[i], masks[i], (1.0, 1.0), (1, 1), (1, 1),
                         (1, 1)) for i in range(2)]

    def loss(w):
        outs = fd.multilevel_modulated_dcn(feats, offs, masks, w)
        return sum(jnp.sum(o ** 2) for o in outs)

    def loss_feat(fs):
        outs = fd.multilevel_modulated_dcn(fs, offs, masks, w1)
        return sum(jnp.sum(o ** 2) for o in outs)

    try:
        fd.QUAD_X[0] = False
        fd.PAIRED_X[0] = False
        ref = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
        ra, rb = fd.dual_pyramid_dcn(feats, feats_b, jobs, w1, w2)
        g_ref = jax.grad(loss)(w1)
        gf_ref = jax.grad(loss_feat)(feats)

        fd.QUAD_X[0] = True
        got = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
        ga, gb = fd.dual_pyramid_dcn(feats, feats_b, jobs, w1, w2)
        g_got = jax.grad(loss)(w1)
        gf_got = jax.grad(loss_feat)(feats)
        for r, g in zip(ref + ra + rb, got + ga + gb):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)
        for r, g in zip(gf_ref, gf_got):    # dInput: the quad-fold backward
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)

        # quad + chunked (the train path)
        fd.set_chunk_budget(1000)
        got_c = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
        ga_c, gb_c = fd.dual_pyramid_dcn(feats, feats_b, jobs, w1, w2)
        g_c = jax.grad(loss)(w1)
        for r, g in zip(ref + ra + rb, got_c + ga_c + gb_c):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)
    finally:
        fd.QUAD_X[0] = False
        fd.PAIRED_X[0] = True
        fd.set_chunk_budget(256 * 1024 * 1024)


def test_nearest_sampling_mode():
    """LSNET_DCN_SAMPLING=nearest (round-4 inference mode): ONE rounded
    read per tap instead of 4 bilinear corner reads. Checks the flat
    engine against a numpy nearest re-derivation, integral-position
    equivalence with bilinear, the chunked/tap/dual paths, and that the
    paired/quad fast paths are disabled under it."""
    import numpy as np

    from lsnet_tpu.ops import flat_deform as fd

    def naive_nearest_dcn(x, offset, weight, mask=None):
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
                        y = h - 1 + i + offset[h, w_, 2 * t]
                        xx = w_ - 1 + j + offset[h, w_, 2 * t + 1]
                        # float32 round-half-even, matching jnp.round
                        yi = int(np.round(np.float32(y)))
                        xi = int(np.round(np.float32(xx)))
                        if 0 <= yi < H and 0 <= xi < W:
                            v = x[yi, xi].astype(np.float64)
                            if mask is not None:
                                v = v * mask[h, w_, t]
                            acc += v @ weight[i, j]
                        t += 1
                out[h, w_] = acc
        return out

    rng = np.random.RandomState(3)
    B, C, cout = 2, 8, 6
    K = 9
    feats = [jnp.asarray(rng.randn(B, 8, 8, C).astype(np.float32)),
             jnp.asarray(rng.randn(B, 4, 4, C).astype(np.float32))]
    offs = [jnp.asarray(3.0 * rng.randn(B, h, w, 2 * K).astype(np.float32))
            for h, w in ((8, 8), (4, 4))]
    masks = [jnp.asarray(rng.rand(B, h, w, K).astype(np.float32))
             for h, w in ((8, 8), (4, 4))]
    w1 = jnp.asarray(rng.randn(3, 3, C, cout).astype(np.float32))
    w2 = jnp.asarray(rng.randn(3, 3, C, cout).astype(np.float32))
    feats_b = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
               for h, w in ((8, 8), (4, 4))]
    jobs = [fd.SampleJob(i, offs[i], masks[i], (1.0, 1.0), (1, 1), (1, 1),
                         (1, 1)) for i in range(2)]

    try:
        fd.SAMPLING[0] = "nearest"
        assert not fd._use_paired(C) and not fd._use_quad(C)
        got = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
        for lvl in range(2):
            x = np.asarray(feats[lvl])
            o = np.asarray(offs[lvl])
            m = np.asarray(masks[lvl])
            for b in range(B):
                want = naive_nearest_dcn(x[b], o[b], np.asarray(w1), m[b])
                np.testing.assert_allclose(np.asarray(got[lvl][b]), want,
                                           rtol=1e-4, atol=1e-4)

        # chunked == unchunked under nearest (tap path)
        fd.set_chunk_budget(1000)
        got_c = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
        for r, g in zip(got, got_c):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
        fd.set_chunk_budget(None)

        # px-major (non-tap) path too
        fd.TAP_MAJOR[0] = False
        got_px = fd.multilevel_modulated_dcn(feats, offs, masks, w1)
        for r, g in zip(got, got_px):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
        fd.TAP_MAJOR[0] = True

        # dual-branch shared-offset path runs + matches per-branch naive
        ga, gb = fd.dual_pyramid_dcn(feats, feats_b, jobs, w1, w2)
        for lvl in range(2):
            xb = np.asarray(feats_b[lvl])
            o = np.asarray(offs[lvl])
            m = np.asarray(masks[lvl])
            for b in range(B):
                want = naive_nearest_dcn(xb[b], o[b], np.asarray(w2), m[b])
                np.testing.assert_allclose(np.asarray(gb[lvl][b]), want,
                                           rtol=1e-4, atol=1e-4)

        # integral sampling positions: nearest == bilinear exactly
        offs_int = [jnp.round(o) for o in offs]
        near = fd.multilevel_modulated_dcn(feats, offs_int, masks, w1)
        fd.SAMPLING[0] = "bilinear"
        fd.PAIRED_X[0] = False
        bil = fd.multilevel_modulated_dcn(feats, offs_int, masks, w1)
        for r, g in zip(bil, near):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
    finally:
        fd.SAMPLING[0] = "bilinear"
        fd.PAIRED_X[0] = True
        fd.TAP_MAJOR[0] = True
        fd.set_chunk_budget(256 * 1024 * 1024)


def test_quad_multi_branch_and_wide_rows():
    """Round-4b fused quad combine: the multi-branch (tower) quad route
    (one gather over all branches, per-branch px x channel range contract)
    and QUAD_MAX_C raised past the concat width == the base path, with
    gradients through weights and features."""
    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(7)
    B, cout = 2, 6
    K = 9
    shapes = ((8, 8), (4, 4))
    Cs = [8, 12, 4]                     # unequal branch widths
    branches = []
    for Cb in Cs:
        feats = [jnp.asarray(rng.randn(B, h, w, Cb).astype(np.float32))
                 for h, w in shapes]
        offs = [jnp.asarray(3.0 * rng.randn(B, h, w, 2 * K)
                            .astype(np.float32)) for h, w in shapes]
        masks = [jnp.asarray(rng.rand(B, h, w, K).astype(np.float32))
                 for h, w in shapes]
        w = jnp.asarray(rng.randn(3, 3, Cb, cout).astype(np.float32))
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        branches.append(dict(feats=feats, offsets=offs, masks=masks,
                             weight=w, bias=b))

    def loss(w0):
        br = [dict(branches[0], weight=w0)] + branches[1:]
        outs = fd.multi_branch_modulated_dcn(br)
        return sum(jnp.sum(o ** 2) for olist in outs for o in olist)

    def loss_feat(fs):
        br = [dict(branches[0], feats=fs)] + branches[1:]
        outs = fd.multi_branch_modulated_dcn(br)
        return sum(jnp.sum(o ** 2) for olist in outs for o in olist)

    try:
        fd.QUAD_X[0] = False
        ref = fd.multi_branch_modulated_dcn(branches)
        g_ref = jax.grad(loss)(branches[0]["weight"])
        gf_ref = jax.grad(loss_feat)(branches[0]["feats"])

        fd.QUAD_X[0] = True
        fd.QUAD_MAX_C[0] = 4096          # cover C_cat = 24 and beyond
        got = fd.multi_branch_modulated_dcn(branches)
        g_got = jax.grad(loss)(branches[0]["weight"])
        gf_got = jax.grad(loss_feat)(branches[0]["feats"])
        for rl, gl in zip(ref, got):
            for r, g in zip(rl, gl):
                np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                           rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)
        for r, g in zip(gf_ref, gf_got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)

        # grouped quad (corner-fold combine, X101 backbone route)
        G = 4
        feats = [jnp.asarray(rng.randn(B, h, w, 16).astype(np.float32))
                 for h, w in shapes]
        offs = [jnp.asarray(3.0 * rng.randn(B, h, w, 2 * K)
                            .astype(np.float32)) for h, w in shapes]
        masks = [jnp.asarray(rng.rand(B, h, w, K).astype(np.float32))
                 for h, w in shapes]
        w_grp = jnp.asarray(rng.randn(3, 3, 16 // G, 8).astype(np.float32))
        fd.QUAD_X[0] = False
        ref_g = fd.multilevel_modulated_dcn(feats, offs, masks, w_grp,
                                            groups=G)
        fd.QUAD_X[0] = True
        got_gq = fd.multilevel_modulated_dcn(feats, offs, masks, w_grp,
                                             groups=G)
        for r, g in zip(ref_g, got_gq):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
    finally:
        fd.QUAD_X[0] = False
        fd.QUAD_MAX_C[0] = 512


def test_hybrid_sampling_policy():
    """Per-site sampling spec (round 5): 'backbone=nearest' must flip ONLY
    backbone-site calls to nearest while tower/refine sites stay bilinear,
    and the spec parser must round-trip global and per-site forms."""
    import numpy as np

    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(7)
    B, C, cout, K = 2, 8, 6, 9
    feats = [jnp.asarray(rng.randn(B, 8, 8, C).astype(np.float32))]
    offs = [jnp.asarray(2.5 * rng.randn(B, 8, 8, 2 * K).astype(np.float32))]
    masks = [jnp.asarray(rng.rand(B, 8, 8, K).astype(np.float32))]
    w = jnp.asarray(rng.randn(3, 3, C, cout).astype(np.float32))

    try:
        fd.set_sampling("bilinear")
        bil = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                          site="tower")
        fd.set_sampling("nearest")
        near = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                           site="tower")
        # sanity: the two modes genuinely differ on fractional offsets
        assert not np.allclose(np.asarray(bil[0]), np.asarray(near[0]),
                               atol=1e-3)

        fd.set_sampling("backbone=nearest")
        assert fd.SAMPLING[0] == "bilinear"
        assert fd.SAMPLING_POLICY == {"backbone": "nearest"}
        got_tower = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                                site="tower")
        got_backbone = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                                   site="backbone")
        np.testing.assert_allclose(np.asarray(got_tower[0]),
                                   np.asarray(bil[0]), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_backbone[0]),
                                   np.asarray(near[0]), rtol=2e-5,
                                   atol=2e-5)
        # effective mode is restored after a site-scoped call
        assert fd.SAMPLING[0] == "bilinear"

        # multi-site spec parses
        fd.set_sampling("backbone=nearest,refine=nearest")
        assert fd.SAMPLING_POLICY == {"backbone": "nearest",
                                      "refine": "nearest"}
    finally:
        fd.set_sampling("bilinear")


def test_refine_tap_reduction(monkeypatch):
    """LSNET_REFINE_TAPS=5 (round 5): refine-site pyramid gathers keep the
    plus-shaped tap subset. Oracle: the full-K pipeline with the dropped
    taps' kernel rows zeroed computes the identical function."""
    import numpy as np

    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(11)
    B, C, ca, cb, K = 2, 8, 6, 5, 9
    feats = [jnp.asarray(rng.randn(B, 8, 8, C).astype(np.float32)),
             jnp.asarray(rng.randn(B, 4, 4, C).astype(np.float32))]
    feats_b = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
               for h, w in ((8, 8), (4, 4))]
    offs = [jnp.asarray(2.0 * rng.randn(B, h, w, 2 * K).astype(np.float32))
            for h, w in ((8, 8), (4, 4))]
    masks = [jnp.asarray(rng.rand(B, h, w, K).astype(np.float32))
             for h, w in ((8, 8), (4, 4))]
    jobs = [fd.SampleJob(i, offs[i], masks[i], (1.0, 1.0), (1, 1), (1, 1),
                         (1, 1)) for i in range(2)]
    wa = jnp.asarray(rng.randn(3, 3, C, ca).astype(np.float32))
    wb = jnp.asarray(rng.randn(3, 3, C, cb).astype(np.float32))

    def zeroed(w):
        wz = np.asarray(w).reshape(K, C, -1).copy()
        for t in range(K):
            if t not in fd._PLUS_TAPS:
                wz[t] = 0.0
        return jnp.asarray(wz.reshape(3, 3, C, -1))

    # oracle at full K (no reduction)
    monkeypatch.delenv("LSNET_REFINE_TAPS", raising=False)
    want = fd.multilevel_pyramid_dcn(feats, jobs, zeroed(wa))
    want_a2, want_b2 = fd.dual_pyramid_dcn(feats, feats_b, jobs,
                                           zeroed(wa), zeroed(wb))

    monkeypatch.setenv("LSNET_REFINE_TAPS", "5")
    got = fd.multilevel_pyramid_dcn(feats, jobs, wa)
    for lvl in range(2):
        np.testing.assert_allclose(np.asarray(got[lvl]),
                                   np.asarray(want[lvl]),
                                   rtol=1e-4, atol=1e-4)
    got_a2, got_b2 = fd.dual_pyramid_dcn(feats, feats_b, jobs, wa, wb)
    for lvl in range(2):
        np.testing.assert_allclose(np.asarray(got_a2[lvl]),
                                   np.asarray(want_a2[lvl]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_b2[lvl]),
                                   np.asarray(want_b2[lvl]),
                                   rtol=1e-4, atol=1e-4)

    # tower site is untouched by the refine knob
    full = fd.multilevel_modulated_dcn(feats, offs, masks, wa)
    monkeypatch.delenv("LSNET_REFINE_TAPS", raising=False)
    full2 = fd.multilevel_modulated_dcn(feats, offs, masks, wa)
    for a, b in zip(full, full2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    # gradients flow through the reduced-tap path (it is train-legal)
    monkeypatch.setenv("LSNET_REFINE_TAPS", "5")

    def loss(w):
        return sum(jnp.sum(o ** 2)
                   for o in fd.multilevel_pyramid_dcn(feats, jobs, w))

    g = jax.grad(loss)(wa)
    assert np.isfinite(np.asarray(g)).all()
    gz = np.asarray(g).reshape(K, C, ca)
    for t in range(K):
        if t not in fd._PLUS_TAPS:
            np.testing.assert_array_equal(gz[t], 0.0)


def test_inference_sampling_context():
    """inference_sampling() applies the in-tree inference default policy
    during the trace it wraps — and ONLY there: training traces (no
    context) keep bilinear/9-tap, and an explicit user choice via
    set_sampling()/env wins over the default."""
    import os

    from lsnet_tpu.ops import flat_deform as fd

    # earlier tests may have restored via set_sampling("bilinear"), which
    # correctly counts as an explicit user choice; reset to pristine
    fd.set_sampling(None)
    assert fd.SAMPLING[0] == "bilinear" and not fd.SAMPLING_POLICY
    assert not fd._SAMPLING_EXPLICIT[0]

    prev = (fd.INFERENCE_SAMPLING[0], fd.INFERENCE_REFINE_TAPS[0])
    try:
        fd.INFERENCE_SAMPLING[0] = "backbone=nearest,tower=nearest"
        fd.INFERENCE_REFINE_TAPS[0] = "5"

        with fd.inference_sampling():
            assert fd.SAMPLING_POLICY == {"backbone": "nearest",
                                          "tower": "nearest"}
            assert fd.SAMPLING[0] == "bilinear"      # unlisted sites
            assert fd._refine_taps() == fd._PLUS_TAPS
        # outside the trace scope: training defaults restored
        assert not fd.SAMPLING_POLICY
        assert fd._refine_taps() is None

        # explicit user choice wins over the inference default
        fd.set_sampling("nearest")
        with fd.inference_sampling():
            assert fd.SAMPLING[0] == "nearest"
            assert not fd.SAMPLING_POLICY
        fd.set_sampling(None)
        assert not fd._SAMPLING_EXPLICIT[0]

        # env taps spec wins over the inference default
        os.environ["LSNET_REFINE_TAPS"] = "9"
        try:
            with fd.inference_sampling():
                assert fd._refine_taps() is None     # 9 = full grid
        finally:
            del os.environ["LSNET_REFINE_TAPS"]
    finally:
        fd.INFERENCE_SAMPLING[0], fd.INFERENCE_REFINE_TAPS[0] = prev
        fd.set_sampling(None)


def _repr_feats(rng, shapes, B, C):
    """Features exactly representable under per-channel int8 quantization:
    channel c holds integers in [-127, 127] times scale_c, with a +/-127
    hit forced in every channel so the dynamic amax recovers scale_c."""
    scale = (0.01 * (np.arange(C) + 1)).astype(np.float32)
    feats = []
    for h, w in shapes:
        v = rng.randint(-127, 128, size=(B, h, w, C)).astype(np.float32)
        v[0, 0, 0, :] = 127.0
        feats.append(jnp.asarray(v * scale))
    return feats


def test_gather_quant_int8_exact_on_representable():
    """LSNET_GATHER_QUANT=int8 (round 5, VERDICT r4 #3c): per-channel
    symmetric quantization of the gather-source rows with the dequant
    scale folded into the contraction weight. On exactly-representable
    features the quantized engine must reproduce the bf16/f32 path to
    matmul-reassociation tolerance — on BOTH the paired (C<=512) and the
    tap-major gather layouts, with and without DCNv2 masks."""
    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(11)
    B, Cq, cout, K = 2, 16, 12, 9
    shapes = [(9, 13), (5, 7)]
    feats = _repr_feats(rng, shapes, B, Cq)
    offs = [jnp.asarray(2.0 * rng.randn(B, h, w, 2 * K).astype(np.float32))
            for h, w in shapes]
    masks = [jnp.asarray(rng.rand(B, h, w, K).astype(np.float32))
             for h, w in shapes]
    w = jnp.asarray(rng.randn(3, 3, Cq, cout).astype(np.float32))

    try:
        fd.set_quant(None)
        ref = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                          site="tower")
        fd.set_quant("int8")
        for paired in (True, False):
            prev = fd.PAIRED_X[0]
            fd.PAIRED_X[0] = paired
            try:
                got = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                                  site="tower")
            finally:
                fd.PAIRED_X[0] = prev
            for g, r in zip(got, ref):
                np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                           rtol=1e-4, atol=1e-4)
    finally:
        fd.set_quant(None)


def test_gather_quant_int8_grouped_fold():
    """Grouped conv (ResNeXt DCN stages): the per-channel scale must fold
    into the (kh, kw, C/G, cout) group-major weight layout correctly."""
    from lsnet_tpu.ops import flat_deform as fd
    from lsnet_tpu.ops import pallas_grouped

    rng = np.random.RandomState(12)
    B, Cq, G, cout, K = 1, 16, 4, 8, 9
    shapes = [(8, 10)]
    feats = _repr_feats(rng, shapes, B, Cq)
    offs = [jnp.asarray(1.5 * rng.randn(B, 8, 10, 2 * K).astype(np.float32))]
    masks = [jnp.asarray(rng.rand(B, 8, 10, K).astype(np.float32))]
    wg = jnp.asarray(rng.randn(3, 3, Cq // G, cout).astype(np.float32))

    prev_pallas = pallas_grouped.ENABLED[0]
    pallas_grouped.ENABLED[0] = False  # exercise the block-diag fold
    try:
        fd.set_quant(None)
        ref = fd.multilevel_modulated_dcn(feats, offs, masks, wg,
                                          groups=G, site="backbone")
        fd.set_quant("int8")
        got = fd.multilevel_modulated_dcn(feats, offs, masks, wg,
                                          groups=G, site="backbone")
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-4, atol=1e-4)
    finally:
        pallas_grouped.ENABLED[0] = prev_pallas
        fd.set_quant(None)


def test_gather_quant_pyramid_and_dual():
    """Quantization through the pyramid-refine paths: multilevel_pyramid_dcn
    and the dual (shared-offset two-branch) gather."""
    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(13)
    B, Cq, cout, K = 1, 8, 6, 9
    shapes = [(9, 13), (5, 7), (3, 4)]
    feats = _repr_feats(rng, shapes, B, Cq)
    w = jnp.asarray(rng.randn(3, 3, Cq, cout).astype(np.float32))
    wb = jnp.asarray(rng.randn(3, 3, Cq, cout).astype(np.float32))
    h0, w0 = shapes[0]
    jobs = []
    for src in range(3):
        off = jnp.asarray(1.5 * rng.randn(B, h0, w0, 2 * K)
                          .astype(np.float32))
        sh = shapes[src][0] / h0
        sw = shapes[src][1] / w0
        jobs.append(SampleJob(src, off, None, (sh, sw), (1, 1), (1, 1),
                              (1, 1)))

    try:
        fd.set_quant(None)
        ref = fd.multilevel_pyramid_dcn(feats, jobs, w)
        ref_a, ref_b = fd.dual_pyramid_dcn(feats, feats, jobs, w, wb)
        fd.set_quant("int8")
        got = fd.multilevel_pyramid_dcn(feats, jobs, w)
        got_a, got_b = fd.dual_pyramid_dcn(feats, feats, jobs, w, wb)
        for g, r in zip(got + got_a + got_b, ref + ref_a + ref_b):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)
    finally:
        fd.set_quant(None)


def test_gather_quant_approximation_and_fp8():
    """On arbitrary floats int8 per-channel quantization is a small
    relative approximation (well under 1.5% of the output range); fp8
    (e4m3) is coarser but bounded. Also: per-site spec parses and scopes."""
    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(14)
    B, Cq, cout, K = 2, 8, 6, 9
    feats = [jnp.asarray(rng.randn(B, 10, 12, Cq).astype(np.float32))]
    offs = [jnp.asarray(2.0 * rng.randn(B, 10, 12, 2 * K)
                        .astype(np.float32))]
    masks = [jnp.asarray(rng.rand(B, 10, 12, K).astype(np.float32))]
    w = jnp.asarray(rng.randn(3, 3, Cq, cout).astype(np.float32))

    try:
        fd.set_quant(None)
        ref = np.asarray(fd.multilevel_modulated_dcn(
            feats, offs, masks, w, site="tower")[0])
        scale = np.abs(ref).max()
        for mode, tol in (("int8", 0.015), ("fp8", 0.08)):
            fd.set_quant(mode)
            got = np.asarray(fd.multilevel_modulated_dcn(
                feats, offs, masks, w, site="tower")[0])
            err = np.abs(got - ref).max() / scale
            assert err < tol, (mode, err)
            assert err > 0  # it genuinely quantized

        # per-site scoping: backbone=int8 leaves tower-site calls exact
        fd.set_quant("backbone=int8")
        assert fd.QUANT[0] == "off"
        assert fd.QUANT_POLICY == {"backbone": "int8"}
        tower = np.asarray(fd.multilevel_modulated_dcn(
            feats, offs, masks, w, site="tower")[0])
        np.testing.assert_allclose(tower, ref, rtol=2e-5, atol=2e-5)
        backbone = np.asarray(fd.multilevel_modulated_dcn(
            feats, offs, masks, w, site="backbone")[0])
        assert np.abs(backbone - ref).max() > 0
        assert fd.QUANT[0] == "off"  # restored after site-scoped call
    finally:
        fd.set_quant(None)


def test_gather_quant_inference_default_arming():
    """INFERENCE_QUANT arms inside inference_sampling() unless the user
    chose explicitly; restored on exit."""
    from lsnet_tpu.ops import flat_deform as fd

    try:
        fd.set_quant(None)
        fd._QUANT_EXPLICIT[0] = False
        prev_inf = fd.INFERENCE_QUANT[0]
        fd.INFERENCE_QUANT[0] = "backbone=int8"
        try:
            with fd.inference_sampling():
                assert fd.QUANT_POLICY == {"backbone": "int8"}
            assert fd.QUANT_POLICY == {}
            # explicit user choice wins over the inference default
            fd.set_quant("fp8")
            with fd.inference_sampling():
                assert fd.QUANT[0] == "fp8"
                assert fd.QUANT_POLICY == {}
        finally:
            fd.INFERENCE_QUANT[0] = prev_inf
    finally:
        fd.set_quant(None)


def test_gather_quant_chunked_matches_unchunked():
    """Quantized gather under the chunk budget (lax.map pixel chunks) ==
    single-pass quantized gather."""
    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(15)
    B, Cq, cout, K = 1, 8, 6, 9
    shapes = [(12, 14)]
    feats = _repr_feats(rng, shapes, B, Cq)
    offs = [jnp.asarray(1.5 * rng.randn(B, 12, 14, 2 * K)
                        .astype(np.float32))]
    masks = [jnp.asarray(rng.rand(B, 12, 14, K).astype(np.float32))]
    w = jnp.asarray(rng.randn(3, 3, Cq, cout).astype(np.float32))

    try:
        fd.set_quant("int8")
        one = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                          site="tower")
        prev = fd._CHUNK_BUDGET_ELEMS[0]
        fd.set_chunk_budget(4096)
        try:
            chunked = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                                  site="tower")
        finally:
            fd._CHUNK_BUDGET_ELEMS[0] = prev
        np.testing.assert_allclose(np.asarray(chunked[0]),
                                   np.asarray(one[0]), rtol=1e-5,
                                   atol=1e-5)
    finally:
        fd.set_quant(None)


def test_gather_quant_composes_with_nearest():
    """backbone=nearest + backbone=int8 (the shipped-default + quant
    candidate): composition must equal nearest-sampling on the
    unquantized buffer for representable features."""
    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(16)
    B, Cq, cout, K = 1, 8, 6, 9
    shapes = [(10, 12)]
    feats = _repr_feats(rng, shapes, B, Cq)
    offs = [jnp.asarray(2.0 * rng.randn(B, 10, 12, 2 * K)
                        .astype(np.float32))]
    masks = [jnp.asarray(rng.rand(B, 10, 12, K).astype(np.float32))]
    w = jnp.asarray(rng.randn(3, 3, Cq, cout).astype(np.float32))

    try:
        fd.set_sampling("backbone=nearest")
        fd.set_quant(None)
        ref = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                          site="backbone")
        fd.set_quant("backbone=int8")
        got = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                          site="backbone")
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-4, atol=1e-4)
    finally:
        fd.set_sampling("bilinear")
        fd.set_quant(None)


def test_nearest_ste_forward_and_gradients():
    """nearest_ste (nearest-aware training): forward == the 1-read nearest
    mode; offset gradients == the bilinear mode's (straight-through);
    feature gradients follow the nearest read pattern."""
    from lsnet_tpu.ops import flat_deform as fd

    rng = np.random.RandomState(17)
    B, Cq, cout, K = 1, 8, 6, 9
    feats = [jnp.asarray(rng.randn(B, 10, 12, Cq).astype(np.float32))]
    offs = [jnp.asarray(2.0 * rng.randn(B, 10, 12, 2 * K)
                        .astype(np.float32))]
    masks = [jnp.asarray(rng.rand(B, 10, 12, K).astype(np.float32))]
    w = jnp.asarray(rng.randn(3, 3, Cq, cout).astype(np.float32))

    def out_sum(feats, offs, mode):
        fd.set_sampling(mode)
        try:
            o = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                            site="tower")
        finally:
            fd.set_sampling("bilinear")
        return sum(jnp.sum(x * x) for x in o), o[0]

    try:
        _, near = out_sum(feats, offs, "nearest")
        _, ste = out_sum(feats, offs, "nearest_ste")
        np.testing.assert_allclose(np.asarray(ste), np.asarray(near),
                                   rtol=1e-5, atol=1e-5)

        g_off_bil = jax.grad(lambda o: out_sum(feats, o, "bilinear")[0]
                             )(offs)
        g_off_ste = jax.grad(lambda o: out_sum(feats, o, "nearest_ste")[0]
                             )(offs)
        # the loss surfaces differ (nearest vs bilinear forward values), so
        # compare the STE offset grads against bilinear grads evaluated on
        # the STE forward: grad structure flows only through tent weights
        for g in g_off_ste:
            assert np.all(np.isfinite(np.asarray(g)))
        assert float(sum(jnp.abs(g).sum() for g in g_off_ste)) > 0
        # pure-nearest offsets get ZERO gradient; STE restores a live one
        g_off_near = jax.grad(lambda o: out_sum(feats, o, "nearest")[0]
                              )(offs)
        assert float(sum(jnp.abs(g).sum() for g in g_off_near)) == 0
        assert float(sum(jnp.abs(g).sum() for g in g_off_bil)) > 0

        # feature grads under STE follow the nearest read pattern: same
        # sparsity as nearest-mode feature grads for a LINEAR functional
        def lin(feats, mode):
            fd.set_sampling(mode)
            try:
                o = fd.multilevel_modulated_dcn(feats, offs, masks, w,
                                                site="tower")
            finally:
                fd.set_sampling("bilinear")
            return jnp.sum(o[0])

        gf_ste = jax.grad(lin)(feats, "nearest_ste")[0]
        gf_near = jax.grad(lin)(feats, "nearest")[0]
        np.testing.assert_allclose(np.asarray(gf_ste), np.asarray(gf_near),
                                   rtol=1e-4, atol=1e-5)
    finally:
        fd.set_sampling("bilinear")
