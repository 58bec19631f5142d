"""Parity tests: Pallas grouped deform contraction vs the dense
block-diagonal XLA path (fwd + bwd). Run in interpret mode on CPU; the
same kernels compile on TPU (driven by the flagship bench)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _dense_ref(vals, weight, K, groups):
    """Dense block-diag reference (flat_deform._blockdiag_weight takes the
    (kh, kw, Cg, cout) conv layout; our kernel API folds kh*kw -> K)."""
    from lsnet_tpu.ops.flat_deform import _blockdiag_weight
    kh = int(np.sqrt(K))
    w4 = weight.reshape(kh, K // kh, weight.shape[1], weight.shape[2])
    wmat = _blockdiag_weight(w4, K, groups)
    return jax.lax.dot_general(vals, wmat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32
                               ).astype(vals.dtype)


CASES = [
    # (px, K, C, groups, cout) — X101 stage2/3/4-like, plus odd tiles
    (64, 9, 512, 4, 512),
    (96, 9, 256, 2, 256),
    (40, 4, 256, 2, 512),      # px not a multiple of the tile
]


@pytest.mark.parametrize("px,K,C,G,cout", CASES)
def test_forward_parity(px, K, C, G, cout):
    from lsnet_tpu.ops.pallas_grouped import (grouped_deform_contract,
                                              supported)
    assert supported(K, C, G, cout)
    rng = np.random.RandomState(0)
    vals = jnp.asarray(rng.randn(px, K * C).astype(np.float32))
    w = jnp.asarray(rng.randn(K, C // G, cout).astype(np.float32) * 0.05)
    out = grouped_deform_contract(vals, w, K, G)
    ref = _dense_ref(vals, w, K, G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_backward_parity():
    from lsnet_tpu.ops.pallas_grouped import grouped_deform_contract
    px, K, C, G, cout = 48, 9, 256, 2, 256
    rng = np.random.RandomState(1)
    vals = jnp.asarray(rng.randn(px, K * C).astype(np.float32))
    w = jnp.asarray(rng.randn(K, C // G, cout).astype(np.float32) * 0.05)

    def f_pallas(v, w):
        return jnp.sum(grouped_deform_contract(v, w, K, G) ** 2)

    def f_ref(v, w):
        return jnp.sum(_dense_ref(v, w, K, G) ** 2)

    gv_p, gw_p = jax.grad(f_pallas, argnums=(0, 1))(vals, w)
    gv_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(vals, w)
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_supported_gate():
    from lsnet_tpu.ops.pallas_grouped import sub_groups, supported
    # X101 shapes
    assert supported(9, 512, 64, 512)      # stage2: sub=16
    assert sub_groups(64, 512) == 16
    assert supported(9, 1024, 64, 1024)    # stage3: sub=8
    assert sub_groups(64, 1024) == 8
    assert supported(9, 2048, 64, 2048)    # stage4: sub=4
    assert sub_groups(64, 2048) == 4
    # ungrouped / ragged shapes fall back
    assert not supported(9, 512, 1, 512)
    assert not supported(9, 96, 3, 96)
