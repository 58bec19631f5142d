"""Parity tests for the scalar-prefetch DMA-gather kernel.

These run in Pallas interpret mode on CPU (the test harness forces the
CPU backend). Since round 5 the TPU compile path is open — the 8-row-
aligned layout satisfies Mosaic's slice-tiling constraint
(``tools/probe_dma2.py``); on-chip rate measurement is
``tools/bench_dma_gather.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsnet_tpu.ops import pallas_dma_gather as pdg


def _case(seed, K=9, px=300, C=64, cout=128, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    rows = 500
    qflat = jnp.asarray(rng.randn(rows, 4 * C), dtype)
    idx = jnp.asarray(rng.randint(0, rows, (K, px)), jnp.int32)
    w4 = jnp.asarray(rng.rand(K, px, 4), jnp.float32)
    wstk = jnp.asarray(rng.randn(4 * C, cout) / np.sqrt(4 * C), dtype)
    wstk = jnp.broadcast_to(wstk, (K, 4 * C, cout))
    return qflat, idx, w4, wstk


def test_forward_parity():
    qflat, idx, w4, wstk = _case(0)
    got = pdg.dma_quad_contract(qflat, idx, w4, wstk)
    want = pdg._xla_quad_contract(qflat, idx, w4, wstk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_forward_parity_bf16_unaligned_px():
    # px not a TPX multiple exercises the pad-and-trim path; bf16 is the
    # production dtype.
    qflat, idx, w4, wstk = _case(1, px=333, dtype=jnp.bfloat16)
    got = pdg.dma_quad_contract(qflat, idx, w4, wstk)
    want = pdg._xla_quad_contract(qflat, idx, w4, wstk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-1)


def test_forward_parity_flagship_shape():
    # the shape the flagship actually routes (C=256 -> C4=1024, sub-row
    # width 128): the only case `supported()` admits on TPU
    qflat, idx, w4, wstk = _case(3, K=9, px=200, C=256, cout=256,
                                 dtype=jnp.bfloat16)
    assert pdg.supported(4 * 256, 256, jnp.bfloat16)
    got = pdg.dma_quad_contract(qflat, idx, w4, wstk)
    want = pdg._xla_quad_contract(qflat, idx, w4, wstk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-1)


def test_grad_parity():
    qflat, idx, w4, wstk = _case(2, K=4, px=150, C=32, cout=128)

    def loss_k(f, w, wk):
        return jnp.sum(pdg.dma_quad_contract(f, idx, w, wk) ** 2)

    def loss_x(f, w, wk):
        return jnp.sum(pdg._xla_quad_contract(f, idx, w, wk) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(qflat, w4, wstk)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(qflat, w4, wstk)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def test_probe_runs_on_cpu():
    # On CPU interpret mode the minimal manual-DMA kernel must work; on a
    # TPU stack this same probe gates LSNET_PALLAS_DMA_GATHER.
    assert pdg.probe()


def test_supported_budget():
    assert pdg.supported(4 * 256, 256, jnp.bfloat16)
    assert not pdg.supported(4 * 4096, 4096, jnp.float32)


def test_px_chunking(monkeypatch):
    # px > PX_CALL splits the scalar-prefetch array across pallas_calls
    # (SMEM is 1 MB; 9 x 16384 x s32 measured 1.1 KB over it on-chip)
    monkeypatch.setattr(pdg, "PX_CALL", 128)
    qflat, idx, w4, wstk = _case(4, px=300)
    got = pdg.dma_quad_contract(qflat, idx, w4, wstk)
    want = pdg._xla_quad_contract(qflat, idx, w4, wstk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
