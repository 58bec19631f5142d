"""Pallas TPU kernel: scalar-prefetch DMA-gather + corner-fold contraction.

The measured end-to-end wall of the DCN formulation is the XLA:TPU gather
unit (~250 GB/s ceiling on v5e vs the 819 GB/s HBM envelope — rate matrix
in docs/PERF.md round 4). XLA fuses the 4-corner gather-accumulate into
the contraction's operand read, but the gather itself still runs on the
descriptor-rate-bound gather path. This kernel goes the other way around
(VERDICT r3 #1): the row indices ride scalar-prefetch (SMEM, available
before the body runs), feature rows are DMA-copied HBM->VMEM with
``make_async_copy`` (per-row async copies issued back-to-back — this does
NOT need Mosaic vector gather), corner weights and the contraction apply
in VMEM, and only the (px, cout) result is written. The (px, K*4C) patch
tensor never exists in HBM and the source rows move at DMA-engine rate,
not gather-unit rate.

Math contract = ``flat_deform._tap_quad_contract`` single-range
``fold=False`` case (the stacked-weight quad path; reference semantics
``mmdet/ops/dcn/src/cuda/deform_conv_cuda_kernel.cu:249-302``):

    out[px] = sum_k (qflat[idx[k, px]].reshape(4, C) * w4[k, px, :, None])
                  .reshape(4C) @ wstk[k]

STATUS ON THIS STACK: the axon remote-compile helper 500s on ANY kernel
using manual DMA primitives / ``pl.ANY`` refs (bisected round 4 — even a
single static-row ``make_async_copy`` with no scalar prefetch fails,
while plain-BlockSpec kernels like ``pallas_grouped`` compile fine). The
kernel is therefore parity-tested in interpret mode (CPU), probed on TPU
at import of the flag (``tools/probe_dma.py``), and gated default-OFF
behind ``LSNET_PALLAS_DMA_GATHER=1`` until the toolchain's manual-DMA
path works. When it opens, this is the only route past the gather-unit
ceiling toward HBM speed-of-light.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ENABLED = [os.environ.get("LSNET_PALLAS_DMA_GATHER", "0") == "1"]

# px-tile: one DMA burst of TPX rows per (tile, tap) grid step.
TPX = 128

# VMEM budget for the resident blocks (rows scratch + one tap of the
# stacked weight + out tile), leaving headroom for Mosaic's own buffers.
_VMEM_BUDGET = 12 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(C4: int, cout: int, dtype) -> bool:
    """Shapes whose resident blocks fit the VMEM budget."""
    bpe = jnp.dtype(dtype).itemsize
    rows = TPX * C4 * bpe
    wblk = C4 * cout * bpe
    out = TPX * cout * 4
    return rows + wblk + out <= _VMEM_BUDGET and C4 % 8 == 0 \
        and cout % 128 == 0


def _kernel(idx_ref, qflat_ref, w4_ref, wstk_ref, out_ref, rows, sem,
            *, tpx: int, c4: int):
    """Grid (tiles, K); k innermost so the out tile accumulates in VMEM."""
    t = pl.program_id(0)
    k = pl.program_id(1)
    base = t * tpx

    def start(p, _):
        pltpu.make_async_copy(qflat_ref.at[idx_ref[k, base + p]],
                              rows.at[p], sem.at[p]).start()
        return 0

    jax.lax.fori_loop(0, tpx, start, 0)

    def wait(p, _):
        pltpu.make_async_copy(qflat_ref.at[0], rows.at[p], sem.at[p]).wait()
        return 0

    jax.lax.fori_loop(0, tpx, wait, 0)

    v = rows[:].reshape(tpx, 4, c4 // 4)
    v = v * w4_ref[0].reshape(tpx, 4, 1).astype(v.dtype)
    contrib = jax.lax.dot(v.reshape(tpx, c4), wstk_ref[0],
                          preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = contrib

    @pl.when(k > 0)
    def _acc():
        out_ref[:] += contrib


def _dma_quad_contract_impl(qflat: Array, idx: Array, w4: Array,
                            wstk: Array) -> Array:
    """out (px, cout) f32. qflat (rows, 4C); idx (K, px) int32;
    w4 (K, px, 4) f32; wstk (K, 4C, cout)."""
    K, px = idx.shape
    C4 = qflat.shape[-1]
    cout = wstk.shape[-1]
    pad = (-px) % TPX
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        w4 = jnp.pad(w4, ((0, 0), (0, pad), (0, 0)))
    tiles = (px + pad) // TPX

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles, K),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # qflat: HBM
            pl.BlockSpec((1, TPX, 4), lambda t, k, idx: (k, t, 0)),
            pl.BlockSpec((1, C4, cout), lambda t, k, idx: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TPX, cout), lambda t, k, idx: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((TPX, C4), qflat.dtype),
            pltpu.SemaphoreType.DMA((TPX,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tpx=TPX, c4=C4),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles * TPX, cout), jnp.float32),
        interpret=_interpret(),
    )(idx, qflat, w4, wstk)
    return out[:px]


def _xla_quad_contract(qflat: Array, idx: Array, w4: Array,
                       wstk: Array) -> Array:
    """Reference XLA path (same math; used for the backward)."""
    K, px = idx.shape
    C4 = qflat.shape[-1]
    g = qflat[idx.reshape(-1)].reshape(K, px, C4)
    v = g.reshape(K, px, 4, C4 // 4) * w4[..., None].astype(g.dtype)
    return jax.lax.dot_general(
        v.reshape(K, px, C4), wstk, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).sum(axis=0)


@jax.custom_vjp
def dma_quad_contract(qflat: Array, idx: Array, w4: Array,
                      wstk: Array) -> Array:
    """DMA-gather fused quad contraction; backward via the XLA path."""
    return _dma_quad_contract_impl(qflat, idx, w4, wstk)


def _fwd(qflat, idx, w4, wstk):
    return _dma_quad_contract_impl(qflat, idx, w4, wstk), \
        (qflat, idx, w4, wstk)


def _bwd(res, dout):
    qflat, idx, w4, wstk = res
    _, vjp = jax.vjp(
        lambda f, w, wk: _xla_quad_contract(f, idx, w, wk),
        qflat, w4, wstk)
    dq, dw4, dwstk = vjp(dout)
    return dq, None, dw4, dwstk


dma_quad_contract.defvjp(_fwd, _bwd)


def probe() -> bool:
    """Compile-and-run the minimal manual-DMA kernel on the current
    backend; returns False on the toolchain failure documented above."""
    try:
        def k(x_ref, o_ref, scratch, sem_ref):
            dma = pltpu.make_async_copy(x_ref.at[0], scratch.at[0],
                                        sem_ref)
            dma.start()
            dma.wait()
            o_ref[:] = scratch[:]

        x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        out = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            interpret=_interpret(),
        )(x)
        return bool(np.allclose(np.asarray(out)[0], np.asarray(x)[0]))
    except Exception:
        return False
