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

STATUS (round 5): the round-4 toolchain block (HTTP 500 on any manual-DMA
kernel) is GONE — ``tools/probe_dma.py`` passes. Mosaic instead enforces
that HBM memref slices move >=8 sublanes at a time ("Slice shape along
dimension 0 must be aligned to tiling (8)"), so a per-pixel single-row
copy is illegal. The kernel therefore views the gather source as
``qflat.reshape(rows*8, C4//8)``: one logical row = one 8-row-aligned
``(8, C4//8)`` block (same bytes, legal slice), gathered rows land in a
``(TPX, 8, C4//8)`` VMEM scratch, and the contraction runs as 8 per-sub-
row MXU dots with f32 accumulate. All three primitives probe OK on-chip
(``tools/probe_dma2.py``, docs/perf/r5/probe_dma2.log). Still gated
behind ``LSNET_PALLAS_DMA_GATHER=1`` pending the on-chip rate
measurement (per-row DMA descriptors are 2 KB each; whether descriptor
issue beats the ~250 GB/s XLA gather unit is an empirical question —
``tools/bench_dma_gather.py``).
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

# px per pallas_call: the scalar-prefetch idx array is SMEM-resident
# (1 MB total); K=9 x 8192 x s32 = 288 KB leaves headroom for program
# scalars + register spills (16384 px measured 1.1 KB over the 1 MB cap).
PX_CALL = 8192

# VMEM budget for the resident blocks (rows scratch + one tap of the
# stacked weight + out tile), leaving headroom for Mosaic's own buffers.
_VMEM_BUDGET = 12 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(C4: int, cout: int, dtype) -> bool:
    """Shapes whose resident blocks fit the VMEM budget and satisfy the
    Mosaic slice-alignment constraint: the 8-row-aligned view needs the
    sub-row width ``C4/8`` to be a whole number of 128-lane vectors."""
    bpe = jnp.dtype(dtype).itemsize
    rows = TPX * C4 * bpe
    wblk = C4 * cout * bpe
    out = TPX * cout * 4
    return rows + wblk + out <= _VMEM_BUDGET and C4 % (8 * 128) == 0 \
        and cout % 128 == 0


def _kernel(idx_ref, qflat8_ref, w8_ref, wstk8_ref, out_ref, rows, sem,
            *, tpx: int):
    """Grid (tiles, K); k innermost so the out tile accumulates in VMEM.

    ``qflat8`` is the 8-row-aligned HBM view (rows*8, C4/8); one logical
    row is the (8, C4/8) block at ``idx*8``.  ``rows`` scratch is
    (tpx, 8, C4/8); the contraction runs as 8 per-sub-row dots against
    ``wstk8`` (K, 8, C4/8, cout), each sub-row pre-scaled by its corner
    weight (``w8`` = w4 repeated onto sub-rows; C4 = 4C so each corner is
    exactly 2 sub-rows)."""
    t = pl.program_id(0)
    k = pl.program_id(1)
    base = t * tpx

    def start(p, _):
        pltpu.make_async_copy(
            qflat8_ref.at[pl.ds(idx_ref[k, base + p] * 8, 8)],
            rows.at[p], sem.at[p]).start()
        return 0

    jax.lax.fori_loop(0, tpx, start, 0)

    def wait(p, _):
        pltpu.make_async_copy(qflat8_ref.at[pl.ds(0, 8)], rows.at[p],
                              sem.at[p]).wait()
        return 0

    jax.lax.fori_loop(0, tpx, wait, 0)

    contrib = None
    for j in range(8):
        v = rows[:, j, :] * w8_ref[0, :, j][:, None].astype(rows.dtype)
        d = jax.lax.dot(v, wstk8_ref[0, j],
                        preferred_element_type=jnp.float32)
        contrib = d if contrib is None else contrib + d

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
    if px > PX_CALL:
        # bound the SMEM-resident scalar-prefetch array per call
        pad = (-px) % PX_CALL
        if pad:
            idx = jnp.pad(idx, ((0, 0), (0, pad)))
            w4 = jnp.pad(w4, ((0, 0), (0, pad), (0, 0)))
        n = (px + pad) // PX_CALL
        idx_c = idx.reshape(K, n, PX_CALL).transpose(1, 0, 2)
        w4_c = w4.reshape(K, n, PX_CALL, 4).transpose(1, 0, 2, 3)
        out = jax.lax.map(
            lambda a: _dma_quad_contract_impl(qflat, a[0], a[1], wstk),
            (idx_c, w4_c))
        return out.reshape(n * PX_CALL, -1)[:px]
    C4 = qflat.shape[-1]
    cout = wstk.shape[-1]
    sub = C4 // 8
    pad = (-px) % TPX
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        w4 = jnp.pad(w4, ((0, 0), (0, pad), (0, 0)))
    tiles = (px + pad) // TPX

    # same bytes, 8-row-aligned slice granularity (free reshape)
    qflat8 = qflat.reshape(-1, sub)
    # corner weight per sub-row: C4 = 4C, sub = C/2 -> corner j//2
    w8 = jnp.repeat(w4, 2, axis=-1)                     # (K, px', 8)
    wstk8 = wstk.reshape(K, 8, sub, cout)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles, K),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # qflat8: HBM
            pl.BlockSpec((1, TPX, 8), lambda t, k, idx: (k, t, 0)),
            pl.BlockSpec((1, 8, sub, cout), lambda t, k, idx: (k, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TPX, cout), lambda t, k, idx: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((TPX, 8, sub), qflat.dtype),
            pltpu.SemaphoreType.DMA((TPX,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tpx=TPX),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles * TPX, cout), jnp.float32),
        interpret=_interpret(),
    )(idx, qflat8, w8, wstk8)
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
