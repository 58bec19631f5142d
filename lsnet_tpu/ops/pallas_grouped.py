"""Pallas TPU kernel: grouped deform-conv contraction.

The grouped DCN contraction (ResNeXt-64x4d DCN stages, reference
`deform_conv_cuda.cpp:811` + `resnext.py` groups=64) is a measured
flagship wall: XLA's options are all bad at G=64 — native grouped conv
lowers to ~1 TFLOP/s, a G-batched einsum is catastrophic (2.2 s/fwd,
docs/PERF.md), and the round-2 workaround (dense block-diagonal matmul)
pays G x FLOPs on zeros (3.6 ms/layer at X101 stage3, ~45% MXU) — and the
XLA sub-blocked variant loses the win again to transpose copies of the
~300 MB patch tensor (measured 3.85 ms).

This kernel runs the contraction as ``nb = G/sub`` block-diagonal
sub-blocks sized for a full 128-wide MXU output:

    sub = 128 // (cout // G)   groups per block
    out[px, b] = sum_k vals[px, k, channels of block b] @ w[b, k]

FLOP waste drops from G x to (128 G / cout) x (8x at X101 stage3, 4x at
stage4) and no transposes are needed: the kernel statically slices the
(tpx, K*C) rows in VMEM. Backward = the transposed kernel (dvals) + a
px-accumulating kernel (dweight); both parity-tested vs the dense path
(tests/test_pallas_grouped.py). Non-TPU backends run in interpret mode.
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

# Flag: use the Pallas path inside the flat-deform engine (grouped convs).
# DEFAULT OFF for the forward hot path: measured on v5e, the kernel wins
# standalone (stage3 1.58 ms vs 3.20 dense, stage4 1.29 vs 3.65) but LOSES
# in the full backbone (553.6 ms vs 356.3 @B4) — XLA fuses the 4-corner
# gather-accumulate directly into the dense matmul's operand read, and
# pallas_call forces the ~300 MB patch tensor to materialize instead. The
# kernel is kept flag-gated (LSNET_PALLAS_GROUPED=1) + parity-tested for
# chips where the fusion/bandwidth balance differs (docs/PERF.md round 3).
ENABLED = [os.environ.get("LSNET_PALLAS_GROUPED", "0") == "1"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def sub_groups(groups: int, cout: int) -> int:
    """Largest divisor of ``groups`` with a <=128-wide block output."""
    out_g = max(1, cout // groups)
    best = 1
    for s in range(1, groups + 1):
        if groups % s == 0 and s * out_g <= 128:
            best = s
    return best


def supported(K: int, C: int, groups: int, cout: int) -> bool:
    """Shapes the kernel handles well (else callers use the XLA path)."""
    if groups <= 1 or C % groups or cout % groups:
        return False
    sub = sub_groups(groups, cout)
    sub_cg = sub * (C // groups)
    sub_out = sub * (cout // groups)
    return sub_cg % 128 == 0 and sub_out % 128 == 0 and C % 128 == 0


def _block_weight(weight: Array, K: int, groups: int, sub: int) -> Array:
    """(K, Cg, cout) grouped-compact -> (nb, K*sub*Cg, sub*outG)
    within-block block-diagonal expansion."""
    Cg = weight.shape[1]
    cout = weight.shape[-1]
    outG = cout // groups
    nb = groups // sub
    w = weight.reshape(K, Cg, nb, sub, outG)
    eye = jnp.eye(sub, dtype=weight.dtype)
    wd = jnp.einsum("kcbgj,gh->bkgchj", w, eye)
    return wd.reshape(nb, K * sub * Cg, sub * outG)


def _pick_tpx(px: int, row_bytes: int, fixed_bytes: int = 0,
              budget: int = 13_000_000) -> int:
    """Pixel-tile size: largest tile whose double-buffered row block plus
    the resident weight block fits the VMEM budget. Small tiles waste MXU
    rows (a 64-px tile runs half-empty 128-row passes — measured 2.85 ms
    vs 3.35 dense at stage3 with tpx=64; bigger tiles close the gap)."""
    t = 512
    while t > 16 and 2 * t * row_bytes + fixed_bytes > budget:
        t //= 2
    return max(16, min(t, 512))


def _make_fwd_kernel(K, C, nb, subCg, subout):
    def kernel(v_ref, w_ref, o_ref):
        tpx = v_ref.shape[0]
        for b in range(nb):
            acc = jnp.zeros((tpx, subout), jnp.float32)
            for k in range(K):
                vk = v_ref[:, k * C + b * subCg:k * C + (b + 1) * subCg]
                wk = w_ref[b, k * subCg:(k + 1) * subCg, :]
                acc = acc + jax.lax.dot_general(
                    vk, wk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[:, b * subout:(b + 1) * subout] = acc.astype(o_ref.dtype)
    return kernel


def _make_dv_kernel(K, C, nb, subCg, subout):
    def kernel(g_ref, w_ref, dv_ref):
        for b in range(nb):
            g = g_ref[:, b * subout:(b + 1) * subout]
            for k in range(K):
                wk = w_ref[b, k * subCg:(k + 1) * subCg, :]
                dv = jax.lax.dot_general(
                    g, wk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dv_ref[:, k * C + b * subCg:k * C + (b + 1) * subCg] = \
                    dv.astype(dv_ref.dtype)
    return kernel


def _make_dw_kernel(K, C, nb, subCg, subout, px, tpx):
    def kernel(v_ref, g_ref, dw_ref):
        i = pl.program_id(0)
        # zero the out-of-bounds rows of the last partial tile — unlike the
        # row-wise fwd/dv kernels, the px-reduction would otherwise
        # accumulate unspecified OOB data
        rows = jax.lax.broadcasted_iota(jnp.int32, (tpx, 1), 0) + i * tpx
        rmask = rows < px
        for b in range(nb):
            g = jnp.where(rmask, g_ref[:, b * subout:(b + 1) * subout], 0)
            for k in range(K):
                # mask BOTH operands: 0 * NaN(garbage) is still NaN
                vk = jnp.where(
                    rmask, v_ref[:, k * C + b * subCg:k * C + (b + 1) * subCg],
                    0)
                contrib = jax.lax.dot_general(
                    vk, g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

                @pl.when(i == 0)
                def _(b=b, k=k, contrib=contrib):
                    dw_ref[b, k * subCg:(k + 1) * subCg, :] = contrib

                @pl.when(i > 0)
                def _(b=b, k=k, contrib=contrib):
                    dw_ref[b, k * subCg:(k + 1) * subCg, :] = (
                        dw_ref[b, k * subCg:(k + 1) * subCg, :] + contrib)
    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grouped_deform_contract(vals: Array, weight: Array, K: int,
                            groups: int) -> Array:
    """vals (px, K*C) with grouped-major channels; weight (K, Cg, cout).

    Returns (px, cout) — numerically identical to the dense block-diagonal
    contraction, at (cout/128G) x the FLOPs."""
    out, _ = _gdc_fwd(vals, weight, K, groups)
    return out


def _dims(weight, K, groups):
    Cg = weight.shape[1]
    cout = weight.shape[-1]
    C = Cg * groups
    sub = sub_groups(groups, cout)
    return C, groups // sub, sub, sub * Cg, sub * (cout // groups)


def _gdc_fwd(vals, weight, K, groups):
    C, nb, sub, subCg, subout = _dims(weight, K, groups)
    px = vals.shape[0]
    wbytes = nb * K * subCg * subout * vals.dtype.itemsize
    tpx = _pick_tpx(px, K * C * vals.dtype.itemsize, wbytes)
    wblk = _block_weight(weight, K, groups, sub).astype(vals.dtype)
    out = pl.pallas_call(
        _make_fwd_kernel(K, C, nb, subCg, subout),
        grid=(pl.cdiv(px, tpx),),
        in_specs=[
            pl.BlockSpec((tpx, K * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, K * subCg, subout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tpx, nb * subout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((px, nb * subout), vals.dtype),
        interpret=_interpret(),
    )(vals, wblk)
    return out, (vals, weight)


def _gdc_bwd(K, groups, res, dout):
    vals, weight = res
    C, nb, sub, subCg, subout = _dims(weight, K, groups)
    Cg = weight.shape[1]
    cout = weight.shape[-1]
    outG = cout // groups
    px = vals.shape[0]
    wbytes = nb * K * subCg * subout * vals.dtype.itemsize
    tpx = _pick_tpx(px, K * C * vals.dtype.itemsize, wbytes)
    wblk = _block_weight(weight, K, groups, sub).astype(vals.dtype)
    dout = dout.astype(vals.dtype)

    dv = pl.pallas_call(
        _make_dv_kernel(K, C, nb, subCg, subout),
        grid=(pl.cdiv(px, tpx),),
        in_specs=[
            pl.BlockSpec((tpx, nb * subout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, K * subCg, subout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tpx, K * C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((px, K * C), vals.dtype),
        interpret=_interpret(),
    )(dout, wblk)

    dwblk = pl.pallas_call(
        _make_dw_kernel(K, C, nb, subCg, subout, px, tpx),
        grid=(pl.cdiv(px, tpx),),
        in_specs=[
            pl.BlockSpec((tpx, K * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpx, nb * subout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, K * subCg, subout), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, K * subCg, subout), jnp.float32),
        interpret=_interpret(),
    )(vals, dout)

    # pull the block-diagonal entries back to the compact layout:
    # dw[k, c, (b*sub+g)*outG+j] = dwblk[b, (k, g, c), (g, j)]
    d6 = dwblk.reshape(nb, K, sub, Cg, sub, outG)
    diag = jnp.einsum("bkgchj,gh->kcbgj", d6, jnp.eye(sub, dtype=d6.dtype))
    dweight = diag.reshape(K, Cg, cout).astype(weight.dtype)
    return dv, dweight


grouped_deform_contract.defvjp(_gdc_fwd, _gdc_bwd)
