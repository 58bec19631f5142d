#!/usr/bin/env python
"""Probe the Mosaic primitives the 8-row-aligned DMA-gather rework needs.

Round-5 finding (docs/perf/r5/probe_dma.log): the round-4 toolchain block
(HTTP 500 on ANY manual-DMA kernel) is GONE — the minimal ``make_async_copy``
kernel now compiles and runs on the attached chip. The full gather kernel
(`lsnet_tpu/ops/pallas_dma_gather.py`) still fails, but on a concrete,
addressable constraint:

    Slice shape along dimension 0 must be aligned to tiling (8), but is 1.

i.e. single-row dynamic slices of a tiled HBM memref are illegal; slices
must move >=8 sublanes at a time. The rework stores the gather source as
``qflat.reshape(rows*8, C4//8)`` so one logical row = an 8-row-aligned
(8, C4//8) block (same bytes, legal slice shape). This probe checks each
primitive that layout needs, separately, so a failure names the exact
missing capability:

  A. dynamic 8-row-aligned HBM slice -> VMEM DMA (the gather read)
  B. static middle-dim read of a (TPX, 8, 128) VMEM scratch (the
     per-sub-row operand view for the 8 partial dots)
  C. 2-D dot on a sub-row view with f32 accumulate (the contraction)

Exit 0 iff all pass on the current backend.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_a():
    """Dynamic 8-aligned slice of an HBM memref, DMA'd to VMEM."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(idx_ref, x_ref, o_ref, scratch, sem):
        i8 = idx_ref[0] * 8
        dma = pltpu.make_async_copy(x_ref.at[pl.ds(i8, 8)], scratch, sem)
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:]

    rows = 32
    x = jnp.arange(rows * 8 * 128, dtype=jnp.float32).reshape(rows * 8, 128)
    x = x.astype(jnp.bfloat16)
    idx = jnp.asarray([5], jnp.int32)
    out = pl.pallas_call(
        k,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda g, idx: (0, 0)),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
        interpret=jax.default_backend() != "tpu",
    )(idx, x)
    want = np.asarray(x[40:48])
    return bool(np.array_equal(np.asarray(out), want))


def probe_b():
    """Middle-dim static-index read of a (TPX, 8, 128) VMEM scratch."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tpx = 16

    def k(x_ref, o_ref):
        acc = jnp.zeros((tpx, 128), jnp.float32)
        for j in range(8):
            acc = acc + x_ref[:, j, :].astype(jnp.float32)
        o_ref[:] = acc

    x = jnp.arange(tpx * 8 * 128, dtype=jnp.float32)
    x = x.reshape(tpx, 8, 128).astype(jnp.bfloat16)
    out = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tpx, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x)
    want = np.asarray(x.astype(jnp.float32)).sum(axis=1)
    return bool(np.allclose(np.asarray(out), want, rtol=1e-2, atol=1.0))


def probe_c():
    """Sub-row view feeding a 2-D dot with f32 accumulate."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tpx = 16

    def k(x_ref, w_ref, o_ref):
        acc = jnp.zeros((tpx, 128), jnp.float32)
        for j in range(8):
            acc = acc + jax.lax.dot(
                x_ref[:, j, :], w_ref[j],
                preferred_element_type=jnp.float32)
        o_ref[:] = acc

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(tpx, 8, 128), jnp.bfloat16)
    w = jnp.asarray(rng.randn(8, 128, 128) / 16, jnp.bfloat16)
    out = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tpx, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x, w)
    xf = np.asarray(x.astype(jnp.float32))
    wf = np.asarray(w.astype(jnp.float32))
    want = sum(xf[:, j, :] @ wf[j] for j in range(8))
    return bool(np.allclose(np.asarray(out), want, rtol=5e-2, atol=0.5))


def main():
    import jax
    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})", file=sys.stderr)
    ok = True
    for name, fn in (("A dyn-aligned-slice DMA", probe_a),
                     ("B middle-dim scratch read", probe_b),
                     ("C sub-row dot", probe_c)):
        try:
            r = fn()
            print(f"{name}: {'OK' if r else 'WRONG RESULT'}")
            ok = ok and r
        except Exception as ex:
            print(f"{name}: FAIL ({type(ex).__name__}) "
                  f"{str(ex).splitlines()[0][:160]}")
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
