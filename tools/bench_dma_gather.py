#!/usr/bin/env python
"""On-chip rate measurement: Pallas DMA-gather vs the XLA gather unit.

The DCN hot loop is gather-bound at ~250 GB/s on the XLA gather path
(docs/PERF.md round-4 rate matrix vs the 819 GB/s v5e HBM envelope).
The manual-DMA kernel (`lsnet_tpu/ops/pallas_dma_gather.py`) moves each
gathered logical row as one (8, C4/8) descriptor; whether descriptor
issue beats the gather unit is the question this tool answers.

Measures, at the flagship shape (C=256 -> 2 KB rows, cout=256, K=9 taps):
  - dma:  the Pallas kernel end-to-end (gather + corner scale + dot)
  - xla:  `_xla_quad_contract` (same math on the XLA gather path)
Reports wall per call, effective gathered-bytes rate, and the ratio.

Usage: python tools/bench_dma_gather.py [--px 16384] [--rows 32768]
       [--iters 20] [--csv out.csv]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])  # host readback = fence


def timeit(fn, iters):
    fn()  # compile + warm
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--px", type=int, default=16384)
    ap.add_argument("--rows", type=int, default=32768)
    ap.add_argument("--C", type=int, default=256)
    ap.add_argument("--cout", type=int, default=256)
    ap.add_argument("--K", type=int, default=9)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    global jnp
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsnet_tpu.ops import pallas_dma_gather as pdg

    C4 = 4 * args.C
    rng = np.random.RandomState(0)
    qflat = jnp.asarray(rng.randn(args.rows, C4), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, args.rows, (args.K, args.px)),
                      jnp.int32)
    w4 = jnp.asarray(rng.rand(args.K, args.px, 4), jnp.float32)
    wstk = jnp.asarray(
        rng.randn(args.K, C4, args.cout) / np.sqrt(C4), jnp.bfloat16)

    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})", flush=True)
    print(f"shape: rows={args.rows} C4={C4} K={args.K} px={args.px} "
          f"cout={args.cout}  supported={pdg.supported(C4, args.cout, jnp.bfloat16)}",
          flush=True)

    gathered_bytes = args.K * args.px * C4 * 2          # bf16 rows moved

    dma = jax.jit(lambda: pdg._dma_quad_contract_impl(qflat, idx, w4, wstk))
    xla = jax.jit(lambda: pdg._xla_quad_contract(qflat, idx, w4, wstk))

    # parity first (rtol loose: bf16 + different accumulation order)
    a, b = np.asarray(dma()), np.asarray(xla())
    err = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
    print(f"parity: max rel err {err:.2e}", flush=True)

    results = {}
    for name, fn in [("xla", xla), ("dma", dma)]:
        t = timeit(fn, args.iters)
        rate = gathered_bytes / t / 1e9
        results[name] = dict(ms=t * 1e3, GBps=rate)
        print(f"{name}: {t * 1e3:8.3f} ms   {rate:7.1f} GB/s gathered",
              flush=True)

    ratio = results["xla"]["ms"] / results["dma"]["ms"]
    print(f"dma speedup over xla: {ratio:.2f}x", flush=True)
    print(json.dumps({"px": args.px, "rows": args.rows, "C4": C4,
                      "parity_relerr": float(err), **results,
                      "speedup": ratio}))


if __name__ == "__main__":
    main()
