#!/usr/bin/env python
"""Probe whether the attached TPU stack compiles manual-DMA Pallas kernels.

The axon remote-compile helper on the round-4 stack returns HTTP 500 for
any kernel using ``make_async_copy`` / ``pl.ANY`` refs (bisected in
docs/PERF.md round 4); this probe is the cheap way to re-check after a
stack upgrade. Exit 0 + "dma: OK" means the DMA-gather kernel
(``lsnet_tpu/ops/pallas_dma_gather.py``, LSNET_PALLAS_DMA_GATHER=1) can
be A/B-measured against the XLA gather path.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from lsnet_tpu.ops import pallas_dma_gather as pdg

    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})", file=sys.stderr)
    ok = pdg.probe()
    print(f"dma: {'OK' if ok else 'UNSUPPORTED'}")
    if ok and jax.default_backend() == "tpu":
        # the full kernel is a bigger compile surface than the probe;
        # check it too before declaring the lever open.
        import jax.numpy as jnp
        import numpy as np
        rng = np.random.RandomState(0)
        qflat = jnp.asarray(rng.randn(1000, 1024), jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, 1000, (9, 256)), jnp.int32)
        w4 = jnp.asarray(rng.rand(9, 256, 4), jnp.float32)
        wstk = jnp.asarray(rng.randn(9, 1024, 256) / 32, jnp.bfloat16)
        got = np.asarray(pdg.dma_quad_contract(qflat, idx, w4, wstk))
        want = np.asarray(pdg._xla_quad_contract(qflat, idx, w4, wstk))
        err = float(np.max(np.abs(got - want)))
        print(f"full kernel max|err| vs XLA path: {err:.4f}")
        sys.exit(0 if err < 0.5 else 2)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
