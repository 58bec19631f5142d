"""Benchmark: flagship LSNet inference throughput on the attached TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline (BASELINE.md): >=100 img/s/chip @ 800x1333 for X-101-64x4d-DCN.
Round 1 benches the R50-DCN flagship forward (bf16) at the reference test
scale; later rounds switch to X-101-DCN once its weights path is complete.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache — repeated bench runs skip the ~10 min compile
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    from lsnet_tpu.models import build_detector
    from __graft_entry__ import _x101_flagship_cfg

    model, _ = build_detector(_x101_flagship_cfg())
    B = int(os.environ.get("BENCH_BATCH", 4))
    H, W = 800, 1344
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(B, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images[:1])
    # bf16 inference params
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    images = images.astype(jnp.bfloat16)

    @jax.jit
    def fwd(variables, images):
        return model.apply(variables, images)

    def sync(outs):
        # force completion with a host transfer (block_until_ready can be
        # a no-op over the remote-execution tunnel)
        return float(jnp.asarray(outs["cls"][0]).reshape(-1)[0])

    sync(fwd(variables, images))
    sync(fwd(variables, images))

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        outs = fwd(variables, images)
    sync(outs)   # one sync: dispatches queue server-side
    dt = time.perf_counter() - t0
    imgs_per_s = B * n_iters / dt

    print(json.dumps({
        "metric": "lsnet_x101_64x4d_dcn_fwd_throughput_800x1344_bf16",
        "value": round(imgs_per_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_s / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
