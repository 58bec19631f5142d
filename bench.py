"""Benchmark: flagship LSNet e2e inference throughput on the attached chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline (BASELINE.md): >=100 img/s/chip @ 800x1333 for X-101-64x4d-DCN.

Round 3: the headline metric is END-TO-END (forward + decode + on-device
NMS -> final detections), matching the reference `tools/benchmark.py` which
times full `model(...)` inference; the forward-only rate is reported to
stderr alongside for comparison with earlier rounds.
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
    from lsnet_tpu.core.decode import TestConfig, lsnet_decode
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
    tcfg = TestConfig(image_shape=(H, W), num_classes=80, task="bbox",
                      num_vectors=4, nms_pre=1000, score_thr=0.05,
                      nms_iou=0.6, max_per_img=100)
    img_shapes = jnp.asarray([[H, W]] * B, jnp.int32)
    sfs = jnp.ones((B, 4), jnp.float32)

    @jax.jit
    def fwd(variables, images):
        return model.apply(variables, images)

    @jax.jit
    def e2e(variables, images, img_shapes, sfs):
        outs = model.apply(variables, images)
        return lsnet_decode(outs, img_shapes, sfs, tcfg)

    def sync(x):
        # force completion with a host transfer (block_until_ready can be
        # a no-op over the remote-execution tunnel)
        return float(jnp.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])

    def rate(fn, *args, iters=20):
        sync(fn(*args))
        sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)   # one sync: dispatches queue server-side
        return B * iters / (time.perf_counter() - t0)

    fwd_rate = rate(fwd, variables, images)
    e2e_rate = rate(e2e, variables, images, img_shapes, sfs)
    print(f"fwd-only: {fwd_rate:.2f} img/s/chip", file=sys.stderr)

    print(json.dumps({
        "metric": "lsnet_x101_64x4d_dcn_e2e_throughput_800x1344_bf16",
        "value": round(e2e_rate, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(e2e_rate / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
