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

    # --- MFU / HBM accounting (VERDICT r3 #8): XLA's own cost analysis of
    # the compiled e2e program vs the chip's peak numbers, so the headline
    # is positioned against the roofline, not just the baseline.
    PEAKS = {  # (bf16 FLOP/s, HBM B/s)
        "TPU v5 lite": (197e12, 819e9),      # v5e
        "TPU v5": (459e12, 2765e9),          # v5p
        "TPU v4": (275e12, 1200e9),
    }
    kind = jax.devices()[0].device_kind
    peak_flops, peak_bw = next(
        (v for k, v in PEAKS.items() if kind.startswith(k)),
        (197e12, 819e9))
    mfu = hbm_util = None
    try:
        ca = (jax.jit(lambda v, im, sh, sf: e2e(v, im, sh, sf))
              .lower(variables, images, img_shapes, sfs)
              .compile().cost_analysis())
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_s = B / e2e_rate
        mfu = float(ca.get("flops", 0.0)) / step_s / peak_flops
        hbm_util = (float(ca.get("bytes accessed", 0.0)) / step_s
                    / peak_bw)
        print(f"cost analysis: {ca.get('flops', 0)/1e9:.1f} GFLOP, "
              f"{ca.get('bytes accessed', 0)/1e9:.2f} GB per batch-{B} "
              f"step -> MFU {mfu*100:.1f}%, HBM {hbm_util*100:.1f}% "
              f"(peaks for '{kind}')", file=sys.stderr)
    except Exception as ex:  # cost_analysis is best-effort on some stacks
        print(f"cost analysis unavailable: {ex}", file=sys.stderr)

    print(json.dumps({
        "metric": "lsnet_x101_64x4d_dcn_e2e_throughput_800x1344_bf16",
        "value": round(e2e_rate, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(e2e_rate / 100.0, 3),
        "mfu": round(mfu, 4) if mfu else None,
        "hbm_util": round(hbm_util, 4) if hbm_util else None,
    }))


if __name__ == "__main__":
    main()
