"""Benchmark: flagship LSNet e2e inference throughput on the attached chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline (BASELINE.md): >=100 img/s/chip @ 800x1333 for X-101-64x4d-DCN.

The headline metric is END-TO-END (forward + decode + on-device NMS ->
final detections), matching the reference `tools/benchmark.py`
(/root/reference/code/tools/benchmark.py:1-60) which times full
`model(...)` inference.

Round-5 rebuild — the round-4 run never produced a number (driver rc=1).
Three fixes, per VERDICT r4 #1:

1. NO eager init. `model.init` at full scale is hundreds of sequential
   eager dispatches over the axon tunnel (~15 min wall before the first
   jit). Params are minted from `jax.eval_shape` metadata with ONE jitted
   program (random normal, bf16) — seconds.
2. Deterministic warm starts. The stock persistent compile cache keys on
   XLA_FLAGS/env, which differ between the builder's shell and the
   driver's (measured: the driver exports XLA_FLAGS, interactive shells
   don't -> permanent cache miss). bench.py therefore keeps its OWN
   executable cache via `jax.experimental.serialize_executable`, keyed
   only on (jax version, device kind, model cfg, batch) — immune to env
   drift. The stock persistent cache stays on as a second layer with
   min_compile_time=0.
3. ONE compile. The MFU block reuses the same compiled executable's
   cost_analysis instead of re-jitting the e2e lambda; fwd-only timing
   (a second full compile) is opt-in via BENCH_FWD=1.
"""

import hashlib
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache — second layer behind the executable cache
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

EXEC_CACHE = "/tmp/lsnet_exec_cache"


def _log(msg):
    print(f"[bench +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


T0 = time.perf_counter()


def mint_params(model, images):
    """Random bf16 params without a single eager full-scale dispatch:
    shapes via eval_shape (pure metadata), values via ONE jitted program."""
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images[:1]))
    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def mint(key):
        keys = jax.random.split(key, len(leaves))
        out = []
        for k, s in zip(keys, leaves):
            if jnp.issubdtype(s.dtype, jnp.floating):
                dt = jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
                out.append(0.03 * jax.random.normal(k, s.shape, dt))
            else:
                out.append(jnp.zeros(s.shape, s.dtype))
        return jax.tree.unflatten(treedef, out)

    return mint(jax.random.PRNGKey(0))


def compile_cached(fn, name, key_extra, *args):
    """jit+lower+compile `fn`, backed by an on-disk serialized-executable
    cache (immune to XLA_FLAGS/env drift in the stock cache key)."""
    from jax.experimental.serialize_executable import (
        deserialize_and_load, serialize)

    dev = jax.devices()[0]
    key = hashlib.sha256("|".join(
        [jax.__version__, dev.device_kind, str(dev.platform), name,
         key_extra]).encode()).hexdigest()[:24]
    path = os.path.join(EXEC_CACHE, f"{name}-{key}.jaxexec")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = deserialize_and_load(payload, in_tree, out_tree)
            _log(f"{name}: loaded serialized executable "
                 f"({os.path.getsize(path) / 1e6:.0f} MB)")
            return compiled
        except Exception as ex:
            _log(f"{name}: executable cache stale ({type(ex).__name__}: "
                 f"{ex}); recompiling")
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    _log(f"{name}: compiled in {time.perf_counter() - t0:.1f}s")
    try:
        os.makedirs(EXEC_CACHE, exist_ok=True)
        with open(path + ".tmp", "wb") as f:
            pickle.dump(serialize(compiled), f)
        os.replace(path + ".tmp", path)
        _log(f"{name}: serialized -> {path}")
    except Exception as ex:
        _log(f"{name}: serialize failed ({type(ex).__name__}: {ex})")
    return compiled


def main():
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.core.decode import TestConfig, lsnet_decode
    from __graft_entry__ import _x101_flagship_cfg

    cfg = _x101_flagship_cfg()
    model, _ = build_detector(cfg)
    B = int(os.environ.get("BENCH_BATCH", 4))
    H, W = 800, 1344
    rng = np.random.RandomState(0)
    _log(f"building inputs (B={B}, {H}x{W})")
    images = jnp.array(rng.randn(B, H, W, 3).astype(np.float32))
    variables = mint_params(model, images)
    images = images.astype(jnp.bfloat16)
    _log("params minted (eval_shape + one jitted init)")
    tcfg = TestConfig(image_shape=(H, W), num_classes=80, task="bbox",
                      num_vectors=4, nms_pre=1000, score_thr=0.05,
                      nms_iou=0.6, max_per_img=100)
    img_shapes = jnp.asarray([[H, W]] * B, jnp.int32)
    sfs = jnp.ones((B, 4), jnp.float32)

    from lsnet_tpu.ops.flat_deform import (INFERENCE_REFINE_TAPS,
                                           INFERENCE_SAMPLING,
                                           inference_sampling)

    def e2e_fn(variables, images, img_shapes, sfs):
        with inference_sampling():   # the shipped inference default
            outs = model.apply(variables, images)
        return lsnet_decode(outs, img_shapes, sfs, tcfg)

    # env knobs that change the compiled graph must be part of the cache
    # key — as must the in-tree inference default policy
    knobs = ",".join(f"{k}={os.environ.get(k, '')}" for k in sorted(
        k for k in os.environ if k.startswith("LSNET_")))
    knobs += f";inf={INFERENCE_SAMPLING[0]}/{INFERENCE_REFINE_TAPS[0]}"
    key_extra = f"B{B};{H}x{W};{knobs};cfg={json.dumps(cfg, sort_keys=True)}"
    e2e = compile_cached(e2e_fn, "e2e", key_extra,
                         variables, images, img_shapes, sfs)

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

    e2e_rate = rate(e2e, variables, images, img_shapes, sfs)
    _log(f"e2e: {e2e_rate:.2f} img/s/chip")

    if os.environ.get("BENCH_FWD", "0") == "1":   # opt-in: second compile
        def fwd_fn(v, im):
            with inference_sampling():
                return model.apply(v, im)

        fwd = compile_cached(fwd_fn, "fwd", key_extra, variables, images)
        fwd_rate = rate(fwd, variables, images)
        _log(f"fwd-only: {fwd_rate:.2f} img/s/chip")

    # --- MFU / HBM accounting: XLA's cost analysis of the SAME compiled
    # e2e executable (no re-jit), against the chip's peak numbers.
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
        ca = e2e.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_s = B / e2e_rate
        mfu = float(ca.get("flops", 0.0)) / step_s / peak_flops
        hbm_util = (float(ca.get("bytes accessed", 0.0)) / step_s
                    / peak_bw)
        _log(f"cost analysis: {ca.get('flops', 0) / 1e9:.1f} GFLOP, "
             f"{ca.get('bytes accessed', 0) / 1e9:.2f} GB per batch-{B} "
             f"step -> MFU {mfu * 100:.1f}%, HBM {hbm_util * 100:.1f}% "
             f"(peaks for '{kind}')")
    except Exception as ex:  # cost_analysis is best-effort on some stacks
        _log(f"cost analysis unavailable: {ex}")

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
