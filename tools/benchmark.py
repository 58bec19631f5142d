#!/usr/bin/env python
"""Measure pure-inference throughput (reference `code/tools/benchmark.py`:
skip the first warm-up iterations, synchronize, report FPS)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--decode", action="store_true",
                        help="include on-device decode+NMS")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lsnet_tpu.core.decode import lsnet_decode
    from lsnet_tpu.models import build_detector
    from lsnet_tpu.train.loop import test_cfg_from
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    canvas = tuple(cfg.get("canvas_shape", (800, 1344)))
    model, _ = build_detector(cfg.model.to_dict())
    B = args.batch_size
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(B, *canvas, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images[:1])
    if args.bf16:
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables)
        images = images.astype(jnp.bfloat16)

    tcfg = test_cfg_from(cfg, canvas)
    shapes = jnp.tile(jnp.array([canvas], jnp.int32), (B, 1))
    sf = jnp.ones((B, 4), jnp.float32)

    from lsnet_tpu.ops.flat_deform import inference_sampling

    if args.decode:
        @jax.jit
        def fwd(v, im):
            with inference_sampling():
                outs = model.apply(v, im)
            return lsnet_decode(outs, shapes, sf, tcfg)
    else:
        @jax.jit
        def fwd(v, im):
            with inference_sampling():
                return model.apply(v, im)

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.asarray(leaf).reshape(-1)[0])

    for _ in range(args.warmup):
        out = fwd(variables, images)
    sync(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(variables, images)
    sync(out)
    dt = time.perf_counter() - t0
    fps = B * args.iters / dt
    print(f"throughput: {fps:.2f} img/s  ({dt / args.iters * 1000:.1f} "
          f"ms/iter, batch {B}, canvas {canvas}, "
          f"{'bf16' if args.bf16 else 'f32'}, "
          f"decode={'on' if args.decode else 'off'})")


if __name__ == "__main__":
    main()
