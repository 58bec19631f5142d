#!/usr/bin/env python
"""Static FLOPs / parameter count from the XLA cost analysis
(reference `code/tools/get_flops.py` used a torch hook counter; here the
compiler itself reports the compiled HLO's flop count — more accurate)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--shape", type=int, nargs=2, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from lsnet_tpu.models import build_detector
    from lsnet_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    canvas = tuple(args.shape or cfg.get("canvas_shape", (800, 1344)))
    model, _ = build_detector(cfg.model.to_dict())
    images = jnp.zeros((1, *canvas, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images))
    n_params = sum(int(jnp.prod(jnp.array(p.shape)))
                   for p in jax.tree.leaves(variables["params"]))

    variables_z = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                               variables)
    lowered = jax.jit(model.apply).lower(variables_z, images)
    compiled = lowered.compile()
    try:
        flops = compiled.cost_analysis()["flops"]
    except (KeyError, TypeError, IndexError):
        flops = float("nan")
    print(f"input shape: (1, {canvas[0]}, {canvas[1]}, 3)")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"flops:  {flops / 1e9:.2f} GFLOPs (XLA cost analysis)")


if __name__ == "__main__":
    main()
