#!/usr/bin/env python
"""Ablation microbench: where does forward time go on the real chip?

Variants: backbone+FPN only / head with plain towers / full DCN head.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def model_cfg(towers: str, backbone_dcn: bool):
    return dict(
        type="LSDetector",
        backbone=dict(type="ResNet", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      stage_with_dcn=(False, backbone_dcn, backbone_dcn,
                                      backbone_dcn)),
        neck=dict(type="FPN", out_channels=256, start_level=1,
                  add_extra_convs="on_input", num_outs=5,
                  norm_cfg=dict(type="GN", num_groups=32)),
        bbox_head=dict(type="LSHead", task="bbox", num_vectors=4,
                       num_classes=80, in_channels=256, feat_channels=256,
                       point_feat_channels=256, stacked_convs=3,
                       norm_cfg=dict(type="GN", num_groups=32),
                       conv_module_type=towers),
    )


def timed(fn, *args, iters=10):
    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.asarray(leaf).reshape(-1)[0])
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)  # single sync after queued dispatches
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--hw", type=int, nargs=2, default=(800, 1344))
    args = parser.parse_args()
    from flax import linen as nn

    from lsnet_tpu.models import build_backbone, build_neck, build_detector

    B = args.batch
    H, W = args.hw
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(B, H, W, 3).astype(np.float32)).astype(jnp.bfloat16)

    class BackboneNeck(nn.Module):
        backbone: nn.Module
        neck: nn.Module

        def __call__(self, x):
            return self.neck(self.backbone(x))

    cfg = model_cfg("norm", False)
    bn = BackboneNeck(build_backbone(cfg["backbone"]),
                      build_neck(cfg["neck"]))
    v = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                     if x.dtype == jnp.float32 else x,
                     bn.init(jax.random.PRNGKey(0), images))
    t = timed(jax.jit(bn.apply), v, images)
    print(f"backbone+fpn:        {t*1000:8.1f} ms  ({B/t:6.1f} img/s)",
          flush=True)

    for name, towers, bdcn in [("head norm towers", "norm", False),
                               ("head dcn towers", "dcn", False),
                               ("full dcn (bb+head)", "dcn", True)]:
        model, _ = build_detector(model_cfg(towers, bdcn))
        v = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                         if x.dtype == jnp.float32 else x,
                         model.init(jax.random.PRNGKey(0), images))
        t = timed(jax.jit(model.apply), v, images)
        print(f"{name:20s} {t*1000:8.1f} ms  ({B/t:6.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
