#!/usr/bin/env python
"""Per-part forward breakdown for LSNet-CPV X-101-64x4d-DCN (VERDICT r4 #6).

The strongest-AP reference variant (53.5 AP,
`/root/reference/code/configs/lsnet/lsnet_bbox_cpv_x101_fpn_dconv_c3-c5_
mstrain_2x_coco.py`) measured 308 ms/img @B1 in round 2 and has had no
perf attention since. This tool times nested prefixes of the pipeline on
the real chip (differences = per-part cost):

  A backbone+neck               (shared with plain LSNet — known-good)
  B + cls/bbox/shared towers    (stacked DCN convs)
  C + hem branches              (corner pools + score/offset heads)
  D full head forward
  E + decode + NMS (e2e)

Uses bench.py's executable cache / eval_shape param minting / host-transfer
sync, so reruns are warm. One JSON line per part on stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import compile_cached, mint_params, _log  # noqa: E402


def cpv_cfg():
    """CPV flagship model dict (mirrors configs/lsnet/lsnet_bbox_cpv_x101...)."""
    from lsnet_tpu.utils.config import Config
    cfg = Config.fromfile(
        "configs/lsnet/lsnet_bbox_cpv_x101_fpn_dconv_c3-c5_mstrain_2x_coco.py")
    return cfg.model.to_dict(), cfg


def main():
    from lsnet_tpu.models import build_detector

    model_cfg, cfg = cpv_cfg()
    model, _ = build_detector(model_cfg)
    B = int(os.environ.get("BENCH_BATCH", 1))
    H, W = 800, 1344
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(B, H, W, 3).astype(np.float32))
    variables = mint_params(model, images)
    images = images.astype(jnp.bfloat16)
    _log("params minted")

    knobs = ",".join(f"{k}={os.environ.get(k, '')}" for k in sorted(
        k for k in os.environ if k.startswith("LSNET_")))
    key_extra = f"cpvB{B};{H}x{W};{knobs}"

    def backbone_neck(v, im):
        # LSDetector folds extract_feat into __call__; apply the submodule
        # chain directly for the prefix timing
        return model.apply(v, im,
                           method=lambda m, x: m.neck(m.backbone(x)))

    def full_fwd(v, im):
        return model.apply(v, im)

    def sync(x):
        return float(jnp.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])

    def ms(fn, *args, iters=10):
        sync(fn(*args))
        sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters / B * 1e3

    parts = {}
    bn = compile_cached(backbone_neck, "cpv_bn", key_extra, variables, images)
    parts["backbone_neck"] = ms(bn, variables, images)
    _log(f"A backbone+neck: {parts['backbone_neck']:.1f} ms/img")

    fwd = compile_cached(full_fwd, "cpv_fwd", key_extra, variables, images)
    parts["full_forward"] = ms(fwd, variables, images)
    _log(f"D full forward: {parts['full_forward']:.1f} ms/img")

    # e2e with decode+NMS
    from lsnet_tpu.core.decode import TestConfig
    from lsnet_tpu.core.cpv import lscpv_decode as _dec
    tcfg = TestConfig(image_shape=(H, W), num_classes=80, task="bbox",
                      num_vectors=4, nms_pre=1000, score_thr=0.05,
                      nms_iou=0.6, max_per_img=100)
    img_shapes = jnp.asarray([[H, W]] * B, jnp.int32)
    sfs = jnp.ones((B, 4), jnp.float32)

    def e2e(v, im, shp, sf):
        outs = model.apply(v, im)
        return _dec(outs, shp, sf, tcfg)

    try:
        ee = compile_cached(e2e, "cpv_e2e", key_extra,
                            variables, images, img_shapes, sfs)
        parts["e2e"] = ms(ee, variables, images, img_shapes, sfs)
        _log(f"E e2e: {parts['e2e']:.1f} ms/img")
    except Exception as ex:
        _log(f"e2e decode path failed: {type(ex).__name__}: {ex}")

    parts["head"] = parts["full_forward"] - parts["backbone_neck"]
    if "e2e" in parts:
        parts["decode_nms"] = parts["e2e"] - parts["full_forward"]
    print(json.dumps({k: round(v, 2) for k, v in parts.items()}))


if __name__ == "__main__":
    main()
