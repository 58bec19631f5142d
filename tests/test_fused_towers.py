"""DCN-mode head forward (fused multi-branch towers) smoke tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lsnet_tpu.models import build_detector


def cfg(task, nv, ncls=3):
    return dict(
        type="LSDetector",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", out_channels=32, start_level=1,
                  add_extra_convs="on_input", num_outs=5,
                  norm_cfg=dict(type="GN", num_groups=8)),
        bbox_head=dict(type="LSHead", task=task, num_vectors=nv,
                       num_classes=ncls, in_channels=32, feat_channels=32,
                       point_feat_channels=32, stacked_convs=1,
                       norm_cfg=dict(type="GN", num_groups=8),
                       conv_module_type="dcn", fuse_towers=True),
    )


@pytest.mark.slow
def test_dcn_head_bbox_forward_and_grad():
    model, _ = build_detector(cfg("bbox", 4))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(v, x)
    assert outs["cls"][0].shape == (1, 8, 8, 3)
    # fused tower params exist per branch
    tower = v["params"]["head"]["towers"]
    assert "cls_convs_0_weight" in tower and "bbox_convs_0_weight" in tower

    def f(params):
        o = model.apply({"params": params,
                         "batch_stats": v["batch_stats"]}, x)
        return sum(jnp.sum(m ** 2) for m in o["bbox_refine"])

    g = jax.grad(f)(v["params"])
    assert np.isfinite(float(jax.tree.leaves(
        jax.tree.map(lambda a: jnp.abs(a).sum(), g))[0]))


@pytest.mark.slow
def test_dcn_head_pose_bbox_forward():
    model, _ = build_detector(cfg("pose_bbox", 17, ncls=1))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(v, x)
    assert outs["pose_refine"][0].shape[-1] == 72
    assert outs["bbox_refine"][0].shape[-1] == 20
    tower = v["params"]["head"]["towers"]
    assert "pose_convs_0_weight" in tower
