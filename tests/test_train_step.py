"""Sharded train-step test on the virtual 8-device CPU mesh — the rebuild's
answer to the reference's untested DDP path (SURVEY.md §4: 'we can do better
on distributed by testing pjit programs on CPU meshes')."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lsnet_tpu.core.loss import LossConfig
from lsnet_tpu.models import build_detector
from lsnet_tpu.parallel.mesh import make_mesh, shard_batch_pytree
from lsnet_tpu.train.optim import build_optimizer
from lsnet_tpu.train.step import create_train_state, make_train_step

IMG = (64, 64)


def tiny_model():
    return build_detector(dict(
        type="LSDetector",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1),
        neck=dict(type="FPN", out_channels=32, start_level=1,
                  add_extra_convs="on_input", num_outs=5,
                  norm_cfg=dict(type="GN", num_groups=8)),
        bbox_head=dict(type="LSHead", task="bbox", num_vectors=4,
                       num_classes=4, in_channels=32, feat_channels=32,
                       point_feat_channels=32, stacked_convs=1,
                       norm_cfg=dict(type="GN", num_groups=8),
                       conv_module_type="norm"),
    ))


def make_batch(B):
    rng = np.random.RandomState(0)
    return {
        "image": jnp.array(rng.randn(B, *IMG, 3).astype(np.float32)),
        "pad_shape": jnp.array([[64, 64]] * B, jnp.int32),
        "gt_bboxes": jnp.array([[[8, 8, 40, 40], [20, 10, 60, 50]]] * B,
                               jnp.float32),
        "gt_labels": jnp.array([[1, 2]] * B, jnp.int32),
        "gt_valid": jnp.array([[True, True]] * B),
    }


@pytest.mark.slow
def test_train_step_8dev_mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    model, _ = tiny_model()
    batch = make_batch(8)
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1])
    tx, _ = build_optimizer(0.01, steps_per_epoch=100, decay_epochs=[8, 11])
    state = create_train_state(variables, tx)
    cfg = LossConfig(image_shape=IMG, num_classes=4, task="bbox")
    mesh = make_mesh(n_data=8)
    step = make_train_step(model, tx, cfg, mesh=mesh)
    # state is donated into the step — snapshot before
    params_before = jax.tree.map(np.asarray, state.params)
    with mesh:
        sharded = shard_batch_pytree(batch, mesh)
        state2, metrics = step(state, sharded)
        state3, metrics2 = step(state2, sharded)
    assert int(state3.step) == 2
    for k, v in metrics2.items():
        assert np.isfinite(float(v)), k
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        params_before, state3.params)
    assert max(jax.tree.leaves(diff)) > 0


@pytest.mark.slow
def test_frozen_backbone_stage_not_updated():
    model, _ = tiny_model()
    batch = make_batch(2)
    variables = model.init(jax.random.PRNGKey(0), batch["image"][:1])
    from lsnet_tpu.models.backbones.resnet import frozen_param_paths
    from lsnet_tpu.train.optim import make_frozen_mask
    mask = make_frozen_mask(variables["params"], frozen_param_paths(18, 1))
    tx, _ = build_optimizer(0.01, 100, [8], trainable_mask=mask)
    state = create_train_state(variables, tx)
    cfg = LossConfig(image_shape=IMG, num_classes=4, task="bbox")
    step = make_train_step(model, tx, cfg)
    p0 = np.asarray(state.params["backbone"]["layer1_0"]["conv1"]["kernel"])
    q0 = np.asarray(state.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    state2, _ = step(state, batch)
    p1 = state2.params["backbone"]["layer1_0"]["conv1"]["kernel"]
    assert float(jnp.abs(p1 - p0).max()) == 0.0
    q1 = state2.params["backbone"]["layer2_0"]["conv1"]["kernel"]
    assert float(jnp.abs(q1 - q0).max()) > 0.0


@pytest.mark.slow
def test_spatial_sharding_matches_single_device():
    """Intra-image spatial sharding (H over the 'model' axis) produces the
    same results as unsharded execution — GSPMD inserts the conv halo
    exchanges (SURVEY §5 long-context analogue)."""
    import numpy as np

    from lsnet_tpu.models import build_detector
    from lsnet_tpu.parallel.mesh import (make_mesh, run_spatially_sharded,
                                         spatial_sharding)

    model, _ = build_detector(dict(
        type="LSDetector",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), base_channels=16),
        neck=dict(type="FPN", out_channels=32, start_level=1,
                  add_extra_convs="on_input", num_outs=5,
                  norm_cfg=dict(type="GN", num_groups=8)),
        bbox_head=dict(type="LSHead", task="bbox", num_vectors=4,
                       num_classes=2, in_channels=32, feat_channels=32,
                       point_feat_channels=32, stacked_convs=1,
                       norm_cfg=dict(type="GN", num_groups=8),
                       conv_module_type="norm")))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images[:1])

    ref = model.apply(variables, images)

    mesh = make_mesh(n_data=2, n_model=4)      # 2 batch x 4 spatial shards
    with mesh:
        got = run_spatially_sharded(
            lambda im: model.apply(variables, im), mesh, images)
    # GSPMD repartitions the GroupNorm/conv reductions -> float
    # reassociation; agreement to ~1% relative is the correctness bar
    # (halo bugs would give O(1) errors at shard boundaries)
    for k in ref:
        for a, b in zip(ref[k], got[k]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1.5e-2, atol=5e-2)


def test_collect_results_wire_format():
    """Multi-host result gather wire format (pack -> pad -> stack -> merge)
    round-trips typed, ragged per-host payloads in host order — the piece of
    `collect_results` that runs under `process_allgather` on real multihost
    (reference rank-ordered collect, `code/mmdet/apis/test.py:135-207`)."""
    from lsnet_tpu.parallel.mesh import _merge_gathered, _pack_results

    per_host = [
        [{"bboxes": np.arange(8, dtype=np.float32).reshape(2, 4),
          "labels": [1, 2]}],
        [],                                         # a host with no images
        [{"bboxes": np.zeros((0, 4), np.float32), "labels": []},
         {"landmarks": np.ones((3, 17, 2), np.float32)}],
    ]
    packed = [_pack_results(r) for r in per_host]
    sizes = np.stack([n for _, n in packed])        # (P, 1) int64
    max_len = int(sizes.max())
    gathered = np.zeros((len(packed), max_len), np.uint8)
    for i, (payload, _) in enumerate(packed):
        gathered[i, : payload.size] = payload

    merged = _merge_gathered(gathered, sizes)
    flat_expected = [x for host in per_host for x in host]
    assert len(merged) == len(flat_expected)
    np.testing.assert_array_equal(merged[0]["bboxes"],
                                  flat_expected[0]["bboxes"])
    assert merged[1]["labels"] == []
    assert merged[2]["landmarks"].shape == (3, 17, 2)


def test_collect_results_single_process_identity():
    from lsnet_tpu.parallel.mesh import collect_results

    data = [{"id": 0}, {"id": 1}]
    out = collect_results(data)
    assert out == data and out is not data
