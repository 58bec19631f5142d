"""fuse_conv_bn identity + publish_model roundtrip + print_config smoke."""

import numpy as np
import pytest


def tiny_cfg():
    return dict(
        type="LSDetector",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1),
        neck=dict(type="FPN", out_channels=32, start_level=1,
                  add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="LSHead", task="bbox", num_vectors=4,
                       num_classes=3, in_channels=32, feat_channels=32,
                       point_feat_channels=32, stacked_convs=1,
                       num_kernel_points=9, gradient_mul=0.1,
                       point_strides=[8, 16, 32, 64, 128],
                       point_base_scale=4),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    import jax
    import jax.numpy as jnp
    from lsnet_tpu.models import build_detector

    model, _ = build_detector(tiny_cfg())
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats/affine so fusion actually has work to do
    leaves_rng = np.random.RandomState(1)

    def perturb(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if any("bn" in n or n == "norm" for n in names):
            return leaf + jnp.asarray(
                0.3 * np.abs(leaves_rng.randn(*leaf.shape)) + 0.05,
                leaf.dtype)
        return leaf

    variables = jax.tree_util.tree_map_with_path(perturb, variables)
    return model, variables, x


def test_fuse_conv_bn_is_identity(model_and_vars):
    from lsnet_tpu.train.fuse import fuse_conv_bn

    model, variables, x = model_and_vars
    fused, names = fuse_conv_bn(variables)
    # every backbone BN (17 in R18: stem + 2*2*4 blocks) must be found
    assert len(names) >= 17, names
    assert any(n.endswith("/bn1") for n in names)
    ref = model.apply(variables, x)
    out = model.apply(fused, x)
    import jax
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-4)
    # tree structure unchanged -> same jit signature
    assert (jax.tree_util.tree_structure(fused)
            == jax.tree_util.tree_structure(variables))


def test_fuse_preserves_nonbn_params(model_and_vars):
    from lsnet_tpu.train.fuse import fuse_conv_bn

    _, variables, _ = model_and_vars
    fused, _ = fuse_conv_bn(variables)
    # a GN param (head) must be untouched
    head_ref = variables["params"]["head"]
    head_fused = fused["params"]["head"]
    import jax
    for a, b in zip(jax.tree.leaves(head_ref), jax.tree.leaves(head_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_publish_model_roundtrip(tmp_path, model_and_vars):
    import orbax.checkpoint as ocp

    from tools.publish_model import load_published, process_checkpoint

    _, variables, _ = model_and_vars
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": {"momentum": np.zeros((4,), np.float32)},
             "meta": {"epoch": np.asarray(12)}}
    src = tmp_path / "step_100"
    ocp.PyTreeCheckpointer().save(str(src), state)
    final = process_checkpoint(str(src), str(tmp_path / "lsnet_r18.npz"))
    assert "-" in final and final.endswith(".npz")
    loaded = load_published(final)
    assert "opt_state" not in loaded          # stripped, like the reference
    assert int(loaded["meta"]["epoch"]) == 12
    import jax
    ref_leaves = jax.tree.leaves(variables["params"])
    got_leaves = jax.tree.leaves(loaded["params"])
    assert len(ref_leaves) == len(got_leaves)
    np.testing.assert_array_equal(np.asarray(ref_leaves[0]), got_leaves[0])


def test_print_config_tool(tmp_path, capsys):
    cfg = tmp_path / "cfg.py"
    cfg.write_text("model = dict(type='LSDetector', nv=4)\nlr = 0.02\n")
    import tools.print_config as pc
    import sys

    argv = sys.argv
    sys.argv = ["print_config.py", str(cfg), "--options", "lr=0.04",
                "model.nv=36"]
    try:
        pc.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "lr = 0.04" in out and "nv=36" in out
