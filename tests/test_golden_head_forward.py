"""End-to-end forward parity of the ASSEMBLED LSHead vs the reference
(`lsnet_head.py:479-755`) — VERDICT r3 missing #5.  The fixture
(tests/golden/head_forward.npz, tools/gen_golden.py gen_head_forward) runs
the reference head under the stubbed-torch harness with a pure-torch CPU
port of the PyramidDeformConv CUDA equations; weights convert through
train/checkpoint.convert_torch_lshead; every per-level output map must
match to ~1e-4."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "head_forward.npz")

TASKS = [("bbox", 4), ("segm", 36), ("pose_bbox", 17), ("pose_kbox", 17)]


@pytest.fixture(scope="module")
def fixture():
    return np.load(GOLDEN)


@pytest.mark.parametrize("task,nv", TASKS,
                         ids=[t for t, _ in TASKS])
def test_head_forward_parity(fixture, task, nv):
    from lsnet_tpu.models.heads.ls_head import LSHead
    from lsnet_tpu.train.checkpoint import convert_torch_lshead

    g = fixture
    pre = f"{task}::"
    feats = [jnp.asarray(g[f"{pre}feat{i}"]) for i in range(5)]
    sd = {k[len(pre) + 4:]: g[k] for k in g.files
          if k.startswith(pre + "sd::")}

    head = LSHead(num_classes=4, in_channels=32, feat_channels=32,
                  point_feat_channels=32, stacked_convs=2, task=task,
                  num_vectors=nv, norm_groups=8, conv_module_type="norm")
    variables = head.init(jax.random.PRNGKey(0), feats)
    params = convert_torch_lshead(sd, task=task)
    # converted tree must cover the flax tree exactly
    ref_paths = {"/".join(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(
                     jax.tree.map(lambda x: 0, variables["params"]))[0][:0]}
    flat_ours = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_conv = jax.tree_util.tree_leaves_with_path(params)
    keys_ours = {jax.tree_util.keystr(p) for p, _ in flat_ours}
    keys_conv = {jax.tree_util.keystr(p) for p, _ in flat_conv}
    assert keys_ours == keys_conv, (
        sorted(keys_ours - keys_conv)[:5], sorted(keys_conv - keys_ours)[:5])
    outs = head.apply({"params": params}, feats)

    def check(name, ref_key):
        for lvl in range(5):
            want = g[f"{pre}{ref_key}{lvl}"]
            got = np.asarray(outs[name][lvl], np.float32)
            np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3,
                                       err_msg=f"{task} {name} lvl{lvl}")

    check("cls", "cls")
    if task in ("bbox", "pose_bbox"):
        check("bbox_init", "bbox_init")
        check("bbox_refine", "bbox_refine")
    if task == "segm":
        check("segm_init", "segm_init")
        check("segm_refine", "segm_refine")
    if task in ("pose_bbox", "pose_kbox"):
        check("pose_init", "pose_init")
        check("pose_refine", "pose_refine")
