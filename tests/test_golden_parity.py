"""Golden numerical parity vs the reference torch implementation.

Fixtures in tests/golden/*.npz are produced by ``tools/gen_golden.py``,
which runs the reference's own CPU torch code (cross-IOU loss, landmark
encode/decode, assigners, polygon pipeline) on seeded inputs. These tests
assert our JAX/numpy implementations reproduce those outputs to <=1e-5
(VERDICT r1 item 2: accuracy evidence).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLD, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} missing — run tools/gen_golden.py")
    return np.load(path)


# ------------------------------------------------------------- cross-IOU ---

@pytest.mark.parametrize("mode", ["bbox", "polygon", "keypoint"])
def test_cross_iou_loss_matches_reference(mode):
    g = _load("cross_iou.npz")
    from lsnet_tpu.models.losses.cross_iou import cross_iou_loss

    kwargs = dict(
        loss_type=mode,
        anchor_pts=jnp.asarray(g[f"{mode}_anchor"]),
        pos_inds=jnp.asarray(g[f"{mode}_pos_inds"]),
        avg_factor=float(g[f"{mode}_avg_factor"]),
        alpha=0.2, stride=9)
    if mode == "keypoint":
        kwargs["vs"] = jnp.asarray(g[f"{mode}_vs"])
    else:
        kwargs["bbox_gt"] = jnp.asarray(g[f"{mode}_bbox_gt"])
    loss = cross_iou_loss(jnp.asarray(g[f"{mode}_pred"]),
                          jnp.asarray(g[f"{mode}_target"]),
                          jnp.asarray(g[f"{mode}_weight"]), **kwargs)
    np.testing.assert_allclose(float(loss), float(g[f"{mode}_loss"]),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------- landmark encode/decode --

def _nchw_to_nlc(x):
    """(B, C, H, W) -> (B*H*W, C) matching our channel-last flat layout."""
    b, c, h, w = x.shape
    return x.transpose(0, 2, 3, 1).reshape(-1, c)


def test_extreme_points2bbox_matches_reference():
    g = _load("head_encode.npz")
    from lsnet_tpu.models.heads.ls_head import extreme_points2bbox

    pts = _nchw_to_nlc(g["e2b_pts"])
    ext, bbox = extreme_points2bbox(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(ext),
                               _nchw_to_nlc(g["e2b_extremes"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bbox),
                               _nchw_to_nlc(g["e2b_bbox"]),
                               rtol=1e-6, atol=1e-6)


def test_vectors2bbox_matches_reference():
    g = _load("head_encode.npz")
    from lsnet_tpu.models.heads.ls_head import vectors2bbox

    pts = _nchw_to_nlc(g["v2b_pts"])
    vec, bbox = vectors2bbox(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(vec),
                               _nchw_to_nlc(g["v2b_vectors"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bbox),
                               _nchw_to_nlc(g["v2b_bbox"]),
                               rtol=1e-6, atol=1e-6)


def _head(task, num_vectors):
    from lsnet_tpu.models.heads.ls_head import LSHead
    return LSHead(num_classes=1, task=task, num_vectors=num_vectors)


@pytest.mark.parametrize("mode,task,nv", [
    ("bbox", "bbox", 4), ("segm", "segm", 36), ("pose", "pose_bbox", 17)])
def test_get_pred_reg_matches_reference(mode, task, nv):
    g = _load("head_encode.npz")
    head = _head(task, nv)
    r1 = jnp.asarray(_nchw_to_nlc(g[f"predreg_{mode}_r1"]))
    if mode == "bbox":
        r2 = jnp.asarray(_nchw_to_nlc(g["predreg_bbox_r2"]))
        got = head._get_pred_reg(r1, r2)
    else:
        got = head._get_pred_reg(r1, None)
    np.testing.assert_allclose(np.asarray(got),
                               _nchw_to_nlc(g[f"predreg_{mode}_out"]),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode,key", [("bbox", "gtreg_bbox"),
                                      ("poly", "gtreg_poly")])
def test_encode_gt_reg_matches_reference(mode, key):
    g = _load("head_encode.npz")
    from lsnet_tpu.core.targets import encode_gt_reg

    gt_pts = g[f"{key}_pts"]
    anchor = g["gtreg_bbox_anchor"]
    row_w = g["gtreg_bbox_weights"][:, 0]
    reg, inds = encode_gt_reg(jnp.asarray(gt_pts), jnp.asarray(anchor[:, :2]),
                              jnp.asarray(row_w))
    np.testing.assert_allclose(np.asarray(reg), g[f"{key}_out"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(inds), g[f"{key}_inds"])


def test_border_center_and_keypoint_prep_match_reference():
    g = _load("head_encode.npz")
    from lsnet_tpu.core.targets import (get_border_center,
                                        keypoints_with_bbox,
                                        keypoints_with_kbox)

    bc = get_border_center(jnp.asarray(g["border_center_boxes"]))
    np.testing.assert_allclose(np.asarray(bc), g["border_center_out"],
                               rtol=1e-6, atol=1e-6)

    kps, vs = keypoints_with_bbox(jnp.asarray(g["border_center_boxes"]),
                                  jnp.asarray(g["kp_bbox_kvs"]))
    np.testing.assert_allclose(np.asarray(kps), g["kp_bbox_out"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vs), g["kp_bbox_vs"])

    kk, kbox, vsk = keypoints_with_kbox(jnp.asarray(g["kp_bbox_kvs"]))
    np.testing.assert_allclose(np.asarray(kk), g["kp_kbox_out"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(kbox), g["kp_kbox_boxes"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vsk), g["kp_kbox_vs"])


# --------------------------------------------------------------- assigners -

def test_box_iou_matches_reference():
    g = _load("assigners.npz")
    from lsnet_tpu.core.assign import box_iou

    got = box_iou(jnp.asarray(g["atss_cand"]), jnp.asarray(g["atss_gt"]))
    np.testing.assert_allclose(np.asarray(got), g["iou_matrix"],
                               rtol=1e-5, atol=1e-6)


def test_atss_assign_matches_reference():
    g = _load("assigners.npz")
    from lsnet_tpu.core.assign import atss_assign

    N = g["atss_cand"].shape[0]
    res = atss_assign(jnp.asarray(g["atss_cand"]),
                      jnp.ones((N,), bool),
                      [int(v) for v in g["atss_num_level"]],
                      jnp.asarray(g["atss_gt"]),
                      jnp.ones((g["atss_gt"].shape[0],), bool), topk=9)
    # reference gt_inds are 1-based with 0 = negative; ours 0-based, -1 neg
    np.testing.assert_array_equal(np.asarray(res.gt_idx),
                                  g["atss_assigned"].astype(np.int64) - 1)


@pytest.mark.parametrize("iou_type", ["center", "centroid"])
def test_centroid_assign_matches_reference(iou_type):
    g = _load("assigners.npz")
    from lsnet_tpu.core.assign import centroid_assign

    N = g["cent_points"].shape[0]
    res = centroid_assign(jnp.asarray(g["cent_points"]),
                          jnp.ones((N,), bool),
                          jnp.asarray(g["cent_gt"]),
                          jnp.ones((g["cent_gt"].shape[0],), bool),
                          jnp.asarray(g["cent_ext"]),
                          scale=4.0, pos_num=1, iou_type=iou_type)
    np.testing.assert_array_equal(
        np.asarray(res.gt_idx),
        g[f"cent_{iou_type}_assigned"].astype(np.int64) - 1)


# ----------------------------------------------------------- polygon prep --

@pytest.mark.parametrize("tag", ["up", "down", "cw"])
def test_uniformsample_matches_reference(tag):
    g = _load("polygons.npz")
    from lsnet_tpu.data.lsvr import uniform_sample

    got = uniform_sample(g[f"{tag}_in"].copy(), 360)
    np.testing.assert_allclose(got, g[f"{tag}_uniform"], rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("tag", ["up", "down", "cw", "tiny"])
def test_unify_polygon_matches_reference(tag):
    g = _load("polygons.npz")
    from lsnet_tpu.data.lsvr import unify_polygon

    comps = ([g[f"{tag}_in"].reshape(-1)] if f"{tag}_in" in g
             else [np.array([1.0, 1.0, 1.2, 1.0, 1.2, 1.2])])
    got = unify_polygon(comps, g[f"{tag}_bbox"], num_points=36)
    np.testing.assert_allclose(np.asarray(got).reshape(-1),
                               g[f"{tag}_unified"], rtol=1e-6, atol=1e-6)


def test_backbone_fpn_forward_parity():
    """Full ResNet-50 + FPN forward vs the reference torch modules
    (fixture from tools/gen_golden.py gen_backbone): the seeded torch
    state dict rides through the converter
    (train/checkpoint.py convert_torch_backbone/convert_torch_neck) and
    the flax activations must match every stage and FPN level."""
    import jax
    from lsnet_tpu.models.backbones.resnet import ResNet
    from lsnet_tpu.models.necks.fpn import FPN
    from lsnet_tpu.train.checkpoint import (convert_torch_backbone,
                                            convert_torch_neck)

    g = _load("backbone_fwd.npz")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    bb_params, bb_stats = convert_torch_backbone(
        {k: v for k, v in sd.items() if k.startswith("backbone.")})
    neck_params = convert_torch_neck(
        {k: v for k, v in sd.items() if k.startswith("neck.")})

    image = jnp.asarray(g["image"])
    bb = ResNet(depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
                frozen_stages=-1)
    init_vars = bb.init(jax.random.PRNGKey(0), image)
    # structural check: converted tree covers the init tree exactly
    init_shapes = jax.tree.map(lambda x: x.shape, init_vars["params"])
    conv_shapes = jax.tree.map(lambda x: x.shape, bb_params)
    assert init_shapes == conv_shapes
    feats = bb.apply({"params": bb_params, "batch_stats": bb_stats}, image)
    for i in range(4):
        ref = np.asarray(g[f"c{i}"])
        got = np.asarray(feats[i])
        scale = max(np.abs(ref).max(), 1e-6)
        assert np.abs(got - ref).max() / scale < 1e-4, f"stage {i}"

    neck = FPN(out_channels=64, start_level=1, add_extra_convs="on_input",
               num_outs=5, norm_cfg=dict(type="GN", num_groups=32))
    init_neck = neck.init(jax.random.PRNGKey(0), feats)
    assert (jax.tree.map(lambda x: x.shape, init_neck["params"])
            == jax.tree.map(lambda x: x.shape, neck_params))
    outs = neck.apply({"params": neck_params}, feats)
    for i in range(5):
        ref = np.asarray(g[f"p{i}"])
        got = np.asarray(outs[i])
        scale = max(np.abs(ref).max(), 1e-6)
        assert np.abs(got - ref).max() / scale < 1e-4, f"level {i}"
