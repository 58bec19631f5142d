"""TTA voting + flip-map tests (reference `lsnet.py:163-299` semantics)."""

import numpy as np

from lsnet_tpu.evalkit.tta import (aug_test_vote, bbox_flip, extreme_flip,
                                   instance_mapping_back, instances_vote,
                                   kps_flip, polygon_flip, remove_boxes)


def test_bbox_flip_roundtrip():
    b = np.array([[10, 20, 50, 60.]])
    f = bbox_flip(b, (100, 200))
    np.testing.assert_allclose(f, [[150, 20, 190, 60]])
    np.testing.assert_allclose(bbox_flip(f, (100, 200)), b)


def test_extreme_flip_swaps_left_right():
    e = np.array([[30, 20, 10, 40, 30, 60, 50, 40.]])
    f = extreme_flip(e, (100, 200))
    # top/bottom mirror x; left slot <- mirrored right
    np.testing.assert_allclose(f[0, 0], 170)
    np.testing.assert_allclose(f[0, 2], 150)
    np.testing.assert_allclose(f[0, 3], 40)
    np.testing.assert_allclose(f[0, 6], 190)


def test_polygon_flip_double_is_identity():
    poly = np.arange(16, dtype=np.float64).reshape(1, 16)
    f2 = polygon_flip(polygon_flip(poly, (64, 64)), (64, 64))
    np.testing.assert_allclose(f2, poly)


def test_kps_flip_pairs():
    kps = np.zeros((1, 34))
    kps[0, 0::2] = np.arange(17)
    f = kps_flip(kps, (64, 100))
    out = f.reshape(17, 2)
    assert out[1, 0] == 100 - 2 and out[2, 0] == 100 - 1


def test_remove_boxes():
    b = np.array([[0, 0, 10, 10], [0, 0, 100, 100.]])
    keep = remove_boxes(b, 0, 50)
    assert list(keep) == [0]
    keep = remove_boxes(b, 50, 1000)
    assert list(keep) == [1]


def test_instances_vote_merges_cluster():
    boxes = np.array([[0, 0, 10, 10], [0.5, 0.5, 10.5, 10.5],
                      [50, 50, 60, 60.]])
    vectors = np.tile(boxes[:, :2], 4)
    scores = np.array([0.9, 0.8, 0.7])
    b, v, s = instances_vote(boxes, vectors, scores, vote_thresh=0.6)
    # two clusters remain; merged box is the score-weighted average
    assert b.shape[0] >= 2
    expect = (boxes[0] * 0.9 + boxes[1] * 0.8) / 1.7
    np.testing.assert_allclose(b[0], expect, atol=1e-6)
    assert s[0] == 0.9


def test_aug_test_vote_end_to_end():
    res = dict(bboxes=np.array([[10, 10, 30, 30.]]),
               scores=np.array([0.9]), labels=np.array([1]),
               vectors=np.tile([20, 10.], 4)[None])
    res_flip = dict(bboxes=np.array([[70, 10, 90, 30.]]),   # flip of above
                    scores=np.array([0.85]), labels=np.array([1]),
                    vectors=np.tile([80, 10.], 4)[None])
    metas = [dict(img_shape=(100, 100), scale_factor=np.ones(4),
                  flip=False),
             dict(img_shape=(100, 100), scale_factor=np.ones(4), flip=True)]
    out = aug_test_vote([res, res_flip], metas, [(0, 10000)], task="bbox",
                        num_classes=3)
    assert out["bboxes"].shape[0] >= 1
    # flipped box maps back onto the original: cluster merges near it
    np.testing.assert_allclose(out["bboxes"][0], [10, 10, 30, 30],
                               atol=0.5)
    assert out["labels"][0] == 1


def test_device_vote_parity():
    """instances_vote_batch (XLA fixed-iteration) == numpy instances_vote."""
    import jax.numpy as jnp

    from lsnet_tpu.evalkit.tta import instances_vote
    from lsnet_tpu.ops.vote import instances_vote_batch

    rng = np.random.RandomState(7)
    for n in (2, 7, 15):
        base = rng.uniform(10, 80, (n, 2))
        wh = rng.uniform(10, 40, (n, 2))
        boxes = np.concatenate([base, base + wh], 1)
        # force some clusters: duplicate a few boxes with jitter
        boxes[1] = boxes[0] + rng.uniform(-2, 2, 4)
        vectors = rng.randn(n, 8)
        scores = rng.uniform(0.1, 1.0, n)
        order = np.argsort(-scores, kind="stable")
        boxes, vectors, scores = boxes[order], vectors[order], scores[order]
        rb, rv, rs = instances_vote(boxes, vectors, scores)
        ob, ov, osc, ok = instances_vote_batch(
            jnp.asarray(boxes[None], jnp.float32),
            jnp.asarray(vectors[None], jnp.float32),
            jnp.asarray(scores[None], jnp.float32),
            jnp.ones((1, n), bool))
        m = np.asarray(ok[0])
        got_s = np.asarray(osc[0])[m]
        got_b = np.asarray(ob[0])[m]
        got_v = np.asarray(ov[0])[m]
        assert got_s.shape[0] == rs.shape[0]
        np.testing.assert_allclose(np.sort(got_s), np.sort(rs), rtol=1e-5)
        # compare rows matched by score order
        ro = np.argsort(-rs, kind="stable")
        go = np.argsort(-got_s, kind="stable")
        np.testing.assert_allclose(got_b[go], rb[ro], rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(got_v[go], rv[ro], rtol=1e-4, atol=1e-3)


def test_device_vote_single_det_empty():
    import jax.numpy as jnp

    from lsnet_tpu.ops.vote import instances_vote_batch
    ob, ov, osc, ok = instances_vote_batch(
        jnp.zeros((1, 4, 4)), jnp.zeros((1, 4, 8)),
        jnp.asarray([[0.9, 0, 0, 0]]),
        jnp.asarray([[True, False, False, False]]))
    assert not np.asarray(ok).any()
