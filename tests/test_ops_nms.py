"""NMS ops vs. naive greedy reference (mirrors `nms_cpu.cpp` semantics)."""

import numpy as np
import jax.numpy as jnp

from lsnet_tpu.ops.nms import NEG_INF, batched_nms, box_iou, nms, soft_nms


def naive_iou(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / ua if ua > 0 else 0.0


def naive_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= NEG_INF / 2:
            continue
        keep.append(i)
        for j in order:
            if not suppressed[j] and naive_iou(boxes[i], boxes[j]) > thr:
                if j != i:
                    suppressed[j] = True
    return keep


def test_box_iou():
    a = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15.]])
    iou = np.asarray(box_iou(a, a))
    np.testing.assert_allclose(np.diag(iou), [1, 1], atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 25 / 175, atol=1e-6)


def test_nms_matches_naive():
    rng = np.random.RandomState(1)
    for trial in range(5):
        n = 64
        ctr = rng.uniform(0, 50, (n, 2))
        wh = rng.uniform(2, 20, (n, 2))
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        keep_idx, keep_scores, valid = nms(jnp.array(boxes), jnp.array(scores),
                                           0.5, 32)
        got = list(np.asarray(keep_idx)[np.asarray(valid)])
        want = naive_nms(boxes, scores, 0.5)[:32]
        assert got == want, f"trial {trial}: {got} != {want}"


def test_nms_with_padding():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40],
                      [0, 0, 0, 0]], np.float32)
    scores = np.array([0.9, 0.8, 0.7, NEG_INF], np.float32)
    keep_idx, _, valid = nms(jnp.array(boxes), jnp.array(scores), 0.5, 4)
    kept = list(np.asarray(keep_idx)[np.asarray(valid)])
    assert kept == [0, 2]


def test_batched_nms_separates_classes():
    # identical overlapping boxes but different classes — both survive
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10.]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1], np.int32)
    _, _, valid = batched_nms(jnp.array(boxes), jnp.array(scores),
                              jnp.array(idxs), 0.5, 4)
    assert int(np.asarray(valid).sum()) == 2
    # same class — one suppressed
    idxs_same = np.array([0, 0], np.int32)
    _, _, valid2 = batched_nms(jnp.array(boxes), jnp.array(scores),
                               jnp.array(idxs_same), 0.5, 4)
    assert int(np.asarray(valid2).sum()) == 1


def test_soft_nms_decays_scores():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, s, valid = soft_nms(jnp.array(boxes), jnp.array(scores), 0.3, 3)
    s = np.asarray(s)
    assert np.asarray(valid).all()
    assert s[0] == 0.9
    # overlapping box decayed below its raw score
    overl = np.asarray(idx).tolist().index(1)
    assert s[overl] < 0.8
