"""On-device soft-voting cluster merge (TTA vote).

XLA reformulation of the reference `instances_vote`
(`/root/reference/code/mmdet/models/detectors/lsnet.py:229-299`, CPU numpy
while-loop): fixed-iteration `lax.fori_loop` over padded per-class slots,
vmapped over classes — ONE device call merges every class of every image
instead of a host loop (VERDICT r2 item 9; the numpy implementation in
:mod:`lsnet_tpu.evalkit.tta` remains the parity oracle).

Semantics mirrored exactly:
* inputs with <= 1 valid det return empty (reference early-out quirk);
* cluster = IoU >= vote_thresh with the best-scoring live det;
* merged box/vector = score-weighted average, score = cluster max;
* cluster members re-emitted as "soft" dets with score*(1-IoU) when that
  stays >= soft_thresh (the seed's IoU is 1 -> always dropped);
* output sorted by score, padded slots invalid.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
NEG_INF = -1e30


@partial(jax.jit, static_argnames=("vote_thresh", "soft_thresh"))
def instances_vote_batch(boxes: Array, vectors: Array, scores: Array,
                         valid: Array, *, vote_thresh: float = 0.66,
                         soft_thresh: float = 0.05
                         ) -> Tuple[Array, Array, Array, Array]:
    """boxes (K, N, 4), vectors (K, N, P), scores (K, N), valid (K, N).

    Returns (boxes (K, 2N, 4), vectors (K, 2N, P), scores (K, 2N),
    valid (K, 2N)) — merged + soft dets per class, score-sorted."""

    def one(boxes, vectors, scores, valid):
        N = boxes.shape[0]
        P = vectors.shape[1]
        eps = 1e-6
        # reference quirk: <=1 input dets -> empty result
        enough = jnp.sum(valid.astype(jnp.int32)) > 1
        live0 = valid & enough
        area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) \
            * jnp.clip(boxes[:, 3] - boxes[:, 1], 0)

        def body(_, st):
            live, m_box, m_vec, m_sc, m_ok, s_sc, s_ok = st
            sc_live = jnp.where(live, scores, NEG_INF)
            seed = jnp.argmax(sc_live)
            any_live = jnp.any(live)
            sb = boxes[seed]
            xx1 = jnp.maximum(sb[0], boxes[:, 0])
            yy1 = jnp.maximum(sb[1], boxes[:, 1])
            xx2 = jnp.minimum(sb[2], boxes[:, 2])
            yy2 = jnp.minimum(sb[3], boxes[:, 3])
            inter = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
            union = jnp.maximum(area[seed] + area - inter, eps)
            iou = (inter / union).at[seed].set(1.0)
            cluster = live & (iou >= vote_thresh) & any_live
            cf = cluster.astype(jnp.float32)
            s = jnp.maximum(jnp.sum(scores * cf), eps)
            mb = jnp.sum(boxes * (scores * cf)[:, None], 0) / s
            mv = jnp.sum(vectors * (scores * cf)[:, None], 0) / s
            msc = jnp.max(jnp.where(cluster, scores, NEG_INF))
            # soft re-emission (only when the cluster has >1 member)
            multi = jnp.sum(cf) > 1.5
            soft = scores * (1.0 - iou)
            emit = cluster & multi & (soft >= soft_thresh)
            s_sc = jnp.where(emit, soft, s_sc)
            s_ok = s_ok | emit
            i = jnp.sum(m_ok.astype(jnp.int32))    # next merged slot
            m_box = jax.lax.cond(
                any_live, lambda: m_box.at[i].set(mb), lambda: m_box)
            m_vec = jax.lax.cond(
                any_live, lambda: m_vec.at[i].set(mv), lambda: m_vec)
            m_sc = jax.lax.cond(
                any_live, lambda: m_sc.at[i].set(msc), lambda: m_sc)
            m_ok = jax.lax.cond(
                any_live, lambda: m_ok.at[i].set(True), lambda: m_ok)
            live = live & ~cluster
            return live, m_box, m_vec, m_sc, m_ok, s_sc, s_ok

        st = (live0,
              jnp.zeros((N, 4), boxes.dtype),
              jnp.zeros((N, P), vectors.dtype),
              jnp.zeros((N,), scores.dtype),
              jnp.zeros((N,), bool),
              jnp.zeros((N,), scores.dtype),
              jnp.zeros((N,), bool))
        _, m_box, m_vec, m_sc, m_ok, s_sc, s_ok = jax.lax.fori_loop(
            0, N, body, st)
        out_box = jnp.concatenate([m_box, boxes], 0)
        out_vec = jnp.concatenate([m_vec, vectors], 0)
        out_sc = jnp.concatenate([m_sc, s_sc], 0)
        out_ok = jnp.concatenate([m_ok, s_ok], 0)
        order = jnp.argsort(-jnp.where(out_ok, out_sc, NEG_INF))
        return (out_box[order], out_vec[order], out_sc[order],
                out_ok[order])

    return jax.vmap(one)(boxes, vectors, scores, valid)
