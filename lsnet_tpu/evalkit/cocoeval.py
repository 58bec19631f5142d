"""COCO-style evaluation (bbox / segm / keypoints) in pure numpy.

Functional re-implementation of the vendored evaluator
(`/root/reference/code/cocoapi/pycocotools/pycocotools/cocoeval.py`, 607
LoC): per-(image, category) greedy IoU matching honoring iscrowd and
ignore regions, accumulation into the precision[T,R,K,A,M] tensor and the
12-number summary (6 for keypoints).  Keypoint similarity is the standard
OKS with the 17 COCO sigmas (`cocoeval.py:218-247`).

The image's pycocotools is absent, so this module *is* the eval backend —
the RLE layer (:mod:`lsnet_tpu.evalkit.rle`) reproduces the reference mask
rasterization so segm numbers stay comparable.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import rle as maskUtils

OKS_SIGMAS = np.array([
    .26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
    1.07, 1.07, .87, .87, .89, .89]) / 10.0


@dataclass
class EvalParams:
    iou_type: str = "bbox"
    iou_thrs: np.ndarray = field(default_factory=lambda: np.linspace(
        0.5, 0.95, 10))
    rec_thrs: np.ndarray = field(default_factory=lambda: np.linspace(
        0.0, 1.00, 101))
    max_dets: Tuple[int, ...] = (1, 10, 100)
    area_rng: Tuple[Tuple[float, float], ...] = (
        (0, 1e10), (0, 32 ** 2), (32 ** 2, 96 ** 2), (96 ** 2, 1e10))
    area_lbl: Tuple[str, ...] = ("all", "small", "medium", "large")
    kpt_sigmas: np.ndarray = field(default_factory=lambda: OKS_SIGMAS.copy())

    @staticmethod
    def for_keypoints() -> "EvalParams":
        return EvalParams(
            iou_type="keypoints", max_dets=(20,),
            area_rng=((32 ** 2, 1e10), (32 ** 2, 96 ** 2), (96 ** 2, 1e10)),
            area_lbl=("all", "medium", "large"))


class COCOEval:
    """Evaluate detections against GT.

    gts / dts: lists of dicts with keys
      image_id, category_id, bbox [x,y,w,h], score (dt), area, iscrowd (gt),
      segmentation (segm mode), keypoints (kpt mode), ignore (optional).
    """

    def __init__(self, gts: Sequence[Dict], dts: Sequence[Dict],
                 img_sizes: Dict[int, Tuple[int, int]],
                 params: Optional[EvalParams] = None):
        self.p = params or EvalParams()
        self.img_sizes = img_sizes
        self.cat_ids = sorted({g["category_id"] for g in gts}
                              | {d["category_id"] for d in dts})
        self.img_ids = sorted({g["image_id"] for g in gts}
                              | {d["image_id"] for d in dts})
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for g in gts:
            self._gts[g["image_id"], g["category_id"]].append(g)
        for d in dts:
            self._dts[d["image_id"], d["category_id"]].append(d)
        self.eval: Dict = {}
        self.stats = np.zeros(0)

    # ------------------------------------------------------------- IoU

    def _compute_iou(self, img_id, cat_id) -> np.ndarray:
        p = self.p
        gts = self._gts[img_id, cat_id]
        dts = sorted(self._dts[img_id, cat_id],
                     key=lambda d: -d["score"])[: p.max_dets[-1]]
        if not gts or not dts:
            return np.zeros((0, 0))
        iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
        if p.iou_type == "bbox":
            d = [np.asarray(x["bbox"], np.float64) for x in dts]
            g = [np.asarray(x["bbox"], np.float64) for x in gts]
            return maskUtils.iou(d, g, iscrowd)
        if p.iou_type == "segm":
            h, w = self.img_sizes[img_id]
            d = [maskUtils.segm_to_rle(x["segmentation"], h, w) for x in dts]
            g = [maskUtils.segm_to_rle(x["segmentation"], h, w) for x in gts]
            return maskUtils.iou(d, g, iscrowd)
        return self._compute_oks(dts, gts)

    def _compute_oks(self, dts, gts) -> np.ndarray:
        sig = self.p.kpt_sigmas
        var = (sig * 2) ** 2
        k = len(sig)
        ious = np.zeros((len(dts), len(gts)))
        for j, gt in enumerate(gts):
            g = np.asarray(gt["keypoints"], np.float64)
            xg, yg, vg = g[0::3], g[1::3], g[2::3]
            k1 = int((vg > 0).sum())
            bb = gt["bbox"]
            x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
            y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
            for i, dt in enumerate(dts):
                d = np.asarray(dt["keypoints"], np.float64)
                xd, yd = d[0::3], d[1::3]
                if k1 > 0:
                    dx, dy = xd - xg, yd - yg
                else:
                    z = np.zeros(k)
                    dx = np.maximum(z, x0 - xd) + np.maximum(z, xd - x1)
                    dy = np.maximum(z, y0 - yd) + np.maximum(z, yd - y1)
                e = (dx ** 2 + dy ** 2) / var / (gt["area"] + np.spacing(1)) / 2
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0] if e.shape[0] else 0
        return ious

    # ------------------------------------------------------------- match

    def _evaluate_img(self, img_id, cat_id, area_rng, max_det, ious):
        p = self.p
        gts = self._gts[img_id, cat_id]
        dts = sorted(self._dts[img_id, cat_id], key=lambda d: -d["score"])
        dts = dts[:max_det]
        if not gts and not dts:
            return None

        for g in gts:
            ignore = g.get("ignore", 0) or g.get("iscrowd", 0)
            area = g.get("area", g["bbox"][2] * g["bbox"][3])
            g["_ignore"] = 1 if (ignore or area < area_rng[0]
                                 or area > area_rng[1]) else 0
        gt_order = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
        gts_sorted = [gts[i] for i in gt_order]
        iscrowd = [int(g.get("iscrowd", 0)) for g in gts_sorted]
        ious_s = ious[:, gt_order] if ious.size else ious

        T = len(p.iou_thrs)
        G, D = len(gts_sorted), len(dts)
        gtm = np.zeros((T, G), np.int64)
        dtm = np.zeros((T, D), np.int64)
        gt_ig = np.array([g["_ignore"] for g in gts_sorted])
        dt_ig = np.zeros((T, D))
        if ious_s.size:
            for t, thr in enumerate(p.iou_thrs):
                for d in range(D):
                    best = min(thr, 1 - 1e-10)
                    m = -1
                    for g in range(G):
                        if gtm[t, g] > 0 and not iscrowd[g]:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[g] == 1:
                            break
                        if ious_s[d, g] < best:
                            continue
                        best = ious_s[d, g]
                        m = g
                    if m == -1:
                        continue
                    dt_ig[t, d] = gt_ig[m]
                    dtm[t, d] = gts_sorted[m].get("id", m + 1)
                    gtm[t, m] = dts[d].get("id", d + 1)
        # unmatched dets outside the area range are ignored
        a = np.array([(d["area"] if "area" in d else
                       d["bbox"][2] * d["bbox"][3]) < area_rng[0]
                      or (d.get("area", d["bbox"][2] * d["bbox"][3]))
                      > area_rng[1] for d in dts]).reshape(1, -1)
        dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0,
                                                    np.repeat(a, T, 0)))
        return {
            "dt_matches": dtm,
            "dt_scores": np.array([d["score"] for d in dts]),
            "dt_ignore": dt_ig,
            "gt_ignore": gt_ig,
            "num_gt": int((gt_ig == 0).sum()),
        }

    # ------------------------------------------------------------- run

    def evaluate(self):
        p = self.p
        self._ious = {(i, c): self._compute_iou(i, c)
                      for i in self.img_ids for c in self.cat_ids}
        T = len(p.iou_thrs)
        R = len(p.rec_thrs)
        K = len(self.cat_ids)
        A = len(p.area_rng)
        M = len(p.max_dets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))

        for k, cat in enumerate(self.cat_ids):
            for a, arng in enumerate(p.area_rng):
                for m, max_det in enumerate(p.max_dets):
                    evals = [self._evaluate_img(i, cat, arng, max_det,
                                                self._ious[i, cat])
                             for i in self.img_ids]
                    evals = [e for e in evals if e is not None]
                    if not evals:
                        continue
                    dt_scores = np.concatenate(
                        [e["dt_scores"] for e in evals])
                    order = np.argsort(-dt_scores, kind="mergesort")
                    sorted_scores = dt_scores[order]
                    dtm = np.concatenate(
                        [e["dt_matches"] for e in evals], axis=1)[:, order]
                    dt_ig = np.concatenate(
                        [e["dt_ignore"] for e in evals], axis=1)[:, order]
                    npig = sum(e["num_gt"] for e in evals)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm > 0, np.logical_not(dt_ig))
                    fps = np.logical_and(dtm == 0, np.logical_not(dt_ig))
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t in range(T):
                        tp, fp = tp_sum[t], fp_sum[t]
                        rc = tp / npig
                        pr = tp / np.maximum(tp + fp, np.spacing(1))
                        recall[t, k, a, m] = rc[-1] if rc.size else 0
                        q = np.zeros(R)
                        ss = np.zeros(R)
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, p.rec_thrs, side="left")
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                                ss[ri] = sorted_scores[pi]
                        precision[t, :, k, a, m] = q
                        scores[t, :, k, a, m] = ss
        self.eval = {"precision": precision, "recall": recall,
                     "scores": scores}
        return self

    # ------------------------------------------------------------- summary

    def _summarize(self, ap=1, iou_thr=None, area="all", max_dets=100):
        p = self.p
        aind = [i for i, l in enumerate(p.area_lbl) if l == area]
        mind = [i for i, d in enumerate(p.max_dets) if d == max_dets]
        if ap:
            s = self.eval["precision"]
            if iou_thr is not None:
                t = np.where(np.isclose(p.iou_thrs, iou_thr))[0]
                s = s[t]
            s = s[:, :, :, aind, mind]
        else:
            s = self.eval["recall"]
            if iou_thr is not None:
                t = np.where(np.isclose(p.iou_thrs, iou_thr))[0]
                s = s[t]
            s = s[:, :, aind, mind]
        valid = s[s > -1]
        return float(valid.mean()) if valid.size else -1.0

    def summarize(self) -> np.ndarray:
        p = self.p
        if p.iou_type == "keypoints":
            md = p.max_dets[0]
            stats = np.array([
                self._summarize(1, max_dets=md),
                self._summarize(1, 0.5, max_dets=md),
                self._summarize(1, 0.75, max_dets=md),
                self._summarize(1, area="medium", max_dets=md),
                self._summarize(1, area="large", max_dets=md),
                self._summarize(0, max_dets=md),
                self._summarize(0, 0.5, max_dets=md),
                self._summarize(0, 0.75, max_dets=md),
                self._summarize(0, area="medium", max_dets=md),
                self._summarize(0, area="large", max_dets=md),
            ])
        else:
            stats = np.array([
                self._summarize(1),
                self._summarize(1, 0.5),
                self._summarize(1, 0.75),
                self._summarize(1, area="small"),
                self._summarize(1, area="medium"),
                self._summarize(1, area="large"),
                self._summarize(0, max_dets=p.max_dets[0]),
                self._summarize(0, max_dets=p.max_dets[1]),
                self._summarize(0, max_dets=p.max_dets[2]),
                self._summarize(0, area="small"),
                self._summarize(0, area="medium"),
                self._summarize(0, area="large"),
            ])
        self.stats = stats
        return stats
