"""Generate golden numerical-parity fixtures from the reference torch code.

Runs the reference's CPU-runnable modules (cross-IOU loss, landmark
encode/decode, assigners, polygon pipeline, GT preprocessing) on seeded
random inputs and records (inputs, outputs) into ``tests/golden/*.npz``.
The reference source is loaded from /root/reference at generation time with
its framework imports stubbed out — nothing from it is copied into this
repo; only the numeric fixtures are committed.

Usage:  python tools/gen_golden.py  [--out tests/golden]

Reference oracles exercised (file:line):
* cross_iou_loss          code/mmdet/models/losses/cross_iou_loss.py:10-172
* LSHead encode/decode    code/mmdet/models/dense_heads/lsnet_head.py:321-454
* LSHead GT preprocessing lsnet_head.py:1677-1829
* ATSSAssigner            code/mmdet/core/bbox/assigners/atss_assigner.py:29-164
* CentroidAssigner        code/mmdet/core/bbox/assigners/centroid_assigner.py:26-140
* LoadAnnotations polygon code/mmdet/datasets/pipelines/loading.py:314-441
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import types

import numpy as np

REF = "/root/reference/code"


# --------------------------------------------------------------- stub tools

class _AnyAttr(types.ModuleType):
    """Module stub whose attributes are permissive no-op callables."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _noop_factory(name)


def _noop_factory(name):
    class _Noop:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return _Noop()

        def __getattr__(self, n):
            if n.startswith("__"):
                raise AttributeError(n)
            return _Noop()

    _Noop.__name__ = name
    return _Noop


class _Registry:
    def register_module(self, *a, **k):
        def deco(obj=None):
            return obj
        if a and not isinstance(a[0], str) and a[0] is not None:
            return a[0]
        return deco


def _mk_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _load(file_path, module_name, package=None):
    spec = importlib.util.spec_from_file_location(module_name, file_path)
    mod = importlib.util.module_from_spec(spec)
    if package:
        mod.__package__ = package
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


# -------------------------------------------------------- reference loaders

def load_cross_iou():
    """Load cross_iou_loss.py with builder/utils stubs, and the real
    weighted_loss util (itself loaded from the reference)."""
    pkg = _mk_module("refloss")
    pkg.__path__ = []
    _mk_module("refloss.builder", LOSSES=_Registry())
    utils = _load(f"{REF}/mmdet/models/losses/utils.py",
                  "refloss.losses_utils")
    sub = _mk_module("refloss.losses")
    sub.__path__ = []
    _mk_module("refloss.losses.utils",
               weighted_loss=utils.weighted_loss,
               weight_reduce_loss=utils.weight_reduce_loss)
    # cross_iou_loss.py does `from ..builder import LOSSES` and
    # `from .utils import weighted_loss`
    return _load(f"{REF}/mmdet/models/losses/cross_iou_loss.py",
                 "refloss.losses.cross_iou_loss", package="refloss.losses")


def load_lshead_class():
    """Load lsnet_head.py with all framework imports stubbed; returns the
    LSHead class (only its pure-math methods are used)."""
    _mk_module("mmcv")
    _mk_module("mmcv.cnn",
               ConvModule=_noop_factory("ConvModule"),
               bias_init_with_prob=lambda p: 0.0,
               normal_init=lambda *a, **k: None,
               kaiming_init=lambda *a, **k: None)
    _mk_module("mmdet")
    _mk_module("mmdet.core",
               PointGenerator=_noop_factory("PointGenerator"),
               build_assigner=lambda *a, **k: None,
               build_sampler=lambda *a, **k: None,
               images_to_levels=lambda *a, **k: None,
               multi_apply=lambda *a, **k: None,
               multiclass_nms=lambda *a, **k: None,
               multiclass_nms_lsvr=lambda *a, **k: None,
               unmap=lambda *a, **k: None)
    _mk_module("mmdet.ops",
               DeformConv=_noop_factory("DeformConv"),
               PyramidDeformConv=_noop_factory("PyramidDeformConv"),
               DeformConvPack=_noop_factory("DeformConvPack"),
               ModulatedDeformConvPack=_noop_factory(
                   "ModulatedDeformConvPack"))
    pkg = _mk_module("refheads")
    pkg.__path__ = []
    _mk_module("refheads.builder", HEADS=_Registry(),
               build_loss=lambda cfg: None)
    sub = _mk_module("refheads.dense")
    sub.__path__ = []

    class _Base:
        pass

    _mk_module("refheads.dense.anchor_free_head", AnchorFreeHead=_Base)
    mod = _load(f"{REF}/mmdet/models/dense_heads/lsnet_head.py",
                "refheads.dense.lsnet_head", package="refheads.dense")
    return mod.LSHead


def load_assigners():
    pkg = _mk_module("refassign")
    pkg.__path__ = []
    # assign_result.py does `from mmdet.utils import util_mixins`
    um = _load(f"{REF}/mmdet/utils/util_mixins.py", "ref_util_mixins")
    mmdet = sys.modules.get("mmdet") or _mk_module("mmdet")
    mmdet.__path__ = []
    mmdet.utils = _mk_module("mmdet.utils", util_mixins=um)
    ar = _load(f"{REF}/mmdet/core/bbox/assigners/assign_result.py",
               "refassign.assign_result")
    _mk_module("refassign.bbox")
    iou2d = load_iou2d()
    _mk_module("refassign.builder", BBOX_ASSIGNERS=_Registry())
    _mk_module("refassign.iou_calculators",
               build_iou_calculator=lambda cfg: iou2d.BboxOverlaps2D())

    class _BaseAssigner:
        pass

    _mk_module("refassign.base_assigner", BaseAssigner=_BaseAssigner)
    sub = _mk_module("refassign.assigners")
    sub.__path__ = []
    for name in ("builder", "iou_calculators"):
        sys.modules[f"refassign.assigners.{name}"] = \
            sys.modules[f"refassign.{name}"]
    sys.modules["refassign.assigners.assign_result"] = ar
    sys.modules["refassign.assigners.base_assigner"] = \
        sys.modules["refassign.base_assigner"]
    # the assigner files do `from ..builder import ...` /
    # `from .assign_result import ...` — give them a package whose parent
    # carries the stubs
    parent = _mk_module("refassign2")
    parent.__path__ = []
    sys.modules["refassign2.builder"] = sys.modules["refassign.builder"]
    sys.modules["refassign2.iou_calculators"] = \
        sys.modules["refassign.iou_calculators"]
    leaf = _mk_module("refassign2.assigners")
    leaf.__path__ = []
    sys.modules["refassign2.assigners.assign_result"] = ar
    sys.modules["refassign2.assigners.base_assigner"] = \
        sys.modules["refassign.base_assigner"]
    atss = _load(f"{REF}/mmdet/core/bbox/assigners/atss_assigner.py",
                 "refassign2.assigners.atss_assigner",
                 package="refassign2.assigners")
    cent = _load(f"{REF}/mmdet/core/bbox/assigners/centroid_assigner.py",
                 "refassign2.assigners.centroid_assigner",
                 package="refassign2.assigners")
    return atss.ATSSAssigner, cent.CentroidAssigner


def load_iou2d():
    if "refiou2.iou2d_calculator" in sys.modules:
        return sys.modules["refiou2.iou2d_calculator"]
    pkg = _mk_module("refiou2")
    pkg.__path__ = []
    _mk_module("refiou2.builder", IOU_CALCULATORS=_Registry())
    return _load(f"{REF}/mmdet/core/bbox/iou_calculators/iou2d_calculator.py",
                 "refiou2.iou2d_calculator", package="refiou2")


def load_load_annotations():
    """LoadAnnotations with mmcv/pycocotools/shapely/mmdet.core stubbed.
    shapely's Polygon.exterior.is_ccw is replaced with the shoelace-sign
    definition (identical semantics for simple rings)."""
    _mk_module("mmcv")

    class _Ring:
        def __init__(self, coords):
            c = np.asarray(coords, np.float64)
            x, y = c[:, 0], c[:, 1]
            signed = 0.5 * (np.dot(x, np.roll(y, -1))
                            - np.dot(y, np.roll(x, -1)))
            self.is_ccw = bool(signed > 0)

    class _Polygon:
        def __init__(self, coords):
            self.exterior = _Ring(coords)

    _mk_module("shapely")
    _mk_module("shapely.geometry", Polygon=_Polygon)
    _mk_module("pycocotools")
    _mk_module("pycocotools.mask", frPyObjects=lambda *a: None,
               decode=lambda *a: None, merge=lambda *a: None)
    _mk_module("mmdet")
    _mk_module("mmdet.core", BitmapMasks=_noop_factory("BitmapMasks"),
               PolygonMasks=_noop_factory("PolygonMasks"))
    pkg = _mk_module("refpipe")
    pkg.__path__ = []
    _mk_module("refpipe.builder", PIPELINES=_Registry())
    sub = _mk_module("refpipe.pipelines")
    sub.__path__ = []
    mod = _load(f"{REF}/mmdet/datasets/pipelines/loading.py",
                "refpipe.pipelines.loading", package="refpipe.pipelines")
    return mod.LoadAnnotations


# ------------------------------------------------------------- golden cases

def gen_cross_iou(out):
    import torch
    mod = load_cross_iou()
    rng = np.random.RandomState(0)
    data = {}

    def one(tag, loss_type, D, nv, stride=9):
        N = 16
        pred = np.abs(rng.randn(N, D)).astype(np.float32) + 0.05
        # GT layout: one positive slot per (neg,pos) pair; others zero
        pos = rng.randint(0, 2, size=(N, D // 2)).astype(bool)
        pos_inds = np.zeros((N, D), bool)
        pos_inds[:, 0::2] = ~pos
        pos_inds[:, 1::2] = pos
        target = np.zeros((N, D), np.float32)
        target[pos_inds] = np.abs(rng.randn(pos_inds.sum())) + 0.05
        weight = (rng.rand(N) > 0.25).astype(np.float32)
        anchor = np.concatenate(
            [rng.rand(N, 2).astype(np.float32) * 64,
             np.full((N, 1), 8, np.float32)], axis=1)
        x1y1 = rng.rand(N, 2).astype(np.float32) * 32
        wh = rng.rand(N, 2).astype(np.float32) * 32 + 4
        bbox_gt = np.concatenate([x1y1, x1y1 + wh], 1)
        vs = rng.randint(0, 3, size=(N, nv)).astype(np.float32)
        avg_factor = float(weight.sum()) + 1.0

        kwargs = dict(loss_type=loss_type,
                      anchor_pts=torch.from_numpy(anchor),
                      pos_inds=torch.from_numpy(pos_inds),
                      reduction="mean", avg_factor=avg_factor,
                      alpha=0.2, stride=stride)
        if loss_type == "keypoint":
            kwargs["vs"] = torch.from_numpy(vs.copy())
        else:
            kwargs["bbox_gt"] = torch.from_numpy(bbox_gt)
        loss = mod.cross_iou_loss(torch.from_numpy(pred),
                                  torch.from_numpy(target.copy()),
                                  torch.from_numpy(weight), **kwargs)
        data.update({
            f"{tag}_pred": pred, f"{tag}_target": target,
            f"{tag}_pos_inds": pos_inds, f"{tag}_weight": weight,
            f"{tag}_anchor": anchor, f"{tag}_bbox_gt": bbox_gt,
            f"{tag}_vs": vs, f"{tag}_avg_factor": avg_factor,
            f"{tag}_loss": np.float32(loss.item()),
        })

    one("bbox", "bbox", 20, 4)
    one("polygon", "polygon", 148, 36, stride=9)
    one("keypoint", "keypoint", 72, 17)
    np.savez(os.path.join(out, "cross_iou.npz"), **data)
    print("cross_iou.npz:", {k: v for k, v in data.items()
                             if k.endswith("_loss")})


def gen_head_encode(out):
    import torch
    LSHead = load_lshead_class()
    head = LSHead.__new__(LSHead)
    rng = np.random.RandomState(1)
    data = {}

    # extreme_points2bbox on a (B, 20, H, W) map
    pts = rng.randn(2, 20, 3, 4).astype(np.float32)
    ext, bbox = head.extreme_points2bbox(torch.from_numpy(pts),
                                         y_first=True, extreme=True)
    data["e2b_pts"] = pts
    data["e2b_extremes"] = ext.numpy()
    data["e2b_bbox"] = bbox.numpy()

    # vectors2bbox on a (B, 148, H, W) map
    vpts = rng.randn(2, 148, 3, 4).astype(np.float32)
    vec, vbox = head.vectors2bbox(torch.from_numpy(vpts), y_first=True,
                                  vector=True)
    data["v2b_pts"] = vpts
    data["v2b_vectors"] = vec.numpy()
    data["v2b_bbox"] = vbox.numpy()

    # get_pred_reg — bbox mode (two raw regs)
    head.task = "bbox"
    head.num_vectors = 4
    head.num_kernel_points = 9
    r1 = np.abs(rng.randn(2, 20, 3, 4)).astype(np.float32)
    r2 = rng.randn(2, 8, 3, 4).astype(np.float32)
    reg = head.get_pred_reg(torch.from_numpy(r1), torch.from_numpy(r2))
    data["predreg_bbox_r1"] = r1
    data["predreg_bbox_r2"] = r2
    data["predreg_bbox_out"] = reg.numpy()

    # get_pred_reg — segm mode
    head.task = "segm"
    head.num_vectors = 36
    rs = np.abs(rng.randn(2, 148, 3, 4)).astype(np.float32)
    reg_s = head.get_pred_reg(torch.from_numpy(rs), None)
    data["predreg_segm_r1"] = rs
    data["predreg_segm_out"] = reg_s.numpy()

    # get_pred_reg — pose mode
    head.task = "pose_bbox"
    head.num_vectors = 17
    rp = np.abs(rng.randn(2, 72, 3, 4)).astype(np.float32)
    reg_p = head.get_pred_reg(torch.from_numpy(rp), None)
    data["predreg_pose_r1"] = rp
    data["predreg_pose_out"] = reg_p.numpy()

    # get_bbox_gt_reg
    N = 12
    gt_pts = (rng.rand(N, 10) * 64).astype(np.float32)
    anchor = np.concatenate([(rng.rand(N, 2) * 64).astype(np.float32),
                             np.full((N, 1), 8, np.float32)], 1)
    bw = np.zeros((N, 4), np.float32)
    bw[rng.rand(N) > 0.3] = 1.0
    yx_reg, yx_inds = head.get_bbox_gt_reg(torch.from_numpy(gt_pts),
                                           torch.from_numpy(anchor),
                                           torch.from_numpy(bw))
    data["gtreg_bbox_pts"] = gt_pts
    data["gtreg_bbox_anchor"] = anchor
    data["gtreg_bbox_weights"] = bw
    data["gtreg_bbox_out"] = yx_reg.numpy()
    data["gtreg_bbox_inds"] = yx_inds.numpy()

    # get_poly_gt_reg (nv=36 -> 74 coords)
    head.num_vectors = 36
    gt_poly = (rng.rand(N, 74) * 64).astype(np.float32)
    yx_reg_p, yx_inds_p = head.get_poly_gt_reg(torch.from_numpy(gt_poly),
                                               torch.from_numpy(anchor),
                                               torch.from_numpy(bw))
    data["gtreg_poly_pts"] = gt_poly
    data["gtreg_poly_out"] = yx_reg_p.numpy()
    data["gtreg_poly_inds"] = yx_inds_p.numpy()

    # get_border_center
    boxes = np.stack([(rng.rand(N) * 32), (rng.rand(N) * 32),
                      32 + rng.rand(N) * 32, 32 + rng.rand(N) * 32],
                     1).astype(np.float32)
    bc = head.get_border_center([torch.from_numpy(boxes)])[0]
    data["border_center_boxes"] = boxes
    data["border_center_out"] = bc.numpy()

    # process_keypoints_with_bbox / _kbox (nv=17)
    head.num_vectors = 17
    kvs = (rng.rand(N, 51) * 64).astype(np.float32)
    kvs[:, 2::3] = rng.randint(0, 3, size=(N, 17)).astype(np.float32)
    kvs[0, 2::3] = np.concatenate([np.zeros(8), np.ones(9)]).astype(
        np.float32)  # mixed-visibility row
    kb, vsb = head.process_keypoints_with_bbox(
        [torch.from_numpy(boxes)], [torch.from_numpy(kvs.copy())])
    data["kp_bbox_kvs"] = kvs
    data["kp_bbox_out"] = kb[0].numpy()
    data["kp_bbox_vs"] = vsb[0].numpy()
    kk, kbb, vsk = head.process_keypoints_with_kbox(
        [torch.from_numpy(kvs.copy())])
    data["kp_kbox_out"] = kk[0].numpy()
    data["kp_kbox_boxes"] = kbb[0].numpy()
    data["kp_kbox_vs"] = vsk[0].numpy()

    np.savez(os.path.join(out, "head_encode.npz"), **data)
    print("head_encode.npz written")


def gen_assigners(out):
    import torch
    ATSSAssigner, CentroidAssigner = load_assigners()
    iou2d = load_iou2d()
    rng = np.random.RandomState(2)
    data = {}

    # grid points across 3 levels (stride 8/16/32 over a 128x128 image;
    # every level must have >= topk points for ATSS)
    pts, nlvl = [], []
    for s in (8, 16, 32):
        n = 128 // s
        yy, xx = np.mgrid[0:n, 0:n]
        p = np.stack([(xx.ravel() + 0.0) * s, (yy.ravel() + 0.0) * s,
                      np.full(n * n, s)], 1).astype(np.float32)
        pts.append(p)
        nlvl.append(n * n)
    points = np.concatenate(pts)

    G = 5
    x1y1 = rng.rand(G, 2).astype(np.float32) * 28
    wh = rng.rand(G, 2).astype(np.float32) * 30 + 6
    gt_bboxes = np.concatenate([x1y1, x1y1 + wh], 1)
    gt_labels = rng.randint(0, 3, G).astype(np.int64)

    # ATSS on synthetic candidate boxes centered at grid points
    scale = 4
    half = points[:, 2:3] * scale / 2
    cand = np.concatenate([points[:, :2] - half, points[:, :2] + half],
                          1).astype(np.float32)
    cand += rng.randn(*cand.shape).astype(np.float32) * 2.0
    atss = ATSSAssigner(topk=9)
    res = atss.assign(torch.from_numpy(cand), nlvl,
                      torch.from_numpy(gt_bboxes), None,
                      torch.from_numpy(gt_labels))
    data["atss_cand"] = cand
    data["atss_num_level"] = np.asarray(nlvl)
    data["atss_gt"] = gt_bboxes
    data["atss_labels"] = gt_labels
    data["atss_assigned"] = res.gt_inds.numpy()
    data["atss_assigned_labels"] = res.labels.numpy()

    # reference IoU matrix as its own oracle
    ious = iou2d.BboxOverlaps2D()(torch.from_numpy(cand),
                                  torch.from_numpy(gt_bboxes))
    data["iou_matrix"] = ious.numpy()

    # Centroid, both iou types; gt extreme points from border centers
    t = np.stack([(gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2, gt_bboxes[:, 1]], 1)
    l = np.stack([gt_bboxes[:, 0], (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2], 1)
    b = np.stack([(gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2, gt_bboxes[:, 3]], 1)
    r = np.stack([gt_bboxes[:, 2], (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2], 1)
    c = np.stack([(gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2,
                  (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2], 1)
    # jitter the extremes off the border midpoints (realistic LSVR)
    jit = rng.randn(G, 2).astype(np.float32)
    gt_ext = np.concatenate([t + jit * 0.5, l, b - jit * 0.5, r, c],
                            1).astype(np.float32)
    for iou_type in ("center", "centroid"):
        ca = CentroidAssigner(scale=4, pos_num=1, iou_type=iou_type)
        res = ca.assign(torch.from_numpy(points),
                        torch.from_numpy(gt_bboxes),
                        torch.from_numpy(gt_ext), None,
                        torch.from_numpy(gt_labels))
        data[f"cent_{iou_type}_assigned"] = res.gt_inds.numpy()
        data[f"cent_{iou_type}_labels"] = res.labels.numpy()
    data["cent_points"] = points
    data["cent_gt"] = gt_bboxes
    data["cent_ext"] = gt_ext
    data["cent_gt_labels"] = gt_labels

    np.savez(os.path.join(out, "assigners.npz"), **data)
    print("assigners.npz written; atss pos:",
          int((data["atss_assigned"] > 0).sum()),
          "cent pos:", int((data["cent_center_assigned"] > 0).sum()))


def gen_polygons(out):
    LoadAnnotations = load_load_annotations()
    la = LoadAnnotations.__new__(LoadAnnotations)
    la.spline_poly_num = 360
    la.spline_num = 10
    rng = np.random.RandomState(3)
    data = {}

    # star-ish simple polygons (ccw + cw), up- and down-sampling cases
    def star(n, r0, r1, cx, cy, ccw=True):
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        rad = np.where(np.arange(n) % 2 == 0, r0, r1)
        x = cx + rad * np.cos(ang)
        y = cy + rad * np.sin(ang)
        p = np.stack([x, y], 1).astype(np.float64)
        return p if ccw else p[::-1].copy()

    polys = {
        "up": star(12, 20, 10, 32, 32),            # 12 -> 360 upsample
        "down": star(500, 25, 14, 40, 40),         # 500 -> 360 downsample
        "cw": star(16, 18, 9, 30, 30, ccw=False),
    }
    for tag, p in polys.items():
        data[f"{tag}_in"] = p
        data[f"{tag}_uniform"] = la.uniformsample(p.copy(), 360)
        flat = [p.reshape(-1).tolist()]
        bbox = np.array([p[:, 0].min(), p[:, 1].min(),
                         p[:, 0].max(), p[:, 1].max()], np.float32)
        data[f"{tag}_bbox"] = bbox
        res = la.unify_polygons(flat, bbox)
        data[f"{tag}_unified"] = np.asarray(res[0])

    # tiny-polygon fallback -> bbox rectangle
    tiny = np.array([[1.0, 1.0], [1.2, 1.0], [1.2, 1.2]])
    bbox = np.array([5.0, 6.0, 25.0, 30.0], np.float32)
    res = la.unify_polygons([tiny.reshape(-1).tolist()], bbox)
    data["tiny_bbox"] = bbox
    data["tiny_unified"] = np.asarray(res[0])

    np.savez(os.path.join(out, "polygons.npz"), **data)
    print("polygons.npz written")




# ----------------------------------------------------- backbone fwd parity

def load_backbone_classes():
    """Load the reference ResNet/ResNeXt + FPN as RUNNABLE torch modules:
    torch is real; only the mmcv layer factories are backed by minimal
    real implementations (Conv2d / BatchNorm2d / GroupNorm), so the
    forward math is 100% reference code."""
    import torch
    import torch.nn as nn

    def build_conv_layer(cfg, *args, **kwargs):
        return nn.Conv2d(*args, **kwargs)

    def build_norm_layer(cfg, num_features, postfix=""):
        cfg = cfg or dict(type="BN")
        if cfg.get("type") == "GN":
            name = f"gn{postfix}" if postfix else "gn"
            return name, nn.GroupNorm(cfg["num_groups"], num_features)
        name = f"bn{postfix}" if postfix else "bn"
        return name, nn.BatchNorm2d(num_features)

    class ConvModule(nn.Module):
        """mmcv ConvModule subset used by FPN: conv (+norm) (+act)."""

        def __init__(self, in_ch, out_ch, k, stride=1, padding=0,
                     conv_cfg=None, norm_cfg=None, act_cfg=None, **kw):
            super().__init__()
            self.conv = nn.Conv2d(in_ch, out_ch, k, stride, padding,
                                  bias=norm_cfg is None)
            self.with_norm = norm_cfg is not None
            if self.with_norm:
                name, norm = build_norm_layer(norm_cfg, out_ch)
                self.norm_name = name
                self.add_module(name, norm)
            self.with_act = act_cfg is not None

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = getattr(self, self.norm_name)(x)
            if self.with_act:
                x = torch.relu(x)
            return x

    _mk_module("mmcv")
    _mk_module("mmcv.cnn",
               build_conv_layer=build_conv_layer,
               build_norm_layer=build_norm_layer,
               ConvModule=ConvModule,
               constant_init=lambda *a, **k: None,
               kaiming_init=lambda *a, **k: None,
               xavier_init=lambda *a, **k: None)
    _mk_module("mmcv.runner", load_checkpoint=lambda *a, **k: None)
    _mk_module("mmdet")
    _mk_module("mmdet.ops", build_plugin_layer=lambda *a, **k: ("p", None))
    _mk_module("mmdet.utils", get_root_logger=lambda *a, **k: None)
    _mk_module("mmdet.core", auto_fp16=lambda *a, **k: (lambda f: f))
    pkg = _mk_module("refmodels")
    pkg.__path__ = []
    _mk_module("refmodels.builder", BACKBONES=_Registry(),
               NECKS=_Registry())
    res_layer = _load(f"{REF}/mmdet/models/utils/res_layer.py",
                      "refmodels.utils_res_layer")
    sub = _mk_module("refmodels.utils")
    sub.__path__ = []
    sys.modules["refmodels.utils"].ResLayer = res_layer.ResLayer
    bbpkg = _mk_module("refmodels.backbones")
    bbpkg.__path__ = []
    nkpkg = _mk_module("refmodels.necks")
    nkpkg.__path__ = []
    resnet = _load(f"{REF}/mmdet/models/backbones/resnet.py",
                   "refmodels.backbones.resnet",
                   package="refmodels.backbones")
    resnext = _load(f"{REF}/mmdet/models/backbones/resnext.py",
                    "refmodels.backbones.resnext",
                    package="refmodels.backbones")
    fpn = _load(f"{REF}/mmdet/models/necks/fpn.py",
                "refmodels.necks.fpn", package="refmodels.necks")
    return resnet.ResNet, resnext.ResNeXt, fpn.FPN


def gen_backbone(out):
    """Seeded torch ResNet-50 + FPN forward -> feature-map fixtures + the
    full state dict (tests convert it through train/checkpoint.py and
    compare our flax backbone+FPN activations)."""
    import torch
    ResNet, ResNeXt, FPN = load_backbone_classes()
    torch.manual_seed(0)
    bb = ResNet(depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
                frozen_stages=-1, norm_eval=True)
    neck = FPN(in_channels=[256, 512, 1024, 2048], out_channels=64,
               start_level=1, add_extra_convs="on_input", num_outs=5,
               norm_cfg=dict(type="GN", num_groups=32))
    rng = np.random.RandomState(3)
    with torch.no_grad():
        model = torch.nn.ModuleDict({"backbone": bb, "neck": neck})
        for name, p in sorted(model.named_parameters()):
            p.copy_(torch.tensor(
                rng.randn(*p.shape).astype(np.float32) * 0.05))
        for name, b in sorted(model.named_buffers()):
            if name.endswith("running_mean"):
                b.copy_(torch.tensor(
                    rng.randn(*b.shape).astype(np.float32) * 0.1))
            elif name.endswith("running_var"):
                b.copy_(torch.tensor(
                    rng.uniform(0.5, 1.5, b.shape).astype(np.float32)))
        model.eval()
        x = torch.tensor(rng.randn(1, 3, 64, 96).astype(np.float32))
        feats = bb(x)
        fpn_outs = neck(list(feats))
    data = {"image": x.numpy().transpose(0, 2, 3, 1)}
    for i, f in enumerate(feats):
        data[f"c{i}"] = f.numpy().transpose(0, 2, 3, 1)
    for i, f in enumerate(fpn_outs):
        data[f"p{i}"] = f.numpy().transpose(0, 2, 3, 1)
    sd = {f"backbone.{k}": v.numpy() for k, v in bb.state_dict().items()}
    sd.update({f"neck.{k}": v.numpy() for k, v in neck.state_dict().items()})
    for k, v in sd.items():
        data[f"sd::{k}"] = v
    np.savez_compressed(os.path.join(out, "backbone_fwd.npz"), **data)
    print("backbone_fwd.npz written")


def load_lshead_class():
    """Load the reference LSHead (`lsnet_head.py:17-755`) as a RUNNABLE
    torch module for the ``conv_module_type='norm'`` configuration.

    torch is real; mmcv ConvModule/GN are minimal real layers, and
    PyramidDeformConv is a pure-torch CPU port of the CUDA sampling
    equations (`deform_conv_cuda_kernel.cu:249-302`: output grid =
    offset's grid, base position scaled by (scale_h, scale_w), zero
    outside, per-corner-bounds bilinear).  The DCN op itself is
    parity-tested separately (tests/test_ops_deform.py); this loader
    exists to test the ASSEMBLED head structure — towers, init heads,
    get_pred_reg, gradient-mul, the in-place offset-scale compounding,
    fuse convs, GN placement, refine softplus composition — end to end.
    """
    import math
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class AttrDict(dict):
        __getattr__ = dict.__getitem__

    def bilinear_zero(x, ys, xs):
        """x (B,C,H,W); ys/xs (B,K,Ho,Wo) -> (B,C,K,Ho,Wo); corners
        outside [0,H)x[0,W) contribute 0 (CUDA im2col semantics)."""
        B, C, H, W = x.shape
        inb = (ys > -1) & (ys < H) & (xs > -1) & (xs < W)
        y0 = torch.floor(ys)
        x0 = torch.floor(xs)
        out = 0
        for dy in (0, 1):
            for dx in (0, 1):
                yi = y0 + dy
                xi = x0 + dx
                wgt = ((1 - (ys - y0 - dy).abs())
                       * (1 - (xs - x0 - dx).abs()))
                ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W) & inb
                yc = yi.clamp(0, H - 1).long()
                xc = xi.clamp(0, W - 1).long()
                flat = (yc * W + xc).view(B, 1, -1).expand(B, C, -1)
                v = torch.gather(x.reshape(B, C, H * W), 2, flat)
                v = v.view(B, C, *ys.shape[1:])
                out = out + v * (wgt * ok).unsqueeze(1)
        return out

    class PyramidDeformConv(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size,
                     stride=1, padding=0, dilation=1, groups=1,
                     deformable_groups=1, bias=False):
            super().__init__()
            self.stride, self.padding, self.dilation = stride, padding, dilation
            self.kernel_size = kernel_size
            self.weight = nn.Parameter(torch.zeros(
                out_channels, in_channels, kernel_size, kernel_size))

        def forward(self, x, offset, scale_h, scale_w):
            B, C, H, W = x.shape
            _, K2, Ho, Wo = offset.shape
            K = K2 // 2
            kh = int(math.isqrt(K))
            hs = (torch.arange(Ho).float() * self.stride - self.padding)
            ws = (torch.arange(Wo).float() * self.stride - self.padding)
            ty = (torch.arange(kh).float() * self.dilation
                  ).repeat_interleave(kh)
            tx = (torch.arange(kh).float() * self.dilation).repeat(kh)
            off = offset.view(B, K, 2, Ho, Wo)
            base_y = (hs.view(1, 1, Ho, 1) + ty.view(1, K, 1, 1)) * scale_h
            base_x = (ws.view(1, 1, 1, Wo) + tx.view(1, K, 1, 1)) * scale_w
            vals = bilinear_zero(x, base_y + off[:, :, 0],
                                 base_x + off[:, :, 1])
            w = self.weight.view(self.weight.shape[0], C, K)
            return torch.einsum("bckhw,ock->bohw", vals, w)

    def build_norm_layer(cfg, num_features, postfix=""):
        name = f"gn{postfix}" if postfix else "gn"
        return name, nn.GroupNorm(cfg["num_groups"], num_features)

    class ConvModule(nn.Module):
        def __init__(self, in_ch, out_ch, k, stride=1, padding=0,
                     conv_cfg=None, norm_cfg=None, **kw):
            super().__init__()
            self.conv = nn.Conv2d(in_ch, out_ch, k, stride, padding,
                                  bias=norm_cfg is None)
            name, norm = build_norm_layer(norm_cfg, out_ch)
            self.norm_name = name
            self.add_module(name, norm)

        def forward(self, x):
            return torch.relu(getattr(self, self.norm_name)(self.conv(x)))

    from functools import partial

    def multi_apply(func, *args, **kwargs):
        pfunc = partial(func, **kwargs) if kwargs else func
        return tuple(map(list, zip(*map(pfunc, *args))))

    _mk_module("mmcv")
    _mk_module("mmcv.cnn", ConvModule=ConvModule,
               bias_init_with_prob=lambda p: float(
                   -np.log((1 - p) / p)),
               normal_init=lambda *a, **k: None,
               kaiming_init=lambda *a, **k: None)
    _mk_module("mmdet")
    _mk_module("mmdet.core", PointGenerator=_noop_factory("PointGenerator"),
               build_assigner=lambda *a, **k: None,
               build_sampler=lambda *a, **k: None,
               images_to_levels=lambda *a, **k: None,
               multi_apply=multi_apply,
               multiclass_nms=lambda *a, **k: None,
               multiclass_nms_lsvr=lambda *a, **k: None,
               unmap=lambda *a, **k: None)
    _mk_module("mmdet.ops", DeformConv=_noop_factory("DeformConv"),
               PyramidDeformConv=PyramidDeformConv,
               DeformConvPack=_noop_factory("DeformConvPack"),
               ModulatedDeformConvPack=_noop_factory(
                   "ModulatedDeformConvPack"))

    class AnchorFreeHead(nn.Module):
        """Minimal stand-in for `anchor_free_head.py:42-98`: attribute
        setup + _init_layers(); losses are never called here."""

        def __init__(self, num_classes, in_channels, feat_channels=256,
                     stacked_convs=4, conv_cfg=None, norm_cfg=None,
                     train_cfg=None, test_cfg=None, **kw):
            super().__init__()
            self.num_classes = num_classes
            self.cls_out_channels = num_classes
            self.in_channels = in_channels
            self.feat_channels = feat_channels
            self.stacked_convs = stacked_convs
            self.conv_cfg = conv_cfg
            self.norm_cfg = norm_cfg
            self.train_cfg = train_cfg
            self.test_cfg = test_cfg
            self._init_layers()

    pkg = _mk_module("refheads")
    pkg.__path__ = []
    _mk_module("refheads.builder", HEADS=_Registry(),
               build_loss=lambda *a, **k: None)
    sub = _mk_module("refheads.dense_heads")
    sub.__path__ = []
    _mk_module("refheads.dense_heads.anchor_free_head",
               AnchorFreeHead=AnchorFreeHead)
    mod = _load(f"{REF}/mmdet/models/dense_heads/lsnet_head.py",
                "refheads.dense_heads.lsnet_head",
                package="refheads.dense_heads")
    return mod.LSHead, AttrDict


def gen_head_forward(out):
    """End-to-end forward goldens for the ASSEMBLED LSHead (all 4 tasks,
    norm-conv config): seeded params + 5-level features -> per-level
    cls/init/refine outputs + the full torch state_dict (tests convert it
    through train/checkpoint.convert_torch_lshead and compare)."""
    import torch
    LSHead, AttrDict = load_lshead_class()
    rng = np.random.RandomState(7)
    C = 32
    sizes = [(16, 24), (8, 12), (4, 6), (2, 3), (1, 2)]
    data = {}
    for task, nv in (("bbox", 4), ("segm", 36), ("pose_bbox", 17),
                     ("pose_kbox", 17)):
        torch.manual_seed(0)
        head = LSHead(num_classes=4, in_channels=C, point_feat_channels=C,
                      task=task, num_vectors=nv,
                      feat_channels=C, stacked_convs=2,
                      norm_cfg=AttrDict(type="GN", num_groups=8),
                      loss_segm_init=dict(), loss_segm_refine=dict(),
                      loss_pose_init=dict(), loss_pose_refine=dict())
        with torch.no_grad():
            for name, p in sorted(head.named_parameters()):
                p.copy_(torch.tensor(
                    rng.randn(*p.shape).astype(np.float32) * 0.05))
            head.eval()
            feats = [torch.tensor(rng.randn(1, C, h, w).astype(np.float32))
                     for h, w in sizes]
            (cls_outs, bbox_init, bbox_refine, segm_init, segm_refine,
             pose_init, pose_refine) = head(feats)
        pre = f"{task}::"
        for i, f in enumerate(feats):
            data[f"{pre}feat{i}"] = f.numpy().transpose(0, 2, 3, 1)
        for nm, lst in (("cls", cls_outs), ("bbox_init", bbox_init),
                        ("bbox_refine", bbox_refine),
                        ("segm_init", segm_init),
                        ("segm_refine", segm_refine),
                        ("pose_init", pose_init),
                        ("pose_refine", pose_refine)):
            for i, f in enumerate(lst or []):
                if f is not None:
                    data[f"{pre}{nm}{i}"] = f.numpy().transpose(0, 2, 3, 1)
        for k, v in head.state_dict().items():
            data[f"{pre}sd::{k}"] = v.numpy()
    np.savez_compressed(os.path.join(out, "head_forward.npz"), **data)
    print("head_forward.npz written")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/golden")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    gens = dict(cross_iou=gen_cross_iou, head_encode=gen_head_encode,
                assigners=gen_assigners, polygons=gen_polygons,
                backbone=gen_backbone, head_forward=gen_head_forward)
    for name, fn in gens.items():
        if args.only and name != args.only:
            continue
        fn(args.out)
    print("golden fixtures written to", args.out)


if __name__ == "__main__":
    main()
