"""LSHead — the unified location-sensitive dense head (flax, NHWC).

TPU-native rebuild of `/root/reference/code/mmdet/models/dense_heads/
lsnet_head.py` (1854 LoC).  Four task modes: ``bbox`` / ``segm`` /
``pose_bbox`` / ``pose_kbox``.  Per FPN level, a two-stage regressor:

  stage 1 (`forward_single1`, ref :502-598): conv towers -> init landmark
    head -> softplus -> signed sampling field (``get_pred_reg`` :372-400)
    -> straight-through gradient mix -> DCN offset field.
  stage 2 (`forward_single2`, ref :600-755): three cross-level
    PyramidDeformConv gathers (level list :603-613) -> 1x1 fuse + skip ->
    GN -> ReLU -> refine head; refine = softplus(out + stop_grad(init)).

Reference quirk reproduced deliberately (``offset_scale_compat=True``): the
reference scales the offset field *in place through slice views*
(:628-633), so the scale factors compound across the 3-iteration level
loop; published checkpoints were trained this way.

All level maps are NHWC; channel layouts per point are identical to the
reference: 4 slots per landmark coordinate pair ``[y-, y+, x-, x+]``.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import (ConvModule, DCNConvModule, MultiBranchDCNTower,
                      PairedPyramidDeformConv, PyramidDeformConv,
                      bias_init_with_prob, normal_init, kaiming_init)

TASK_BRANCHES = {"bbox": ("cls", "bbox"), "segm": ("cls", "segm"),
                 "pose_bbox": ("cls", "bbox", "pose"),
                 "pose_kbox": ("cls", "pose")}

Array = jax.Array


def branch_pyramid_jobs(feats, dcn_offs, dcn_kernel: int,
                        offset_scale_compat: bool):
    """All cross-level sampling jobs of a refine branch, in (out_lvl, src)
    order — 3 jobs per output level (`lsnet_head.py:603-613`), with the
    reference's in-place offset-scale compounding (:628-633) when
    ``offset_scale_compat``."""
    from ...ops.flat_deform import SampleJob
    num_levels = len(feats)
    pad = (dcn_kernel - 1) // 2
    jobs = []
    for lvl in range(num_levels):
        base_h, base_w = feats[lvl].shape[1:3]
        off = dcn_offs[lvl]
        for level in LSHead._level_list(lvl, num_levels):
            cur_h, cur_w = feats[level].shape[1:3]
            scale_h = cur_h / base_h
            scale_w = cur_w / base_w
            src = off if offset_scale_compat else dcn_offs[lvl]
            o2 = src.reshape(*src.shape[:-1], -1, 2)
            scaled = (o2 * jnp.asarray([scale_h, scale_w], src.dtype)
                      ).reshape(src.shape)
            if offset_scale_compat:
                off = scaled
            jobs.append(SampleJob(level, scaled, None, (scale_h, scale_w),
                                  (1, 1), (pad, pad), (1, 1)))
    return jobs


def dcn_base_offset(kernel: int) -> np.ndarray:
    """(1,1,1,2K) base tap displacements [y,x] (ref :55-59)."""
    pad = (kernel - 1) // 2
    base = np.arange(-pad, pad + 1).astype(np.float32)
    yy = np.repeat(base, kernel)
    xx = np.tile(base, kernel)
    return np.stack([yy, xx], axis=1).reshape(1, 1, 1, -1)


def signed_from_pairs(x: Array) -> Array:
    """Collapse 4-slot-per-pair layout to signed values.

    x (..., 2P) where consecutive channel pairs are (neg_slot, pos_slot);
    returns (..., P) = max(pair) with sign flipped when the neg slot wins
    (ref ``extreme_points2bbox`` :321-327 core idiom)."""
    shp = x.shape[:-1]
    pairs = x.reshape(*shp, -1, 2)
    val = jnp.max(pairs, axis=-1)
    neg = jnp.argmax(pairs, axis=-1) == 0
    return jnp.where(neg, -val, val)


def extreme_points2bbox(pts: Array) -> Tuple[Array, Array]:
    """pts (..., 4*(nv+1)) channel-last -> (extremes (...,8), bbox (...,4)).

    Channel layout per point: [y-, y+, x-, x+]; point order t,l,b,r,center
    (ref :321-347).  Returns extremes as [xt,yt, xl,yl, xb,yb, xr,yr] and
    bbox [left, up, right, bottom] in *stride units* (caller rescales)."""
    signed = signed_from_pairs(pts)                  # (..., 2*(nv+1)) [y,x]*
    yx = signed.reshape(*signed.shape[:-1], -1, 2)
    ys = yx[..., 0]
    xs = yx[..., 1]
    left = xs[..., 1]
    right = xs[..., 3]
    up = ys[..., 0]
    bottom = ys[..., 2]
    bbox = jnp.stack([left, up, right, bottom], axis=-1)
    extremes = jnp.stack([xs[..., 0], ys[..., 0], xs[..., 1], ys[..., 1],
                          xs[..., 2], ys[..., 2], xs[..., 3], ys[..., 3]],
                         axis=-1)
    return extremes, bbox


def vectors2bbox(pts: Array) -> Tuple[Array, Array]:
    """pts (..., 4*(nv+1)) -> (vectors (...,2*nv) xy-interleaved, bbox).

    Drops the final center group (ref ``vectors2bbox`` :349-370)."""
    signed = signed_from_pairs(pts[..., :-4])
    yx = signed.reshape(*signed.shape[:-1], -1, 2)
    ys = yx[..., 0]
    xs = yx[..., 1]
    bbox = jnp.stack([xs.min(-1), ys.min(-1), xs.max(-1), ys.max(-1)], axis=-1)
    vectors = jnp.stack([xs, ys], axis=-1).reshape(*ys.shape[:-1], -1)
    return vectors, bbox


class LSHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_kernel_points: int = 9
    gradient_mul: float = 0.1
    point_strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    task: str = "bbox"
    num_vectors: int = 4
    conv_module_type: str = "norm"        # 'norm' | 'dcn'
    norm_groups: int = 32
    offset_scale_compat: bool = True
    # fuse all tower branches into one wide-row gather per block — measured
    # SLOWER on v5e (half the fetched channels are wasted; the gather is
    # byte-bound at 1KB rows), kept as an option for other chips
    fuse_towers: bool = False

    @property
    def dcn_kernel(self) -> int:
        return int(math.isqrt(self.num_kernel_points))

    def _tower(self, prefix: str) -> List[nn.Module]:
        blocks = []
        for i in range(self.stacked_convs):
            if self.conv_module_type == "norm":
                blocks.append(ConvModule(
                    self.feat_channels, 3,
                    norm_cfg=dict(type="GN", num_groups=self.norm_groups),
                    kernel_init=normal_init(0.01),
                    name=f"{prefix}_convs_{i}"))
            else:
                blocks.append(DCNConvModule(
                    self.feat_channels, self.dcn_kernel,
                    num_groups=self.norm_groups,
                    name=f"{prefix}_convs_{i}"))
        return blocks

    def setup(self):
        task = self.task
        nv = self.num_vectors
        nkp = self.num_kernel_points
        if self.conv_module_type == "dcn" and self.fuse_towers:
            # all towers in one fused multi-branch module (one gather per
            # stacked block for every branch)
            self.fused_tower = MultiBranchDCNTower(
                branch_names=TASK_BRANCHES[task],
                out_channels=self.feat_channels,
                stacked_convs=self.stacked_convs,
                kernel_size=self.dcn_kernel, num_groups=self.norm_groups,
                name="towers")
        else:
            self.cls_tower = self._tower("cls")
        if task in ("bbox", "pose_bbox"):
            if not (self.conv_module_type == "dcn" and self.fuse_towers):
                self.bbox_tower = self._tower("bbox")
            bbox_nv = 4
            bbox_out_dim = 4 * (bbox_nv + 1) + (nkp - bbox_nv - 1) * 2  # 28
            self.pts_bbox_init_conv = nn.Conv(
                self.point_feat_channels, (3, 3), padding=1,
                kernel_init=normal_init(0.01), name="pts_bbox_init_conv")
            self.pts_bbox_init_out = nn.Conv(
                bbox_out_dim, (1, 1), kernel_init=normal_init(0.01),
                name="pts_bbox_init_out")
            self.pts_bbox_refine_conv = PyramidDeformConv(
                self.point_feat_channels, self.dcn_kernel,
                padding=(self.dcn_kernel - 1) // 2,
                name="pts_bbox_refine_conv")
            self.pts_bbox_refine_out = nn.Conv(
                4 * (bbox_nv + 1), (1, 1), kernel_init=normal_init(0.01),
                name="pts_bbox_refine_out")
            self.bbox_af_dcn_conv = nn.Conv(
                self.point_feat_channels, (1, 1),
                kernel_init=normal_init(0.01), name="bbox_af_dcn_conv")
            self.bbox_feat_conv = nn.Conv(
                self.point_feat_channels, (3, 3), padding=1,
                kernel_init=normal_init(0.01), name="bbox_feat_conv")
            self.bbox_gn = nn.GroupNorm(num_groups=self.norm_groups,
                                        epsilon=1e-5, name="bbox_GN")
        if task == "segm":
            if not (self.conv_module_type == "dcn" and self.fuse_towers):
                self.segm_tower = self._tower("segm")
            out_dim = (nv + 1) * 4
            self.pts_segm_init_conv = nn.Conv(
                self.point_feat_channels, (3, 3), padding=1,
                kernel_init=normal_init(0.01), name="pts_segm_init_conv")
            self.pts_segm_init_out = nn.Conv(
                out_dim, (1, 1), kernel_init=normal_init(0.01),
                name="pts_segm_init_out")
            self.pts_segm_refine_conv = PyramidDeformConv(
                self.point_feat_channels, self.dcn_kernel,
                padding=(self.dcn_kernel - 1) // 2,
                name="pts_segm_refine_conv")
            self.pts_segm_refine_out = nn.Conv(
                out_dim, (1, 1), kernel_init=normal_init(0.01),
                name="pts_segm_refine_out")
            self.segm_af_dcn_conv = nn.Conv(
                self.point_feat_channels, (1, 1),
                kernel_init=normal_init(0.01), name="segm_af_dcn_conv")
            self.segm_feat_conv = nn.Conv(
                self.point_feat_channels, (3, 3), padding=1,
                kernel_init=normal_init(0.01), name="segm_feat_conv")
            self.segm_gn = nn.GroupNorm(num_groups=self.norm_groups,
                                        epsilon=1e-5, name="segm_GN")
        if task in ("pose_bbox", "pose_kbox"):
            if not (self.conv_module_type == "dcn" and self.fuse_towers):
                self.pose_tower = self._tower("pose")
            out_dim = (nv + 1) * 4
            self.pts_pose_init_conv = nn.Conv(
                self.point_feat_channels, (3, 3), padding=1,
                kernel_init=normal_init(0.01), name="pts_pose_init_conv")
            self.pts_pose_init_out = nn.Conv(
                out_dim, (1, 1), kernel_init=normal_init(0.01),
                name="pts_pose_init_out")
            self.pts_pose_refine_conv = PyramidDeformConv(
                self.point_feat_channels, self.dcn_kernel,
                padding=(self.dcn_kernel - 1) // 2,
                name="pts_pose_refine_conv")
            self.pts_pose_refine_out = nn.Conv(
                out_dim, (1, 1), kernel_init=normal_init(0.01),
                name="pts_pose_refine_out")
            self.pose_af_dcn_conv = nn.Conv(
                self.point_feat_channels, (1, 1),
                kernel_init=normal_init(0.01), name="pose_af_dcn_conv")
            self.pose_feat_conv = nn.Conv(
                self.point_feat_channels, (3, 3), padding=1,
                kernel_init=normal_init(0.01), name="pose_feat_conv")
            self.pose_gn = nn.GroupNorm(num_groups=self.norm_groups,
                                        epsilon=1e-5, name="pose_GN")
        # classification branch (shared across tasks). The cls pyramid
        # gathers share the MAIN task branch's offset field, so the two
        # branches fuse into one double-width gather (PairedPyramidDeformConv)
        main = {"bbox": "bbox", "segm": "segm", "pose_bbox": "pose",
                "pose_kbox": "pose"}[task]
        self.pair_refine_cls = PairedPyramidDeformConv(
            self.point_feat_channels, self.point_feat_channels,
            self.dcn_kernel, name=f"pts_{main}_cls_pair")
        self.pts_cls_out = nn.Conv(
            self.num_classes, (1, 1), kernel_init=normal_init(0.01),
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="pts_cls_out")
        self.cls_af_dcn_conv = nn.Conv(
            self.point_feat_channels, (1, 1), kernel_init=normal_init(0.01),
            name="cls_af_dcn_conv")
        self.cls_feat_conv = nn.Conv(
            self.point_feat_channels, (3, 3), padding=1,
            kernel_init=normal_init(0.01), name="cls_feat_conv")
        self.cls_gn = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                                   name="cls_GN")

    # ---- stage-1 helpers -------------------------------------------------
    def _get_pred_reg(self, raw_reg1: Array, raw_reg2: Optional[Array]) -> Array:
        """Build the signed 2K-channel DCN sampling field (ref :372-400)."""
        if raw_reg2 is not None:  # bbox: 5 signed points + 4 raw extra points
            pos_reg = signed_from_pairs(raw_reg1)            # (...,10) [y,x]*5
            return jnp.concatenate([pos_reg, raw_reg2], axis=-1)
        # segm/pose: subsample (nv+1) groups down to K-1, append center
        shp = raw_reg1.shape[:-1]
        groups = raw_reg1.reshape(*shp, -1, 4)               # (..., nv+1, 4)
        cts = groups[..., -1:, :]
        polys = groups[..., :-1, :]
        if self.task == "segm":
            ks = math.ceil(self.num_vectors / (self.num_kernel_points - 1))
            offs = polys[..., ::ks, :]
        else:  # pose
            offs = polys[..., 1::2, :]
        sel = jnp.concatenate([offs, cts], axis=-2)          # (..., K, 4)
        return signed_from_pairs(sel.reshape(*shp, -1))      # (..., 2K)

    def _init_branch(self, feat: Array, init_conv, init_out,
                     sp_channels: Optional[int]) -> Tuple[Array, Array]:
        """-> (init_sp, dcn_offset). sp_channels: slice of softplus'd channels
        (bbox: 20 of 28); None = all."""
        raw = init_out(nn.relu(init_conv(feat)))
        if sp_channels is not None:
            init_sp = jax.nn.softplus(raw[..., :sp_channels])
            pred_reg = self._get_pred_reg(init_sp, raw[..., sp_channels:])
        else:
            init_sp = jax.nn.softplus(raw)
            pred_reg = self._get_pred_reg(init_sp, None)
        mixed = ((1.0 - self.gradient_mul) * jax.lax.stop_gradient(pred_reg)
                 + self.gradient_mul * pred_reg)
        base = jnp.asarray(dcn_base_offset(self.dcn_kernel), feat.dtype)
        return init_sp, mixed - base

    # ---- stage-2 ---------------------------------------------------------
    @staticmethod
    def _level_list(lvl: int, num_levels: int) -> List[int]:
        if lvl == 0:
            return [0, 1, 2]
        if lvl == num_levels - 1:
            return [lvl, lvl - 1, lvl - 2]
        return [lvl, lvl - 1, lvl + 1]

    def _refine_gather_all(self, feats, dcn_offs, pdc) -> List[List[Array]]:
        """One flat gather+matmul for the whole branch; regroup 3 raws per
        output level."""
        jobs = branch_pyramid_jobs(feats, dcn_offs, self.dcn_kernel,
                                   self.offset_scale_compat)
        raws = pdc(list(feats), jobs)
        return [raws[3 * lvl:3 * lvl + 3] for lvl in range(len(feats))]

    def _fuse(self, raws: List[Array], skip_feat: Array, af_conv, feat_conv,
              gn, out_conv) -> Array:
        x = af_conv(jnp.concatenate(raws, axis=-1))
        x = nn.relu(x)
        x = gn(x + feat_conv(skip_feat))
        return out_conv(nn.relu(x))

    # ---- forward ---------------------------------------------------------
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        task = self.task
        num_levels = len(feats)
        outs: Dict[str, List[Array]] = {"cls": []}
        if task in ("bbox", "pose_bbox"):
            outs["bbox_init"] = []
            outs["bbox_refine"] = []
        if task == "segm":
            outs["segm_init"] = []
            outs["segm_refine"] = []
        if task in ("pose_bbox", "pose_kbox"):
            outs["pose_init"] = []
            outs["pose_refine"] = []

        # stage 1 — towers: dcn mode fuses ALL branches' gathers per block;
        # norm mode runs plain per-level convs. Init heads per level.
        task_feats, init_sps, dcn_offs = {}, {}, {}
        if self.conv_module_type == "dcn" and self.fuse_towers:
            branch_feats = self.fused_tower(feats)
            cls_feats = branch_feats["cls"]
            for key in TASK_BRANCHES[task]:
                if key != "cls":
                    task_feats[key] = branch_feats[key]
        else:
            def run_plain(tower, xs):
                cur = list(xs)
                for blk in tower:
                    if isinstance(blk, DCNConvModule):
                        cur = blk(cur)
                    else:
                        cur = [blk(f) for f in cur]
                return cur

            cls_feats = run_plain(self.cls_tower, feats)
            if task in ("bbox", "pose_bbox"):
                task_feats["bbox"] = run_plain(self.bbox_tower, feats)
            if task == "segm":
                task_feats["segm"] = run_plain(self.segm_tower, feats)
            if task in ("pose_bbox", "pose_kbox"):
                task_feats["pose"] = run_plain(self.pose_tower, feats)

        if task in ("bbox", "pose_bbox"):
            pairs = [self._init_branch(bf, self.pts_bbox_init_conv,
                                       self.pts_bbox_init_out, 20)
                     for bf in task_feats["bbox"]]
            init_sps["bbox"] = [p[0] for p in pairs]
            dcn_offs["bbox"] = [p[1] for p in pairs]
        if task == "segm":
            pairs = [self._init_branch(sf, self.pts_segm_init_conv,
                                       self.pts_segm_init_out, None)
                     for sf in task_feats["segm"]]
            init_sps["segm"] = [p[0] for p in pairs]
            dcn_offs["segm"] = [p[1] for p in pairs]
        if task in ("pose_bbox", "pose_kbox"):
            pairs = [self._init_branch(pf, self.pts_pose_init_conv,
                                       self.pts_pose_init_out, None)
                     for pf in task_feats["pose"]]
            init_sps["pose"] = [p[0] for p in pairs]
            dcn_offs["pose"] = [p[1] for p in pairs]

        # stage 2 — the MAIN task branch and the cls branch share one
        # offset field, so they run as ONE double-width gather; pose_bbox's
        # extra bbox branch runs its own batched gather
        main = {"bbox": "bbox", "segm": "segm", "pose_bbox": "pose",
                "pose_kbox": "pose"}[task]
        def fuse_cfg(key):
            return (getattr(self, f"{key}_af_dcn_conv"),
                    getattr(self, f"{key}_feat_conv"),
                    getattr(self, f"{key}_gn"),
                    getattr(self, f"pts_{key}_refine_out"))

        jobs_main = branch_pyramid_jobs(task_feats[main], dcn_offs[main],
                                        self.dcn_kernel,
                                        self.offset_scale_compat)
        main_raws, cls_raws = self.pair_refine_cls(task_feats[main],
                                                   cls_feats, jobs_main)

        def emit_refine(key, raws_per_lvl):
            af, fc, gn, oc = fuse_cfg(key)
            for lvl in range(num_levels):
                out = self._fuse(raws_per_lvl[lvl], task_feats[key][lvl],
                                 af, fc, gn, oc)
                refine_sp = jax.nn.softplus(
                    out + jax.lax.stop_gradient(init_sps[key][lvl]))
                outs[f"{key}_init"].append(init_sps[key][lvl])
                outs[f"{key}_refine"].append(refine_sp)

        emit_refine(main, [main_raws[3 * l:3 * l + 3]
                           for l in range(num_levels)])
        if task == "pose_bbox":
            bbox_raws_per_lvl = self._refine_gather_all(
                task_feats["bbox"], dcn_offs["bbox"],
                self.pts_bbox_refine_conv)
            emit_refine("bbox", bbox_raws_per_lvl)

        for lvl in range(num_levels):
            cls_out = self._fuse(cls_raws[3 * lvl:3 * lvl + 3],
                                 cls_feats[lvl], self.cls_af_dcn_conv,
                                 self.cls_feat_conv, self.cls_gn,
                                 self.pts_cls_out)
            outs["cls"].append(cls_out)
        return outs
