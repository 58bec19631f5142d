"""LSCPVHead — corner-point-verification detection head (flax, NHWC).

TPU-native rebuild of `/root/reference/code/mmdet/models/dense_heads/
lscpvnet_head.py` (1123 LoC): the bbox-only LSNet variant that adds

* a semantic branch (``reppoints_sem_out`` + embedding, SEPFocalLoss);
* TL/BR corner-pooling branches (`TLPool`/`BRPool`,
  `code/mmdet/ops/corner_pool/corner_pool.py:119-186`) predicting corner
  heatmaps (1ch each) + offsets (2ch each);
* heatmap/offset features concatenated (+6 ch) into the cls/reg towers;
* the same init -> PyramidDeformConv refine scheme as LSHead (task bbox).

Corner pooling itself is ``lax.associative_scan`` cummax
(:mod:`lsnet_tpu.ops.corner_pool`).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.corner_pool import bottom_pool, left_pool, right_pool, top_pool
from ..layers import (ConvModule, DCNConvModule, MultiBranchDCNTower,
                      PairedPyramidDeformConv, PyramidDeformConv,
                      bias_init_with_prob, normal_init)
from .ls_head import (LSHead, branch_pyramid_jobs, dcn_base_offset,
                      signed_from_pairs)

Array = jax.Array


class CornerPoolPack(nn.Module):
    """Two directional cummax pools fused with a residual 1x1 path."""
    dim: int
    pool_modes: Sequence[str]          # e.g. ("top", "left")
    first_kernel_size: int = 3
    kernel_size: int = 1
    corner_dim: int = 64
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pools = {"top": top_pool, "bottom": bottom_pool,
                 "left": left_pool, "right": right_pool}
        norm = dict(type="GN", num_groups=self.norm_groups)
        p1 = ConvModule(self.corner_dim, self.first_kernel_size,
                        norm_cfg=norm, name="p1_conv1")(x)
        p2 = ConvModule(self.corner_dim, self.first_kernel_size,
                        norm_cfg=norm, name="p2_conv1")(x)
        pooled = pools[self.pool_modes[0]](p1) + pools[self.pool_modes[1]](p2)
        p = nn.Conv(self.dim, (3, 3), padding=1, use_bias=False,
                    name="p_conv1")(pooled)
        p = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="p_gn1")(p)
        r = nn.Conv(self.dim, (1, 1), use_bias=False, name="conv1")(x)
        r = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn1")(r)
        out = nn.relu(p + r)
        return ConvModule(self.dim, self.kernel_size, norm_cfg=norm,
                          name="conv2")(out)


class LSCPVHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    shared_stacked_convs: int = 1
    first_kernel_size: int = 3
    kernel_size: int = 1
    corner_dim: int = 64
    num_kernel_points: int = 9
    gradient_mul: float = 0.1
    point_strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    conv_module_type: str = "norm"
    norm_groups: int = 32
    offset_scale_compat: bool = True
    fuse_towers: bool = False

    @property
    def dcn_kernel(self) -> int:
        import math
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
        pad = (self.dcn_kernel - 1) // 2
        if self.conv_module_type == "dcn" and self.fuse_towers:
            self.fused_tower = MultiBranchDCNTower(
                branch_names=("cls", "bbox"),
                out_channels=self.feat_channels,
                stacked_convs=self.stacked_convs,
                kernel_size=self.dcn_kernel, num_groups=self.norm_groups,
                name="towers")
        else:
            self.cls_tower = self._tower("cls")
            self.bbox_tower = self._tower("bbox")
        shared = []
        for i in range(self.shared_stacked_convs):
            if self.conv_module_type == "norm":
                shared.append(ConvModule(
                    self.feat_channels, 3,
                    norm_cfg=dict(type="GN", num_groups=self.norm_groups),
                    kernel_init=normal_init(0.01), name=f"shared_convs_{i}"))
            else:
                shared.append(DCNConvModule(
                    self.feat_channels, 3, num_groups=self.norm_groups,
                    name=f"shared_convs_{i}"))
        self.shared_tower = shared

        self.hem_tl = CornerPoolPack(
            self.feat_channels, ("top", "left"),
            first_kernel_size=self.first_kernel_size,
            kernel_size=self.kernel_size, corner_dim=self.corner_dim,
            norm_groups=self.norm_groups, name="hem_tl")
        self.hem_br = CornerPoolPack(
            self.feat_channels, ("bottom", "right"),
            first_kernel_size=self.first_kernel_size,
            kernel_size=self.kernel_size, corner_dim=self.corner_dim,
            norm_groups=self.norm_groups, name="hem_br")

        bias_cls = bias_init_with_prob(0.01)
        self.pair_refine_cls = PairedPyramidDeformConv(
            self.point_feat_channels, self.point_feat_channels,
            self.dcn_kernel, kernel_init=normal_init(0.01),
            name="pts_bbox_cls_pair")
        self.pts_cls_out = nn.Conv(
            self.num_classes, (1, 1), kernel_init=normal_init(0.01),
            bias_init=nn.initializers.constant(bias_cls), name="pts_cls_out")
        pts_out_dim = 4 * 5 + (self.num_kernel_points - 5) * 2   # 28
        self.pts_bbox_init_conv = nn.Conv(
            self.point_feat_channels, (3, 3), padding=1,
            kernel_init=normal_init(0.01), name="pts_bbox_init_conv")
        self.pts_bbox_init_out = nn.Conv(
            pts_out_dim, (1, 1), kernel_init=normal_init(0.01),
            name="pts_bbox_init_out")
        self.pts_bbox_refine_conv = PyramidDeformConv(
            self.point_feat_channels, self.dcn_kernel, padding=pad,
            kernel_init=normal_init(0.01), name="pts_bbox_refine_conv")
        self.pts_bbox_refine_out = nn.Conv(
            20, (1, 1), kernel_init=normal_init(0.01),
            name="pts_bbox_refine_out")

        self.hem_tl_score_out = nn.Conv(
            1, (3, 3), padding=1, kernel_init=normal_init(0.01),
            bias_init=nn.initializers.constant(bias_cls),
            name="hem_tl_score_out")
        self.hem_br_score_out = nn.Conv(
            1, (3, 3), padding=1, kernel_init=normal_init(0.01),
            bias_init=nn.initializers.constant(bias_cls),
            name="hem_br_score_out")
        self.hem_tl_offset_out = nn.Conv(
            2, (3, 3), padding=1, kernel_init=normal_init(0.01),
            name="hem_tl_offset_out")
        self.hem_br_offset_out = nn.Conv(
            2, (3, 3), padding=1, kernel_init=normal_init(0.01),
            name="hem_br_offset_out")

        self.sem_out = nn.Conv(
            self.num_classes, (1, 1), kernel_init=normal_init(0.01),
            bias_init=nn.initializers.constant(bias_cls), name="sem_out")
        self.sem_embedding = ConvModule(
            self.feat_channels, 1,
            norm_cfg=dict(type="GN", num_groups=self.norm_groups),
            name="sem_embedding")

        self.cls_af_dcn_conv = nn.Conv(
            self.point_feat_channels, (1, 1), kernel_init=normal_init(0.01),
            name="cls_af_dcn_conv")
        self.bbox_af_dcn_conv = nn.Conv(
            self.point_feat_channels, (1, 1), kernel_init=normal_init(0.01),
            name="bbox_af_dcn_conv")
        self.cls_feat_conv = nn.Conv(
            self.point_feat_channels, (3, 3), padding=1,
            kernel_init=normal_init(0.01), name="cls_feat_conv")
        self.bbox_feat_conv = nn.Conv(
            self.point_feat_channels, (3, 3), padding=1,
            kernel_init=normal_init(0.01), name="bbox_feat_conv")
        self.cls_gn = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                                   name="cls_GN")
        self.bbox_gn = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                                    name="bbox_GN")

    def _get_pred_reg(self, raw_reg1: Array, raw_reg2: Array) -> Array:
        pos_reg = signed_from_pairs(raw_reg1)
        return jnp.concatenate([pos_reg, raw_reg2], axis=-1)

    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        num_levels = len(feats)
        base = jnp.asarray(dcn_base_offset(self.dcn_kernel), feats[0].dtype)

        def run_tower(tower, xs):
            cur = list(xs)
            for blk in tower:
                if isinstance(blk, DCNConvModule):
                    cur = blk(cur)
                else:
                    cur = [blk(f) for f in cur]
            return cur

        if self.conv_module_type == "dcn" and self.fuse_towers:
            bf_all = self.fused_tower(feats)
            cls_feats_t = bf_all["cls"]
            bbox_feats_t = bf_all["bbox"]
        else:
            cls_feats_t = run_tower(self.cls_tower, feats)
            bbox_feats_t = run_tower(self.bbox_tower, feats)
        shared_t = run_tower(self.shared_tower, bbox_feats_t)

        cls_feats, bbox_feats = [], []
        init_sps, dcn_offs = [], []
        hem_scores, hem_offsets, sem_scores = [], [], []
        for lvl_i, x in enumerate(feats):
            cf = cls_feats_t[lvl_i]
            bf = bbox_feats_t[lvl_i]
            sf = shared_t[lvl_i]
            sem_score = self.sem_out(sf)
            sem_feat = self.sem_embedding(sf)
            cf = cf + sem_feat
            bf = bf + sem_feat
            hf = sf + sem_feat

            tl = self.hem_tl(hf)
            br = self.hem_br(hf)
            hem_score = jnp.concatenate(
                [self.hem_tl_score_out(tl), self.hem_br_score_out(br)], -1)
            hem_offset = jnp.concatenate(
                [self.hem_tl_offset_out(tl), self.hem_br_offset_out(br)], -1)

            raw = self.pts_bbox_init_out(nn.relu(self.pts_bbox_init_conv(bf)))
            init_sp = jax.nn.softplus(raw[..., :20])
            pred_reg = self._get_pred_reg(init_sp, raw[..., 20:])
            mixed = ((1 - self.gradient_mul) * jax.lax.stop_gradient(pred_reg)
                     + self.gradient_mul * pred_reg)
            dcn_off = mixed - base

            hem6 = jnp.concatenate([hem_score, hem_offset], -1)
            cls_feats.append(jnp.concatenate([cf, hem6], -1))
            bbox_feats.append(jnp.concatenate([bf, hem6], -1))
            init_sps.append(init_sp)
            dcn_offs.append(dcn_off)
            hem_scores.append(hem_score)
            hem_offsets.append(hem_offset)
            sem_scores.append(sem_score)

        outs = {"cls": [], "bbox_init": init_sps, "bbox_refine": [],
                "hem_score": hem_scores, "hem_offset": hem_offsets,
                "sem_score": sem_scores}
        jobs = branch_pyramid_jobs(bbox_feats, dcn_offs, self.dcn_kernel,
                                   self.offset_scale_compat)
        bbox_raws, cls_raws_all = self.pair_refine_cls(
            list(bbox_feats), list(cls_feats), jobs)
        for lvl in range(num_levels):
            raws = bbox_raws[3 * lvl:3 * lvl + 3]
            cls_raws = cls_raws_all[3 * lvl:3 * lvl + 3]
            fused = nn.relu(self.bbox_af_dcn_conv(jnp.concatenate(raws, -1)))
            fused = self.bbox_gn(fused + self.bbox_feat_conv(bbox_feats[lvl]))
            refine_out = self.pts_bbox_refine_out(nn.relu(fused))
            outs["bbox_refine"].append(jax.nn.softplus(
                refine_out + jax.lax.stop_gradient(init_sps[lvl])))
            cfused = nn.relu(self.cls_af_dcn_conv(
                jnp.concatenate(cls_raws, -1)))
            cfused = self.cls_gn(cfused + self.cls_feat_conv(cls_feats[lvl]))
            outs["cls"].append(self.pts_cls_out(nn.relu(cfused)))
        return outs
