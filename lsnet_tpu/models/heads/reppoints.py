"""RepPoints v1 head — LSNet's published ancestor (flax, NHWC).

TPU-native rebuild of `/root/reference/code/mmdet/models/dense_heads/
reppoints_head.py` (719 LoC): per FPN level, cls/reg conv towers, an init
branch predicting 2K point offsets, then TWO DeformConv branches (cls +
refine) sampling at the init points with a straight-through gradient mix
(`forward_single`, ref :250-290).  The two branches share one offset field,
so they ride the paired double-width gather
(:class:`lsnet_tpu.models.layers.PairedPyramidDeformConv`) — one flat
gather + two MXU matmuls for the whole pyramid.

Points-to-box transforms (minmax / partial_minmax / moment, ref :154-212)
live in :mod:`lsnet_tpu.core.reppoints` as pure functions shared by loss
and decode.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import (ConvModule, PairedPyramidDeformConv,
                      bias_init_with_prob, normal_init)
from .ls_head import dcn_base_offset

Array = jax.Array


class RepPointsHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    point_strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    transform_method: str = "moment"      # minmax | partial_minmax | moment
    moment_mul: float = 0.01
    norm_groups: int = 32

    @property
    def dcn_kernel(self) -> int:
        return int(math.isqrt(self.num_points))

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        k = self.dcn_kernel
        pad = (k - 1) // 2
        base = jnp.asarray(dcn_base_offset(k))            # (1,1,1,2K) [y,x]

        def tower(prefix):
            return [ConvModule(self.feat_channels, 3,
                               norm_cfg=dict(type="GN",
                                             num_groups=self.norm_groups),
                               kernel_init=normal_init(0.01),
                               name=f"{prefix}_convs_{i}")
                    for i in range(self.stacked_convs)]

        cls_tower = tower("cls")
        reg_tower = tower("reg")
        init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                            padding=[(1, 1), (1, 1)],
                            kernel_init=normal_init(0.01), name="pts_init_conv")
        init_out = nn.Conv(2 * self.num_points, (1, 1),
                           kernel_init=normal_init(0.01), name="pts_init_out")
        pair_dcn = PairedPyramidDeformConv(
            self.point_feat_channels, self.point_feat_channels, k,
            name="cls_refine_dcn")
        cls_out = nn.Conv(self.num_classes, (1, 1),
                          kernel_init=normal_init(0.01),
                          bias_init=nn.initializers.constant(
                              bias_init_with_prob(0.01)), name="cls_out")
        refine_out = nn.Conv(2 * self.num_points, (1, 1),
                             kernel_init=normal_init(0.01),
                             name="pts_refine_out")

        cls_feats, pts_feats, inits, dcn_offs = [], [], [], []
        for f in feats:
            cf, pf = f, f
            for blk in cls_tower:
                cf = blk(cf)
            for blk in reg_tower:
                pf = blk(pf)
            pts_init = init_out(nn.relu(init_conv(pf)))    # (B,H,W,2K) [y,x]
            mix = (self.gradient_mul * pts_init
                   + (1.0 - self.gradient_mul) * jax.lax.stop_gradient(
                       pts_init))
            dcn_offs.append((mix - base).astype(f.dtype))
            cls_feats.append(cf)
            pts_feats.append(pf)
            inits.append(pts_init)

        # one double-width gather for the whole pyramid: jobs are
        # single-level (scale 1) — plain DeformConv semantics
        from ...ops.flat_deform import SampleJob
        jobs = [SampleJob(i, dcn_offs[i], None, (1.0, 1.0), (1, 1),
                          (pad, pad), (1, 1)) for i in range(len(feats))]
        cls_g, ref_g = pair_dcn(cls_feats, pts_feats, jobs)
        cls_maps, refine_maps = [], []
        for i in range(len(feats)):
            cls_maps.append(cls_out(nn.relu(cls_g[i])))
            refine = refine_out(nn.relu(ref_g[i]))
            refine_maps.append(refine
                               + jax.lax.stop_gradient(inits[i]))
        if self.transform_method == "moment":
            # trained log-scale factors mixed straight-through (ref :188-192)
            mt = self.param("moment_transfer", nn.initializers.zeros, (2,),
                            jnp.float32)
            moment = (mt * self.moment_mul
                      + jax.lax.stop_gradient(mt) * (1 - self.moment_mul))
        else:
            moment = jnp.zeros((2,), jnp.float32)
        return {"cls": cls_maps, "pts_init": inits,
                "pts_refine": refine_maps, "moment": moment}


class RepPointsV2Head(nn.Module):
    """RepPoints v2 — RepPoints + corner/semantic verification (flax).

    Rebuild of `/root/reference/code/mmdet/models/dense_heads/
    reppoints_v2_head.py` (1063 LoC, the template LSNet-CPV derives from):
    the v1 two-stage point regressor plus a shared-conv branch emitting
    TL/BR corner heatmaps+offsets (corner pools) and a semantic map; hem
    maps (6ch) concat into the cls/reg features before the DCN branches
    (`forward_single`, ref :310-375)."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    shared_stacked_convs: int = 1
    first_kernel_size: int = 3
    kernel_size: int = 1
    corner_dim: int = 64
    num_points: int = 9
    gradient_mul: float = 0.1
    point_strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    transform_method: str = "moment"
    moment_mul: float = 0.01
    norm_groups: int = 32

    @property
    def dcn_kernel(self) -> int:
        return int(math.isqrt(self.num_points))

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        from .lscpv_head import CornerPoolPack
        k = self.dcn_kernel
        pad = (k - 1) // 2
        base = jnp.asarray(dcn_base_offset(k))

        def tower(prefix):
            return [ConvModule(self.feat_channels, 3,
                               norm_cfg=dict(type="GN",
                                             num_groups=self.norm_groups),
                               kernel_init=normal_init(0.01),
                               name=f"{prefix}_convs_{i}")
                    for i in range(self.stacked_convs)]

        cls_tower = tower("cls")
        reg_tower = tower("reg")
        shared_tower = [ConvModule(
            self.feat_channels, 3,
            norm_cfg=dict(type="GN", num_groups=self.norm_groups),
            kernel_init=normal_init(0.01), name=f"shared_convs_{i}")
            for i in range(self.shared_stacked_convs)]
        sem_out = nn.Conv(self.num_classes, (1, 1),
                          kernel_init=normal_init(0.01),
                          bias_init=nn.initializers.constant(
                              bias_init_with_prob(0.01)), name="sem_out")
        sem_embedding = ConvModule(
            self.feat_channels, 1,
            norm_cfg=dict(type="GN", num_groups=self.norm_groups),
            name="sem_embedding")
        hem_tl = CornerPoolPack(
            self.feat_channels, ("top", "left"),
            first_kernel_size=self.first_kernel_size,
            kernel_size=self.kernel_size, corner_dim=self.corner_dim,
            norm_groups=self.norm_groups, name="hem_tl")
        hem_br = CornerPoolPack(
            self.feat_channels, ("bottom", "right"),
            first_kernel_size=self.first_kernel_size,
            kernel_size=self.kernel_size, corner_dim=self.corner_dim,
            norm_groups=self.norm_groups, name="hem_br")
        bias_cls = bias_init_with_prob(0.01)
        mk_out = lambda ch, name, b=0.0: nn.Conv(          # noqa: E731
            ch, (3, 3), padding=1, kernel_init=normal_init(0.01),
            bias_init=nn.initializers.constant(b), name=name)
        tl_score = mk_out(1, "hem_tl_score_out", bias_cls)
        br_score = mk_out(1, "hem_br_score_out", bias_cls)
        tl_off = mk_out(2, "hem_tl_offset_out")
        br_off = mk_out(2, "hem_br_offset_out")

        init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                            padding=[(1, 1), (1, 1)],
                            kernel_init=normal_init(0.01),
                            name="pts_init_conv")
        init_out = nn.Conv(2 * self.num_points, (1, 1),
                           kernel_init=normal_init(0.01),
                           name="pts_init_out")
        pair_dcn = PairedPyramidDeformConv(
            self.point_feat_channels, self.point_feat_channels, k,
            name="cls_refine_dcn")
        cls_out = nn.Conv(self.num_classes, (1, 1),
                          kernel_init=normal_init(0.01),
                          bias_init=nn.initializers.constant(bias_cls),
                          name="cls_out")
        refine_out = nn.Conv(2 * self.num_points, (1, 1),
                             kernel_init=normal_init(0.01),
                             name="pts_refine_out")

        cls_feats, pts_feats, inits, dcn_offs = [], [], [], []
        hem_scores, hem_offsets, sem_scores = [], [], []
        for f in feats:
            cf, pf = f, f
            for blk in cls_tower:
                cf = blk(cf)
            for blk in reg_tower:
                pf = blk(pf)
            sf = pf
            for blk in shared_tower:
                sf = blk(sf)
            sem_score = sem_out(sf)
            sem_feat = sem_embedding(sf)
            cf = cf + sem_feat
            pf = pf + sem_feat
            hf = sf + sem_feat
            tl = hem_tl(hf)
            br = hem_br(hf)
            hem_score = jnp.concatenate([tl_score(tl), br_score(br)], -1)
            hem_offset = jnp.concatenate([tl_off(tl), br_off(br)], -1)

            pts_init = init_out(nn.relu(init_conv(pf)))
            mix = (self.gradient_mul * pts_init
                   + (1.0 - self.gradient_mul)
                   * jax.lax.stop_gradient(pts_init))
            dcn_offs.append((mix - base).astype(f.dtype))
            hem6 = jnp.concatenate([hem_score, hem_offset], -1)
            cls_feats.append(jnp.concatenate([cf, hem6], -1))
            pts_feats.append(jnp.concatenate([pf, hem6], -1))
            inits.append(pts_init)
            hem_scores.append(hem_score)
            hem_offsets.append(hem_offset)
            sem_scores.append(sem_score)

        from ...ops.flat_deform import SampleJob
        jobs = [SampleJob(i, dcn_offs[i], None, (1.0, 1.0), (1, 1),
                          (pad, pad), (1, 1)) for i in range(len(feats))]
        cls_g, ref_g = pair_dcn(cls_feats, pts_feats, jobs)
        cls_maps, refine_maps = [], []
        for i in range(len(feats)):
            cls_maps.append(cls_out(nn.relu(cls_g[i])))
            refine = refine_out(nn.relu(ref_g[i]))
            refine_maps.append(refine + jax.lax.stop_gradient(inits[i]))
        if self.transform_method == "moment":
            mt = self.param("moment_transfer", nn.initializers.zeros, (2,),
                            jnp.float32)
            moment = (mt * self.moment_mul
                      + jax.lax.stop_gradient(mt) * (1 - self.moment_mul))
        else:
            moment = jnp.zeros((2,), jnp.float32)
        return {"cls": cls_maps, "pts_init": inits,
                "pts_refine": refine_maps, "moment": moment,
                "hem_score": hem_scores, "hem_offset": hem_offsets,
                "sem_score": sem_scores}
