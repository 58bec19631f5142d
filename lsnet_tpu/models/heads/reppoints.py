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
