"""Additional necks: PAFPN and BFP.

Zoo-parity with the reference necks (`/root/reference/code/mmdet/models/
necks/pafpn.py`, `bfp.py`): PAFPN adds a bottom-up path aggregation on top
of FPN; BFP (Balanced Feature Pyramid, Libra R-CNN) refines all levels with
a gathered-and-redistributed balanced feature.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvModule, FrozenBatchNorm
from .fpn import FPN, _upsample_nearest_2x_to

Array = jax.Array


class PAFPN(nn.Module):
    """FPN + bottom-up path aggregation (PANet)."""
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Optional[str] = None
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        fpn_outs = FPN(out_channels=self.out_channels,
                       num_outs=self.num_outs,
                       start_level=self.start_level,
                       add_extra_convs=self.add_extra_convs,
                       norm_cfg=self.norm_cfg, name="fpn")(inputs)
        outs = [fpn_outs[0]]
        # bottom-up: downsample + add, then 3x3 conv
        for i in range(1, len(fpn_outs)):
            down = ConvModule(self.out_channels, 3, stride=2,
                              norm_cfg=self.norm_cfg, act=None,
                              name=f"downsample_{i}")(outs[-1])
            h, w = fpn_outs[i].shape[1:3]
            down = down[:, :h, :w]
            merged = fpn_outs[i] + down
            outs.append(ConvModule(self.out_channels, 3,
                                   norm_cfg=self.norm_cfg, act=None,
                                   name=f"pafpn_conv_{i}")(merged))
        return tuple(outs)


class BFP(nn.Module):
    """Balanced Feature Pyramid: average all levels at a reference level,
    refine, redistribute residually."""
    out_channels: int = 256
    refine_level: int = 2
    refine_type: Optional[str] = "conv"   # None | 'conv'

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        ref_h, ref_w = inputs[self.refine_level].shape[1:3]
        gathered = []
        for i, x in enumerate(inputs):
            if i < self.refine_level:
                # downsample via adaptive max pool (stride = size ratio)
                sh = x.shape[1] // ref_h
                sw = x.shape[2] // ref_w
                g = nn.max_pool(x, (max(sh, 1), max(sw, 1)),
                                strides=(max(sh, 1), max(sw, 1)))
                g = g[:, :ref_h, :ref_w]
            elif i > self.refine_level:
                g = _upsample_nearest_2x_to(x, (ref_h, ref_w))
            else:
                g = x
            gathered.append(g)
        bsf = sum(gathered) / len(gathered)
        if self.refine_type == "conv":
            bsf = ConvModule(self.out_channels, 3, act=None,
                             name="refine")(bsf)
        outs = []
        for i, x in enumerate(inputs):
            h, w = x.shape[1:3]
            if i < self.refine_level:
                r = _upsample_nearest_2x_to(bsf, (h, w))
            elif i > self.refine_level:
                sh = bsf.shape[1] // h
                sw = bsf.shape[2] // w
                r = nn.max_pool(bsf, (max(sh, 1), max(sw, 1)),
                                strides=(max(sh, 1), max(sw, 1)))[:, :h, :w]
            else:
                r = bsf
            outs.append(x + r)
        return tuple(outs)


def _resize_to(x: Array, hw: Tuple[int, int], mode: str = "nearest") -> Array:
    """Resize up (interpolate) or down (max-pool by integer factor) to an
    exact size — reference BaseMergeCell._resize semantics."""
    H, W = x.shape[1:3]
    th, tw = hw
    if (H, W) == (th, tw):
        return x
    if H < th or W < tw:
        if mode == "bilinear":
            return jax.image.resize(x, (x.shape[0], th, tw, x.shape[3]),
                                    method="bilinear")
        return _upsample_nearest_2x_to(x, (th, tw))
    k = H // th
    return nn.max_pool(x, (k, k), strides=(k, k))


class _SumCell(nn.Module):
    """act->conv->norm merge cell, x1 + x2 (reference SumCell)."""
    out_channels: int
    norm_cfg: Optional[dict] = None
    with_out_conv: bool = True

    @nn.compact
    def __call__(self, x1: Array, x2: Array, out_hw: Tuple[int, int]) -> Array:
        x = _resize_to(x1, out_hw) + _resize_to(x2, out_hw)
        if self.with_out_conv:
            # reference out_conv_order=('act','conv','norm')
            x = nn.relu(x)
            x = ConvModule(self.out_channels, 3, norm_cfg=self.norm_cfg,
                           act=None, name="out_conv")(x)
        return x


class _GPCell(nn.Module):
    """Global-pooling attention merge: x2 + sigmoid(gap(x2)) * x1."""
    out_channels: int = 0
    norm_cfg: Optional[dict] = None
    with_out_conv: bool = True

    @nn.compact
    def __call__(self, x1: Array, x2: Array, out_hw: Tuple[int, int]) -> Array:
        x1 = _resize_to(x1, out_hw)
        x2 = _resize_to(x2, out_hw)
        att = jax.nn.sigmoid(jnp.mean(x2, axis=(1, 2), keepdims=True))
        x = x2 + att * x1
        if self.with_out_conv:
            x = nn.relu(x)
            x = ConvModule(self.out_channels, 3, norm_cfg=self.norm_cfg,
                           act=None, name="out_conv")(x)
        return x


class NASFPN(nn.Module):
    """NAS-FPN (reference `necks/nas_fpn.py`): laterals to 5 levels, then
    ``stack_times`` stages of the searched merging-cell topology
    (gp_64_4 / sum_44_4 / sum_43_3 / sum_34_4 / gp_43_5+sum_55_5 /
    gp_54_7+sum_77_7 / gp_75_6)."""
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 0
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        used = list(inputs[self.start_level:])
        feats = [ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                            act=None, name=f"lateral_{i}")(f)
                 for i, f in enumerate(used)]
        for k in range(self.num_outs - len(feats)):
            f = ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                           act=None, name=f"extra_{k}")(feats[-1])
            feats.append(nn.max_pool(f, (2, 2), strides=(2, 2)))
        p3, p4, p5, p6, p7 = feats
        hw = lambda t: t.shape[1:3]   # noqa: E731
        for s in range(self.stack_times):
            oc, nc = self.out_channels, self.norm_cfg
            p4_1 = _GPCell(oc, nc, name=f"s{s}_gp_64_4")(p6, p4, hw(p4))
            p4_2 = _SumCell(oc, nc, name=f"s{s}_sum_44_4")(p4_1, p4, hw(p4))
            p3 = _SumCell(oc, nc, name=f"s{s}_sum_43_3")(p4_2, p3, hw(p3))
            p4 = _SumCell(oc, nc, name=f"s{s}_sum_34_4")(p3, p4_2, hw(p4))
            p5_tmp = _GPCell(with_out_conv=False,
                             name=f"s{s}_gp_43_5")(p4, p3, hw(p5))
            p5 = _SumCell(oc, nc, name=f"s{s}_sum_55_5")(p5, p5_tmp, hw(p5))
            p7_tmp = _GPCell(with_out_conv=False,
                             name=f"s{s}_gp_54_7")(p5, p4_2, hw(p7))
            p7 = _SumCell(oc, nc, name=f"s{s}_sum_77_7")(p7, p7_tmp, hw(p7))
            p6 = _GPCell(oc, nc, name=f"s{s}_gp_75_6")(p7, p5, hw(p6))
        return p3, p4, p5, p6, p7


class HRFPN(nn.Module):
    """HRNet feature pyramid (reference `necks/hrfpn.py`): bilinear-upsample
    every branch to the top resolution, concat, 1x1 reduce, then pool to
    ``num_outs`` levels with a 3x3 conv each."""
    out_channels: int = 256
    num_outs: int = 5
    pooling_type: str = "AVG"

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        th, tw = inputs[0].shape[1:3]
        ups = [inputs[0]]
        for i in range(1, len(inputs)):
            ups.append(jax.image.resize(
                inputs[i], (inputs[i].shape[0], th, tw, inputs[i].shape[3]),
                method="bilinear"))
        out = jnp.concatenate(ups, axis=-1)
        out = ConvModule(self.out_channels, 1, act=None,
                         name="reduction")(out)
        levels = [out]
        for i in range(1, self.num_outs):
            k = 2 ** i
            if self.pooling_type == "MAX":
                levels.append(nn.max_pool(out, (k, k), strides=(k, k)))
            else:
                levels.append(nn.avg_pool(out, (k, k), strides=(k, k)))
        return tuple(ConvModule(self.out_channels, 3, act=None,
                                name=f"fpn_{i}")(lv)
                     for i, lv in enumerate(levels))


class FPNCarafe(nn.Module):
    """FPN with CARAFE upsampling in the top-down path (reference
    `necks/fpn_carafe.py`): each upsample predicts content-aware reassembly
    kernels (ops.misc.carafe) instead of nearest-neighbour."""
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    up_kernel: int = 5
    up_group: int = 1
    encoder_kernel: int = 3
    compressed_channels: int = 64
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        from ...ops.misc import carafe
        used = list(inputs[self.start_level:])
        n = len(used)
        laterals = [ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                               act=None, name=f"lateral_{i}")(f)
                    for i, f in enumerate(used)]
        for i in range(n - 1, 0, -1):
            x = laterals[i]
            # kernel prediction: compress -> encode -> softmax per window
            comp = ConvModule(self.compressed_channels, 1, act=None,
                              name=f"up_comp_{i}")(x)
            k2 = self.up_kernel * self.up_kernel * self.up_group * 4
            enc = ConvModule(k2, self.encoder_kernel, act=None,
                             name=f"up_enc_{i}")(comp)
            B, H, W, _ = enc.shape
            masks = enc.reshape(B, H, W, 2, 2,
                                self.up_group * self.up_kernel ** 2)
            masks = jax.nn.softmax(masks, axis=-1)
            masks = masks.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H * 2, W * 2, self.up_group * self.up_kernel ** 2)
            up = carafe(x, masks, self.up_kernel, self.up_group, 2)
            th, tw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + up[:, :th, :tw]
        outs = [ConvModule(self.out_channels, 3, norm_cfg=self.norm_cfg,
                           act=None, name=f"fpn_{i}")(laterals[i])
                for i in range(n)]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (2, 2), strides=(2, 2)))
        return tuple(outs)


class RFP(nn.Module):
    """Recursive Feature Pyramid (DetectoRS, reference `necks/rfp.py`):
    FPN outputs are fed back through an rfp-aggregation conv into a second
    (recursive) FPN pass, fused by a learned per-pixel gate.

    The reference feeds the feedback into the backbone stages; the TPU
    build approximates the unrolled recursion at the neck level (feedback
    added to the laterals), which keeps the backbone weight-shared and the
    whole unroll jittable."""
    out_channels: int = 256
    num_outs: int = 5
    rfp_steps: int = 2
    start_level: int = 0
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        fpn = FPN(out_channels=self.out_channels, num_outs=self.num_outs,
                  start_level=self.start_level,
                  add_extra_convs="on_input", norm_cfg=self.norm_cfg,
                  name="fpn")
        outs = fpn(inputs)
        n_used = len(inputs) - self.start_level
        for step in range(self.rfp_steps - 1):
            # feedback: 1x1 aggregation of current outputs into the inputs
            fb_inputs = list(inputs)
            for i in range(n_used):
                fb = ConvModule(inputs[self.start_level + i].shape[-1], 1,
                                act=None, name=f"rfp_agg_s{step}_{i}")(
                                    outs[i])
                fb_inputs[self.start_level + i] = (
                    inputs[self.start_level + i] + fb)
            new_outs = FPN(out_channels=self.out_channels,
                           num_outs=self.num_outs,
                           start_level=self.start_level,
                           add_extra_convs="on_input",
                           norm_cfg=self.norm_cfg,
                           name=f"fpn_step{step + 1}")(fb_inputs)
            fused = []
            for i, (o, nw) in enumerate(zip(outs, new_outs)):
                gate = jax.nn.sigmoid(
                    ConvModule(1, 1, act=None,
                               name=f"rfp_gate_s{step}_{i}")(nw))
                fused.append(gate * nw + (1 - gate) * o)
            outs = tuple(fused)
        return outs


class _NASFCOSConcatCell(nn.Module):
    """NAS-FCOS ConcatCell (reference `ops/merge_cells.py:129-137` +
    `necks/nasfcos_fpn.py:76-91`): optional 3x3 input convs, resize to the
    larger input, channel concat, then norm->act->grouped-1x1 out conv
    (groups = out_channels: each pair of concat channels mixes to one)."""
    out_channels: int
    with_input1_conv: bool = True
    with_input2_conv: bool = False
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x1: Array, x2: Array) -> Array:
        C = self.out_channels
        if self.with_input1_conv:
            x1 = ConvModule(C, 3, bias=True, norm_cfg=self.norm_cfg,
                            name="input1_conv")(x1)
        if self.with_input2_conv:
            x2 = ConvModule(C, 3, bias=True, norm_cfg=self.norm_cfg,
                            name="input2_conv")(x2)
        out_hw = (max(x1.shape[1], x2.shape[1]),
                  max(x1.shape[2], x2.shape[2]))
        x1 = _resize_to(x1, out_hw)
        x2 = _resize_to(x2, out_hw)
        # interleave so each depthwise group sees (x1_c, x2_c) — the torch
        # concat is block-wise [x1, x2] with groups=C mapping group c to
        # channels (2c? no: group c gets channels [c*2? ...]); torch groups
        # split the 2C input contiguously: group c owns channels
        # [c*2C/C=(2c, 2c+1)] of the CONCAT -> pair (x1_{2c}, x1_{2c+1})
        # for c < C/2 ... i.e. the plain block concat, grouped conv
        x = jnp.concatenate([x1, x2], axis=-1)
        x = FrozenBatchNorm(name="bn")(x)
        x = nn.relu(x)
        # grouped 1x1, groups = C over 2C input
        x = nn.Conv(C, (1, 1), feature_group_count=C, use_bias=False,
                    name="out_conv")(x)
        return x


class NASFCOSFPN(nn.Module):
    """NAS-FCOS FPN (reference `necks/nasfcos_fpn.py:10-161`): BN+ReLU 1x1
    adapters, the searched 7-ConcatCell DAG, P3-P5 fused with f5 and
    bilinear-resized back to input strides, extra stride-2 convs."""
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        C = self.out_channels
        used = list(inputs[self.start_level:])
        feats = []
        for i, f in enumerate(used):
            a = nn.Conv(C, (1, 1), use_bias=False,
                        name=f"adapt_{i}")(f)
            a = FrozenBatchNorm(name=f"adapt_bn_{i}")(a)
            feats.append(nn.relu(a))
        spec = [("c22_1", 2, 2, True, True), ("c22_2", 2, 2, True, True),
                ("c32", 3, 2, True, False), ("c02", 0, 2, True, False),
                ("c42", 4, 2, True, True), ("c36", 3, 6, True, True),
                ("c61", 6, 1, True, True)]
        for name, i1, i2, w1, w2 in spec:
            feats.append(_NASFCOSConcatCell(
                C, with_input1_conv=w1, with_input2_conv=w2,
                norm_cfg=self.norm_cfg, name=name)(feats[i1], feats[i2]))
        ret = []
        for idx, input_idx in zip([9, 8, 7], [1, 2, 3]):
            f1, f2 = feats[idx], feats[5]
            f2r = jax.image.resize(
                f2, (f2.shape[0], f1.shape[1], f1.shape[2], f2.shape[3]),
                method="bilinear")
            s = f1 + f2r
            tgt = inputs[input_idx].shape[1:3]
            ret.append(jax.image.resize(
                s, (s.shape[0], tgt[0], tgt[1], s.shape[3]),
                method="bilinear"))
        x = ret[-1]
        for k in range(self.num_outs - len(ret)):
            # reference order ('act','norm','conv'), act None on the first
            if k > 0:
                x = nn.relu(x)
            x = nn.Conv(C, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)],
                        name=f"extra_{k}")(x)
            ret.append(x)
        return tuple(ret)
