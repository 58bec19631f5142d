"""RegNet + HourglassNet backbones (zoo parity with the reference
`/root/reference/code/mmdet/models/backbones/regnet.py` (322 LoC) and
`hourglass.py` (193 LoC)).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import FrozenBatchNorm, kaiming_init
from .resnet import BasicBlock, _conv

Array = jax.Array


# ---------------------------------------------------------------------- RegNet

def regnet_widths(w0: float, wa: float, wm: float, depth: int,
                  group_width: int):
    """Quantized linear width rule (RegNet paper / reference
    ``generate_regnet``)."""
    ws_cont = w0 + wa * np.arange(depth)
    ks = np.round(np.log(ws_cont / w0) / np.log(wm))
    ws = w0 * np.power(wm, ks)
    ws = np.round(ws / 8) * 8
    # adjust to group width compatibility
    ws = [int(min(w, group_width * max(1, round(w / group_width))))
          for w in ws]
    ws = [int(max(group_width, round(w / group_width) * group_width))
          for w in ws]
    widths, stages = [], []
    for w in ws:
        if not widths or widths[-1] != w:
            widths.append(w)
            stages.append(1)
        else:
            stages[-1] += 1
    return widths, stages


class RegBottleneck(nn.Module):
    width: int
    stride: int
    group_width: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        groups = max(1, self.width // self.group_width)
        identity = x
        out = _conv(self.width, 1, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(name="bn1")(out))
        out = _conv(self.width, 3, self.stride, groups=groups,
                    name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(name="bn2")(out))
        out = _conv(self.width, 1, name="conv3")(out)
        out = FrozenBatchNorm(name="bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.width:
            identity = _conv(self.width, 1, self.stride,
                             name="downsample_conv")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class RegNet(nn.Module):
    """RegNetX; ``arch`` mirrors the reference dict
    (w0, wa, wm, depth, group_width)."""
    arch: dict
    stem_channels: int = 32
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        a = dict(self.arch)
        widths, stages = regnet_widths(a["w0"], a["wa"], a["wm"],
                                       a["depth"], a["group_w"])
        x = _conv(self.stem_channels, 3, 2, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(name="bn1")(x))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        for si, (w, d) in enumerate(zip(widths, stages)):
            for bi in range(d):
                x = RegBottleneck(w, 2 if bi == 0 else 1, a["group_w"],
                                  name=f"layer{si + 1}_{bi}")(x)
            if self.frozen_stages >= si + 1:
                x = jax.lax.stop_gradient(x)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)


# ----------------------------------------------------------------- Hourglass

class HourglassModule(nn.Module):
    """Recursive hourglass (CornerNet style, reference `hourglass.py:10-79`)."""
    depth: int
    stage_channels: Sequence[int]
    stage_blocks: Sequence[int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cur_ch = self.stage_channels[0]
        next_ch = self.stage_channels[1]
        cur_blocks = self.stage_blocks[0]

        up1 = x
        for i in range(cur_blocks):
            up1 = BasicBlock(cur_ch, downsample=(up1.shape[-1] != cur_ch
                                                 and i == 0),
                             name=f"up1_{i}")(up1)
        low1 = x
        for i in range(cur_blocks):
            low1 = BasicBlock(next_ch, stride=2 if i == 0 else 1,
                              downsample=(i == 0), name=f"low1_{i}")(low1)
        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                   self.stage_blocks[1:], name="low2")(low1)
        else:
            low2 = low1
            for i in range(cur_blocks):
                low2 = BasicBlock(next_ch, name=f"low2_{i}")(low2)
        low3 = low2
        for i in range(cur_blocks):
            low3 = BasicBlock(cur_ch, downsample=(low3.shape[-1] != cur_ch
                                                  and i == 0),
                              name=f"low3_{i}")(low3)
        B, H, W, C = low3.shape
        th, tw = up1.shape[1:3]
        ridx = (jnp.arange(th) * H) // th
        cidx = (jnp.arange(tw) * W) // tw
        up2 = low3[:, ridx][:, :, cidx]
        return up1 + up2


class HourglassNet(nn.Module):
    """Stacked hourglass (reference `hourglass.py:82-193`): returns one
    feature map per stack (stride 4)."""
    num_stacks: int = 2
    downsample_times: int = 5
    stage_channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Sequence[int] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        ch0 = self.stage_channels[0]
        x = _conv(128, 7, 2, name="stem_conv1")(x)
        x = nn.relu(FrozenBatchNorm(name="stem_bn1")(x))
        x = BasicBlock(ch0, stride=2, downsample=True, name="stem_res")(x)

        outs = []
        inter = x
        for s in range(self.num_stacks):
            hg = HourglassModule(self.downsample_times, self.stage_channels,
                                 self.stage_blocks, name=f"hg{s}")(inter)
            feat = _conv(self.feat_channel, 3, name=f"out{s}_conv")(hg)
            feat = nn.relu(FrozenBatchNorm(name=f"out{s}_bn")(feat))
            outs.append(feat)
            if s < self.num_stacks - 1:
                a = _conv(ch0, 1, name=f"remap{s}_a")(inter)
                a = FrozenBatchNorm(name=f"remap{s}_abn")(a)
                b = _conv(ch0, 1, name=f"remap{s}_b")(feat)
                b = FrozenBatchNorm(name=f"remap{s}_bbn")(b)
                inter = BasicBlock(ch0, name=f"inter{s}")(nn.relu(a + b))
        return tuple(outs)
