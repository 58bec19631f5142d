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


class SSDVGG(nn.Module):
    """VGG-16 SSD backbone (reference
    `/root/reference/code/mmdet/models/backbones/ssd_vgg.py`): the standard
    VGG16 conv stack with pool5 3x3/1, dilated fc6/fc7 convs, SSD extra
    layers, and an L2-normalized conv4_3 output.

    Returns 6 feature maps (conv4_3*, fc7, conv8_2..conv11_2) for SSD300.
    """
    input_size: int = 300
    depth: int = 16
    l2_norm_scale: float = 20.0

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        stages = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))
        outs = []
        for s, (n_convs, ch) in enumerate(stages):
            for i in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"conv{s + 1}_{i + 1}")(x)
                x = nn.relu(x)
            if s == 3:
                # conv4_3 output, L2-normalized with a learned per-channel
                # scale (reference L2Norm, init 20)
                scale = self.param("l2_norm_scale_param",
                                   nn.initializers.constant(
                                       self.l2_norm_scale),
                                   (x.shape[-1],), jnp.float32)
                norm = jnp.sqrt(
                    jnp.sum(x.astype(jnp.float32) ** 2, -1,
                            keepdims=True)) + 1e-10
                outs.append((x / norm * scale).astype(x.dtype))
            if s < 4:
                # ceil_mode pooling: pad to even before 2x2/2
                ph = x.shape[1] % 2
                pw = x.shape[2] % 2
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                mode="edge")
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.max_pool(x, (3, 3), strides=(1, 1),
                                padding=((1, 1), (1, 1)))
        # fc6: 3x3 dilation 6; fc7: 1x1 (both 1024)
        x = nn.relu(nn.Conv(1024, (3, 3), padding=[(6, 6), (6, 6)],
                            kernel_dilation=(6, 6), name="fc6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), name="fc7")(x))
        outs.append(x)
        # SSD300 extras: (1x1 squeeze, 3x3) pairs
        extras = ((256, 512, 2), (128, 256, 2), (128, 256, 0), (128, 256, 0))
        for i, (c1, c2, stride) in enumerate(extras):
            x = nn.relu(nn.Conv(c1, (1, 1), name=f"extra{i}_1")(x))
            if stride == 2:
                x = nn.relu(nn.Conv(c2, (3, 3), strides=(2, 2),
                                    padding=[(1, 1), (1, 1)],
                                    name=f"extra{i}_2")(x))
            else:
                x = nn.relu(nn.Conv(c2, (3, 3), padding="VALID",
                                    name=f"extra{i}_2")(x))
            outs.append(x)
        return tuple(outs)
