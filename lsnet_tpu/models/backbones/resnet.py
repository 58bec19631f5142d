"""ResNet / ResNeXt / Res2Net backbone family (NHWC, flax).

TPU-native re-design of the reference backbones
(`/root/reference/code/mmdet/models/backbones/resnet.py` (661 LoC),
`resnext.py` (131), `res2net.py` (350)) covering every knob the LSNet
configs use: depth 50/101, ``groups/base_width`` (ResNeXt), ``scales/
base_width`` (Res2Net), per-stage DCNv2 (``stage_with_dcn``), ``frozen_stages``
and ``norm_eval`` (realized by FrozenBatchNorm + stop_gradient), and
``out_indices``.

Design differences from the reference (deliberate, TPU-first):
  * NHWC layout, bf16-friendly; BN is FrozenBatchNorm (running stats).
  * ``with_cp`` (torch checkpointing) maps to ``jax.checkpoint`` via the
    ``remat`` flag (rematerialize each residual block).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import FrozenBatchNorm, ModulatedDeformConvPack, kaiming_init

Array = jax.Array

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _conv(out, k, stride=1, dilation=1, groups=1, name=None):
    pad = k // 2 * dilation
    return nn.Conv(out, (k, k), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)],
                   kernel_dilation=(dilation, dilation),
                   feature_group_count=groups, use_bias=False,
                   kernel_init=kaiming_init, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    use_dcn: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv1")(x)
        out = FrozenBatchNorm(name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dilation, name="conv2")(out)
        out = FrozenBatchNorm(name="bn2")(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, name="downsample_conv")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """Bottleneck with optional ResNeXt grouping and DCNv2 on conv2.

    'pytorch' style: stride lives on the 3x3 conv (reference
    `resnet.py:61-68`)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    use_dcn: bool = False
    use_sac: bool = False
    groups: int = 1
    base_width: int = 4
    base_channels: int = 64
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.groups == 1:
            width = self.planes
        else:  # ResNeXt (`resnext.py:45-47`)
            width = int(self.planes * (self.base_width / self.base_channels)) * self.groups
        identity = x
        out = _conv(width, 1, 1, name="conv1")(x)
        out = FrozenBatchNorm(name="bn1")(out)
        out = nn.relu(out)
        if self.use_dcn:
            out = ModulatedDeformConvPack(width, 3, stride=self.stride,
                                          padding=self.dilation,
                                          dilation=self.dilation,
                                          groups=self.groups,
                                          use_bias=False, site="backbone",
                                          name="conv2")(out)
        elif self.use_sac:
            from ..layers import SAConv
            out = SAConv(width, 3, stride=self.stride,
                         dilation=self.dilation, groups=self.groups,
                         name="conv2")(out)
        elif self.groups > 1:
            # measured-policy grouped conv (dense block-diag at small
            # per-group widths — see layers.GroupedConv)
            from ..layers import GroupedConv
            out = GroupedConv(width, 3, stride=self.stride,
                              dilation=self.dilation, groups=self.groups,
                              name="conv2")(out)
        else:
            out = _conv(width, 3, self.stride, self.dilation,
                        groups=self.groups, name="conv2")(out)
        out = FrozenBatchNorm(name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, 1, name="conv3")(out)
        out = FrozenBatchNorm(name="bn3")(out)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride,
                             name="downsample_conv")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Res2Bottleneck(nn.Module):
    """Res2Net bottle2neck (`res2net.py:12-97`): the 3x3 conv is split into
    ``scales-1`` hierarchical group convs over channel slices."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    use_dcn: bool = False
    scales: int = 4
    base_width: int = 26
    base_channels: int = 64
    expansion: int = 4
    stage_type: str = "normal"   # 'stage' for the first block of a stage

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import math
        width = int(math.floor(self.planes * (self.base_width / self.base_channels)))
        identity = x
        out = _conv(width * self.scales, 1, 1, name="conv1")(x)
        out = FrozenBatchNorm(name="bn1")(out)
        out = nn.relu(out)

        spx = jnp.split(out, self.scales, axis=-1)
        outs = []
        sp = None
        for i in range(self.scales - 1):
            inp = spx[i] if (i == 0 or self.stage_type == "stage") else sp + spx[i]
            if self.use_dcn:
                sp = ModulatedDeformConvPack(width, 3, stride=self.stride,
                                             padding=self.dilation,
                                             dilation=self.dilation,
                                             use_bias=False, site="backbone",
                                             name=f"conv2_{i}")(inp)
            else:
                sp = _conv(width, 3, self.stride, self.dilation,
                           name=f"conv2_{i}")(inp)
            sp = nn.relu(FrozenBatchNorm(name=f"bn2_{i}")(sp))
            outs.append(sp)
        if self.stage_type == "normal" and self.stride == 1:
            outs.append(spx[-1])
        else:  # 'stage': avg-pool the last slice (reference `res2net.py:83-85`)
            outs.append(nn.avg_pool(spx[-1], (3, 3),
                                    strides=(self.stride, self.stride),
                                    padding=((1, 1), (1, 1))))
        out = jnp.concatenate(outs, axis=-1)

        out = _conv(self.planes * self.expansion, 1, 1, name="conv3")(out)
        out = FrozenBatchNorm(name="bn3")(out)
        if self.downsample:
            # Res2Net downsample: avgpool + 1x1 conv (`res2net.py:252-263`)
            identity = x
            if self.stride != 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride),
                                       padding="VALID")
            identity = _conv(self.planes * self.expansion, 1, 1,
                             name="downsample_conv")(identity)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Unified ResNet-family backbone.

    Config-mirror of the reference registry entries ``ResNet`` / ``ResNeXt``
    / ``Res2Net``: select the variant via ``block_type``.
    """
    depth: int = 50
    block_type: str = "resnet"   # resnet | resnext | res2net
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    frozen_stages: int = -1
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    stage_with_sac: Sequence[bool] = (False, False, False, False)
    groups: int = 1              # ResNeXt
    base_width: int = 4          # ResNeXt (4) / Res2Net (26)
    scales: int = 4              # Res2Net
    base_channels: int = 64
    deep_stem: bool = False      # Res2Net-v1d: 3x 3x3 convs replace the 7x7
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        block_kind, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[: self.num_stages]

        if self.deep_stem:
            # reference `_make_stem_layer` deep_stem branch (resnet.py):
            # 3x3/2 (C/2) -> 3x3 (C/2) -> 3x3 (C)
            x = _conv(self.base_channels // 2, 3, 2, name="stem_conv1")(x)
            x = nn.relu(FrozenBatchNorm(name="stem_bn1")(x))
            x = _conv(self.base_channels // 2, 3, 1, name="stem_conv2")(x)
            x = nn.relu(FrozenBatchNorm(name="stem_bn2")(x))
            x = _conv(self.base_channels, 3, 1, name="stem_conv3")(x)
            x = nn.relu(FrozenBatchNorm(name="stem_bn3")(x))
        else:
            # stem: 7x7/2 + maxpool 3x3/2
            x = _conv(self.base_channels, 7, 2, name="conv1")(x)
            x = FrozenBatchNorm(name="bn1")(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = self.base_channels
        for stage_i, nblocks in enumerate(stage_blocks):
            stride = self.strides[stage_i]
            dilation = self.dilations[stage_i]
            use_dcn = self.stage_with_dcn[stage_i]
            use_sac = self.stage_with_sac[stage_i]
            for block_i in range(nblocks):
                blk_stride = stride if block_i == 0 else 1
                downsample = block_i == 0
                name = f"layer{stage_i + 1}_{block_i}"
                if block_kind == "basic":
                    block_cls, kwargs = BasicBlock, dict(
                        planes=planes, stride=blk_stride, dilation=dilation,
                        downsample=downsample, use_dcn=use_dcn)
                elif self.block_type == "res2net":
                    block_cls, kwargs = Res2Bottleneck, dict(
                        planes=planes, stride=blk_stride, dilation=dilation,
                        downsample=downsample, use_dcn=use_dcn,
                        scales=self.scales, base_width=self.base_width,
                        base_channels=self.base_channels,
                        stage_type="stage" if block_i == 0 else "normal")
                else:
                    block_cls, kwargs = Bottleneck, dict(
                        planes=planes, stride=blk_stride, dilation=dilation,
                        downsample=downsample, use_dcn=use_dcn,
                        use_sac=use_sac,
                        groups=self.groups if self.block_type == "resnext" else 1,
                        base_width=self.base_width,
                        base_channels=self.base_channels)
                if self.remat:
                    block_cls = nn.remat(block_cls)
                x = block_cls(**kwargs, name=name)(x)
            if self.frozen_stages >= stage_i + 1:
                x = jax.lax.stop_gradient(x)
            if stage_i in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)


def frozen_param_paths(depth: int, frozen_stages: int,
                       deep_stem: bool = False) -> Tuple[str, ...]:
    """Prefixes of param collections that the optimizer must not touch
    (reference `_freeze_stages`, `resnet.py:536-556`)."""
    if frozen_stages < 0:
        return ()
    prefixes = ["stem_"] if deep_stem else ["conv1", "bn1"]
    for s in range(1, frozen_stages + 1):
        prefixes.append(f"layer{s}_")
    return tuple(prefixes)
