"""MobileNetV2 backbone (zoo parity with the reference
`/root/reference/code/mmdet/models/backbones/mobilenet_v2.py`, 280 LoC):
inverted-residual bottlenecks, width multiplier, frozen stages; NHWC flax
with FrozenBatchNorm like the rest of the family.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import FrozenBatchNorm, kaiming_init

Array = jax.Array

# (expand_ratio, channels, num_blocks, stride) per stage — the V2 recipe
ARCH = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _conv_bn_relu6(x, out, k, stride, groups=1, name=""):
    pad = k // 2
    x = nn.Conv(out, (k, k), strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                feature_group_count=groups, use_bias=False,
                kernel_init=kaiming_init, name=f"{name}_conv")(x)
    x = FrozenBatchNorm(name=f"{name}_bn")(x)
    return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        identity = x
        out = x
        if self.expand_ratio != 1:
            out = _conv_bn_relu6(out, hidden, 1, 1, name="expand")
        out = _conv_bn_relu6(out, hidden, 3, self.stride, groups=hidden,
                             name="depthwise")
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      kernel_init=kaiming_init, name="project_conv")(out)
        out = FrozenBatchNorm(name="project_bn")(out)
        if self.stride == 1 and cin == self.out_channels:
            out = out + identity
        return out


class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    out_indices: Sequence[int] = (1, 2, 4, 6)
    frozen_stages: int = -1

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        c = _make_divisible(32 * self.widen_factor)
        x = _conv_bn_relu6(x, c, 3, 2, name="conv1")
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        for stage_i, (t, ch, n, s) in enumerate(ARCH):
            out_ch = _make_divisible(ch * self.widen_factor)
            for block_i in range(n):
                x = InvertedResidual(out_ch, s if block_i == 0 else 1, t,
                                     name=f"layer{stage_i + 1}_{block_i}")(x)
            if self.frozen_stages >= stage_i + 1:
                x = jax.lax.stop_gradient(x)
            if stage_i in self.out_indices:
                outs.append(x)
        return tuple(outs)
