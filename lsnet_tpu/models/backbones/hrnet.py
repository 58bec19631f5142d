"""HRNet backbone (zoo parity with the reference
`/root/reference/code/mmdet/models/backbones/hrnet.py`, 535 LoC).

High-Resolution Net: a stem + bottleneck stage-1, then stages of parallel
multi-resolution branches exchanging information through fuse units.
Configured by the mmdet-style ``extra`` dict::

    extra=dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(4,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(4, 4), num_channels=(32, 64)),
        stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                    num_blocks=(4, 4, 4), num_channels=(32, 64, 128)),
        stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                    num_blocks=(4, 4, 4, 4),
                    num_channels=(32, 64, 128, 256)))

Outputs the four branch feature maps (strides 4/8/16/32), NHWC.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import FrozenBatchNorm, kaiming_init
from .resnet import BasicBlock, Bottleneck, _conv

Array = jax.Array


def _upsample_to(x: Array, hw) -> Array:
    B, H, W, C = x.shape
    th, tw = hw
    ridx = (jnp.arange(th) * H) // th
    cidx = (jnp.arange(tw) * W) // tw
    return x[:, ridx][:, :, cidx]


class HRModule(nn.Module):
    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    multiscale_output: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[Array]) -> Tuple[Array, ...]:
        # per-branch residual blocks
        feats = []
        for b in range(self.num_branches):
            x = xs[b]
            for i in range(self.num_blocks[b]):
                x = BasicBlock(self.num_channels[b],
                               downsample=(x.shape[-1]
                                           != self.num_channels[b]
                                           and i == 0),
                               name=f"branch{b}_block{i}")(x)
            feats.append(x)
        if self.num_branches == 1:
            return (feats[0],)
        # fuse units: every output branch sums transformed inputs
        outs = []
        n_out = self.num_branches if self.multiscale_output else 1
        for i in range(n_out):
            acc = None
            for j in range(self.num_branches):
                y = feats[j]
                if j > i:      # upsample lower-res: 1x1 conv + NN upsample
                    y = _conv(self.num_channels[i], 1,
                              name=f"fuse{i}_{j}_conv")(y)
                    y = FrozenBatchNorm(name=f"fuse{i}_{j}_bn")(y)
                    y = _upsample_to(y, feats[i].shape[1:3])
                elif j < i:    # downsample higher-res: chained 3x3 stride-2
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.num_channels[i] if last else \
                            self.num_channels[j]
                        y = _conv(ch, 3, 2, name=f"fuse{i}_{j}_d{k}_conv")(y)
                        y = FrozenBatchNorm(name=f"fuse{i}_{j}_d{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return tuple(outs)


class HRNet(nn.Module):
    extra: Any
    frozen_stages: int = -1

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        extra = dict(self.extra)
        # stem: two stride-2 3x3 convs
        x = _conv(64, 3, 2, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(name="bn1")(x))
        x = _conv(64, 3, 2, name="conv2")(x)
        x = nn.relu(FrozenBatchNorm(name="bn2")(x))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        # stage 1: bottlenecks
        s1 = dict(extra["stage1"])
        ch1 = s1["num_channels"][0]
        for i in range(s1["num_blocks"][0]):
            x = Bottleneck(ch1, downsample=(i == 0),
                           name=f"layer1_{i}")(x)
        xs = [x]

        prev_channels = [ch1 * 4]
        for stage_i, key in enumerate(("stage2", "stage3", "stage4")):
            scfg = dict(extra[key])
            nb = scfg["num_branches"]
            chans = list(scfg["num_channels"])
            # transition: adapt/extend branch list
            new_xs = []
            for b in range(nb):
                if b < len(xs):
                    if prev_channels[b] != chans[b]:
                        y = _conv(chans[b], 3,
                                  name=f"transition{stage_i + 2}_{b}_conv")(
                            xs[b])
                        y = nn.relu(FrozenBatchNorm(
                            name=f"transition{stage_i + 2}_{b}_bn")(y))
                    else:
                        y = xs[b]
                else:  # new lower-resolution branch from the last one
                    y = _conv(chans[b], 3, 2,
                              name=f"transition{stage_i + 2}_{b}_conv")(
                        xs[-1])
                    y = nn.relu(FrozenBatchNorm(
                        name=f"transition{stage_i + 2}_{b}_bn")(y))
                new_xs.append(y)
            xs = new_xs
            for m in range(scfg["num_modules"]):
                last = m == scfg["num_modules"] - 1
                xs = list(HRModule(
                    nb, scfg["num_blocks"], chans,
                    multiscale_output=True if not last or key != "stage4"
                    else scfg.get("multiscale_output", True),
                    name=f"{key}_module{m}")(xs))
            prev_channels = chans
            if self.frozen_stages >= stage_i + 2:
                xs = [jax.lax.stop_gradient(v) for v in xs]
        return tuple(xs)
