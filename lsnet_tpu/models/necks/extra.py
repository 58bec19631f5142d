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

from ..layers import ConvModule
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
