"""Feature Pyramid Network (NHWC, flax).

Mirrors the reference FPN (`/root/reference/code/mmdet/models/necks/fpn.py:10-217`)
with the knobs LSNet uses: ``start_level``, ``add_extra_convs='on_input'``,
``num_outs``, GN norm, no activation on lateral/fpn convs, nearest-neighbour
top-down upsampling.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvModule

Array = jax.Array


def _upsample_nearest_2x_to(x: Array, target_hw: Tuple[int, int]) -> Array:
    """Nearest upsample to an exact (H, W) (handles odd sizes like torch
    ``interpolate(..., size=prev_shape)``)."""
    B, H, W, C = x.shape
    th, tw = target_hw
    ridx = (jnp.arange(th) * H) // th
    cidx = (jnp.arange(tw) * W) // tw
    return x[:, ridx][:, :, cidx]


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Optional[str] = None    # None | 'on_input' | 'on_output' | 'on_lateral'
    relu_before_extra_convs: bool = False
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        used = list(inputs[self.start_level:
                           (None if self.end_level == -1 else self.end_level + 1)])
        n_used = len(used)

        laterals = [
            ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg, act=None,
                       name=f"lateral_{i}")(used[i])
            for i in range(n_used)
        ]
        for i in range(n_used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x_to(
                laterals[i], laterals[i - 1].shape[1:3])

        outs = [
            ConvModule(self.out_channels, 3, norm_cfg=self.norm_cfg, act=None,
                       name=f"fpn_{i}")(laterals[i])
            for i in range(n_used)
        ]

        if self.num_outs > n_used:
            if self.add_extra_convs is None:
                for _ in range(self.num_outs - n_used):
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                if self.add_extra_convs == "on_input":
                    extra_src = used[-1]
                elif self.add_extra_convs == "on_lateral":
                    extra_src = laterals[-1]
                else:  # on_output
                    extra_src = outs[-1]
                for k in range(self.num_outs - n_used):
                    if k > 0 and self.relu_before_extra_convs:
                        extra_src = nn.relu(extra_src)
                    extra_src = ConvModule(self.out_channels, 3, stride=2,
                                           norm_cfg=self.norm_cfg, act=None,
                                           name=f"extra_{k}")(extra_src)
                    outs.append(extra_src)
        return tuple(outs)
