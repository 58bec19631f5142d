"""Inherited dense-head zoo — RetinaNet / FCOS / ATSS (flax forward passes).

These rebuild the reference's generic single-stage heads over the shared
LSNet machinery (SURVEY §2.3 "capability surface"):

* RetinaHead  `/root/reference/code/mmdet/models/dense_heads/retina_head.py`
* FCOSHead    `.../fcos_head.py`
* ATSSHead    `.../atss_head.py`

Forward only (pure compute, NHWC multi-level in -> dict of per-level maps);
losses live in :mod:`lsnet_tpu.core.dense_loss` and decoding in
:mod:`lsnet_tpu.core.dense_decode`, mirroring the LSNet split.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

_prior_bias = float(-math.log((1 - 0.01) / 0.01))   # bias_init_with_prob(.01)


def _conv3(out, name, bias_init=0.0):
    return nn.Conv(out, (3, 3), padding=[(1, 1), (1, 1)],
                   kernel_init=nn.initializers.normal(0.01),
                   bias_init=nn.initializers.constant(bias_init), name=name)


class _Tower(nn.Module):
    """stacked 3x3 convs (+ optional GN) shared by all three heads."""
    convs: int
    channels: int
    use_gn: bool
    name_prefix: str

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.convs):
            x = _conv3(self.channels, f"{self.name_prefix}{i}")(x)
            if self.use_gn:
                x = nn.GroupNorm(num_groups=32, name=f"{self.name_prefix}{i}_gn")(x)
            x = nn.relu(x)
        return x


class RetinaHead(nn.Module):
    """Anchor-based focal-loss head (A = 9 anchors/cell); norm_groups > 0
    adds GN towers (the FreeAnchor variant's configuration)."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_base_anchors: int = 9
    norm_groups: int = 0          # retina uses no norm in towers

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        use_gn = self.norm_groups > 0
        cls_tower = _Tower(self.stacked_convs, self.feat_channels, use_gn,
                           "cls_conv")
        reg_tower = _Tower(self.stacked_convs, self.feat_channels, use_gn,
                           "reg_conv")
        cls_out = _conv3(self.num_base_anchors * self.num_classes,
                         "retina_cls", bias_init=_prior_bias)
        reg_out = _conv3(self.num_base_anchors * 4, "retina_reg")
        cls_maps, reg_maps = [], []
        for f in feats:
            cls_maps.append(cls_out(cls_tower(f)))
            reg_maps.append(reg_out(reg_tower(f)))
        return {"cls": cls_maps, "reg": reg_maps}


class FCOSHead(nn.Module):
    """Anchor-free per-point head: cls / (l,t,r,b) / centerness."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    centerness_on_reg: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        cls_tower = _Tower(self.stacked_convs, self.feat_channels, True,
                           "cls_conv")
        reg_tower = _Tower(self.stacked_convs, self.feat_channels, True,
                           "reg_conv")
        cls_out = _conv3(self.num_classes, "fcos_cls",
                         bias_init=_prior_bias)
        reg_out = _conv3(4, "fcos_reg")
        ctr_out = _conv3(1, "fcos_centerness")
        # per-level learnable scale on the reg output (reference Scale)
        scales = self.param("scales", nn.initializers.ones,
                            (len(feats),), jnp.float32)
        cls_maps, reg_maps, ctr_maps = [], [], []
        for i, f in enumerate(feats):
            cf = cls_tower(f)
            rf = reg_tower(f)
            cls_maps.append(cls_out(cf))
            # exp(scale * reg) -> positive distances (reference fcos_head)
            reg_maps.append(jnp.exp(reg_out(rf) * scales[i].astype(f.dtype)))
            ctr_maps.append(ctr_out(rf if self.centerness_on_reg else cf))
        return {"cls": cls_maps, "reg": reg_maps, "centerness": ctr_maps}


class ATSSHead(nn.Module):
    """Single-anchor head with centerness + GIoU (reference atss_head.py)."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        cls_tower = _Tower(self.stacked_convs, self.feat_channels, True,
                           "cls_conv")
        reg_tower = _Tower(self.stacked_convs, self.feat_channels, True,
                           "reg_conv")
        cls_out = _conv3(self.num_classes, "atss_cls",
                         bias_init=_prior_bias)
        reg_out = _conv3(4, "atss_reg")
        ctr_out = _conv3(1, "atss_centerness")
        scales = self.param("scales", nn.initializers.ones,
                            (len(feats),), jnp.float32)
        cls_maps, reg_maps, ctr_maps = [], [], []
        for i, f in enumerate(feats):
            cf = cls_tower(f)
            rf = reg_tower(f)
            cls_maps.append(cls_out(cf))
            reg_maps.append(reg_out(rf) * scales[i].astype(f.dtype))
            ctr_maps.append(ctr_out(rf))
        return {"cls": cls_maps, "reg": reg_maps, "centerness": ctr_maps}


class GFLHead(nn.Module):
    """Generalized Focal Loss head (reference
    `/root/reference/code/mmdet/models/dense_heads/gfl_head.py`): joint
    quality-classification branch + discretized box-distribution regression
    (4 sides x (reg_max+1) logits, decoded by the integral operator)."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        cls_tower = _Tower(self.stacked_convs, self.feat_channels, True,
                           "cls_conv")
        reg_tower = _Tower(self.stacked_convs, self.feat_channels, True,
                           "reg_conv")
        cls_out = _conv3(self.num_classes, "gfl_cls",
                         bias_init=_prior_bias)
        reg_out = _conv3(4 * (self.reg_max + 1), "gfl_reg")
        scales = self.param("scales", nn.initializers.ones,
                            (len(feats),), jnp.float32)
        cls_maps, reg_maps = [], []
        for i, f in enumerate(feats):
            cf = cls_tower(f)
            rf = reg_tower(f)
            cls_maps.append(cls_out(cf))
            reg_maps.append(reg_out(rf) * scales[i].astype(f.dtype))
        return {"cls": cls_maps, "reg": reg_maps}


class SSDHead(nn.Module):
    """SSD detection head (reference `.../ssd_head.py:15-105`): one 3x3
    cls conv + one 3x3 reg conv per input level, per-level anchor counts
    (4/6/6/6/4/4 for SSD300), softmax classification over C+1."""
    num_classes: int
    in_channels: Tuple[int, ...] = (512, 1024, 512, 256, 256, 256)
    num_base_anchors: Tuple[int, ...] = (4, 6, 6, 6, 4, 4)

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        cls_maps, reg_maps = [], []
        for i, f in enumerate(feats):
            A = self.num_base_anchors[i]
            cls_maps.append(_conv3(A * (self.num_classes + 1),
                                   f"cls_conv{i}")(f))
            reg_maps.append(_conv3(A * 4, f"reg_conv{i}")(f))
        return {"cls": cls_maps, "reg": reg_maps}


class FoveaHead(nn.Module):
    """FoveaBox head (reference `.../fovea_head.py:42-122`, with_deform
    variant omitted): cls/reg towers + 3x3 outputs; reg is log-space
    (l, t, r, b) in per-level base_edge units."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        cls_tower = _Tower(self.stacked_convs, self.feat_channels, False,
                           "cls_conv")
        reg_tower = _Tower(self.stacked_convs, self.feat_channels, False,
                           "reg_conv")
        cls_out = _conv3(self.num_classes, "fovea_cls",
                         bias_init=_prior_bias)
        reg_out = _conv3(4, "fovea_reg")
        cls_maps, reg_maps = [], []
        for f in feats:
            reg_maps.append(reg_out(reg_tower(f)))
            cls_maps.append(cls_out(cls_tower(f)))
        return {"cls": cls_maps, "reg": reg_maps}


class FSAFHead(nn.Module):
    """FSAF head (reference `.../fsaf_head.py:13-55`): RetinaHead with ONE
    anchor per cell and ReLU'd (t, b, l, r) regression (the TBLR coder only
    accepts positive distances); reg bias init 0.25."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        cls_tower = _Tower(self.stacked_convs, self.feat_channels, False,
                           "cls_conv")
        reg_tower = _Tower(self.stacked_convs, self.feat_channels, False,
                           "reg_conv")
        cls_out = _conv3(self.num_classes, "retina_cls",
                         bias_init=_prior_bias)
        reg_out = _conv3(4, "retina_reg", bias_init=0.25)
        cls_maps, reg_maps = [], []
        for f in feats:
            cls_maps.append(cls_out(cls_tower(f)))
            reg_maps.append(nn.relu(reg_out(reg_tower(f))))
        return {"cls": cls_maps, "reg": reg_maps}


class RetinaSepBNHead(nn.Module):
    """RetinaNet head with SHARED tower convs but per-level BN statistics
    (reference `.../retina_sepbn_head.py`: used by NAS-FPN recipes)."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_base_anchors: int = 9

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        from ..layers import FrozenBatchNorm
        n_lvl = len(feats)
        cls_convs = [_conv3(self.feat_channels, f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [_conv3(self.feat_channels, f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        cls_bns = [[FrozenBatchNorm(name=f"cls_bn{i}_l{l}")
                    for l in range(n_lvl)]
                   for i in range(self.stacked_convs)]
        reg_bns = [[FrozenBatchNorm(name=f"reg_bn{i}_l{l}")
                    for l in range(n_lvl)]
                   for i in range(self.stacked_convs)]
        cls_out = _conv3(self.num_base_anchors * self.num_classes,
                         "retina_cls", bias_init=_prior_bias)
        reg_out = _conv3(self.num_base_anchors * 4, "retina_reg")
        cls_maps, reg_maps = [], []
        for l, f in enumerate(feats):
            cf, rf = f, f
            for i in range(self.stacked_convs):
                cf = nn.relu(cls_bns[i][l](cls_convs[i](cf)))
                rf = nn.relu(reg_bns[i][l](reg_convs[i](rf)))
            cls_maps.append(cls_out(cf))
            reg_maps.append(reg_out(rf))
        return {"cls": cls_maps, "reg": reg_maps}


class GARPNHead(nn.Module):
    """Guided-Anchoring RPN head (reference
    `/root/reference/code/mmdet/models/dense_heads/ga_rpn_head.py:13-38`):
    a 3x3 rpn conv + the GuidedAnchorHead branches with binary objectness
    (1 guided anchor per cell) — loc / shape / deform-adapted cls+reg."""
    in_channels: int = 256
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        from ...ops.flat_deform import multilevel_modulated_dcn
        rpn_conv = _conv3(self.feat_channels, "rpn_conv")
        loc_out = nn.Conv(1, (1, 1), kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(_prior_bias),
                          name="conv_loc")
        shape_out = nn.Conv(2, (1, 1),
                            kernel_init=nn.initializers.normal(0.01),
                            name="conv_shape")
        off = nn.Conv(2 * 9, (1, 1), kernel_init=nn.initializers.zeros,
                      name="adaption_offset")
        w_ad = self.param("adaption_weight", nn.initializers.normal(0.01),
                          (3, 3, self.feat_channels, self.feat_channels),
                          jnp.float32)
        cls_out = nn.Conv(1, (1, 1),
                          kernel_init=nn.initializers.normal(0.01),
                          name="ga_cls")
        reg_out = nn.Conv(4, (1, 1),
                          kernel_init=nn.initializers.normal(0.01),
                          name="ga_reg")
        locs, shapes, xs, offs = [], [], [], []
        for f in feats:
            x = nn.relu(rpn_conv(f))
            locs.append(loc_out(x))
            shape = shape_out(x)
            shapes.append(shape)
            xs.append(x)
            offs.append(off(jax.lax.stop_gradient(shape)).astype(f.dtype))
        adapted = multilevel_modulated_dcn(
            xs, offs, [None] * len(feats), w_ad.astype(feats[0].dtype))
        cls_maps, reg_maps = [], []
        for a in adapted:
            a = nn.relu(a)
            cls_maps.append(cls_out(a))
            reg_maps.append(reg_out(a))
        return {"cls": cls_maps, "reg": reg_maps, "loc": locs,
                "shape": shapes}


class GARetinaHead(nn.Module):
    """Guided-Anchoring RetinaNet head (reference
    `.../guided_anchor_head.py:865` + `ga_retina_head.py`): per-cell
    anchor-shape (dw, dh) and location-objectness branches; a deformable
    feature adaption driven by the shape prediction; cls/reg towers on the
    adapted features with ONE guided anchor per cell.

    The reference applies the post-adaption convs through ``masked_conv``
    (compute only at loc-masked cells); dense conv is the TPU-native
    equivalent — the mask applies at decode (SURVEY §2.2)."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        from ...ops.flat_deform import multilevel_modulated_dcn
        cls_tower = _Tower(self.stacked_convs, self.feat_channels, False,
                           "cls_conv")
        reg_tower = _Tower(self.stacked_convs, self.feat_channels, False,
                           "reg_conv")
        loc_out = _conv3(1, "conv_loc", bias_init=_prior_bias)
        shape_out = _conv3(2, "conv_shape")
        # two feature adapters (cls / reg), offsets from the shape pred
        # (reference FeatureAdaption x2 in ga_retina_head.py)
        off_cls = nn.Conv(2 * 9, (1, 1), kernel_init=nn.initializers.zeros,
                          name="adaption_offset_cls")
        off_reg = nn.Conv(2 * 9, (1, 1), kernel_init=nn.initializers.zeros,
                          name="adaption_offset_reg")
        w_cls = self.param("adaption_weight_cls",
                           nn.initializers.normal(0.01),
                           (3, 3, self.feat_channels, self.feat_channels),
                           jnp.float32)
        w_reg = self.param("adaption_weight_reg",
                           nn.initializers.normal(0.01),
                           (3, 3, self.feat_channels, self.feat_channels),
                           jnp.float32)
        cls_out = _conv3(self.num_classes, "ga_cls",
                         bias_init=_prior_bias)
        reg_out = _conv3(4, "ga_reg")
        locs, shapes, cls_maps, reg_maps = [], [], [], []
        cfs, rfs, offs_c, offs_r = [], [], [], []
        for f in feats:
            cf = cls_tower(f)
            rf = reg_tower(f)
            locs.append(loc_out(cf))
            shape = shape_out(rf)
            shapes.append(shape)
            sg = jax.lax.stop_gradient(shape)
            cfs.append(cf)
            rfs.append(rf)
            offs_c.append(off_cls(sg).astype(f.dtype))
            offs_r.append(off_reg(sg).astype(f.dtype))
        a_cls = multilevel_modulated_dcn(
            cfs, offs_c, [None] * len(feats), w_cls.astype(feats[0].dtype))
        a_reg = multilevel_modulated_dcn(
            rfs, offs_r, [None] * len(feats), w_reg.astype(feats[0].dtype))
        for ac, ar in zip(a_cls, a_reg):
            cls_maps.append(cls_out(nn.relu(ac)))
            reg_maps.append(reg_out(nn.relu(ar)))
        return {"cls": cls_maps, "reg": reg_maps, "loc": locs,
                "shape": shapes}
