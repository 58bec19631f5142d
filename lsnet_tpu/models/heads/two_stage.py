"""Two-stage detector family: RPN + RoI bbox head (Faster R-CNN).

TPU-native rebuild of the reference two-stage stack (SURVEY §2.3):
* RPNHead      `/root/reference/code/mmdet/models/dense_heads/rpn_head.py`
* SingleRoIExtractor  `.../roi_heads/roi_extractors/single_level.py`
  (FPN-level routing by RoI scale, finest_scale=56)
* Shared2FCBBoxHead   `.../roi_heads/bbox_heads/convfc_bbox_head.py`
* TwoStageDetector    `.../detectors/two_stage.py`

Everything is statically shaped: proposals are fixed-count padded arrays
with validity masks, and the level routing runs RoIAlign on every level
then selects — no data-dependent shapes (SURVEY §7 design stance).
Losses/proposal decode live in :mod:`lsnet_tpu.core.two_stage`.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.roi import roi_align

Array = jax.Array


class RPNHead(nn.Module):
    """Objectness + box-delta maps per FPN level (A anchors/cell)."""
    in_channels: int = 256
    feat_channels: int = 256
    num_base_anchors: int = 3

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        conv = nn.Conv(self.feat_channels, (3, 3),
                       padding=[(1, 1), (1, 1)],
                       kernel_init=nn.initializers.normal(0.01),
                       name="rpn_conv")
        cls_out = nn.Conv(self.num_base_anchors, (1, 1),
                          kernel_init=nn.initializers.normal(0.01),
                          name="rpn_cls")
        reg_out = nn.Conv(self.num_base_anchors * 4, (1, 1),
                          kernel_init=nn.initializers.normal(0.01),
                          name="rpn_reg")
        cls_maps, reg_maps = [], []
        for f in feats:
            x = nn.relu(conv(f))
            cls_maps.append(cls_out(x))
            reg_maps.append(reg_out(x))
        return {"rpn_cls": cls_maps, "rpn_reg": reg_maps}


class Shared2FCBBoxHead(nn.Module):
    """flatten(7x7xC) -> 2 shared FCs -> (softmax cls, per-class deltas)."""
    num_classes: int
    fc_channels: int = 1024
    roi_size: Tuple[int, int] = (7, 7)
    reg_class_agnostic: bool = False

    @nn.compact
    def __call__(self, roi_feats: Array) -> Tuple[Array, Array]:
        N = roi_feats.shape[0]
        x = roi_feats.reshape(N, -1)
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_cls")(x)
        n_reg = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(n_reg, kernel_init=nn.initializers.normal(0.001),
                       name="fc_reg")(x)
        return cls, reg


def multilevel_roi_align(feats: Sequence[Array], rois: Array,
                         strides: Sequence[int],
                         out_size: Tuple[int, int] = (7, 7),
                         finest_scale: float = 56.0) -> Array:
    """RoIAlign with FPN-level routing (reference SingleRoIExtractor
    ``map_roi_levels``: lvl = floor(log2(sqrt(area)/finest_scale)),
    clamped). Runs every level for every RoI and masks — static shapes.

    rois: (N, 5) [batch, x1, y1, x2, y2]."""
    n_lvl = min(len(feats), 4)        # extractor uses the first 4 levels
    w = rois[:, 3] - rois[:, 1]
    h = rois[:, 4] - rois[:, 2]
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, n_lvl - 1).astype(jnp.int32)
    out = None
    for i in range(n_lvl):
        r = roi_align(feats[i], rois, out_size,
                      spatial_scale=1.0 / strides[i])
        sel = (lvl == i).astype(r.dtype)[:, None, None, None]
        out = r * sel if out is None else out + r * sel
    return out


class TwoStageDetector(nn.Module):
    """Faster R-CNN assembly. Call methods individually (flax ``method=``):

    * ``extract(images)``            -> FPN feats
    * ``rpn(feats)``                 -> rpn cls/reg maps
    * ``roi_forward(feats, rois)``   -> (cls_logits, reg) for given RoIs

    The default ``__call__`` runs extract+rpn (enough for init/shape
    inference); proposal generation / sampling / losses are pure functions
    in :mod:`lsnet_tpu.core.two_stage`.
    """
    backbone: nn.Module
    neck: nn.Module
    rpn_head: nn.Module
    bbox_head: nn.Module
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)

    def extract(self, images: Array) -> Tuple[Array, ...]:
        return self.neck(self.backbone(images))

    def rpn(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        return self.rpn_head(feats)

    def roi_forward(self, feats: Sequence[Array], rois: Array
                    ) -> Tuple[Array, Array]:
        roi_feats = multilevel_roi_align(list(feats), rois, self.strides)
        return self.bbox_head(roi_feats)

    def __call__(self, images: Array, rois: Array = None):
        feats = self.extract(images)
        outs = self.rpn(feats)
        if rois is not None:
            outs["roi"] = self.roi_forward(feats, rois)
        else:
            # touch the bbox head so init creates its params
            dummy = jnp.zeros((1, 5), images.dtype)
            outs["roi"] = self.roi_forward(feats, dummy)
        return outs


class FCNMaskHead(nn.Module):
    """Mask R-CNN mask branch (reference
    `roi_heads/mask_heads/fcn_mask_head.py`): 4x conv3x3 -> 2x deconv ->
    per-class 1x1. 14x14 RoI feats -> (N, 28, 28, num_classes) logits."""
    num_classes: int
    conv_channels: int = 256
    num_convs: int = 4

    @nn.compact
    def __call__(self, roi_feats: Array) -> Array:
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_channels, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                kernel_init=nn.initializers.normal(0.01),
                                name=f"mask_conv{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.conv_channels, (2, 2),
                                     strides=(2, 2),
                                     name="mask_upsample")(x))
        return nn.Conv(self.num_classes, (1, 1),
                       kernel_init=nn.initializers.normal(0.001),
                       name="mask_logits")(x)


class MaskRCNNDetector(TwoStageDetector):
    """Faster R-CNN + FCN mask branch (reference `detectors/mask_rcnn.py`)."""
    mask_head: nn.Module = None

    def mask_forward(self, feats: Sequence[Array], rois: Array) -> Array:
        roi_feats = multilevel_roi_align(list(feats), rois, self.strides,
                                         out_size=(14, 14))
        return self.mask_head(roi_feats)

    def __call__(self, images: Array, rois: Array = None):
        outs = super().__call__(images, rois)
        feats = self.extract(images)
        dummy = (rois if rois is not None
                 else jnp.zeros((1, 5), images.dtype))
        outs["mask"] = self.mask_forward(feats, dummy)
        return outs


class CascadeRCNNDetector(TwoStageDetector):
    """Cascade R-CNN (reference `detectors/cascade_rcnn.py` +
    `roi_heads/cascade_roi_head.py`): three bbox heads refining the boxes
    at increasing IoU thresholds; class-agnostic regression."""
    bbox_head2: nn.Module = None
    bbox_head3: nn.Module = None

    def roi_forward_stage(self, feats: Sequence[Array], rois: Array,
                          stage: int) -> Tuple[Array, Array]:
        roi_feats = multilevel_roi_align(list(feats), rois, self.strides)
        head = (self.bbox_head, self.bbox_head2,
                self.bbox_head3)[stage]
        return head(roi_feats)

    def __call__(self, images: Array, rois: Array = None):
        feats = self.extract(images)
        outs = self.rpn(feats)
        dummy = (rois if rois is not None
                 else jnp.zeros((1, 5), images.dtype))
        for st in range(3):
            outs[f"roi{st}"] = self.roi_forward_stage(feats, dummy, st)
        return outs


class FastRCNNDetector(nn.Module):
    """Fast R-CNN (reference `detectors/fast_rcnn.py`): the RoI head run on
    EXTERNALLY provided proposals — no RPN. Methods mirror
    :class:`TwoStageDetector` minus ``rpn``."""
    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)

    def extract(self, images: Array) -> Tuple[Array, ...]:
        return self.neck(self.backbone(images))

    def roi_forward(self, feats: Sequence[Array], rois: Array
                    ) -> Tuple[Array, Array]:
        roi_feats = multilevel_roi_align(list(feats), rois, self.strides)
        return self.bbox_head(roi_feats)

    def __call__(self, images: Array, rois: Array = None):
        feats = self.extract(images)
        if rois is None:
            rois = jnp.zeros((1, 5), images.dtype)
        return {"roi": self.roi_forward(feats, rois)}


class MaskIoUHead(nn.Module):
    """Mask Scoring R-CNN mask-IoU head (reference
    `roi_heads/mask_heads/maskiou_head.py`): concat(RoI feats, max-pooled
    mask pred) -> 4 convs (last stride 2) -> 3 fcs -> per-class IoU."""
    num_classes: int
    conv_channels: int = 256
    fc_channels: int = 1024

    @nn.compact
    def __call__(self, roi_feats: Array, mask_pred: Array) -> Array:
        # mask_pred (N, 28, 28, C) -> class-max probability map, 2x maxpool
        mp = jax.nn.sigmoid(mask_pred.max(axis=-1, keepdims=True))
        mp = nn.max_pool(mp, (2, 2), strides=(2, 2))
        x = jnp.concatenate([roi_feats, mp], axis=-1)
        for i in range(4):
            stride = 2 if i == 3 else 1
            x = nn.relu(nn.Conv(self.conv_channels, (3, 3),
                                strides=(stride, stride),
                                padding=[(1, 1), (1, 1)],
                                kernel_init=nn.initializers.normal(0.01),
                                name=f"maskiou_conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(2):
            x = nn.relu(nn.Dense(self.fc_channels,
                                 name=f"maskiou_fc{i}")(x))
        return nn.Dense(self.num_classes, name="maskiou_out")(x)


class MaskScoringRCNNDetector(MaskRCNNDetector):
    """Mask Scoring R-CNN (reference `detectors/mask_scoring_rcnn.py`)."""
    maskiou_head: nn.Module = None

    def maskiou_forward(self, feats: Sequence[Array], rois: Array,
                        mask_pred: Array) -> Array:
        roi_feats = multilevel_roi_align(list(feats), rois, self.strides,
                                         out_size=(14, 14))
        return self.maskiou_head(roi_feats, mask_pred)

    def __call__(self, images: Array, rois: Array = None):
        outs = super().__call__(images, rois)
        feats = self.extract(images)
        dummy = (rois if rois is not None
                 else jnp.zeros((1, 5), images.dtype))
        outs["maskiou"] = self.maskiou_forward(feats, dummy, outs["mask"])
        return outs
