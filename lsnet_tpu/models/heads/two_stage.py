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
import numpy as np
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


class DoubleConvFCBBoxHead(nn.Module):
    """Double-Head R-CNN bbox head (reference
    `/root/reference/code/mmdet/models/roi_heads/bbox_heads/
    double_bbox_head.py:72-180`): a conv branch (BasicResBlock 256->1024 +
    ``num_convs`` bottleneck blocks + avg-pool) regresses boxes from the
    *reg* RoI features while an fc branch (``num_fcs`` FCs) classifies from
    the *cls* RoI features."""
    num_classes: int
    num_convs: int = 4
    num_fcs: int = 2
    conv_channels: int = 1024
    fc_channels: int = 1024
    reg_class_agnostic: bool = False

    @nn.compact
    def __call__(self, cls_feats: Array, reg_feats: Array
                 ) -> Tuple[Array, Array]:
        from ..layers import FrozenBatchNorm

        def conv_bn(x, ch, k, name, act=True):
            x = nn.Conv(ch, (k, k), padding=[(k // 2,) * 2] * 2,
                        use_bias=False, name=f"{name}_conv")(x)
            x = FrozenBatchNorm(name=f"{name}_bn")(x)
            return nn.relu(x) if act else x

        # conv branch (BasicResBlock :9-68 then bottlenecks :122-131)
        x = conv_bn(reg_feats, reg_feats.shape[-1], 3, "res_conv1")
        x = conv_bn(x, self.conv_channels, 1, "res_conv2", act=False)
        idt = conv_bn(reg_feats, self.conv_channels, 1, "res_identity",
                      act=False)
        x = nn.relu(x + idt)
        mid = self.conv_channels // 4
        for i in range(self.num_convs):
            y = conv_bn(x, mid, 1, f"branch{i}_1")
            y = conv_bn(y, mid, 3, f"branch{i}_2")
            y = conv_bn(y, self.conv_channels, 1, f"branch{i}_3", act=False)
            x = nn.relu(x + y)
        x = jnp.mean(x, axis=(1, 2))                      # global avg pool
        n_reg = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(n_reg, kernel_init=nn.initializers.normal(0.001),
                       name="fc_reg")(x)

        # fc branch
        f = cls_feats.reshape(cls_feats.shape[0], -1)
        for i in range(self.num_fcs):
            f = nn.relu(nn.Dense(self.fc_channels, name=f"fc_branch{i}")(f))
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_cls")(f)
        return cls, reg


def _scale_rois(rois: Array, factor: float) -> Array:
    """Rescale (N, 5) rois about their centers (reference
    `single_level.py roi_rescale`)."""
    cx = (rois[:, 1] + rois[:, 3]) * 0.5
    cy = (rois[:, 2] + rois[:, 4]) * 0.5
    hw = (rois[:, 3] - rois[:, 1]) * 0.5 * factor
    hh = (rois[:, 4] - rois[:, 2]) * 0.5 * factor
    return jnp.stack([rois[:, 0], cx - hw, cy - hh, cx + hw, cy + hh], -1)


class DoubleHeadRCNNDetector(TwoStageDetector):
    """Faster R-CNN with the Double Head RoI head (reference
    `roi_heads/double_roi_head.py:8-34`): the reg branch extracts RoI
    features at ``reg_roi_scale_factor`` x enlarged boxes."""
    reg_roi_scale_factor: float = 1.3

    def roi_forward(self, feats: Sequence[Array], rois: Array
                    ) -> Tuple[Array, Array]:
        cls_feats = multilevel_roi_align(list(feats), rois, self.strides)
        reg_feats = multilevel_roi_align(
            list(feats), _scale_rois(rois, self.reg_roi_scale_factor),
            self.strides)
        return self.bbox_head(cls_feats, reg_feats)


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


class GridHead(nn.Module):
    """Grid R-CNN grid head (reference
    `roi_heads/mask_heads/grid_head.py:11-219`): 8 GN convs (first stride
    2), first+second-order fusion between neighboring grid points
    (5x5 depthwise + 1x1 per edge), two grouped 2x deconvs to per-point
    28x28 heatmaps (the Grid R-CNN Plus half-sized sub-region maps)."""
    grid_points: int = 9
    num_convs: int = 8
    roi_feat_size: int = 14
    point_feat_channels: int = 64

    @property
    def grid_size(self) -> int:
        return int(np.sqrt(self.grid_points))

    def neighbors(self):
        gs = self.grid_size
        out = []
        for i in range(gs):
            for j in range(gs):
                n = []
                if i > 0:
                    n.append((i - 1) * gs + j)
                if j > 0:
                    n.append(i * gs + j - 1)
                if j < gs - 1:
                    n.append(i * gs + j + 1)
                if i < gs - 1:
                    n.append((i + 1) * gs + j)
                out.append(tuple(n))
        return out

    @nn.compact
    def __call__(self, roi_feats: Array) -> Dict[str, Array]:
        G = self.grid_points
        c = self.point_feat_channels
        C = G * c
        x = roi_feats
        for i in range(self.num_convs):
            stride = 2 if i == 0 else 1
            x = nn.Conv(C, (3, 3), strides=(stride, stride),
                        padding=[(1, 1), (1, 1)], name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=G * 4, name=f"gn{i}")(x)
            x = nn.relu(x)

        def trans(prefix, i, j, src):
            h = nn.Conv(c, (5, 5), padding=[(2, 2), (2, 2)],
                        feature_group_count=c,
                        name=f"{prefix}_{i}_{j}_dw")(src)
            return nn.Conv(c, (1, 1), name=f"{prefix}_{i}_{j}_pw")(h)

        nbrs = self.neighbors()
        slc = lambda t, i: t[..., i * c:(i + 1) * c]       # noqa: E731
        x_fo = []
        for i, pts in enumerate(nbrs):
            acc = slc(x, i)
            for j, p in enumerate(pts):
                acc = acc + trans("fo", i, j, slc(x, p))
            x_fo.append(acc)
        x_so = []
        for i, pts in enumerate(nbrs):
            acc = slc(x, i)
            for j, p in enumerate(pts):
                acc = acc + trans("so", i, j, x_fo[p])
            x_so.append(acc)

        # deconv weights are SHARED between the fused and unfused paths
        # (reference uses the same self.deconv1/2 for both)
        dec1 = [nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME",
                                 name=f"deconv1_g{g}") for g in range(G)]
        dec2 = [nn.ConvTranspose(1, (4, 4), strides=(2, 2), padding="SAME",
                                 name=f"deconv2_g{g}") for g in range(G)]
        gn1 = nn.GroupNorm(num_groups=G, name="deconv1_gn")

        def heatmap_from(xin):
            h = jnp.concatenate([dec1[g](slc(xin, g)) for g in range(G)],
                                axis=-1)
            h = nn.relu(gn1(h))
            return jnp.concatenate([dec2[g](slc(h, g)) for g in range(G)],
                                   axis=-1)               # (N, 28, 28, G)

        fused = heatmap_from(jnp.concatenate(x_so, axis=-1))
        unfused = heatmap_from(x)
        return {"fused": fused, "unfused": unfused}


class GridRCNNDetector(TwoStageDetector):
    """Grid R-CNN (reference `detectors/grid_rcnn.py`): second-stage box
    localization by grid-point heatmaps instead of delta regression."""
    grid_head: nn.Module = None

    def grid_forward(self, feats: Sequence[Array], rois: Array
                     ) -> Dict[str, Array]:
        roi_feats = multilevel_roi_align(list(feats), rois, self.strides,
                                         out_size=(14, 14))
        return self.grid_head(roi_feats)

    def __call__(self, images: Array, rois: Array = None):
        outs = super().__call__(images, rois)
        feats = self.extract(images)
        dummy = (rois if rois is not None
                 else jnp.zeros((1, 5), images.dtype))
        outs["grid"] = self.grid_forward(feats, dummy)
        return outs


class FusedSemanticHead(nn.Module):
    """HTC multi-level fused semantic head (reference
    `roi_heads/mask_heads/fused_semantic_head.py`): per-level 1x1
    laterals resized to the fusion level, 4x 3x3 convs, a 1x1 embedding
    (fused into RoI feats) and 1x1 logits."""
    num_classes: int
    fusion_level: int = 1
    num_convs: int = 4
    conv_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Tuple[Array, Array]:
        tgt = feats[self.fusion_level]
        x = nn.relu(nn.Conv(self.conv_channels, (1, 1),
                            name=f"lateral_{self.fusion_level}")(tgt))
        th, tw = tgt.shape[1:3]
        for i, f in enumerate(feats):
            if i == self.fusion_level:
                continue
            l = nn.relu(nn.Conv(self.conv_channels, (1, 1),
                                name=f"lateral_{i}")(f))
            l = jax.image.resize(l, (l.shape[0], th, tw, l.shape[3]),
                                 method="bilinear")
            x = x + l
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_channels, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                name=f"conv{i}")(x))
        embedding = nn.relu(nn.Conv(self.conv_channels, (1, 1),
                                    name="conv_embedding")(x))
        logits = nn.Conv(self.num_classes + 1, (1, 1),
                         name="conv_logits")(x)
        return logits, embedding


class HTCMaskHead(nn.Module):
    """HTC mask head with info flow (reference
    `roi_heads/mask_heads/htc_mask_head.py`): previous stage's mask feats
    enter through a 1x1 res conv."""
    num_classes: int
    conv_channels: int = 256
    num_convs: int = 4

    @nn.compact
    def __call__(self, roi_feats: Array, last_feat: Array = None
                 ) -> Tuple[Array, Array]:
        x = roi_feats
        if last_feat is not None:
            x = x + nn.relu(nn.Conv(self.conv_channels, (1, 1),
                                    name="conv_res")(last_feat))
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_channels, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                kernel_init=nn.initializers.normal(0.01),
                                name=f"mask_conv{i}")(x))
        feat = x
        x = nn.relu(nn.ConvTranspose(self.conv_channels, (2, 2),
                                     strides=(2, 2), name="mask_upsample")(x))
        logits = nn.Conv(self.num_classes, (1, 1),
                         kernel_init=nn.initializers.normal(0.001),
                         name="mask_logits")(x)
        return logits, feat


class HTCDetector(TwoStageDetector):
    """Hybrid Task Cascade (reference `detectors/htc.py` +
    `roi_heads/htc_roi_head.py`): 3-stage cascade with per-stage mask
    heads (mask info flow) and a fused semantic branch whose RoI features
    add into both bbox and mask RoI feats."""
    bbox_head2: nn.Module = None
    bbox_head3: nn.Module = None
    mask_head1: nn.Module = None
    mask_head2: nn.Module = None
    mask_head3: nn.Module = None
    semantic_head: nn.Module = None

    def semantic(self, feats: Sequence[Array]) -> Tuple[Array, Array]:
        return self.semantic_head(feats)

    def _sem_roi(self, sem_feat: Array, rois: Array, out_size):
        # semantic RoI features: single map at the fusion-level stride (8)
        return multilevel_roi_align([sem_feat], rois, (8,),
                                    out_size=out_size)

    def roi_forward_stage(self, feats, rois, stage, sem_feat=None):
        roi_feats = multilevel_roi_align(list(feats), rois, self.strides)
        if sem_feat is not None:
            roi_feats = roi_feats + self._sem_roi(sem_feat, rois, (7, 7))
        head = (self.bbox_head, self.bbox_head2, self.bbox_head3)[stage]
        return head(roi_feats)

    def mask_forward_stage(self, feats, rois, stage, sem_feat=None,
                           last_feat=None):
        roi_feats = multilevel_roi_align(list(feats), rois, self.strides,
                                         out_size=(14, 14))
        if sem_feat is not None:
            roi_feats = roi_feats + self._sem_roi(sem_feat, rois, (14, 14))
        head = (self.mask_head1, self.mask_head2, self.mask_head3)[stage]
        return head(roi_feats, last_feat)

    def __call__(self, images: Array, rois: Array = None):
        feats = self.extract(images)
        outs = self.rpn(feats)
        sem_logits, sem_feat = self.semantic(feats)
        outs["sem"] = sem_logits
        dummy = (rois if rois is not None
                 else jnp.zeros((1, 5), images.dtype))
        last = None
        for st in range(3):
            outs[f"roi{st}"] = self.roi_forward_stage(feats, dummy, st,
                                                      sem_feat)
            m, last = self.mask_forward_stage(feats, dummy, st, sem_feat,
                                              last)
            outs[f"mask{st}"] = m
        return outs


def point_sample(feat: Array, points: Array) -> Array:
    """Bilinear sample (N, H, W, C) at normalized [0,1] xy ``points``
    (N, P, 2) -> (N, P, C) (reference mmcv point_sample, align=False)."""
    N, H, W, C = feat.shape
    x = points[..., 0] * W - 0.5
    y = points[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = jnp.clip(x0 + dx, 0, W - 1).astype(jnp.int32)
            yi = jnp.clip(y0 + dy, 0, H - 1).astype(jnp.int32)
            w = ((1 - jnp.abs(x - (x0 + dx)))
                 * (1 - jnp.abs(y - (y0 + dy))))
            g = jnp.take_along_axis(
                feat.reshape(N, H * W, C),
                (yi * W + xi)[..., None].astype(jnp.int32), axis=1)
            out = out + g * w[..., None].astype(feat.dtype)
    return out


class MaskPointHead(nn.Module):
    """PointRend point head (reference
    `roi_heads/mask_heads/mask_point_head.py`): a 3-layer 1x1-conv MLP on
    [fine point features, coarse point logits] -> per-class point logits,
    with the coarse logits re-concatenated at every layer."""
    num_classes: int
    num_fcs: int = 3
    fc_channels: int = 256

    @nn.compact
    def __call__(self, fine: Array, coarse: Array) -> Array:
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, name=f"fc{i}")(x))
            x = jnp.concatenate([x, coarse], axis=-1)
        return nn.Dense(self.num_classes, name="fc_logits")(x)


class PointRendDetector(MaskRCNNDetector):
    """PointRend (reference `detectors/point_rend.py` +
    `roi_heads/point_rend_roi_head.py`): Mask R-CNN whose mask predictions
    are refined at uncertain points by an MLP over fine P2 features."""
    point_head: nn.Module = None

    def __call__(self, images: Array, rois: Array = None):
        outs = super().__call__(images, rois)
        feats = self.extract(images)
        dummy = (rois if rois is not None
                 else jnp.zeros((1, 5), images.dtype))
        pts = jnp.full((dummy.shape[0], 4, 2), 0.5, images.dtype)
        outs["point"] = self.point_forward(feats, dummy, pts, outs["mask"])
        return outs

    def point_forward(self, feats: Sequence[Array], rois: Array,
                      points: Array, coarse_logits: Array) -> Array:
        """points (N, P, 2) normalized within each roi; fine features come
        from the finest FPN level (reference in_channels=[256], start P2).
        """
        x1, y1 = rois[:, 1], rois[:, 2]
        w = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-3)
        h = jnp.maximum(rois[:, 4] - rois[:, 2], 1e-3)
        f0 = feats[0]
        B, H, W, C = f0.shape
        stride = 4.0
        # flat-row bilinear gather (materializing f0[batch_of_roi] would
        # be N_rois x the full P2 map)
        px = (x1[:, None] + points[..., 0] * w[:, None]) / stride - 0.5
        py = (y1[:, None] + points[..., 1] * h[:, None]) / stride - 0.5
        bidx = jnp.clip(rois[:, 0].astype(jnp.int32), 0, B - 1)
        flat = f0.reshape(B * H * W, C)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fine = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                xi = jnp.clip(x0 + dx, 0, W - 1).astype(jnp.int32)
                yi = jnp.clip(y0 + dy, 0, H - 1).astype(jnp.int32)
                wt = ((1 - jnp.abs(px - (x0 + dx)))
                      * (1 - jnp.abs(py - (y0 + dy))))
                idx = bidx[:, None] * (H * W) + yi * W + xi
                fine = fine + flat[idx.reshape(-1)].reshape(
                    *idx.shape, C) * wt[..., None].astype(f0.dtype)
        coarse = point_sample(coarse_logits, points)
        return self.point_head(fine, coarse)
